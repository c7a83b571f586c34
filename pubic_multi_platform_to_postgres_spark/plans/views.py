"""SQL view/model registry — the engine's dbt layer (K4).

The reference materializes dbt models as Postgres views after every
pipeline cycle (``scheduler.py:35-47``; ``dbt/dbt_project.yml:19-29``
``+materialized: view``). Models reference landed tables through
``source()`` and each other through ``ref()``.

Here a model is a name + Spark SQL text (or a DataFrame-producing
function) + explicit dependencies. ``materialize`` resolves the DAG
topologically and registers each model as a temp view (or a saved table
for ``materialized='table'``), so downstream queries — and other models —
can reference it by name. ``spark.sql`` text goes through Catalyst like
any query; a view adds zero execution cost until queried.

The two reference models ship as built-ins with verbatim semantics
(``dbt/models/wrike/proposal_durations.sql``, ``quote_durations.sql``):
filter Completed + NOT NULL dates + LOWER(title) LIKE, project, and
``ROUND(EXTRACT(EPOCH FROM (completeddate - createddate)) / 86400, 4)``.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Model:
    name: str
    sql: str | None = None
    fn: Callable[[SparkSession], DataFrame] | None = None
    depends_on: list[str] = field(default_factory=list)
    materialized: str = "view"  # "view" | "table"

    def build(self, spark: SparkSession) -> DataFrame:
        if self.sql is not None:
            return spark.sql(self.sql)
        if self.fn is not None:
            return self.fn(spark)
        raise ValueError(f"model {self.name} has neither sql nor fn")


class ViewRegistry:
    """Ordered registry of SQL models with dependency resolution."""

    def __init__(self) -> None:
        self._models: dict[str, Model] = {}

    def register(self, model: Model) -> Model:
        if model.name in self._models:
            raise ValueError(f"duplicate model: {model.name}")
        self._models[model.name] = model
        return model

    def model(
        self,
        name: str,
        sql: str,
        depends_on: list[str] | None = None,
        materialized: str = "view",
    ) -> Model:
        return self.register(Model(name, sql=sql, depends_on=depends_on or [], materialized=materialized))

    def _topo_order(self) -> list[Model]:
        order: list[Model] = []
        seen: dict[str, int] = {}  # 0=visiting, 1=done

        def visit(name: str) -> None:
            state = seen.get(name)
            if state == 1:
                return
            if state == 0:
                raise ValueError(f"model dependency cycle at {name}")
            seen[name] = 0
            m = self._models.get(name)
            if m is None:
                # external source table (already a view/table in the session)
                seen[name] = 1
                return
            for dep in m.depends_on:
                visit(dep)
            seen[name] = 1
            order.append(m)

        for name in self._models:
            visit(name)
        return order

    def materialize(self, spark: SparkSession) -> list[str]:
        """Build every model in dependency order; returns build order."""
        built = []
        for m in self._topo_order():
            df = m.build(spark)
            if m.materialized == "table":
                df.write.mode("overwrite").saveAsTable(m.name)
            else:
                df.createOrReplaceTempView(m.name)
            built.append(m.name)
        return built


_DURATION_MODEL_SQL = """
SELECT id,
       createddate,
       updateddate,
       completeddate,
       title,
       status,
       ROUND((unix_timestamp(completeddate) - unix_timestamp(createddate))
             / 86400.0, 4) AS duration_in_days
FROM tasks
WHERE status = 'Completed'
  AND createddate IS NOT NULL
  AND completeddate IS NOT NULL
  AND LOWER(title) LIKE '%{word}%'
"""


def reference_models() -> ViewRegistry:
    """The reference's dbt project: proposal_durations + quote_durations
    over a ``tasks`` source view (register ``tasks`` first)."""
    reg = ViewRegistry()
    reg.model(
        "proposal_durations",
        _DURATION_MODEL_SQL.format(word="proposal"),
        depends_on=["tasks"],
    )
    reg.model(
        "quote_durations",
        _DURATION_MODEL_SQL.format(word="quote"),
        depends_on=["tasks"],
    )
    return reg
