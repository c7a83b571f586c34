"""MERGE INTO: keyed three-way merge (update / delete / insert) and the
CDC-changelog apply built on it.

The reference's loader path is pure PK upsert (insert-or-update,
``ON CONFLICT DO UPDATE`` — see operators/upsert.py). A lakehouse engine
also needs the full MERGE surface — conditional updates, matched
deletes, conditional insert clauses — i.e. what Delta/Iceberg expose as
``MERGE INTO`` and Postgres 15+ as SQL MERGE.

Spark-first shape: ONE full-outer equi-join on the merge keys (hash
shuffle both sides, AQE-sized), then a per-row CASE picks the surviving
column values. No row explosion, no driver loop; cost is the join
shuffle — the same lower bound Delta pays, minus its file pruning (a
real lake deployment would swap this for ``DeltaTable.merge`` and prune
untouched files; the semantics here are identical).

Duplicate-key sources are rejected exactly like Delta's
``MergeIntoCommand`` (a source row matching is ambiguous if two source
rows share a key) — pre-dedup with :func:`latest_changes` when the
source is a changelog.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pubic_multi_platform_to_postgres_spark.operators.upsert import ParquetUpsertSink


def merge_into(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    matched_update: dict[str, Column] | None = None,
    matched_delete: Column | None = None,
    insert: bool | Column = True,
    check_duplicate_source_keys: bool = True,
) -> DataFrame:
    """Merge ``source`` into ``target`` on ``keys``; returns the new
    target contents (the caller persists it — e.g. ParquetUpsertSink's
    swap, or a lake MERGE).

    - matched + ``matched_delete`` condition true → row dropped
    - matched otherwise → ``matched_update`` expressions applied
      (``None`` → keep target row unchanged)
    - source-only + ``insert`` (bool, or a Column condition evaluated on
      the source row) → source row inserted
    - target-only → kept as-is

    Condition/update expressions are evaluated against the joined row:
    target columns under their own names, source non-key columns
    prefixed ``_src_``. NULL-valued conditions count as false (SQL MERGE
    semantics).

    ``check_duplicate_source_keys`` adds a window-count guard that fails
    the job if two source rows share a key (ambiguous merge, mirroring
    Delta's duplicate-match error) — one extra window over the already
    -shuffled source partitioning; disable for pre-deduped changelogs.
    """
    tcols = target.columns
    if check_duplicate_source_keys:
        # The guard must ride on a column the join actually uses (the first
        # key), or Catalyst prunes the unused projection and the check never
        # evaluates. assert_true returns NULL when the predicate holds, so
        # when(guard.isNull(), key) is the key itself — or an error.
        w = Window.partitionBy(*keys)
        guard = F.assert_true(
            F.count(F.lit(1)).over(w) <= 1,
            F.concat(
                F.lit("merge_into: duplicate source key "),
                F.concat_ws(",", *[F.col(k).cast("string") for k in keys]),
            ),
        )
        source = source.withColumn(
            keys[0], F.when(guard.isNull(), F.col(keys[0]))
        )

    src = source.select(
        *[F.col(k).alias(f"_srck_{k}") for k in keys],
        *[
            F.col(c).alias(f"_src_{c}")
            for c in source.columns
            if c not in keys
        ],
        F.lit(True).alias("_src_present"),
    )
    tgt = target.withColumn("_tgt_present", F.lit(True))
    cond = [tgt[k] == src[f"_srck_{k}"] for k in keys]
    joined = tgt.join(src, cond, "full_outer")

    matched = F.col("_tgt_present").isNotNull() & F.col("_src_present").isNotNull()
    src_only = F.col("_tgt_present").isNull()

    keep = F.lit(True)
    if matched_delete is not None:
        keep = keep & ~(matched & F.coalesce(matched_delete, F.lit(False)))
    if insert is True:
        pass
    elif insert is False:
        keep = keep & ~src_only
    else:
        keep = keep & (~src_only | F.coalesce(insert, F.lit(False)))
    joined = joined.filter(keep)

    def out_col(c: str) -> Column:
        if c in keys:
            v = F.when(src_only, F.col(f"_srck_{c}")).otherwise(F.col(c))
        else:
            src_val = F.col(f"_src_{c}") if f"_src_{c}" in joined.columns else F.lit(None)
            v = F.col(c)
            if matched_update is not None and c in matched_update:
                v = F.when(matched, matched_update[c]).otherwise(v)
            v = F.when(src_only, src_val).otherwise(v)
        return v.alias(c)

    return joined.select(*[out_col(c) for c in tcols])


def latest_changes(
    changes: DataFrame,
    keys: list[str],
    seq_col: str,
) -> DataFrame:
    """Collapse a changelog to its latest change per key (highest
    ``seq_col``). One window on the key — the same shuffle the merge
    join needs, so the exchange is reused."""
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def apply_cdc(
    target: DataFrame,
    changes: DataFrame,
    keys: list[str],
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC changelog (op ∈ I/U/D, monotone ``seq_col``) to a
    snapshot: the latest change per key wins; D deletes, I/U upserts; a
    D for an absent key is a no-op — Debezium-style batch apply (a
    streaming changelog reaches this same function per micro-batch via
    ``foreachBatch``).
    """
    latest = latest_changes(changes, keys, seq_col)
    data_cols = [c for c in target.columns if c not in keys]
    is_delete = F.col(f"_src_{op_col}") == "D"
    return merge_into(
        target,
        latest,
        keys,
        matched_update={c: F.col(f"_src_{c}") for c in data_cols},
        matched_delete=is_delete,
        insert=~is_delete,
        check_duplicate_source_keys=False,  # latest_changes deduped
    )


def apply_cdc_versioned(
    target: DataFrame,
    changes: DataFrame,
    keys: list[str],
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """CDC apply for a target that STORES the change sequence (the shape a
    streaming sink needs): a change only lands if its ``seq_col`` beats
    the row's stored one, so replayed micro-batches are no-ops and a
    stale update arriving after a newer one (cross-batch out-of-order)
    is ignored — the version-check upsert Debezium-style sink connectors
    run per batch.

    Known CDC caveat (documented, not solved here): a delete at seq n
    removes the row AND its stored seq, so a stale pre-delete update in a
    LATER batch re-inserts the key. Preventing that requires tombstone
    retention; batch-internal ordering is already safe
    (``latest_changes`` collapses first).
    """
    latest = latest_changes(changes, keys, seq_col)
    newer = F.col(f"_src_{seq_col}") > F.col(seq_col)
    data_cols = [c for c in target.columns if c not in keys and c != seq_col]
    upd = {
        c: F.when(newer, F.col(f"_src_{c}")).otherwise(F.col(c)) for c in data_cols
    }
    upd[seq_col] = F.when(newer, F.col(f"_src_{seq_col}")).otherwise(F.col(seq_col))
    return merge_into(
        target,
        latest,
        keys,
        matched_update=upd,
        matched_delete=(F.col(f"_src_{op_col}") == "D") & newer,
        insert=F.col(f"_src_{op_col}") != "D",
        check_duplicate_source_keys=False,
    )


class ParquetCdcSink(ParquetUpsertSink):
    """Apply CDC micro-batches to a parquet snapshot: the streaming twin
    of :func:`apply_cdc_versioned` (drive it from
    ``streaming/runner.py foreach_batch_cdc``). The landed table carries
    the data columns + ``seq_col`` (the version check), never ``op_col``.
    Inherits the per-path lock and crash-safe staging swap."""

    def __init__(
        self,
        spark,
        path,
        keys: list[str],
        seq_col: str,
        op_col: str = "op",
    ) -> None:
        super().__init__(spark, path, keys, order_col=seq_col)
        self.seq_col = seq_col
        self.op_col = op_col

    def _write_locked(self, batch: DataFrame) -> None:
        existing = self.read()
        if existing is None:
            latest = latest_changes(batch, self.keys, self.seq_col)
            result = latest.filter(F.col(self.op_col) != "D").drop(self.op_col)
        else:
            result = apply_cdc_versioned(
                existing, batch, self.keys, self.seq_col, self.op_col
            )
        self._swap_in(result)


class AdditiveAggSink(ParquetUpsertSink):
    """Incremental materialized aggregate for distributive measures: each
    batch folds into stored per-group partials (counts/sums ADD on key
    collision instead of replacing) — incremental view maintenance for
    the groupBy-sum family, so refreshing a 100 TB rollup costs one pass
    over the NEW data plus a merge against the (|groups|-sized) state,
    never a recompute of history. AVG and friends derive from the stored
    (sum, count) pairs at read time; non-distributive aggregates
    (distinct, percentiles) need sketch-typed state instead (HLL /
    quantile digest) — out of scope here.

    ``write(batch)`` expects RAW rows; the sink aggregates them with the
    declared measures and merges. Inherits the per-path lock and
    crash-safe staging swap.
    """

    def __init__(
        self,
        spark,
        path,
        keys: list[str],
        measures: dict[str, Column],
        sketch_measures: dict[str, Column] | None = None,
        merge_fns: dict[str, "object"] | None = None,
    ) -> None:
        """``measures``: output column -> aggregate expression over a raw
        batch. The default merge is ``stored + batch`` — correct ONLY for
        count/sum. For other distributive aggregates pass ``merge_fns``:
        output column -> ``f(stored_col, batch_col) -> Column``, e.g.
        ``F.least``/``F.greatest`` for min/max.

        ``sketch_measures``: output column -> ``hll_sketch_agg(...)``
        expression. Stored state is the binary sketch; merge is
        ``hll_union`` — this makes APPROX DISTINCT incrementally
        maintainable (the non-distributive aggregate a plain additive
        rollup can't keep). Read estimates with
        ``F.hll_sketch_estimate(col)``.
        """
        super().__init__(spark, path, keys)
        self.measures = measures
        self.sketch_measures = sketch_measures or {}
        self.merge_fns = merge_fns or {}

    def _write_locked(self, batch: DataFrame) -> None:
        partial = batch.groupBy(*self.keys).agg(
            *[expr.alias(name) for name, expr in self.measures.items()],
            *[expr.alias(name) for name, expr in self.sketch_measures.items()],
        )
        existing = self.read()
        if existing is None:
            self._swap_in(partial)
            return
        updates = {
            name: self.merge_fns[name](F.col(name), F.col(f"_src_{name}"))
            if name in self.merge_fns
            else F.col(name) + F.col(f"_src_{name}")
            for name in self.measures
        }
        updates.update({
            name: F.hll_union(F.col(name), F.col(f"_src_{name}"))
            for name in self.sketch_measures
        })
        result = merge_into(
            existing,
            partial,
            self.keys,
            matched_update=updates,
            insert=True,
            check_duplicate_source_keys=False,  # groupBy guarantees unique keys
        )
        self._swap_in(result)
