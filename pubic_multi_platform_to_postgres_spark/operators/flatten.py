"""Recursive JSON flattening as a StructType-driven ``select`` (P1/P2).

The reference flattens every raw API record row-by-row in Python
(``flatten_json``, ``tap_wrike/utility.py:34-56``): nested dict keys are
joined with ``-`` (``dates.start`` → ``dates-start``), list items are
indexed (``key-0``, ``key-1``, …), and keys named in a preserve list
(e.g. ``["profiles"]``) stay intact for the later sub-stream split.
HubSpot uses the one-level variant (``row.update(row.pop("properties"))``,
``tap_hubspot/utility.py:99``).

Here the same semantics compile to a single projection over a typed nested
DataFrame — no Python in the row path, fully columnar, and Catalyst prunes
any nested field the downstream plan doesn't use. At 100 TB this is the
difference between a per-row interpreter and a vectorized column gather.

Dash-joined names are legal Spark column names but need backtick quoting
in SQL — the oracle side quotes them with double quotes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def flatten_columns(
    schema: T.StructType,
    sep: str = "-",
    preserve: tuple[str, ...] = (),
    array_limits: dict[str, int] | None = None,
    _prefix: str = "",
    _path: tuple[str, ...] = (),
) -> list[Column]:
    """Compile a nested schema into the flat projection the reference's
    ``flatten_json`` would produce.

    - struct field ``a.b`` → column ``a-b``
    - array field ``xs`` (not preserved) → ``xs-0 … xs-(n-1)`` where ``n``
      comes from ``array_limits[dotted.path]`` (data-independent: the plan
      must be static; see :func:`infer_array_limits`)
    - field named in ``preserve`` → kept whole (sub-stream split input)
    """
    array_limits = array_limits or {}
    cols: list[Column] = []
    for f in schema.fields:
        name = f.name
        dotted = ".".join((*_path, name))
        out = f"{_prefix}{name}"
        ref = F.col(dotted)
        if name in preserve:
            cols.append(ref.alias(out))
        elif isinstance(f.dataType, T.StructType):
            cols.extend(
                flatten_columns(
                    f.dataType, sep, preserve, array_limits,
                    _prefix=f"{out}{sep}", _path=(*_path, name),
                )
            )
        elif isinstance(f.dataType, T.ArrayType):
            n = array_limits.get(dotted, 0)
            elem = f.dataType.elementType
            for i in range(n):
                # try_element_at: short lists yield NULL (ANSI element_at throws)
                item = F.try_element_at(ref, F.lit(i + 1))
                if isinstance(elem, T.StructType):
                    for sub in elem.fields:
                        cols.append(item[sub.name].alias(f"{out}{sep}{i}{sep}{sub.name}"))
                else:
                    cols.append(item.alias(f"{out}{sep}{i}"))
            if n == 0:
                # no limit declared: drop the array (reference drops empty
                # lists; callers that need it must preserve or limit it)
                continue
        else:
            cols.append(ref.alias(out))
    return cols


def flatten(
    df: DataFrame,
    sep: str = "-",
    preserve: tuple[str, ...] = (),
    array_limits: dict[str, int] | None = None,
) -> DataFrame:
    """Apply :func:`flatten_columns` to a DataFrame (P1, generic variant)."""
    return df.select(*flatten_columns(df.schema, sep, preserve, array_limits))


def infer_array_limits(df: DataFrame, paths: list[str]) -> dict[str, int]:
    """Measure ``max(size(path))`` for each array path in one aggregation.

    One cheap extra pass (map-side max + single-row result) used when the
    caller wants reference-faithful index flattening but doesn't know the
    maximum list arity up front. For fixed API schemas, pass explicit
    limits instead and skip the scan.
    """
    if not paths:
        return {}
    row = df.agg(
        *[F.max(F.size(F.col(p))).alias(p) for p in paths]
    ).collect()[0]
    return {p: max(int(row[p] or 0), 0) for p in paths}


def merge_struct(df: DataFrame, struct_col: str) -> DataFrame:
    """One-level flatten-merge (P2): lift every field of ``struct_col`` to
    the top level and drop the struct — the HubSpot
    ``row.update(row.pop("properties", {}))`` semantics
    (``tap_hubspot/utility.py:99``). ``dict.update`` overwrites, so on a
    name collision the struct's field wins over the top-level column."""
    struct_fields = [
        f.name for f in df.schema[struct_col].dataType.fields  # type: ignore[union-attr]
    ]
    top = [c for c in df.columns if c != struct_col and c not in struct_fields]
    lifted = [F.col(f"{struct_col}.{name}").alias(name) for name in struct_fields]
    return df.select(*top, *lifted)
