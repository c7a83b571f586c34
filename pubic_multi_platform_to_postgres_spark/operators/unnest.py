"""Child-stream splitting: explode + parent back-reference + surrogate keys.

The reference turns nested arrays into separate keyed tables
(``process_sub_streams``: ``tap_wrike/utility.py:146-195``,
``tap_xero/utility.py:105-152``, hubspot association variant
``tap_hubspot/utility.py:151-226``) with a ``parent_id`` back-reference and
a synthesized composite primary key (``tap_hubspot/fetch.py:17-44``,
``tap_wrike/fetch.py:13-20``, ``tap_xero/fetch.py:100-104``).

In Spark each split is one ``explode`` projection — narrow, pipelined
inside the scan stage, no shuffle. The parent row keeps its list column
(or drops it) and the child DataFrame is written as its own table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_surrogate_key(
    df: DataFrame,
    parts: list[str | Column],
    out: str = "id",
    sep: str = "_",
) -> DataFrame:
    """U3: composite surrogate key ``part1_part2_…`` (string concat, the
    reference's f-string key synthesis). NULL parts become empty segments
    the way Python string-formats ``None`` — callers should key on
    non-null columns, as the reference implicitly does."""
    cols = [F.col(p) if isinstance(p, str) else p for p in parts]
    return df.withColumn(out, F.concat_ws(sep, *[c.cast("string") for c in cols]))


def split_substream(
    df: DataFrame,
    list_col: str,
    parent_key: str,
    key_parts: list[str] | None = None,
    keep_parent_cols: tuple[str, ...] = (),
) -> DataFrame:
    """U1: one child row per element of ``list_col`` with ``parent_id``.

    ``key_parts`` (child-side column names) synthesize the child PK as
    ``parent_id_<part1>_<part2>…``; pass ``None`` to skip key synthesis.
    ``keep_parent_cols`` copies additional parent columns (the Xero tenant
    enrichment rides through here).
    """
    exploded = df.filter(F.size(F.col(list_col)) > 0).select(
        F.col(parent_key).cast("string").alias("parent_id"),
        *[F.col(c) for c in keep_parent_cols],
        F.explode(F.col(list_col)).alias("_elem"),
    )
    child = exploded.select("parent_id", *keep_parent_cols, "_elem.*")
    if key_parts is not None:
        child = with_surrogate_key(child, ["parent_id", *key_parts])
    return child


def unnest_association(
    df: DataFrame,
    assoc: str,
    parent_key: str,
    results_path: str | None = None,
) -> DataFrame:
    """U2 + P5: HubSpot association unnest with key prefixing.

    Explodes ``associations.<assoc>.results``, renames each element field
    ``k`` → ``<assoc>_k`` (``tap_hubspot/utility.py:202-206``), attaches
    ``parent_id``, and synthesizes ``id = parent_id_<assoc>_id``
    (``tap_hubspot/fetch.py:17-44``).
    """
    path = results_path or f"associations.{assoc}.results"
    exploded = df.select(
        F.col(parent_key).cast("string").alias("parent_id"),
        F.explode(F.col(path)).alias("_elem"),
    )
    elem_fields = exploded.schema["_elem"].dataType.fields  # type: ignore[union-attr]
    child = exploded.select(
        "parent_id",
        *[F.col(f"_elem.{f.name}").alias(f"{assoc}_{f.name}") for f in elem_fields],
    )
    return with_surrogate_key(child, ["parent_id", f"{assoc}_id"])


def unnest_budget_lines(
    df: DataFrame,
    parent_key: str = "BudgetID",
    lines_col: str = "BudgetLines",
    balances_col: str = "BudgetBalances",
    keep_parent_cols: tuple[str, ...] = (),
) -> DataFrame:
    """P3: Xero two-level unnest with field merge
    (``process_budget_lines``, ``tap_xero/utility.py:243-292``).

    Each ``BudgetLines[i] × BudgetBalances[j]`` pair becomes one row: the
    line's fields minus the balances array, merged with the balance's
    fields, plus ``parent_id`` and the composite key
    ``ID = parent_id_AccountCode_Period`` (``tap_xero/fetch.py:100-104``).
    """
    lines = df.select(
        F.col(parent_key).cast("string").alias("parent_id"),
        *[F.col(c) for c in keep_parent_cols],
        F.explode(F.col(lines_col)).alias("_line"),
    )
    line_fields = [
        f.name
        for f in lines.schema["_line"].dataType.fields  # type: ignore[union-attr]
        if f.name != balances_col
    ]
    pairs = lines.select(
        "parent_id",
        *keep_parent_cols,
        *[F.col(f"_line.{n}").alias(n) for n in line_fields],
        F.explode(F.col(f"_line.{balances_col}")).alias("_bal"),
    )
    bal_fields = [
        f.name for f in pairs.schema["_bal"].dataType.fields  # type: ignore[union-attr]
    ]
    merged = pairs.select(
        "parent_id",
        *keep_parent_cols,
        *line_fields,
        *[F.col(f"_bal.{n}").alias(n) for n in bal_fields],
    )
    return with_surrogate_key(
        merged,
        ["parent_id", "AccountCode", F.col("Period").cast("string")],
        out="ID",
    )


def rename_with_prefix(df: DataFrame, prefix: str, exclude: tuple[str, ...] = ()) -> DataFrame:
    """P5 standalone: ``k`` → ``<prefix>k`` for every column not excluded."""
    return df.select(
        *[
            F.col(c) if c in exclude else F.col(c).alias(f"{prefix}{c}")
            for c in df.columns
        ]
    )
