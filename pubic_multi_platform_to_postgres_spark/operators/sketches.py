"""Count-Min Sketch: sublinear-memory frequency estimation.

Cormode & Muthukrishnan 2005 ("An Improved Data Stream Summary: the
Count-Min Sketch and its Applications"). The d x w counter matrix is the
heavy-hitter / frequency workhorse of every streaming analytics stack
(reference analog: the pre-aggregated analytics scans land exact counts
because their upstream APIs bound cardinality; at 100 TB of raw tokens
the exact table does not fit, the sketch does).

Cross-engine determinism: the row hashes are the repo's portable 60-bit
md5 device over ``'<row>|<token>'`` (``dedup._token_hash_expr``
rationale) — no affine/overflow arithmetic, so a DuckDB oracle replays
every cell and every estimate bit-for-bit.

Scale shape (100 TB): ONE corpus scan to token counts (map-side partial
aggregation does the heavy lifting); everything after is vocab-sized —
a window sum over (r, bucket) materializes the cells IN the probe rows
(single lineage: the first join-based draft scanned and aggregated the
corpus twice because exchange reuse did not fire across the
probe/sketch branches), then a per-token min. The d*w cell table itself
is an algorithmic constant (4 x 256 whatever the corpus) and exports
via :func:`cms_cells` for sketch merging / the streaming face —
the cell aggregation is exactly the incremental-aggregate shape
Structured Streaming maintains.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pubic_multi_platform_to_postgres_spark.operators.dedup import tokenize


def _cms_bucket(token: Column, row: int, width: int) -> Column:
    """Row hash ``md5_60('<row>|' || token) % width`` — positive (the
    60-bit value fits signed int64), so ``%`` agrees across engines."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.lit(str(row)), token)), 1, 15),
        16, 10,
    ).cast("long")
    return h % F.lit(width)


def cms_token_rows(
    df: DataFrame, text_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Tokenize ``text_col`` and emit one row per (distinct token,
    sketch row): ``(token, n, r, bucket)`` — the true count and the cell
    coordinate. Counting per DISTINCT token first is equivalent to
    streaming per-occurrence increments (same cell totals) with the
    map-side combine done once."""
    toks = df.select(F.explode(tokenize(F.col(text_col))).alias("token"))
    tc = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    return tc.select(
        "token",
        "n",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("r"),
                    _cms_bucket(F.col("token"), r, width).alias("bucket"),
                )
                for r in range(depth)
            ])
        ).alias("rb"),
    ).select("token", "n", "rb.r", "rb.bucket")


def cms_cells(token_rows: DataFrame) -> DataFrame:
    """The exportable d x w sketch: ``(r, bucket, cell)`` with ``cell =
    sum of n over tokens hashing there``. Constant-size output; two
    sketches built with the same (depth, width, hash) merge by adding
    cells — the classic mergeability property."""
    return token_rows.groupBy("r", "bucket").agg(F.sum("n").alias("cell"))


def cms_estimates(token_rows: DataFrame) -> DataFrame:
    """Point-query every distinct token against the sketch, in ONE
    lineage: a window sum over (r, bucket) materializes each cell total
    next to the probe row — no self-join, no second corpus scan — then
    the per-token min over rows is the CMS estimate. Guarantees
    ``cms_estimate >= true_n`` always (cells only ever add counts), with
    the standard (eps, delta) overestimate bound — pinned by
    ``test_cms_never_underestimates``."""
    w = Window.partitionBy("r", "bucket")
    return (
        token_rows.withColumn("cell", F.sum("n").over(w))
        .groupBy("token")
        .agg(
            F.min("n").alias("true_n"),
            F.min("cell").alias("cms_estimate"),
        )
        .select(
            "token",
            "true_n",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("true_n")).alias("overestimate"),
        )
    )


def cms_cells_from_occurrences(
    df: DataFrame, text_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """The sketch as ONE aggregation over raw token occurrences —
    ``(r, bucket, cell)`` identical to ``cms_cells(cms_token_rows(...))``
    (pinned by ``test_streaming_cms_cells_match_batch``) but with no
    per-token pre-count, so it is legal as a Structured Streaming
    aggregation (chained aggregates are not). This is the streaming
    face's whole point: the state is the d x w cell grid — 1024 keys
    whatever the corpus has streamed past — where an exact top-k would
    hold unbounded per-token state."""
    toks = df.select(F.explode(tokenize(F.col(text_col))).alias("token"))
    occ = toks.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("r"),
                    _cms_bucket(F.col("token"), r, width).alias("bucket"),
                )
                for r in range(depth)
            ])
        ).alias("rb")
    ).select("rb.r", "rb.bucket")
    return occ.groupBy("r", "bucket").agg(F.count(F.lit(1)).alias("cell"))
