"""Corpus-trained selection / classification for training-data curation.

Not present in the reference (its curation surface stops at the PK upsert,
K2) — these are the model-based data-selection operators a 100 TB text
pipeline runs after dedup:

- :func:`hashed_token_counts` — per-document counts over HASHED unigram
  buckets (the DSIR / fastText feature space: a fixed-width feature
  vector whatever the vocabulary size, so the model tables stay
  O(buckets), never O(vocab)).
- :func:`smoothed_bucket_profile` — add-one-smoothed per-group bucket
  probabilities, integer-quantized exactly like the LM family
  (``(c+1)·10⁹ // (N+B)``) so downstream sums are order-independent
  integers.
- :func:`dsir_weights` — DSIR importance weights (Xie et al., NeurIPS
  2023): per-bucket log-likelihood ratio between a target domain and the
  raw pool, quantized to integer micro-nats.
- :func:`centroid_scores` — Rocchio nearest-centroid class scores: the
  dot product of a document's hashed-bucket counts with each class's
  smoothed profile, as an exact integer.

Everything is built-in column expressions; the only per-token work is a
map-side hash + modulo. Model tables are ``O(groups × buckets)`` rows
regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pubic_multi_platform_to_postgres_spark.operators.dedup import (
    _token_hash_expr,
    tokenize,
)

#: quantization scale shared with the LM family (operators/textstats.py):
#: integer probabilities in parts-per-1e9.
PROB_SCALE = 1_000_000_000
#: log-likelihood-ratio quantization: micro-nats.
LLR_SCALE = 1_000_000


def hashed_token_counts(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *keep_cols: str,
    n_buckets: int = 1024,
    token_hash: str = "xxhash64",
) -> DataFrame:
    """Per-document token counts over hashed unigram buckets:
    ``(id, *keep, bkt, c)``.

    The hash→bucket map is computed map-side per token; the aggregate
    carries only (id, bucket) — the text never shuffles. ``md5`` makes
    the bucket assignment replayable in an external SQL oracle
    (``('0x' || substr(md5(t),1,15))::BIGINT % B``); ``xxhash64`` is the
    production default (same dataflow, faster hash — xxhash64 can be
    negative, so the bucket uses ``pmod``).
    """
    toks = df.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        F.explode(tokenize(F.col(text_col))).alias("tok"),
    )
    return (
        toks.select(
            id_col,
            *keep_cols,
            F.pmod(_token_hash_expr(F.col("tok"), token_hash), F.lit(n_buckets)).alias(
                "bkt"
            ),
        )
        .groupBy(id_col, *keep_cols, "bkt")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def smoothed_bucket_profile(
    counts: DataFrame,
    group_col: str,
    n_buckets: int = 1024,
    groups: list[str] | None = None,
) -> DataFrame:
    """Add-one-smoothed integer bucket probabilities per group:
    ``(group, bkt, pm)`` with ``pm = (c+1)·10⁹ // (N_group + B)`` — the
    LM family's exact-integer quantization (INTEGER floor division, so
    an external oracle's ``//`` reproduces it bit-for-bit).

    The profile is DENSE: every (group, bucket) cell exists, including
    zero-count ones, so consumers can plain-equi-join on the bucket with
    no missing-default handling. Built by exploding a bucket sequence
    from the per-group totals (``groups × B`` rows — a model table, not
    corpus data) and left-joining the observed counts; the unpartitioned
    window never sees more than the profile table itself.

    ``groups`` optionally pins the EXPECTED group values: a group with
    zero observed counts then still gets its full smoothed grid
    (``pm = 1·10⁹ // B`` everywhere — the pure add-one prior) instead of
    vanishing from the output. Consumers whose semantics require a side
    to exist even when the corpus lacks it (e.g. DSIR's target profile)
    must pass it; by default only observed groups materialize.

    ``(c+1)·10⁹`` must stay inside int64 — good to ~9·10⁹ tokens per
    (group, bucket) cell; past that drop ``PROB_SCALE`` a decade.
    """
    grouped = counts.groupBy(group_col, "bkt").agg(F.sum("c").alias("c"))
    totals = grouped.groupBy(group_col).agg(F.sum("c").alias("n"))
    if groups is not None:
        expected = counts.sparkSession.createDataFrame(
            [(g,) for g in groups], schema=f"{group_col} string"
        )
        totals = expected.join(totals, group_col, "left").select(
            group_col, F.coalesce("n", F.lit(0)).alias("n")
        )
    grid = totals.select(
        group_col,
        "n",
        F.explode(F.sequence(F.lit(0), F.lit(n_buckets - 1))).alias("bkt"),
    )
    return grid.join(grouped, [group_col, "bkt"], "left").select(
        group_col,
        "bkt",
        F.expr(
            f"(coalesce(c, 0) + 1) * {PROB_SCALE}L div (n + {n_buckets})"
        ).alias("pm"),
    )


def dsir_weights(
    target_profile: DataFrame, raw_profile: DataFrame
) -> DataFrame:
    """DSIR per-bucket importance weights ``(bkt, llr_q)``: the
    log-likelihood ratio ``ln p_target(b) − ln p_raw(b)`` of the two
    smoothed profiles, quantized to integer micro-nats
    (``round(·×10⁶)``) so per-document weight sums are exact integers.

    The ``ln`` of the same integer ``pm`` can differ between engines in
    the last ulp (Java ``Math.log`` vs libm); ``round`` at the 1e-6 grid
    absorbs it except within ~1e-8 of a half — the same documented
    tolerance as ``corpus_tfidf_top_terms``.
    """
    t = target_profile.select("bkt", F.col("pm").alias("pm_t"))
    r = raw_profile.select("bkt", F.col("pm").alias("pm_r"))
    return t.join(r, "bkt").select(
        "bkt",
        F.expr(
            f"CAST(round((ln(pm_t) - ln(pm_r)) * {LLR_SCALE}, 0) AS BIGINT)"
        ).alias("llr_q"),
    )


def centroid_scores(
    doc_counts: DataFrame, profile: DataFrame, class_col: str
) -> DataFrame:
    """Rocchio nearest-centroid scores: for every document × class,
    the exact-integer dot product ``Σ_b c_b · pm_class[b]`` of the
    document's hashed-bucket counts with the class's smoothed profile.

    Plan: one plain equi-join on the bucket (the profile is
    ``classes × B`` rows — AQE broadcasts it when it fits; no forced
    hint) fans each doc-bucket row out by at most ``|classes|``, then a
    partial-aggregated sum per (doc, class) — one bounded shuffle.
    Scores are integer sums of integer products (``c ≤ doc tokens``,
    ``pm ≤ 10⁹`` — inside int64 up to ~9·10⁹ tokens per document), so
    ranking ties are exact and a deterministic tie-break is safe.
    """
    id_cols = [c for c in doc_counts.columns if c not in ("bkt", "c")]
    return (
        doc_counts.join(profile, "bkt")
        .groupBy(*id_cols, class_col)
        .agg(F.sum(F.col("c") * F.col("pm")).alias("score_q"))
    )
