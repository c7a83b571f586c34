"""Document deduplication family for large-scale training-data pipelines.

Not present in the reference (its only dedup is the PK upsert at the sink,
K2) — these are the corpus-level operators a 100 TB text pipeline needs:

- :func:`exact_dedup` — content-hash groupBy (one shuffle on the hash).
- :func:`minhash_signatures` / :func:`minhash_dedup_pairs` — MinHash+LSH:
  shingle → per-seed min-hash signature → banded bucket join. Candidate
  generation is a self-join on (band, band_hash) — the classic
  shuffle-bounded near-dup pipeline: no all-pairs product ever
  materializes; cost scales with bucket occupancy, not n².
- :func:`ngram_jaccard_pairs` — exact Jaccard over token n-gram sets
  within a blocking key (for verification / small-blocking use).
- :func:`simhash` — 64-bit SimHash fingerprint per document (Hamming
  neighbors = near-dups); fingerprinting is embarrassingly parallel.
- :func:`embedding_neardup_pairs` — cosine near-dup over an embedding
  column, blocked to avoid the quadratic product.

Everything is built-in column expressions (xxhash64 / transform /
aggregate / zip_with) — JVM-side, no Python in the row path.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokenize(text: Column, lowercase: bool = True) -> Column:
    """Whitespace tokens of (optionally lowercased) text."""
    t = F.lower(text) if lowercase else text
    return F.split(F.trim(t), r"\s+")


def word_shingles(tokens: Column, n: int = 3) -> Column:
    """Token n-grams (shingles) as strings: ``["a b c", "b c d", ...]``.

    Documents shorter than ``n`` tokens get their full text as the single
    shingle (so they still participate in hashing).
    """
    joined = F.array_join(tokens, " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(tokens) - n),
        lambda i: F.array_join(F.slice(tokens, i + 1, n), " "),
    )
    return F.when(F.size(tokens) >= n, grams).otherwise(F.array(joined))


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup: group by content hash, keep the lowest id (stable
    canonical representative), count the duplicates collapsed.

    Scale: single hash-shuffle; the md5 is computed map-side and the
    groupBy carries only (hash, id), never the text.
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    shingle_size: int = 3,
) -> DataFrame:
    """MinHash signature per document: ``signature[i] = min over shingles
    of xxhash64(i, shingle)``.

    One pass, no shuffle: shingling + hashing happen inside a projection.
    The shingle array is materialized in its own projection first —
    embedding it in all ``num_hashes`` min-expressions would make every
    row rebuild the shingle set ``num_hashes`` times (Catalyst's
    CollapseProject keeps a non-cheap alias consumed many times).

    Per-seed ``array_min(transform(...))`` executes fastest (primitive
    loops per seed); its analyzer cost — 64 lambda resolutions — is paid
    once because callers reuse this single projection (see
    ``minhash_dedup_pairs``: signatures ride through the band explode
    instead of being re-instantiated per join branch).
    """
    tokens = tokenize(F.col(text_col))
    shingled = df.select(
        F.col(id_col), word_shingles(tokens, shingle_size).alias("_shingles")
    )
    sig = F.array(
        *[
            F.array_min(
                F.transform(F.col("_shingles"), lambda s, i=i: F.xxhash64(F.lit(i), s))
            )
            for i in range(num_hashes)
        ]
    )
    return shingled.select(F.col(id_col), sig.alias("signature"))


def lsh_buckets(
    sig_df: DataFrame,
    id_col: str,
    bands: int = 16,
    rows_per_band: int = 4,
    keep_signature: bool = False,
) -> DataFrame:
    """Banded LSH: hash each signature band → (id, band, bucket) rows.

    Two docs sharing any (band, bucket) are candidates. Output is
    ``bands`` rows per doc — linear blow-up, then the candidate join
    shuffles on (band, bucket) only. With ``keep_signature`` the full
    signature rides along (lets the verifier skip a back-join).
    """
    entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.hash(F.slice(F.col("signature"), b * rows_per_band + 1, rows_per_band))
                .alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    keep = ["signature"] if keep_signature else []
    return sig_df.select(F.col(id_col), *keep, F.explode(entries).alias("e")).select(
        id_col, *keep, "e.band", "e.bucket"
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    shingle_size: int = 3,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """Candidate pairs from MinHash LSH, verified by signature-estimated
    Jaccard: ``(id_a, id_b, est_jaccard)`` with ``id_a < id_b``.

    The estimated Jaccard (fraction of matching signature positions) is
    an unbiased estimator of true shingle Jaccard — at 64 hashes, σ≈0.06.
    Scale: candidates come only from shared LSH buckets; the quadratic
    term is bounded per-bucket (skewed buckets → AQE skew handling, or
    raise ``bands``/``rows_per_band`` to sharpen the threshold curve).
    Signatures ride through the band explode so the pair join needs no
    back-joins (the shuffle carries ``bands × num_hashes`` longs per doc —
    a few KB — in exchange for two fewer shuffles and a single
    instantiation of the signature expression).
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_size)
    buckets = lsh_buckets(sigs, id_col, bands, rows_per_band, keep_signature=True)
    a = buckets.select(
        F.col(id_col).alias("id_a"), "band", "bucket", F.col("signature").alias("sig_a")
    )
    b = buckets.select(
        F.col(id_col).alias("id_b"), "band", "bucket", F.col("signature").alias("sig_b")
    )
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    ) / F.lit(float(num_hashes))
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .distinct()
        .select("id_a", "id_b", est.alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_cols: list[str],
    threshold: float = 0.5,
    ngram: int = 1,
) -> DataFrame:
    """Exact Jaccard near-dup pairs within a blocking key.

    Jaccard over *distinct* token n-gram sets; the self-join runs only
    inside each block (the scale contract: pick block_cols so blocks stay
    small — language, length bucket, LSH bucket, …).
    """
    grams = (
        F.array_distinct(tokenize(F.col(text_col)))
        if ngram == 1
        else F.array_distinct(word_shingles(tokenize(F.col(text_col)), ngram))
    )
    base = df.select(F.col(id_col), *[F.col(c) for c in block_cols], grams.alias("grams"))
    a = base.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("id_a"),
        F.col("grams").alias("g_a"),
    )
    b = base.select(
        *[F.col(c).alias(f"_b_{c}") for c in block_cols],
        F.col(id_col).alias("id_b"),
        F.col("grams").alias("g_b"),
    )
    cond = F.col("id_a") < F.col("id_b")
    for c in block_cols:
        cond = cond & (F.col(c) == F.col(f"_b_{c}"))
    inter = F.size(F.array_intersect("g_a", "g_b")).cast("double")
    union = (F.size("g_a") + F.size("g_b") - F.size(F.array_intersect("g_a", "g_b"))).cast(
        "double"
    )
    jac = inter / union
    return (
        a.join(b, cond)
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """64-bit SimHash fingerprint per document.

    Per-token xxhash64 once (materialized projection — see
    ``minhash_signatures`` for why), then 64 bit-votes folded over the
    token-hash array (sum of ±1 per bit), fingerprint =
    Σ 2^i·[vote_i > 0]. Pure projection — no shuffle; near-dup search is
    then a Hamming-distance join on fingerprint prefixes (same banding
    idea as LSH).
    """
    hashed = df.select(
        F.col(id_col),
        F.transform(tokenize(F.col(text_col)), lambda w: F.xxhash64(w)).alias("_h"),
    )

    def vote(i: int) -> Column:
        bit = lambda h: F.shiftright(h, i).bitwiseAND(F.lit(1).cast("long"))  # noqa: E731
        return F.aggregate(
            F.col("_h"),
            F.lit(0).cast("long"),
            lambda acc, h: acc + F.when(bit(h) == 1, 1).otherwise(-1),
        )

    fingerprint = reduce(
        lambda x, y: x.bitwiseOR(y),
        [
            F.when(vote(i) > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
            for i in range(64)
        ],
    )
    return hashed.select(F.col(id_col), fingerprint.alias("simhash64"))


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<numeric> columns, computed in double
    with a deterministic left fold (cross-engine reproducible)."""
    da = F.transform(a, lambda x: x.cast("double"))
    db = F.transform(b, lambda x: x.cast("double"))
    dot = lambda u, v: F.aggregate(  # noqa: E731
        F.zip_with(u, v, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return dot(da, db) / (F.sqrt(dot(da, da)) * F.sqrt(dot(db, db)))


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    block_cols: list[str],
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-dup pairs within a blocking key.

    Brute-force inside blocks (exact); at corpus scale the block key is an
    LSH/IVF bucket (see ``operators/similarity.py``) so each block holds
    O(thousands) vectors and the pair join stays shuffle-bounded.
    """
    base = df.select(F.col(id_col), *[F.col(c) for c in block_cols], F.col(vec_col))
    a = base.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("v_a"),
    )
    b = base.select(
        *[F.col(c).alias(f"_b_{c}") for c in block_cols],
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("v_b"),
    )
    cond = F.col("id_a") < F.col("id_b")
    for c in block_cols:
        cond = cond & (F.col(c) == F.col(f"_b_{c}"))
    cos = cosine_sim(F.col("v_a"), F.col("v_b"))
    return (
        a.join(b, cond)
        .select("id_a", "id_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
