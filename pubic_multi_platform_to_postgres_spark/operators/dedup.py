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


def _token_hash_expr(token: Column, token_hash: str) -> Column:
    """64-bit-ish token hash.

    - ``xxhash64`` (default): fastest, JVM-native — the production path.
    - ``md5``: the first 15 hex digits of md5 as a 60-bit integer. md5 is
      the one hash every SQL engine shares, so fingerprints/signatures
      built on it are reproducible bit-for-bit in an external oracle
      (DuckDB: ``('0x' || substr(md5(t),1,15))::BIGINT``) — the property
      the driver's hash-check gate needs. 60 bits keep the value inside
      a signed BIGINT on every engine (no ANSI overflow).
    """
    if token_hash == "xxhash64":
        return F.xxhash64(token)
    if token_hash == "md5":
        return F.conv(F.substring(F.md5(token), 1, 15), 16, 10).cast("long")
    raise ValueError(f"unknown token_hash {token_hash!r}")


def minhash_constants(
    num_hashes: int = 64, shingle_size: int = 3
) -> tuple[list[int], list[int], list[int]]:
    """The (A, B, C) affine coefficients of the MinHash family, as plain
    ints — factored out so the DuckDB oracle generator replays the exact
    same seeded sequence the signatures use."""
    import random

    rng = random.Random(42)
    A = [rng.randrange(1 << 62) * 2 + 1 for _ in range(num_hashes)]
    B = [rng.randrange(1 << 63) for _ in range(num_hashes)]
    C = [rng.randrange(1 << 62) * 2 + 1 for _ in range(shingle_size)]
    return A, B, C


def word_shingles(tokens: Column, n: int = 3) -> Column:
    """Token n-grams (shingles) as strings: ``["a b c", "b c d", ...]``.

    Documents shorter than ``n`` tokens get their full text as the single
    shingle (so they still participate in hashing).

    The ``tokens`` expression is LET-BOUND through the
    ``transform(array(tokens), t -> ...)[0]`` idiom: HOF lambdas are
    interpreted, so a tokenizer captured inline in the lambda body
    re-evaluates its ``split`` once PER SHINGLE POSITION (r15 measured
    4.2 s vs 0.84 s for the sf0.1 md5-gram stream). The per-position
    ``concat_ws`` over three element lookups emits the exact same
    single-space-joined strings as the previous ``slice`` +
    ``array_join`` form, so every md5-replaying oracle is unchanged.

    CONTRACT MIRROR: :func:`hashed_gram_sets` re-implements this
    function's windowing (sequence bounds, ``< n``-token fallback,
    let-bind idiom) in hash-equivalence-class form; changes here must
    be mirrored there (guard:
    ``test_hashed_gram_sets_equivalence_classes_match_string_path``).
    """

    def _per_doc(t: Column) -> Column:
        grams = F.transform(
            F.sequence(F.lit(0), F.size(t) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(t, i + j + 1) for j in range(n)]
            ),
        )
        return F.when(F.size(t) >= n, grams).otherwise(
            F.array(F.array_join(t, " "))
        )

    return F.transform(F.array(tokens), _per_doc)[0]


def hashed_gram_sets(text: Column, ngram: int) -> Column:
    """Per-document DISTINCT 64-bit gram-hash set of word ``ngram``-
    shingles — the hash-equivalence-class form of
    ``array_distinct(transform(word_shingles(tokenize(text), n),
    xxhash64))`` WITHOUT ever materializing the shingle strings: the
    n-token window hashes as one multi-argument ``xxhash64(w[i], ...,
    w[i+n-1])`` call (single-space joining of whitespace-free tokens is
    injective, so the triple↔string correspondence is a bijection and
    the equivalence classes are identical modulo the same ~2⁻⁴⁰
    collision stance the string hashing already carries). The token
    array is LET-BOUND through the ``transform(array(w), t -> ...)[0]``
    idiom so each document tokenizes exactly once — referenced inline,
    the interpreted HOF lambda re-evaluates ``split`` per element
    (measured 8.0 s vs 0.29 s on the sf0.1 corpus; the string-building
    ``word_shingles`` path itself measures 2.97 s).

    ONLY for consumers that compare hashes for EQUALITY (the SSJoin
    prefix filters, ``array_intersect`` verification): the hash VALUES
    differ from ``xxhash64(gram_string)``, so anything replaying the
    per-gram hash in an external oracle (the md5 fingerprint family)
    must keep building the strings.

    Documents shorter than ``ngram`` tokens fall back to one hash of
    the space-joined full text, exactly like ``word_shingles`` — note
    the fallback hash lives in a DIFFERENT input domain than the
    window hashes (one joined string vs an n-token argument tuple);
    cross-domain equality/inequality matching the string path relies
    on the same ~2⁻⁴⁰ collision stance as everything else here.

    CONTRACT MIRROR: the sequence bounds (``0 .. size(t) − n``), the
    ``< n``-token fallback condition, and the let-bind idiom must stay
    in lockstep with :func:`word_shingles` — if either changes alone,
    the hash path's equality classes silently drift from the string/md5
    oracle path. Guarded by
    ``test_hashed_gram_sets_equivalence_classes_match_string_path``.
    """
    w = tokenize(text)
    if ngram == 1:
        return F.array_distinct(F.transform(w, lambda t: F.xxhash64(t)))

    def _per_doc(t: Column) -> Column:
        gram_hashes = F.transform(
            F.sequence(F.lit(0), F.size(t) - ngram),
            lambda i: F.xxhash64(
                *[F.element_at(t, i + j + 1) for j in range(ngram)]
            ),
        )
        return F.when(
            F.size(t) >= ngram, F.array_distinct(gram_hashes)
        ).otherwise(F.array(F.xxhash64(F.array_join(t, " "))))

    return F.transform(F.array(w), _per_doc)[0]


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


def clone_mass(df: DataFrame, text_col: str) -> tuple[int, int]:
    """Measured duplication mass for the collapse planner rule: the
    exact-clone class-size histogram reduced to ``(n_rows,
    clique_pairs)`` where ``clique_pairs = Σ C(m_i, 2)`` over
    text-identical classes — the number of pair rows clone cliques
    alone would push through a direct pair generator's candidate and
    verify stages.

    Cost: one map-side ``xxhash64(text)`` + one partial-agg groupBy +
    a two-value aggregate — the cheapest possible duplication probe
    (at 100 TB this is the kind of statistic a catalog keeps; here it
    is one linear job). Hash identity, not byte identity, with the
    usual ~2⁻⁴⁰ collision stance."""
    sizes = df.groupBy(F.xxhash64(F.col(text_col)).alias("__cm_h")).agg(
        F.count(F.lit(1)).alias("__cm_m")
    )
    row = sizes.agg(
        F.sum("__cm_m").alias("n"),
        F.sum(
            F.col("__cm_m") * (F.col("__cm_m") - 1) / F.lit(2)
        ).alias("cp"),
    ).first()
    return int(row["n"] or 0), int(row["cp"] or 0)


def collapse_strategy(
    n_rows: int, clique_pairs: int, breakeven: float = 1.0
) -> str:
    """Planner rule for the exact-clone collapse (VERDICT r11 Next #3,
    modeled on ``similarity.filtered_strategy``): pure function of two
    measured counts, unit-testable without a session and reproducible
    by an external engine.

    ``'collapse'`` iff ``clique_pairs >= breakeven * n_rows`` — the
    collapse's overhead is one class groupBy plus expansion joins, all
    O(n_rows + output), so it pays off once the clique pair mass the
    direct plan would push through the gram join and per-pair verify
    reaches ~one row per document. Measured anchors: the base corpora
    carry ~zero clique mass (sf0.1: 8 pairs / 5,000 docs → direct, and
    the forced-collapse face pinned ~1.7× slower there), while a
    mass-duplicated crawl head (one page × 10⁷ copies → 5×10¹³ clique
    pairs) is collapse by ~10⁶×. Conservative toward 'direct': a
    clique pair costs AT LEAST one candidate row + one verify probe,
    so breakeven 1.0 undercounts the direct plan's true per-pair cost.
    """
    if n_rows <= 0:
        return "direct"
    return "collapse" if clique_pairs >= breakeven * n_rows else "direct"


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    shingle_size: int = 3,
    token_hash: str = "xxhash64",
) -> DataFrame:
    """MinHash signature per document.

    Pipeline (one pass, no shuffle):

    1. JVM-side: tokenize + per-token ``xxhash64`` (codegen-friendly — one
       interpreted HOF pass over the token array, nothing per-seed).
    2. One vectorized Arrow-batched Pandas UDF per document:
       - shingle hashes = affine combination of ``shingle_size``
         consecutive token hashes (numpy slice arithmetic in C — replaces
         the interpreted ``slice``+``array_join`` string shingling, which
         dominated the profile),
       - ``signature[i] = min over shingles of (a_i·h + b_i)`` as an
         (num_hashes × n_shingles) uint64 broadcast + row-min.

    Odd multipliers + wrap-around multiply-shift form the standard
    approximately min-wise family; the estimator quality contract is
    pinned by ``test_minhash_estimator_tracks_exact_jaccard``. Documents
    shorter than ``shingle_size`` tokens contribute one whole-text
    shingle (the reference's short-document convention).
    """
    import numpy as np

    A_l, B_l, C_l = minhash_constants(num_hashes, shingle_size)
    A = np.array(A_l, dtype=np.uint64)
    B = np.array(B_l, dtype=np.uint64)
    C = np.array(C_l, dtype=np.uint64)
    empty = np.full(num_hashes, np.iinfo(np.int64).max, dtype=np.int64)

    # no type hints: `from __future__ import annotations` stringifies them
    # and pandas_udf's hint inspection can't resolve a function-local name
    @F.pandas_udf("array<long>")
    def _minhash(hs):
        import pandas as pd

        k = shingle_size

        def one(h):
            if h is None or len(h) == 0:
                return empty
            hv = np.asarray(h, dtype=np.int64).view(np.uint64)
            n = hv.shape[0]
            if n >= k:
                s = np.zeros(n - k + 1, dtype=np.uint64)
                for j in range(k):
                    s += C[j] * hv[j : n - k + 1 + j]
            else:  # short doc: one whole-text shingle
                s = (C[:n] * hv).sum(keepdims=True)
            return (A[:, None] * s[None, :] + B[:, None]).min(axis=1).view(np.int64)

        return hs.apply(one)

    token_hashes = df.select(
        F.col(id_col),
        F.transform(
            tokenize(F.col(text_col)), lambda t: _token_hash_expr(t, token_hash)
        ).alias("_h"),
    )
    return token_hashes.select(
        F.col(id_col), _minhash(F.col("_h")).alias("signature")
    )


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
    token_hash: str = "xxhash64",
    bucket_chunk: int = 512,
) -> DataFrame:
    """Near-dup candidate pairs from MinHash LSH, verified by
    signature-estimated Jaccard: ``(id_a, id_b, est_jaccard)``, id_a < id_b.

    ``bucket_chunk`` bounds the per-bucket comparison block (see the
    chunking comment in ``partition_pairs``): a mass-duplicated page
    fills one bucket per band with its whole clique, and peak memory is
    ``bucket_chunk² · num_hashes`` doubles instead of ``clique²``. The
    emitted pair set is IDENTICAL for any chunk size (equality pinned by
    ``test_minhash_bucket_chunking_identical_pairs``); only the
    allocation schedule changes. Non-default values are for tests.

    The estimated Jaccard (fraction of matching signature positions) is an
    unbiased estimator of true shingle Jaccard — at 64 hashes, σ≈0.06.

    Plan shape (the scale contract): ONE pass computes signatures, the
    band explode is a linear ×bands blow-up, and pair generation runs
    after a single hash repartition on (band, bucket) via ``mapInPandas``
    — one Python invocation per *partition*, not per bucket (an
    ``applyInPandas`` per bucket would pay ~0.3 ms of per-group overhead
    × one group per (band, bucket) — it benchmarked 4× slower than the
    self-join it replaced). Inside the partition, single-member buckets
    are dropped vectorized; the quadratic term is bounded per bucket
    (hot buckets → raise ``bands``/``rows_per_band`` to sharpen the
    curve). No self-join: the old two-branch join re-executed the whole
    signature pipeline twice. ``distinct()`` collapses pairs colliding in
    several bands (``est_jaccard`` is a pure function of the signatures,
    so duplicates are bit-identical rows).
    """
    import numpy as np
    import pandas as pd

    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_size, token_hash)
    buckets = lsh_buckets(sigs, id_col, bands, rows_per_band, keep_signature=True)

    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"id_a {id_type}, id_b {id_type}, est_jaccard double"

    def partition_pairs(batches):
        pdfs = list(batches)
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        # Group by the band's EXACT signature slice, not the 32-bit bucket
        # hash: the hash only routes rows to partitions; candidate
        # semantics ("two docs agree on every value in some band") must
        # not admit hash-collision pairs — that keeps the relation a pure
        # function of the signatures, reproducible by an external oracle.
        r = rows_per_band
        pdf = pdf.assign(_key=[
            (band, tuple(np.asarray(sig, dtype=np.int64)[band * r:(band + 1) * r]))
            for band, sig in zip(pdf["band"], pdf["signature"])
        ])
        # drop single-member buckets before the python-level group loop
        pdf = pdf[pdf["_key"].duplicated(keep=False).values]
        out_a, out_b, out_e = [], [], []
        # Chunked triangular enumeration: a mass-duplicated page (the
        # BENCH_SKEW fixture's clone stratum) puts ALL its copies in one
        # bucket in EVERY band, and the all-at-once m×m×num_hashes
        # comparison array is quadratic MEMORY in the clique size
        # (1500 copies × 64 hashes ≈ 1.2 GB — an executor OOM, where
        # chunks of 512 stay ≤ ~130 MB). Block-wise comparison emits the
        # identical pair set at bounded peak memory — lossless, only the
        # allocation schedule changes.
        chunk = bucket_chunk
        for _, g in pdf.groupby("_key", sort=False):
            sig = np.stack([np.asarray(s, dtype=np.int64) for s in g["signature"]])
            ids = g[g.columns[0]].tolist()  # id col is first in the projection
            m = len(ids)
            for c0 in range(0, m, chunk):
                s0 = sig[c0 : c0 + chunk]
                for c1 in range(c0, m, chunk):
                    s1 = sig[c1 : c1 + chunk]
                    eq = (s0[:, None, :] == s1[None, :, :]).mean(axis=2)
                    iu, ju = np.nonzero(eq >= threshold)
                    for i, j in zip(iu, ju):
                        gi, gj = c0 + int(i), c1 + int(j)
                        if gi >= gj:  # strict upper triangle, globally
                            continue
                        a, b = ids[gi], ids[gj]
                        if a > b:
                            a, b = b, a
                        out_a.append(a)
                        out_b.append(b)
                        out_e.append(float(eq[i, j]))
        yield pd.DataFrame({"id_a": out_a, "id_b": out_b, "est_jaccard": out_e})

    cand = (
        buckets.select(F.col(id_col), "signature", "band", "bucket")
        .repartition(F.col("band"), F.col("bucket"))
    )
    return cand.mapInPandas(partition_pairs, out_schema).distinct()


def _validate_njp_names(id_col: str, block_cols: list[str]) -> None:
    reserved = {"id_a", "id_b", "jaccard"}
    bad = [c for c in (id_col, *block_cols)
           if c in reserved or c.startswith("__njp_")]
    if bad:
        raise ValueError(
            f"ngram_jaccard_pairs: column names {bad} are reserved "
            "(output names id_a/id_b/jaccard and the __njp_ internal prefix)"
        )


def _hash_grams(
    df: DataFrame, text_col: str, id_col: str, block_cols: list[str], ngram: int
) -> DataFrame:
    """Per-doc distinct 64-bit gram hashes: ``(__njp_id, *block_cols,
    __njp_g)``, lazily checkpointed (feeds candidates AND both verify
    branches). Gram identity = hash-equivalence classes only (the
    verify stage re-intersects the exact sets), so the build goes
    through :func:`hashed_gram_sets` — no shingle strings."""
    return df.select(
        F.col(id_col).alias("__njp_id"),
        *[F.col(c) for c in block_cols],
        hashed_gram_sets(F.col(text_col), ngram).alias("__njp_g"),
    ).localCheckpoint(eager=False)


def _jaccard_prefix_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_cols: list[str],
    threshold: float,
    ngram: int,
    block_grids: list[list[Column]] | None = None,
    hashed: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Shared candidate generator for the SSJoin/AllPairs prefix filter:
    returns ``(hashed, cand)`` — the checkpointed per-doc distinct-gram
    arrays and the candidate ``(id_a, id_b)`` pairs from the rarest-first
    prefix-token equi-join (see ``ngram_jaccard_pairs`` for the theorem
    and the scale argument). ``ngram_jaccard_candidates`` exposes the
    candidate face alone so scale evidence can measure candidate growth
    without paying the verify join.

    ``block_grids`` (mutually exclusive with ``block_cols``) runs
    MULTI-GRID blocking in one pass: each inner list of Column
    expressions is one blocking key per document, and a pair is a
    candidate when it shares a prefix token AND agrees on at least one
    grid's key (offset length-bucket grids — the leakage-split recall
    contract). The gram arrays, global token order, and prefix sets are
    block-independent, so they are computed ONCE; only the candidate
    join fans out ×len(block_grids) via an exploded (grid, key) struct —
    strictly cheaper than running the whole pipeline per grid (which
    re-tokenizes and re-shuffles the corpus per grid) or than exploding
    the input rows (which doubles the gram arrays through every stage
    and multiplies the verify join). Requires one row per ``id_col``.

    ``hashed`` (pre-built by :func:`_hash_grams`, possibly filtered to
    class representatives) skips the gram build — the exact-collapse
    path runs the filter over one doc per content class.
    """
    if hashed is None:
        hashed = _hash_grams(df, text_col, id_col, block_cols, ngram)

    tok = hashed.select("__njp_id", *block_cols, F.explode("__njp_g").alias("__njp_g_tok"))
    # global document frequency = the canonical rarest-first token order
    gdf = tok.groupBy("__njp_g_tok").agg(F.count(F.lit(1)).alias("__njp_df"))
    ordered = (
        tok.join(gdf, "__njp_g_tok")
        .groupBy("__njp_id", *block_cols)
        .agg(F.array_sort(F.collect_list(F.struct("__njp_df", "__njp_g_tok"))).alias("__njp_sg"))
    )
    # p = |X| - ceil(t|X|) + 1; the 1e-9 nudge guards float-up rounding
    # of t*|X| (an over-long prefix is safe, a short one loses pairs)
    pref = ordered.select(
        "__njp_id",
        *block_cols,
        F.explode(
            F.expr(
                "transform(slice(__njp_sg, 1, size(__njp_sg) - "
                f"cast(ceil({threshold!r} * size(__njp_sg) - 1e-9) as int) + 1), "
                "s -> s.__njp_g_tok)"
            )
        ).alias("__njp_g_tok"),
    )
    if block_grids is not None:
        # one (grid, key) struct per grid per doc, attached to the
        # prefix stream by an id equi-join — the only ×n_grids fan-out
        blocks = df.select(
            F.col(id_col).alias("__njp_id"),
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(i).alias("__njp_grid"),
                        *[e.alias(f"__njp_k{j}") for j, e in enumerate(grid)],
                    )
                    for i, grid in enumerate(block_grids)
                ])
            ).alias("__njp_blk"),
        )
        pref = pref.join(blocks, "__njp_id")
        block_cols = ["__njp_blk"]
    a = pref.select(
        F.col("__njp_id").alias("id_a"), *[F.col(c).alias(f"__njp_ba_{c}") for c in block_cols],
        "__njp_g_tok",
    )
    b = pref.select(
        F.col("__njp_id").alias("id_b"), *[F.col(c).alias(f"__njp_bb_{c}") for c in block_cols],
        F.col("__njp_g_tok").alias("__njp_g_b"),
    )
    cond = (F.col("__njp_g_tok") == F.col("__njp_g_b")) & (F.col("id_a") < F.col("id_b"))
    for c in block_cols:
        cond &= F.col(f"__njp_ba_{c}").eqNullSafe(F.col(f"__njp_bb_{c}"))
    cand = a.join(b, cond).select("id_a", "id_b").dropDuplicates(["id_a", "id_b"])
    return hashed, cand


def ngram_jaccard_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_cols: list[str],
    threshold: float = 0.5,
    ngram: int = 1,
    block_grids: list[list[Column]] | None = None,
) -> DataFrame:
    """Candidate ``(id_a, id_b)`` pairs from the prefix filter ONLY —
    no verification join. Every qualifying pair is a candidate
    (the prefix theorem is lossless), so the candidate count bounds the
    verify join's probe size; ``tools/bench_scale.py`` measures it at
    100x to close the extrapolation gap without the verify join's
    output-sized shuffle (VERDICT r6 next-round #6)."""
    _validate_njp_names(id_col, block_cols)
    return _jaccard_prefix_candidates(
        df, text_col, id_col, block_cols, threshold, ngram, block_grids
    )[1]


def _verify_jaccard(
    hashed: DataFrame, cand: DataFrame, threshold: float
) -> DataFrame:
    """Exact verification of candidate pairs against the checkpointed
    gram arrays: ``(id_a, id_b, jaccard)`` with jaccard ≥ threshold."""
    ga = hashed.select(F.col("__njp_id").alias("id_a"), F.col("__njp_g").alias("__njp_ga"))
    gb = hashed.select(F.col("__njp_id").alias("id_b"), F.col("__njp_g").alias("__njp_gb"))
    inter = F.size(F.array_intersect("__njp_ga", "__njp_gb"))
    den = F.size("__njp_ga") + F.size("__njp_gb") - inter
    jac = inter.cast("double") / den.cast("double")
    return (
        cand.join(ga, "id_a")
        .join(gb, "id_b")
        .filter(jac >= threshold)
        .select("id_a", "id_b", jac.alias("jaccard"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_cols: list[str],
    threshold: float = 0.5,
    ngram: int = 1,
    block_grids: list[list[Column]] | None = None,
    collapse_exact: bool = False,
) -> DataFrame:
    """Exact Jaccard near-dup pairs within a blocking key, by PREFIX
    FILTERING (Chaudhuri et al. SSJoin / Bayardo et al. AllPairs —
    the standard exact set-similarity join).

    Jaccard over *distinct* token n-gram sets; only pairs inside the
    same block qualify. A naive in-block all-pairs scorer is O(b²) in
    block size — measured quadratic on replica-scaled corpora
    (BENCH_SF1: 46× wall-clock for 30× data) — so candidates come from
    the prefix-filter theorem instead: order tokens globally
    rarest-first; with prefix π(X) = the first |X| − ⌈t·|X|⌉ + 1 tokens
    of X, any pair with J(A,B) ≥ t shares a token in BOTH prefixes
    (if A∩B missed π(A), then A∩B ⊆ A∖π(A), so |A∩B| ≤ ⌈t·|A|⌉ − 1
    < t·|A| ≤ t·|A∪B| ≤ |A∩B| — contradiction). Candidate generation
    is therefore a token EQUI-join on (block, prefix-token) — the rare
    half of each vocabulary, so hot stopwords never fan out — followed
    by exact per-candidate verification with JVM ``array_intersect``.
    Lossless: the output is identical to the all-pairs scorer.

    Every stage is a linear shuffle (explode/groupBy/equi-join); no
    stage enumerates a block cross product, so a hot (lang, len-bucket)
    block costs what its qualifying pairs cost, not its size squared.
    The reported ``jaccard`` is a single IEEE division of two exact
    small integers, so it is bit-identical to any other engine's ratio
    of the same counts; 64-bit token hashing makes a set-altering
    collision ~2⁻⁴⁰ improbable.

    Internal working columns carry a ``__njp_`` prefix so user-supplied
    ``id_col``/``block_cols`` can take any ordinary name (ADVICE r6: the
    r6 internals ``g``/``gdf``/``sg`` shadowed same-named user columns);
    the prefix itself plus the output names are reserved and rejected.
    The lazily-checkpointed shared subtree is unpersisted by Spark's
    ContextCleaner once the returned frame is no longer referenced.

    ``block_grids`` (instead of ``block_cols``) blocks each document
    under SEVERAL keys at once — offset length-bucket grids — in one
    pass; a pair qualifies when it meets the threshold and shares at
    least one grid key (see ``_jaccard_prefix_candidates``).

    ``collapse_exact`` (BENCH_SKEW re-plan for mass-duplicated pages):
    documents with IDENTICAL (distinct-gram set, block key) collapse to
    one representative BEFORE the prefix filter; verified rep pairs
    expand back to member cross products and within-class cliques emit
    directly with jaccard 1.0. The output is IDENTICAL to the direct
    path (members of a class have the same gram set, so every member
    pair scores exactly what its rep pair scores — equality pinned by
    ``test_jaccard_collapse_exact_identical_pairs``), but a clique of
    ``m`` copies costs the candidate join ONE row instead of m² gram-
    join rows and m² verify probes; the only m²-sized stage left is the
    within-class emission, which IS the answer. On a clone-free corpus
    the collapse adds one map-side class hash + one groupBy on the
    class key — linear. Not combinable with ``block_grids`` (a class
    would need the full grid-key vector in its identity; use the
    direct path there).
    """
    _validate_njp_names(id_col, block_cols)
    if not collapse_exact:
        hashed, cand = _jaccard_prefix_candidates(
            df, text_col, id_col, block_cols, threshold, ngram, block_grids
        )
        return _verify_jaccard(hashed, cand, threshold)
    if block_grids is not None:
        raise ValueError("collapse_exact does not support block_grids")
    hashed = _hash_grams(df, text_col, id_col, block_cols, ngram)
    # content-class identity: 64-bit hash of the SORTED gram array plus
    # the block key, with the set size alongside (same collision stance
    # as the gram hashing itself: a set-altering collision is ~2⁻⁴⁰
    # improbable and would need to collide size too)
    mem = hashed.select(
        "__njp_id",
        F.xxhash64(F.array_sort("__njp_g"), *[F.col(c) for c in block_cols])
        .alias("__njp_cls"),
        F.size("__njp_g").alias("__njp_sz"),
    ).localCheckpoint(eager=False)
    reps = mem.groupBy("__njp_cls", "__njp_sz").agg(
        F.min("__njp_id").alias("__njp_rep")
    )
    mem = mem.join(reps, ["__njp_cls", "__njp_sz"]).select(
        "__njp_rep", "__njp_id"
    )
    rep_hashed = hashed.join(
        reps.select(F.col("__njp_rep").alias("__njp_id")), "__njp_id"
    ).localCheckpoint(eager=False)
    _, cand = _jaccard_prefix_candidates(
        None, text_col, "__njp_id", block_cols, threshold, ngram,
        hashed=rep_hashed,
    )
    rep_pairs = _verify_jaccard(rep_hashed, cand, threshold)
    ma = mem.select(
        F.col("__njp_rep").alias("id_a"), F.col("__njp_id").alias("__njp_ma")
    )
    mb = mem.select(
        F.col("__njp_rep").alias("id_b"), F.col("__njp_id").alias("__njp_mb")
    )
    cross = (
        rep_pairs.join(ma, "id_a")
        .join(mb, "id_b")
        .select(
            F.least("__njp_ma", "__njp_mb").alias("id_a"),
            F.greatest("__njp_ma", "__njp_mb").alias("id_b"),
            "jaccard",
        )
    )
    within = (
        mem.alias("x")
        .join(mem.alias("y"), "__njp_rep")
        .filter(F.col("x.__njp_id") < F.col("y.__njp_id"))
        # identical sets score exactly 1.0; the guard keeps parity with
        # the direct path for a (degenerate) threshold above 1
        .filter(F.lit(1.0) >= F.lit(threshold))
        .select(
            F.col("x.__njp_id").alias("id_a"),
            F.col("y.__njp_id").alias("id_b"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    return cross.unionAll(within)


def simhash(
    df: DataFrame, text_col: str, id_col: str, token_hash: str = "xxhash64"
) -> DataFrame:
    """64-bit SimHash fingerprint per document.

    Per-token xxhash64 once (JVM-side), then the 64 bit-votes run as one
    vectorized Pandas UDF per document: unpack the token hashes into an
    (n_tokens × 64) sign matrix, column-sum, fingerprint =
    Σ 2^i·[vote_i > 0]. (The HOF formulation — 64 interpreted
    ``aggregate`` folds per row — was ~10× slower; HOFs sit outside
    whole-stage codegen.) Pure projection, no shuffle; near-dup search is
    a Hamming-distance join on fingerprint prefixes (same banding idea
    as LSH).
    """
    import numpy as np

    shifts = np.arange(64, dtype=np.uint64)

    @F.pandas_udf("long")
    def _simhash(hs):
        import pandas as pd

        # One vectorized pass over the WHOLE Arrow batch (a per-doc
        # Series.apply pays numpy dispatch per document): concatenate all
        # token hashes, unpack to a (total_tokens × 64) uint8 bit matrix,
        # and add.reduceat at document offsets → per-doc ones-counts.
        # Bit i is set iff ones > n_tokens/2 (majority vote).
        lens = np.fromiter(
            (0 if h is None else len(h) for h in hs), count=len(hs), dtype=np.int64
        )
        if lens.sum() == 0:
            return pd.Series(np.zeros(len(hs), dtype=np.int64))
        flat = np.concatenate(
            [np.asarray(h, dtype=np.int64) for h in hs if h is not None and len(h)]
        ).view(np.uint64)
        # unpackbits on the little-endian byte view puts bit i of each
        # hash at column i directly — one (total_tokens × 64) uint8
        # matrix, NO total_tokens×64 uint64 intermediate (the broadcast
        # `flat[:, None] >> shifts` formulation peaked at 8× this
        # memory; on large Arrow batches that ~128 MB spike stalled the
        # Python worker on allocator/compaction every few runs — the
        # bimodal wall-clock the r8/r11 pins kept adjudicating)
        bits = np.unpackbits(
            flat.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
        )
        nz = lens > 0
        offsets = np.zeros(int(nz.sum()), dtype=np.int64)
        np.cumsum(lens[nz][:-1], out=offsets[1:])
        ones = np.add.reduceat(bits, offsets, axis=0, dtype=np.int64)
        majority = (2 * ones) > lens[nz][:, None]
        fps_nz = (majority.astype(np.uint64) * (np.uint64(1) << shifts)).sum(
            axis=1, dtype=np.uint64
        )
        fps = np.zeros(len(hs), dtype=np.uint64)
        fps[nz] = fps_nz
        return pd.Series(fps.view(np.int64))

    hashed = df.select(
        F.col(id_col),
        F.transform(
            tokenize(F.col(text_col)), lambda w: _token_hash_expr(w, token_hash)
        ).alias("_h"),
    )
    return hashed.select(F.col(id_col), _simhash(F.col("_h")).alias("simhash64"))


def simhash_neardup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    n_chunks: int = 4,
    token_hash: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ ``max_hamming``.

    Classic pigeonhole banding: split the 64-bit fingerprint into
    ``n_chunks`` 16-bit chunks — two fingerprints within Hamming distance
    ``n_chunks - 1`` MUST share at least one exact chunk (pigeonhole), so
    the candidate join is an equi-join on (chunk_idx, chunk_value), never
    an all-pairs product. Verification is ``bit_count(xor(a, b))`` — one
    JVM instruction per pair. Requires ``max_hamming < n_chunks`` for the
    pigeonhole guarantee (asserted).

    Scale: same shape as MinHash LSH — linear ×n_chunks explode, hash
    shuffle on chunk value, per-bucket candidates, cheap exact verify.
    """
    # materialize the fingerprints once: both self-join branches read them,
    # and without this the tokenize + pandas-UDF fingerprint subtree
    # executes twice (Catalyst doesn't auto-reuse non-identical branches)
    fp = simhash(df, text_col, id_col, token_hash).localCheckpoint()
    return hamming_neardup_pairs(fp, id_col, "simhash64", max_hamming, n_chunks)


def hamming_neardup_pairs(
    fp_df: DataFrame,
    id_col: str,
    fp_col: str,
    max_hamming: int = 3,
    n_chunks: int = 4,
) -> DataFrame:
    """Pigeonhole-banded Hamming pairs over ANY 64-bit fingerprint column
    — the banding core of :func:`simhash_neardup_pairs`, factored so
    other fingerprint families (image aHash, audio chromaprint-style
    hashes) reuse the identical candidate machinery. ``fp_df`` must be
    cheap to read twice (checkpoint/cache upstream if the fingerprint is
    expensive)."""
    if max_hamming >= n_chunks:
        raise ValueError("pigeonhole guarantee needs max_hamming < n_chunks")
    bits = 64 // n_chunks
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("chunk_idx"),
                F.shiftrightunsigned(F.col(fp_col), i * bits)
                .bitwiseAND(F.lit((1 << bits) - 1).cast("long"))
                .alias("chunk_val"),
            )
            for i in range(n_chunks)
        ]
    )
    banded = fp_df.select(
        F.col(id_col), fp_col, F.explode(chunks).alias("c")
    ).select(id_col, fp_col, "c.chunk_idx", "c.chunk_val")
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col(fp_col).alias("fp_a"),
        "chunk_idx", "chunk_val",
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col(fp_col).alias("fp_b"),
        "chunk_idx", "chunk_val",
    )
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    # verify BEFORE the dedup-distinct: the Hamming filter is a map-side
    # projection over join output, so failed candidates never reach the
    # distinct's shuffle (a pair sharing k chunks is emitted k times —
    # distinct collapses the survivors only)
    return (
        a.join(b, ["chunk_idx", "chunk_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def connected_components(
    edges_df: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components over a near-dup pair graph: ``(node, label)``
    with ``label`` = the smallest node id in the component — the cluster
    collapse every dedup pipeline runs after pair generation (keep the
    canonical ``label`` doc, drop the rest).

    Algorithm: **recursive local contraction**, not an O(diameter) join
    loop. Each round runs union-find *inside each edge partition* (one
    Arrow batch per partition, union-by-min so every local root is its
    sub-component's min id). A node whose edges landed in several
    partitions got several local roots; those roots are provably in one
    component, so the round emits one star edge (min root ↔ other root)
    per extra root — the ONLY connectivity the local pass missed — and
    recurses on that (geometrically smaller) condensed graph with half
    the partitions. The final round is one task over the fully-condensed
    graph, which closes the job exactly; per-node labels then compose
    back through the per-round (node → min local root) mappings with
    tiny hash joins. No driver-side graph, no per-round convergence
    count, no O(diameter) dependence; each round's outputs are
    localCheckpoint'd so lineage stays flat.

    Why label = min id survives: the global min node m of a component is
    the min of every local sub-component containing it, so every round
    maps m → m and the component's condensed nodes are ids ≥ m glued to
    m — min-union keeps m to the top.

    (The previous min-label-propagation + pointer-jumping loop needed ~5
    rounds × 3 shuffles here; contraction runs 2-3 rounds of one
    mapInPandas + two tiny shuffles — measured ~4× faster at sf0.1, and
    at 100 TB the first local pass collapses the bulk of the edges
    before anything global moves.)
    """
    e = edges_df.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    edges = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") < F.col("dst"))
        .distinct()
        .localCheckpoint()
    )

    def local_uf(it):
        import pandas as pd

        parent: dict = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for pdf in it:
            for u, v in zip(pdf["src"], pdf["dst"]):
                if u not in parent:
                    parent[u] = u
                if v not in parent:
                    parent[v] = v
                ru, rv = find(u), find(v)
                if ru != rv:
                    if rv < ru:
                        ru, rv = rv, ru
                    parent[rv] = ru
        if parent:
            nodes = list(parent)
            yield pd.DataFrame({"node": nodes, "label": [find(x) for x in nodes]})

    schema = "node long, label long"
    # r15: floor 1, not 2 — when the (AQE-coalesced) edge list already
    # fits a handful of partitions, one task closes the graph exactly in
    # a single round, skipping a whole repartition+UF+star-edge+isEmpty
    # cycle; big edge lists (partitions ≥ 8) are unaffected.
    n_part = max(1, edges.rdd.getNumPartitions() // 4)
    mappings: list[DataFrame] = []
    for _ in range(max_iter):
        part_edges = edges.repartition(n_part, "src") if n_part > 1 else edges.coalesce(1)
        # (node, local root) — possibly several roots per node when its
        # edges spanned partitions
        raw = part_edges.mapInPandas(local_uf, schema)
        nmin = raw.groupBy("node").agg(F.min("label").alias("label"))
        if n_part > 1:
            # non-final rounds: nmin feeds BOTH the star-edge join and
            # the label composition — checkpoint so the per-partition
            # union-find runs once. The final round's mapping is read
            # exactly once (composition only), so the eager
            # materialization job would be pure overhead there.
            nmin = nmin.localCheckpoint()
        mappings.append(nmin)
        if n_part == 1:
            break  # one task saw the whole condensed graph: labels exact
        # star edges between a node's min root and each of its other
        # roots — the cross-partition connectivity the local pass missed
        edges = (
            raw.join(nmin.select("node", F.col("label").alias("ml")), "node")
            .filter(F.col("label") != F.col("ml"))
            .select(F.col("ml").alias("src"), F.col("label").alias("dst"))
            .distinct()
            .localCheckpoint()
        )
        n_part = max(1, n_part // 2)
        if edges.isEmpty():
            break

    if stats is not None:
        # local-contraction rounds actually run (scale-evidence hook:
        # BENCH_SF1 records this alongside cluster counts — the recursion
        # depth is the "union-find iteration count" of the distributed
        # algorithm; the in-partition union-find itself is single-pass)
        stats["rounds"] = len(mappings)

    # compose node → round-0 root → … → final label; labels already final
    # at an earlier level pass through the left join untouched.
    labels = mappings[0]
    for m in mappings[1:]:
        nxt = m.select(F.col("node").alias("label"), F.col("label").alias("nl"))
        labels = labels.join(nxt, "label", "left").select(
            "node", F.coalesce("nl", "label").alias("label")
        )
    return labels


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
    gemm_tile: int = 2048,
) -> DataFrame:
    """Embedding-cosine near-dup pairs within a blocking key.

    One ``applyInPandas`` per block: an Arrow batch in, a numpy GEMM
    (``X @ X.T``) prunes the candidate pairs, then each surviving pair's
    cosine is recomputed with a strict left-to-right fold — the exact
    IEEE operation order of the SQL definition — so the reported value is
    bit-identical to what per-pair fold expressions (and the DuckDB
    oracle) produce. The GEMM is 2-3 orders of magnitude faster than
    per-pair fold evaluation; the fold runs only on the few candidates
    within ``1e-6`` of the threshold's neighborhood.

    Scale contract: the shuffle is one hash partition per block; at
    corpus scale the block key is an LSH/IVF bucket (see
    ``operators/similarity.py``) so each block holds O(thousands) of
    vectors. ``gemm_tile`` bounds the similarity-matrix allocation when
    a block outgrows that contract anyway (a duplicate-swamped bucket):
    the GEMM runs in ``tile × n`` row bands instead of one ``n × n``
    matrix, so peak memory is ``tile·n·8`` bytes and only the compute
    stays quadratic (it is an exact all-pairs scorer by contract). The
    emitted pair set is identical for any tile size — same lossless
    re-schedule as the minhash ``bucket_chunk``
    (``test_embedding_gemm_tile_identical_pairs``).
    """
    import numpy as np
    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"id_a {id_type}, id_b {id_type}, cosine double"

    def _fold_dot(a: list[float], b: list[float]) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        vecs = [[float(x) for x in v] for v in pdf[vec_col]]
        ids = pdf[id_col].tolist()
        X = np.asarray(vecs, dtype=np.float64)
        norms = np.sqrt((X * X).sum(axis=1))
        n = len(ids)
        out_a, out_b, out_c = [], [], []
        self_dot = [_fold_dot(v, v) for v in vecs]
        for c0 in range(0, n, gemm_tile):
            c1 = min(c0 + gemm_tile, n)
            S = (X[c0:c1] @ X.T) / np.outer(norms[c0:c1], norms)
            ti, j = np.nonzero(S >= threshold - 1e-6)
            for i, jj in zip(ti + c0, j):
                if i >= jj:  # strict upper triangle, globally
                    continue
                cos = _fold_dot(vecs[i], vecs[jj]) / (
                    (self_dot[i] ** 0.5) * (self_dot[jj] ** 0.5)
                )
                if cos >= threshold:
                    a, b = ids[i], ids[jj]
                    if a > b:
                        a, b = b, a
                    out_a.append(a)
                    out_b.append(b)
                    out_c.append(cos)
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "cosine": out_c})

    base = df.select(F.col(id_col), *[F.col(c) for c in block_cols], F.col(vec_col))
    return base.groupBy(*[F.col(c) for c in block_cols]).applyInPandas(
        block_pairs, out_schema
    )


def _containment_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_cols: list[str],
    threshold: float,
    ngram: int,
    hashed: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Exact ASYMMETRIC containment pairs: ordered ``(id_a, id_b,
    containment)`` with ``C(A,B) = |A∩B| / |A| ≥ threshold`` over
    distinct token n-gram sets, within a blocking key — the
    quote/repost/subset detector Jaccard misses by construction (a
    short document fully quoted inside a long one has high containment
    but low Jaccard, because the union is dominated by the container).

    Candidates come from a ONE-SIDED prefix filter (the containment
    corollary of SSJoin/AllPairs): order tokens globally rarest-first;
    with π(A) = the first |A| − ⌈t·|A|⌉ + 1 tokens of A, any B with
    C(A,B) ≥ t shares a token with π(A) — if A∩B missed π(A) then
    |A∩B| ≤ |A| − |π(A)| = ⌈t·|A|⌉ − 1 < t·|A|, a contradiction.
    Containment has NO symmetric prefix (the container side's bound
    depends on |A|), so candidate generation equi-joins the contained
    side's prefix tokens against the container side's FULL posting
    list within the block. Lossless: exact verification
    (``array_intersect`` over the checkpointed gram arrays) makes the
    output identical to the blocked all-pairs scorer whatever the
    candidate order, so the engine-side 64-bit gram hashing never has
    to match an oracle's hash — only its set-equality classes.

    Scale: every stage is a linear shuffle (explode / groupBy /
    equi-join); candidate volume is Σ_token prefix-df(token) ·
    df(token) within the block — the rarest-first prefix keeps hot
    stopword grams out of the probe side, and the full-side fan-out is
    the price of exact asymmetric semantics (measured on the
    30×-replica curve like the other pair generators). The reported
    ``containment`` is one IEEE division of two exact small integers.

    Container-side df-cap: REJECTED (VERDICT r10 Next #2b). The hot
    posting lists are not waste here — a short document quoted inside
    mass boilerplate matches its containers PRECISELY through the hot
    grams (its prefix's only shared tokens with them ARE the
    boilerplate grams, df ≈ the boilerplate stratum size), so any cap
    below that df severs every true quote×container pair; there is no
    "safe" cap value the way MOSS winnowing has one for shared
    SUBSTRING reporting (where dropping ubiquitous substrings is the
    contract). What keeps the plan scale-safe instead is the one-sided
    rarest-first prefix: prefixes of boilerplate-heavy documents fill
    up with their rare unique grams, so hot grams only enter the probe
    side for documents that are MOSTLY boilerplate — and for those,
    candidates ≈ true output. Measured on the adversarial-skew fixture
    (``BENCH_SKEW_r11.json``): candidates stay linear-in-corpus plus
    output-sized (16.9M candidates / 3.6M true pairs at 30× with a 15%
    boilerplate stratum); losslessness and the cap-loss argument are
    pinned by ``test_containment_dfcap_would_drop_true_pairs``.
    """
    if hashed is None:  # internal rep-collapse calls pass pre-named frames
        reserved = {"id_a", "id_b", "containment"}
        bad = [c for c in (id_col, *block_cols)
               if c in reserved or c.startswith("__ctp_")]
        if bad:
            raise ValueError(
                f"containment_pairs: column names {bad} are reserved "
                "(output names id_a/id_b/containment and the __ctp_ prefix)"
            )
    # threshold must live in (0, 1]: above 1 the prefix slice length
    # |X| − ⌈t|X|⌉ + 1 goes non-positive (an opaque slice() failure deep
    # inside Spark); at or below 0 the prefix covers the whole set and
    # the filter silently degenerates to all-pairs within the block.
    if not 0.0 < threshold <= 1.0:
        raise ValueError(
            f"containment threshold must be in (0, 1], got {threshold!r}"
        )
    if hashed is None:
        hashed = df.select(
            F.col(id_col).alias("__ctp_id"),
            *[F.col(c) for c in block_cols],
            hashed_gram_sets(F.col(text_col), ngram).alias("__ctp_g"),
        ).localCheckpoint(eager=False)
    tok = hashed.select(
        "__ctp_id", *block_cols, F.explode("__ctp_g").alias("__ctp_tok")
    )
    gdf = tok.groupBy("__ctp_tok").agg(F.count(F.lit(1)).alias("__ctp_df"))
    ordered = (
        tok.join(gdf, "__ctp_tok")
        .groupBy("__ctp_id", *block_cols)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("__ctp_df", "__ctp_tok"))
            ).alias("__ctp_sg")
        )
    )
    # p = |X| - ceil(t|X|) + 1 (1e-9 nudge: an over-long prefix is safe,
    # a short one loses pairs — same guard as the jaccard device)
    pref = ordered.select(
        "__ctp_id",
        *block_cols,
        F.explode(
            F.expr(
                "transform(slice(__ctp_sg, 1, size(__ctp_sg) - "
                f"cast(ceil({threshold!r} * size(__ctp_sg) - 1e-9) as int) + 1), "
                "s -> s.__ctp_tok)"
            )
        ).alias("__ctp_tok"),
    )
    a = pref.select(
        F.col("__ctp_id").alias("id_a"),
        *[F.col(c).alias(f"__ctp_ba_{c}") for c in block_cols],
        "__ctp_tok",
    )
    b = tok.select(
        F.col("__ctp_id").alias("id_b"),
        *[F.col(c).alias(f"__ctp_bb_{c}") for c in block_cols],
        "__ctp_tok",
    )
    cond = [a["__ctp_tok"] == b["__ctp_tok"]] + [
        F.col(f"__ctp_ba_{c}") == F.col(f"__ctp_bb_{c}") for c in block_cols
    ]
    cand = (
        a.join(b, cond)
        .filter(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return hashed, cand


def _verify_containment(
    hashed: DataFrame, cand: DataFrame, threshold: float
) -> DataFrame:
    """Exact verification of ordered candidate pairs: ``(id_a, id_b,
    containment)`` with ``C(A,B) = |A∩B|/|A| ≥ threshold``."""
    ga = hashed.select(
        F.col("__ctp_id").alias("id_a"), F.col("__ctp_g").alias("__ctp_ga")
    )
    gb = hashed.select(
        F.col("__ctp_id").alias("id_b"), F.col("__ctp_g").alias("__ctp_gb")
    )
    c = (
        F.size(F.array_intersect("__ctp_ga", "__ctp_gb")).cast("double")
        / F.size("__ctp_ga").cast("double")
    )
    return (
        cand.join(ga, "id_a")
        .join(gb, "id_b")
        .filter(c >= threshold)
        .select("id_a", "id_b", c.alias("containment"))
    )


def containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_cols: list[str],
    threshold: float = 0.5,
    ngram: int = 3,
    collapse_exact: bool = False,
) -> DataFrame:
    """Verified containment pairs — see :func:`_containment_candidates`
    (the module docstring above it carries the theorem and the scale
    argument): exact ``array_intersect`` verification over the
    checkpointed gram arrays makes the prefix filter lossless.

    ``collapse_exact`` mirrors the jaccard generator's mass-duplication
    re-plan: identical (distinct-gram set, block key) classes run the
    prefix filter and verification as ONE representative; verified rep
    pairs expand to all ordered member cross products (containment is a
    pure function of the two gram SETS, so every member pair scores its
    rep pair's value exactly), and within-class ordered pairs emit
    directly at containment 1.0 (identical sets contain each other).
    Output identical to the direct path — pinned by
    ``test_containment_collapse_exact_identical_pairs``."""
    if not collapse_exact:
        hashed, cand = _containment_candidates(
            df, text_col, id_col, block_cols, threshold, ngram
        )
        return _verify_containment(hashed, cand, threshold)
    reserved = {"id_a", "id_b", "containment"}
    bad = [c for c in (id_col, *block_cols)
           if c in reserved or c.startswith("__ctp_")]
    if bad:
        raise ValueError(
            f"containment_pairs: column names {bad} are reserved "
            "(output names id_a/id_b/containment and the __ctp_ prefix)"
        )
    # build grams once, collapse to content classes, pair the reps
    hashed = df.select(
        F.col(id_col).alias("__ctp_id"),
        *[F.col(c) for c in block_cols],
        hashed_gram_sets(F.col(text_col), ngram).alias("__ctp_g"),
    ).localCheckpoint(eager=False)
    mem = hashed.select(
        "__ctp_id",
        F.xxhash64(F.array_sort("__ctp_g"), *[F.col(c) for c in block_cols])
        .alias("__ctp_cls"),
        F.size("__ctp_g").alias("__ctp_sz"),
    ).localCheckpoint(eager=False)
    reps = mem.groupBy("__ctp_cls", "__ctp_sz").agg(
        F.min("__ctp_id").alias("__ctp_rep")
    )
    mem = mem.join(reps, ["__ctp_cls", "__ctp_sz"]).select(
        "__ctp_rep", "__ctp_id"
    )
    rep_hashed = hashed.join(
        reps.select(F.col("__ctp_rep").alias("__ctp_id")), "__ctp_id"
    ).localCheckpoint(eager=False)
    _, cand = _containment_candidates(
        None, text_col, "__ctp_id", block_cols, threshold, ngram,
        hashed=rep_hashed,
    )
    rep_pairs = _verify_containment(rep_hashed, cand, threshold)
    # ordered expansion: rep pairs are already directional, so members
    # inherit the direction — no least/greatest renormalization
    ma = mem.select(
        F.col("__ctp_rep").alias("id_a"), F.col("__ctp_id").alias("__ctp_ma")
    )
    mb = mem.select(
        F.col("__ctp_rep").alias("id_b"), F.col("__ctp_id").alias("__ctp_mb")
    )
    cross = (
        rep_pairs.join(ma, "id_a")
        .join(mb, "id_b")
        .select(
            F.col("__ctp_ma").alias("id_a"),
            F.col("__ctp_mb").alias("id_b"),
            "containment",
        )
    )
    within = (
        mem.alias("x")
        .join(mem.alias("y"), "__ctp_rep")
        .filter(F.col("x.__ctp_id") != F.col("y.__ctp_id"))
        .select(
            F.col("x.__ctp_id").alias("id_a"),
            F.col("y.__ctp_id").alias("id_b"),
            F.lit(1.0).alias("containment"),
        )
    )
    return cross.unionAll(within)


def containment_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_cols: list[str],
    threshold: float = 0.5,
    ngram: int = 3,
) -> DataFrame:
    """Candidate ``(id_a, id_b)`` pairs from the one-sided prefix
    filter ONLY — no verification join. Lossless superset of
    :func:`containment_pairs`; ``tools/bench_scale.py`` counts it at
    100× to close the extrapolation gap without the verify join's
    output-sized shuffle (the same candidate-policy as
    ``ngram_jaccard_candidates``)."""
    return _containment_candidates(
        df, text_col, id_col, block_cols, threshold, ngram
    )[1]
