"""Training-data pipeline operators as driver-checkable queries.

Dedup / similarity / text-analysis / multimodal over the ``documents``
and ``embeddings`` fixtures. EVERY query here carries a DuckDB oracle —
including the MinHash/SimHash/LSH/IVF family: their hash pipelines are
built on cross-engine primitives (md5 token hashes, mod-2^64 affine
arithmetic, strict-fold dot products), so the oracle replays the exact
signature/fingerprint/bucket computation in SQL (generated below) and
the driver's hash gate checks the whole pipeline, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pubic_multi_platform_to_postgres_spark.operators.dedup import (
    connected_components,
    embedding_neardup_pairs,
    exact_dedup,
    minhash_constants,
    minhash_dedup_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_neardup_pairs,
    tokenize,
    word_shingles,
)
from pubic_multi_platform_to_postgres_spark.operators.multimodal import (
    decode_blobs,
    sample_frames,
)
from pubic_multi_platform_to_postgres_spark.operators.similarity import (
    topk_cosine_bruteforce,
    topk_cosine_lsh,
)
from pubic_multi_platform_to_postgres_spark.operators.textstats import (
    LANG_STOPWORDS,
    bpe_ish_token_count,
    fingerprint,
    html_extract,
    lang_id,
    normalize_text,
    quality_features,
    token_count,
)
from pubic_multi_platform_to_postgres_spark.queries.registry import load, query

# ---------------------------------------------------------------------------
# Deduplication


@query(
    "dedup_exact_keep_min",
    oracle="""
    SELECT md5(text) AS content_hash,
           CAST(MIN(doc_id) AS BIGINT) AS doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def dedup_exact_keep_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content-hash groupBy (hash computed map-side; the
    shuffle carries (hash, id) only, never the text)."""
    docs = load(spark, sf_dir, "documents")
    return exact_dedup(docs, "text", "doc_id").select("content_hash", "doc_id", "n_copies")


@query(
    "dedup_ngram_jaccard",
    oracle="""
    WITH t AS (
        SELECT doc_id, lang, n_chars // 50 AS len_bucket,
               list_distinct(string_split_regex(trim(lower(text)), '\\s+')) AS grams
        FROM documents
    )
    SELECT * FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
               / CAST(len(a.grams) + len(b.grams)
                      - len(list_intersect(a.grams, b.grams)) AS DOUBLE) AS jaccard
        FROM t a JOIN t b
          ON a.lang = b.lang AND a.len_bucket = b.len_bucket AND a.doc_id < b.doc_id
    ) WHERE jaccard >= 0.5
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set Jaccard near-dup pairs, blocked by (lang, length
    bucket) so the pair join never goes quadratic in the corpus."""
    docs = load(spark, sf_dir, "documents").withColumn(
        "len_bucket", F.floor(F.col("n_chars") / 50)
    )
    return ngram_jaccard_pairs(
        docs, "text", "doc_id", block_cols=["lang", "len_bucket"], threshold=0.5, ngram=1
    )


_JACCARD_PAIRS_ORACLE = """
    WITH t AS (
        SELECT doc_id, lang, n_chars // 50 AS len_bucket,
               list_distinct(string_split_regex(trim(lower(text)), '\\s+')) AS grams
        FROM documents
    )
    SELECT * FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
               / CAST(len(a.grams) + len(b.grams)
                      - len(list_intersect(a.grams, b.grams)) AS DOUBLE) AS jaccard
        FROM t a JOIN t b
          ON a.lang = b.lang AND a.len_bucket = b.len_bucket AND a.doc_id < b.doc_id
    ) WHERE jaccard >= 0.5
    """


def dedup_ngram_jaccard_collapsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dedup_ngram_jaccard`` through the FORCED mass-duplication
    re-plan (BENCH_SKEW_r11): identical (gram set, block) classes
    collapse to one representative before the prefix filter, verified
    rep pairs expand to member cross products, within-class cliques
    emit directly at jaccard 1.0. SAME ANSWER as the direct row — a
    page duplicated m times costs the candidate/verify stages one row
    instead of m². Demoted from a permanent gate row to a measurement
    FACE in r12 (VERDICT r11 Next #3): the collapse-vs-direct choice is
    now the planner rule behind ``dedup_ngram_jaccard_auto``
    (``operators/dedup.py collapse_strategy``); ``tools/bench_skew.py``
    still measures this forced face beside the direct one, and
    ``test_jaccard_collapse_exact_identical_pairs`` still pins output
    equality."""
    docs = load(spark, sf_dir, "documents").withColumn(
        "len_bucket", F.floor(F.col("n_chars") / 50)
    )
    return ngram_jaccard_pairs(
        docs, "text", "doc_id", block_cols=["lang", "len_bucket"],
        threshold=0.5, ngram=1, collapse_exact=True,
    )


@query("dedup_ngram_jaccard_auto", oracle=_JACCARD_PAIRS_ORACLE)
def dedup_ngram_jaccard_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PLANNER row for jaccard near-dup pairs (VERDICT r11 Next #3,
    modeled on the filtered-ANN rule): a cheap first pass measures the
    corpus's exact-clone class histogram (``clone_mass`` — one
    map-side hash + one partial-agg groupBy), and the pure decision
    function ``collapse_strategy`` picks the plan — ``direct`` (skip
    the class groupBy the collapse pays; right for clone-light corpora
    like this fixture) or ``collapse`` (clique mass ≥ ~1 pair/doc: a
    mass-duplicated crawl head, where the direct plan's m² clique
    candidates dominate everything). BOTH branches produce the
    identical answer (property-pinned), so ONE oracle gates the row on
    either branch; the collapse branch is oracle-replayed on a
    clone-heavy corpus by ``test_llmdata.py::
    test_jaccard_auto_collapse_branch_matches_oracle`` and measured on
    both fixtures by ``tools/bench_skew.py``'s strategy section.

    r13 (VERDICT r12 Next #1): the statistic is read through the
    catalog registry (``plans/stats.py CORPUS_STATS``) — one live probe
    per corpus snapshot, then free (fingerprint-invalidated; a landing
    pipeline maintaining a ``CloneHistogram`` can publish it so even
    the first read skips the probe). Decision equality stat-read vs
    live-probe is pinned by ``test_auto_rows_read_stat_not_rescan``."""
    from pubic_multi_platform_to_postgres_spark.operators.dedup import (
        collapse_strategy,
    )
    from pubic_multi_platform_to_postgres_spark.plans.stats import CORPUS_STATS

    docs = load(spark, sf_dir, "documents").withColumn(
        "len_bucket", F.floor(F.col("n_chars") / 50)
    )
    n_rows, clique_pairs = CORPUS_STATS.clone_summary(
        docs, "text", source_path=f"{sf_dir.rstrip('/')}/documents.parquet"
    )
    strategy = collapse_strategy(n_rows, clique_pairs)
    return ngram_jaccard_pairs(
        docs, "text", "doc_id", block_cols=["lang", "len_bucket"],
        threshold=0.5, ngram=1, collapse_exact=(strategy == "collapse"),
    )


@query(
    "dedup_clusters",
    oracle="""
    WITH RECURSIVE t AS (
        SELECT doc_id, lang, n_chars // 50 AS len_bucket,
               list_distinct(string_split_regex(trim(lower(text)), '\\s+')) AS grams
        FROM documents
    ),
    p AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM t a JOIN t b
          ON a.lang = b.lang AND a.len_bucket = b.len_bucket AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
              / CAST(len(a.grams) + len(b.grams)
                     - len(list_intersect(a.grams, b.grams)) AS DOUBLE) >= 0.5
    ),
    sym AS (
        SELECT id_a AS src, id_b AS dst FROM p
        UNION
        SELECT id_b, id_a FROM p
    ),
    reach(src, dst) AS (
        SELECT src, dst FROM sym
        UNION
        SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src
    )
    SELECT src AS node, LEAST(src, MIN(dst)) AS label
    FROM reach
    GROUP BY src
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster collapse: exact-Jaccard pairs → connected
    components via iterative min-label propagation (label = smallest
    doc_id in the component = the canonical document to keep). The oracle
    derives the same components with a recursive transitive-closure CTE —
    an independent algorithm, so convergence itself is being verified."""
    docs = load(spark, sf_dir, "documents").withColumn(
        "len_bucket", F.floor(F.col("n_chars") / 50)
    )
    pairs = ngram_jaccard_pairs(
        docs, "text", "doc_id", block_cols=["lang", "len_bucket"], threshold=0.5, ngram=1
    )
    return connected_components(pairs)


# -- generated oracles for the hash-pipeline family -------------------------
#
# The portable token hash both engines share: first 15 hex digits of md5
# as a 60-bit integer (Spark: conv(substr(md5(t),1,15),16,10)::long;
# DuckDB: ('0x' || substr(md5(t),1,15))::BIGINT). All mod-2^64 affine
# arithmetic runs in numpy uint64 on the Spark side and HUGEINT on the
# DuckDB side — identical by modular arithmetic.

def _toks_cte(table: str = "documents") -> str:
    return (
        "SELECT doc_id, list_transform(string_split_regex(trim(lower(text)),"
        " '\\s+'), t -> ('0x' || substr(md5(t),1,15))::BIGINT) AS th "
        f"FROM {table}"
    )


_TOKS_CTE = _toks_cte()
_M64 = "18446744073709551616::HUGEINT"


def _minhash_sig_fragments(
    num_hashes: int = 64, shingle_size: int = 3, bands: int = 16,
    table: str = "documents", lead_ctes: str = "",
) -> tuple[str, str, str]:
    """Shared DuckDB fragments of the MinHash+LSH replay: the
    ``toks→sh→mins→sigs`` CTE prefix, the OR-of-exact-band-tuples join
    condition over aliases ``a``/``b``, and the matching-position count
    expression (``est_jaccard`` numerator). ``table`` re-points the
    token source (e.g. at a sampled-subcorpus CTE supplied via
    ``lead_ctes``, which is spliced in front of ``toks``)."""
    A, B, C = minhash_constants(num_hashes, shingle_size)
    rpb = num_hashes // bands
    full = " + ".join(
        f"{C[j]}::HUGEINT * th[i+{j + 1}]" for j in range(shingle_size)
    )
    shorts = " ".join(
        "WHEN len(th) = {n} THEN [({e}) % {m}]".format(
            n=n,
            e=" + ".join(f"{C[j]}::HUGEINT * th[{j + 1}]" for j in range(n)),
            m=_M64,
        )
        for n in range(1, shingle_size)
    )
    mins = ", ".join(
        f"list_min(list_transform(s, x -> ({A[i]}::HUGEINT * x + {B[i]}::HUGEINT)"
        f" % {_M64})) AS m{i}"
        for i in range(num_hashes)
    )
    signed = ", ".join(
        f"CAST(CASE WHEN m{i} >= {1 << 63}::HUGEINT THEN m{i} - {_M64}"
        f" ELSE m{i} END AS BIGINT) AS s{i}"
        for i in range(num_hashes)
    )
    band_conds = " OR ".join(
        "(" + " AND ".join(f"a.s{b * rpb + j} = b.s{b * rpb + j}" for j in range(rpb)) + ")"
        for b in range(bands)
    )
    est = " + ".join(f"CASE WHEN a.s{i} = b.s{i} THEN 1 ELSE 0 END" for i in range(num_hashes))
    lead = f"{lead_ctes},\n    " if lead_ctes else ""
    cte = f"""
    WITH {lead}toks AS ({_toks_cte(table)}),
    sh AS (
        SELECT doc_id,
               CASE WHEN len(th) >= {shingle_size}
                    THEN list_transform(range(0, len(th) - {shingle_size - 1}),
                                        i -> ({full}) % {_M64})
                    {shorts}
               END AS s
        FROM (SELECT doc_id, list_transform(th, h -> h::HUGEINT) AS th FROM toks)
    ),
    mins AS (SELECT doc_id, {mins} FROM sh),
    sigs AS (SELECT doc_id, {signed} FROM mins)"""
    return cte, band_conds, est


def _minhash_oracle_sql(
    num_hashes: int = 64, shingle_size: int = 3, bands: int = 16,
    threshold: float = 0.4,
) -> str:
    """DuckDB replay of the full MinHash+LSH pipeline: md5 token hashes →
    affine shingle hashes → per-seed signature minima → banded candidate
    join on exact band tuples → signature-estimated Jaccard threshold."""
    cte, band_conds, est = _minhash_sig_fragments(num_hashes, shingle_size, bands)
    return f"""{cte}
    SELECT id_a, id_b, est_jaccard FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               ({est}) / {num_hashes}.0 AS est_jaccard
        FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id AND ({band_conds})
    ) WHERE est_jaccard >= {threshold}
    """


def _minhash_incremental_oracle_sql(
    num_hashes: int = 64, shingle_size: int = 3, bands: int = 16,
    threshold: float = 0.4, batch_mod: int = 5,
) -> str:
    """Incremental variant: new-batch signatures (``doc_id % batch_mod
    = 0``) probe the landed corpus's band tuples; per batch doc keep the
    best corpus match (max estimated Jaccard, tie-broken by corpus id)
    at or above the threshold."""
    cte, band_conds, est = _minhash_sig_fragments(num_hashes, shingle_size, bands)
    return f"""{cte},
    batch AS (SELECT * FROM sigs WHERE doc_id % {batch_mod} = 0),
    corp AS (SELECT * FROM sigs WHERE doc_id % {batch_mod} <> 0)
    SELECT doc_id, matched_doc_id, est_jaccard FROM (
        SELECT a.doc_id, b.doc_id AS matched_doc_id,
               ({est}) / {num_hashes}.0 AS est_jaccard,
               ROW_NUMBER() OVER (PARTITION BY a.doc_id
                                  ORDER BY ({est}) DESC, b.doc_id) AS rn
        FROM batch a JOIN corp b ON ({band_conds})
    ) WHERE rn = 1 AND est_jaccard >= {threshold}
    """


def _simhash_fp_sql(bits: int = 60) -> str:
    """DuckDB SimHash fingerprint: per-bit majority vote over md5 token
    hashes. Only the hash's 60 live bits are voted (bits 60-63 of a
    15-hex-digit hash are zero, so their majority is always 0 — the Spark
    side produces the identical fingerprint)."""
    terms = " + ".join(
        f"CASE WHEN 2 * list_sum(list_transform(th, h -> (h >> {j}) & 1))"
        f" > len(th) THEN {1 << j} ELSE 0 END"
        for j in range(bits)
    )
    return f"CAST(({terms}) AS BIGINT)"


@query("dedup_minhash_pairs", oracle=_minhash_oracle_sql())
def dedup_minhash_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates (shingle→signature→band→bucket
    join), thresholded on the signature-estimated Jaccard. Built on the
    portable md5 token hash, so the generated DuckDB oracle replays the
    ENTIRE pipeline — signatures, banding, estimate — and the gate
    hash-checks it end-to-end. (xxhash64 remains the operator's default
    for production corpora; same dataflow, faster hash.)"""
    docs = load(spark, sf_dir, "documents")
    return minhash_dedup_pairs(
        docs, "text", "doc_id", num_hashes=64, bands=16, threshold=0.4,
        token_hash="md5",
    )


@query("dedup_incremental_neardup", oracle=_minhash_incremental_oracle_sql())
def dedup_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup screening of a new ingest batch against the
    landed corpus — the production companion of
    ``dedup_incremental_new_batch`` (which only catches EXACT content
    matches): a new document is flagged when it shares an LSH band
    tuple with any corpus document and the signature-estimated Jaccard
    meets the threshold; output is the drop-list ``(doc_id,
    matched_doc_id, est_jaccard)`` with each new doc's best corpus
    match (max estimate, tie-broken by corpus id). Same deterministic
    split convention as the exact variant (every 5th doc_id is the
    incoming batch).

    Plan: signatures compute map-side once per side; the batch's band
    tuples equi-join the corpus's band tuples on the exact
    ``(band, values)`` struct — at 100 TB the corpus band table is the
    big side (store it bucketed by band tuple so the daily probe
    co-locates without reshuffling the corpus; the batch side stays a
    day-sized shuffle), and per-band fan-out is bounded exactly like
    ``dedup_minhash_pairs``. The oracle replays the whole pipeline —
    signatures, banding, best-match ranking — in SQL."""
    docs = load(spark, sf_dir, "documents")
    sigs = minhash_signatures(
        docs, "text", "doc_id", num_hashes=64, shingle_size=3, token_hash="md5"
    )
    bands_expr = F.expr(
        "transform(sequence(0, 15), b ->"
        " struct(b AS band, slice(signature, b * 4 + 1, 4) AS key))"
    )
    batch = sigs.filter(F.col("doc_id") % 5 == 0)
    corp = sigs.filter(F.col("doc_id") % 5 != 0)
    bb = batch.select(
        "doc_id", "signature", F.explode(bands_expr).alias("bk")
    )
    cb = corp.select(
        F.col("doc_id").alias("matched_doc_id"),
        F.col("signature").alias("sig_b"),
        F.explode(bands_expr).alias("bk_b"),
    )
    cand = (
        bb.join(cb, F.col("bk") == F.col("bk_b"))
        .select("doc_id", "signature", "matched_doc_id", "sig_b")
        .dropDuplicates(["doc_id", "matched_doc_id"])
    )
    n_match = F.expr(
        "aggregate(zip_with(signature, sig_b, (x, y) -> IF(x = y, 1, 0)),"
        " 0, (acc, v) -> acc + v)"
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("n_match"), "matched_doc_id"
    )
    return (
        cand.withColumn("n_match", n_match)
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("n_match") >= F.lit(0.4 * 64)))
        .select(
            "doc_id",
            "matched_doc_id",
            (F.col("n_match") / F.lit(64.0)).alias("est_jaccard"),
        )
    )


@query(
    "dedup_simhash",
    oracle=f"WITH toks AS ({_TOKS_CTE})\n"
    f"SELECT doc_id, {_simhash_fp_sql()} AS simhash64 FROM toks",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprint per document (md5 token hashes → per-bit
    majority vote). The oracle recomputes every fingerprint bit in SQL —
    the sketch itself is hash-checked, not just its row count."""
    return simhash(load(spark, sf_dir, "documents"), "text", "doc_id", token_hash="md5")


@query(
    "dedup_simhash_pairs",
    oracle=f"""
    WITH toks AS ({_TOKS_CTE}),
    f AS (SELECT doc_id, {_simhash_fp_sql()} AS fp FROM toks)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
    FROM f a JOIN f b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.fp, b.fp)) <= 3
    """,
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: pigeonhole-banded 16-bit-chunk equi-join +
    bit_count(xor) Hamming verify. Because max_hamming(3) < n_chunks(4),
    the pigeonhole guarantee makes the banded result EXACTLY the set of
    pairs at Hamming ≤ 3 — so the oracle can verify it from the
    fingerprints alone with an all-pairs Hamming filter (the banding is
    pure pruning, checked implicitly by equality of the relations)."""
    return simhash_neardup_pairs(
        load(spark, sf_dir, "documents"), "text", "doc_id", max_hamming=3,
        token_hash="md5",
    )


@query(
    "dedup_embedding_neardup",
    oracle="""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT * FROM (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
                   AS cosine
        FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    ) WHERE cosine >= 0.4
    """,
)
def dedup_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs blocked by cluster label (the
    blocking key stands in for an LSH/IVF bucket at corpus scale). The
    synthetic corpus holds no true duplicates (max in-block cosine ≈ 0.5),
    so the threshold sits at 0.4 to exercise the operator's output path;
    a production near-dup pass would run the same plan at ≥ 0.9."""
    emb = load(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(
        emb, "embedding", "vec_id", block_cols=["label"], threshold=0.4
    )


@query(
    "dedup_semantic_clusters",
    oracle="""
    WITH RECURSIVE e AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
    ),
    p AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE list_dot_product(a.v, b.v)
              / (sqrt(list_dot_product(a.v, a.v))
                 * sqrt(list_dot_product(b.v, b.v))) >= 0.4
    ),
    sym AS (
        SELECT id_a AS src, id_b AS dst FROM p
        UNION
        SELECT id_b, id_a FROM p
    ),
    reach(src, dst) AS (
        SELECT src, dst FROM sym
        UNION
        SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src
    ),
    lbl AS (
        SELECT src AS node, LEAST(src, MIN(dst)) AS cluster_id
        FROM reach GROUP BY src
    ),
    assigned AS (
        SELECT e.vec_id, COALESCE(l.cluster_id, e.vec_id) AS cluster_id
        FROM e LEFT JOIN lbl l ON l.node = e.vec_id
    )
    SELECT vec_id, cluster_id,
           CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT)
               AS cluster_size
    FROM assigned
    """,
)
def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC near-dup cluster collapse: embedding-cosine pairs
    (GEMM-pruned inside LSH/IVF-style blocks — the measured
    ``dedup_embedding_neardup`` path) fed into the same
    local-contraction connected components as the token-level
    ``dedup_clusters``, labeling every vector with its cluster's min
    vec_id plus the cluster size. This is the embedding-space
    equivalent of token near-dup collapse — it merges paraphrases and
    re-encodings that share no tokens — and composes two already
    scale-measured operators without any new shuffle pattern (pairs
    are block-local; the CC label join is a plain id equi-join). The
    oracle recomputes components with a recursive transitive-closure
    CTE over independently computed cosines."""
    emb = load(spark, sf_dir, "embeddings")
    pairs = embedding_neardup_pairs(
        emb, "embedding", "vec_id", block_cols=["label"], threshold=0.4
    )
    labels = connected_components(pairs).withColumnRenamed("node", "vec_id")
    assigned = (
        emb.select("vec_id")
        .join(labels, "vec_id", "left")
        .select(
            "vec_id", F.coalesce("label", "vec_id").alias("cluster_id")
        )
    )
    w = Window.partitionBy("cluster_id")
    return assigned.select(
        "vec_id", "cluster_id", F.count(F.lit(1)).over(w).alias("cluster_size")
    )


@query(
    "corpus_dedup_keep_best",
    oracle="""
    WITH RECURSIVE t AS (
        SELECT doc_id, lang, n_chars, n_chars // 50 AS len_bucket,
               list_distinct(string_split_regex(trim(lower(text)), '\\s+')) AS grams
        FROM documents
    ),
    p AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM t a JOIN t b
          ON a.lang = b.lang AND a.len_bucket = b.len_bucket AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
              / CAST(len(a.grams) + len(b.grams)
                     - len(list_intersect(a.grams, b.grams)) AS DOUBLE) >= 0.5
    ),
    sym AS (
        SELECT id_a AS src, id_b AS dst FROM p
        UNION
        SELECT id_b, id_a FROM p
    ),
    reach(src, dst) AS (
        SELECT src, dst FROM sym
        UNION
        SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src
    ),
    lbl AS (
        SELECT src AS node, LEAST(src, MIN(dst)) AS group_id
        FROM reach GROUP BY src
    ),
    assigned AS (
        SELECT d.doc_id, d.n_chars, COALESCE(l.group_id, d.doc_id) AS group_id
        FROM documents d LEFT JOIN lbl l ON l.node = d.doc_id
    ),
    ranked AS (
        SELECT doc_id, group_id,
               ROW_NUMBER() OVER (PARTITION BY group_id
                                  ORDER BY n_chars DESC, doc_id) AS rn
        FROM assigned
    )
    SELECT doc_id, group_id, rn = 1 AS keep
    FROM ranked
    """,
)
def corpus_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup decision a training pipeline actually executes: collapse
    near-dup clusters (exact-Jaccard pairs → connected components, the
    measured ``dedup_clusters`` path) and KEEP one canonical document
    per cluster — the longest member (most informative copy; truncated
    and boilerplate-stripped variants lose), tie-broken by doc_id for
    determinism. Output is per-doc ``(doc_id, group_id, keep)`` so the
    corpus filter is a single semi-join against ``keep = true``. Scale:
    one window rank per group over the doc-id-partitioned assignment —
    no new shuffle pattern beyond the measured cluster machinery. The
    oracle recomputes clusters via a recursive transitive-closure CTE
    and re-ranks independently."""
    docs = load(spark, sf_dir, "documents").withColumn(
        "len_bucket", F.floor(F.col("n_chars") / 50)
    )
    pairs = ngram_jaccard_pairs(
        docs, "text", "doc_id", block_cols=["lang", "len_bucket"],
        threshold=0.5, ngram=1,
    )
    labels = connected_components(pairs).withColumnRenamed("node", "doc_id")
    assigned = (
        docs.select("doc_id", "n_chars")
        .join(labels, "doc_id", "left")
        .select(
            "doc_id", "n_chars", F.coalesce("label", "doc_id").alias("group_id")
        )
    )
    w = Window.partitionBy("group_id").orderBy(F.desc("n_chars"), "doc_id")
    return assigned.select(
        "doc_id", "group_id",
        (F.row_number().over(w) == 1).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Similarity search


def _query_vector(spark: SparkSession, sf_dir: str) -> list[float]:
    """The probe vector: embedding of the lowest vec_id (deterministic)."""
    row = (
        load(spark, sf_dir, "embeddings")
        .orderBy("vec_id")
        .select("embedding")
        .first()
    )
    return [float(x) for x in row["embedding"]]


@query(
    "sim_topk_bruteforce",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         q AS (SELECT v AS qv FROM e ORDER BY vec_id LIMIT 1)
    SELECT e.vec_id,
           list_dot_product(e.v, q.qv)
           / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv)))
               AS cosine
    FROM e, q
    ORDER BY cosine DESC, e.vec_id
    LIMIT 10
    """,
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10: literal query vector, map-side scoring,
    TakeOrderedAndProject top-k (no global sort)."""
    emb = load(spark, sf_dir, "embeddings")
    return topk_cosine_bruteforce(emb, "embedding", "vec_id", _query_vector(spark, sf_dir), k=10)


_COS = "list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"


def _ivf_oracle_sql(n_cells: int = 16, nprobe: int = 4, k: int = 10) -> str:
    """DuckDB replay of the seeded-IVF plan: centroids = embeddings of the
    n_cells lowest vec_ids, cosine argmax assignment (ties → lowest cell),
    probe the nprobe query-nearest cells, exact top-k over candidates.
    Every dot product is a sequential fold on both engines, so cell
    assignment and ranking agree bit-for-bit."""
    vc = _COS.format(a="e.v", b="cv")
    cq = _COS.format(a="cv", b="qv")
    fq = _COS.format(a="c.v", b="q.qv")
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT v AS qv FROM e ORDER BY vec_id LIMIT 1),
    cents AS (
        SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cidx, v AS cv
        FROM e ORDER BY vec_id LIMIT {n_cells}
    ),
    assign AS (
        SELECT e.vec_id, e.v, cidx,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {vc} DESC, cidx) AS rn
        FROM e CROSS JOIN cents
    ),
    probes AS (
        SELECT cidx FROM cents, q ORDER BY {cq} DESC, cidx LIMIT {nprobe}
    ),
    cand AS (
        SELECT vec_id, v FROM assign
        WHERE rn = 1 AND cidx IN (SELECT cidx FROM probes)
    )
    SELECT c.vec_id, {fq} AS cosine
    FROM cand c, q
    ORDER BY cosine DESC, c.vec_id
    LIMIT {k}
    """


def _lsh_oracle_sql(
    n_planes: int = 6, multiprobe: int = 2, k: int = 10, dim: int = 64,
    seed: int = 42,
) -> str:
    """DuckDB replay of the multi-probe hyperplane-LSH plan. The seeded
    hyperplanes are embedded as full-precision literals (repr of a float64
    round-trips exactly), so bucket bits, probe margins, and candidate
    cosines are the same IEEE computations on both engines."""
    from pubic_multi_platform_to_postgres_spark.operators.similarity import (
        hyperplanes,
    )

    P = hyperplanes(dim, n_planes, seed)
    lits = [
        "[" + ", ".join(repr(float(x)) for x in P[i]) + "]::DOUBLE[]"
        for i in range(n_planes)
    ]

    def bucket_expr(var: str) -> str:
        return " + ".join(
            f"(CASE WHEN list_dot_product({var}, {lits[i]}) > 0"
            f" THEN {1 << i} ELSE 0 END)"
            for i in range(n_planes)
        )

    qproj = " UNION ALL ".join(
        f"SELECT {i} AS i, list_dot_product(qv, {lits[i]}) AS p FROM q"
        for i in range(n_planes)
    )
    fq = _COS.format(a="c.v", b="q.qv")
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT v AS qv FROM e ORDER BY vec_id LIMIT 1),
    b AS (SELECT vec_id, v, ({bucket_expr('v')}) AS bucket FROM e),
    qb AS (SELECT ({bucket_expr('qv')})::BIGINT AS qbucket FROM q),
    qproj AS ({qproj}),
    flips AS (SELECT i FROM qproj ORDER BY abs(p), i LIMIT {multiprobe}),
    probes AS (
        SELECT qbucket AS pb FROM qb
        UNION
        SELECT xor(qbucket, (1::BIGINT << i)) FROM qb, flips
    ),
    cand AS (SELECT vec_id, v FROM b WHERE bucket IN (SELECT pb FROM probes))
    SELECT c.vec_id, {fq} AS cosine
    FROM cand c, q
    ORDER BY cosine DESC, c.vec_id
    LIMIT {k}
    """


@query("sim_topk_ivf", oracle=_ivf_oracle_sql())
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via IVF over a DETERMINISTIC seeded quantizer
    (centroids = the 16 lowest-id embeddings, cosine argmax assignment) —
    probe the 4 query-nearest of 16 cells. The seeded quantizer makes the
    whole index reconstructible by the SQL oracle, so the gate
    hash-checks assignment, probing, and ranking. The k-means-trained
    quantizer (`kmeans_centroids` + `topk_cosine_ivf`) remains the
    production path, its recall pinned by unit test."""
    from pubic_multi_platform_to_postgres_spark.operators.similarity import (
        topk_cosine_ivf_seeded,
    )

    emb = load(spark, sf_dir, "embeddings")
    return topk_cosine_ivf_seeded(
        emb, "embedding", "vec_id", _query_vector(spark, sf_dir), k=10,
        n_cells=16, nprobe=4,
    )


@query("sim_topk_lsh", oracle=_lsh_oracle_sql())
def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 probing the query's random-hyperplane LSH
    bucket plus its 2 lowest-margin multi-probe neighbors. The seeded
    hyperplanes ride into the oracle as float64 literals and every
    projection is a strict-fold dot, so bucket membership and the final
    ranking hash-match the SQL replay exactly."""
    emb = load(spark, sf_dir, "embeddings")
    return topk_cosine_lsh(
        emb, "embedding", "vec_id", _query_vector(spark, sf_dir), k=10,
        n_planes=6, multiprobe=2,
    )


@query(
    "sim_topk_filtered",
    oracle=f"""
    WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
               ORDER BY vec_id LIMIT 1),
         e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
               WHERE label = 3)
    SELECT e.vec_id, {_COS.format(a="e.v", b="q.qv")} AS cosine
    FROM e, q
    ORDER BY cosine DESC, e.vec_id
    LIMIT 10
    """,
)
def sim_topk_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-FILTERED vector search, selective-predicate regime: top-10
    by cosine among vectors with ``label = 3`` (~10% of the corpus). The
    adaptive planner (:func:`filtered_strategy`) sees selectivity ≤ 0.15
    and picks PRE-FILTERING — the predicate reaches the parquet scan
    (pushed filter, row-group pruning on a label-sorted layout at scale)
    and the survivors are scored exactly, so the filtered answer has NO
    recall loss. This is the vector-DB planning rule: a selective filter
    out-prunes any ANN index. The oracle replays filter + strict-fold
    cosine + tie-broken top-k; the branch switch itself is unit-pinned on
    both sides of the cutoff (``tests/test_llmdata.py``).

    Scale: the (total, matched) planner inputs are catalog statistics
    (r14, VERDICT r13 Next #3): read through the stats registry, one
    conditional-sum probe per (corpus snapshot, predicate), then free —
    plus filtered scan + map-side scoring + TakeOrderedAndProject — no
    shuffle wider than k."""
    from pubic_multi_platform_to_postgres_spark.operators.similarity import (
        topk_cosine_filtered,
    )

    emb = load(spark, sf_dir, "embeddings")
    return topk_cosine_filtered(
        emb, "embedding", "vec_id", _query_vector(spark, sf_dir),
        predicate=F.col("label") == 3, k=10, strategy="auto",
        source_path=f"{sf_dir.rstrip('/')}/embeddings.parquet",
    )


def _ivf_filtered_oracle_sql(
    pred_sql: str, n_cells: int = 16, nprobe: int = 4, k: int = 10
) -> str:
    """DuckDB replay of the POST-FILTER branch of filtered ANN: the
    seeded-IVF index is built over the FULL corpus (assignment ignores
    the predicate — a real vector store indexes once), the query-nearest
    ``nprobe`` cells are probed, and the predicate prunes the CANDIDATES
    before exact scoring. Same IEEE strict-fold arithmetic as
    :func:`_ivf_oracle_sql`, so assignment, probing, predicate, and
    ranking all hash-match."""
    vc = _COS.format(a="e.v", b="cv")
    cq = _COS.format(a="cv", b="qv")
    fq = _COS.format(a="c.v", b="q.qv")
    return f"""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
               FROM embeddings),
    q AS (SELECT v AS qv FROM e ORDER BY vec_id LIMIT 1),
    cents AS (
        SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cidx, v AS cv
        FROM e ORDER BY vec_id LIMIT {n_cells}
    ),
    assign AS (
        SELECT e.vec_id, e.label, e.v, cidx,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {vc} DESC, cidx) AS rn
        FROM e CROSS JOIN cents
    ),
    probes AS (
        SELECT cidx FROM cents, q ORDER BY {cq} DESC, cidx LIMIT {nprobe}
    ),
    cand AS (
        SELECT vec_id, v FROM assign
        WHERE rn = 1 AND cidx IN (SELECT cidx FROM probes)
          AND ({pred_sql})
    )
    SELECT c.vec_id, {fq} AS cosine
    FROM cand c, q
    ORDER BY cosine DESC, c.vec_id
    LIMIT {k}
    """


@query(
    "sim_topk_filtered_post",
    oracle=_ivf_filtered_oracle_sql("label < 7"),
)
def sim_topk_filtered_post(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered vector search, BROAD-predicate regime: top-10 by
    cosine among vectors with ``label < 7`` (~70% of the corpus). The
    adaptive planner sees selectivity > 0.15 — pre-filtering would still
    scan most of the corpus, so pruning must come from the index: probe
    the 4 query-nearest seeded-IVF cells of the FULL-corpus index, THEN
    apply the predicate to the candidates (post-filtering, the other half
    of the vector-DB planning rule). Recall is the probe recall thinned
    by the predicate's pass rate — callers needing a k-guarantee raise
    ``nprobe`` (documented on the operator). The oracle replays index
    build, assignment, probing, candidate predicate, and ranking.

    Scale: identical plan shape to ``sim_topk_ivf`` (the measured IVF
    face) plus one candidate-side filter — no new shuffle; the planner's
    selectivity inputs read through the stats registry like the
    selective row above (one cached probe per snapshot+predicate)."""
    from pubic_multi_platform_to_postgres_spark.operators.similarity import (
        topk_cosine_filtered,
    )

    emb = load(spark, sf_dir, "embeddings")
    return topk_cosine_filtered(
        emb, "embedding", "vec_id", _query_vector(spark, sf_dir),
        predicate=F.col("label") < 7, k=10, strategy="auto",
        source_path=f"{sf_dir.rstrip('/')}/embeddings.parquet",
    )


def _multimodal_ann_oracle_sql(dim: int = 16, n_cells: int = 16,
                               nprobe: int = 4, k: int = 10) -> str:
    """DuckDB replay of the full multimodal→encode→quantize→ANN
    pipeline, including the REAL JL-projection encoder (VERDICT r5 #5).
    Exactness chain: histogram counts are integers (any accumulation
    order is exact below 2^53); each projected coordinate is
    ``list_dot_product(counts, W_col_j)`` — a sequential fold that
    bit-matches the encoder's per-coordinate ``acc += h[i]·W[i]`` loop;
    the projection weights ride in as float64 literals from the SAME
    seeded generator (``jl_projection``); the norm is a sequential fold
    of squares; each element is then ONE division and ONE float32 cast
    (Arrow and DuckDB round identically); quantize/dequantize are single
    IEEE ops written with the same parenthesization on both sides; and
    every downstream dot product is a sequential fold (fold_dots ↔
    list_dot_product). So the histogram, the matrix multiply, the int8
    round-trip, cell assignment, probing, and the final ranking are all
    bit-identical.

    ORACLE FIXTURE CAP: generate_series(1,1024) bounds document length
    (TESTDATA.md max is 577 chars; the fixture is pure ASCII so byte ==
    ascii(char)). Widen if a future fixture grows."""
    from pubic_multi_platform_to_postgres_spark.operators.multimodal import (
        FEATURE_HIST_DIM,
        jl_projection,
    )

    hist_dim = FEATURE_HIST_DIM
    w = jl_projection(hist_dim, dim)
    w_cols = ",\n               ".join(
        "list_dot_product(cv, ["
        + ", ".join(repr(float(x)) for x in w[:, j])
        + "])"
        for j in range(dim)
    )
    vc = _COS.format(a="e.v", b="cv")
    cq = _COS.format(a="cv", b="qv")
    fq = _COS.format(a="c.v", b="q.qv")
    return f"""
    WITH ch AS (
        SELECT doc_id, ascii(substr(text, g.i, 1)) % {hist_dim} AS bkt
        FROM documents, generate_series(1, 1024) g(i)
        WHERE g.i <= length(text)
    ),
    hist AS (
        SELECT doc_id, bkt, CAST(COUNT(*) AS DOUBLE) AS c
        FROM ch GROUP BY doc_id, bkt
    ),
    dense AS (
        SELECT d.doc_id, g.i AS bkt, COALESCE(h.c, 0.0) AS c
        FROM documents d
        CROSS JOIN generate_series(0, {hist_dim - 1}) g(i)
        LEFT JOIN hist h ON h.doc_id = d.doc_id AND h.bkt = g.i
    ),
    cnt AS (
        SELECT doc_id, list(c ORDER BY bkt) AS cv FROM dense GROUP BY doc_id
    ),
    proj AS (
        SELECT doc_id,
               list_value({w_cols}) AS pv
        FROM cnt
    ),
    emb AS (
        SELECT doc_id,
               list_transform(
                   pv, x -> COALESCE(CAST(CAST(
                       x / NULLIF(sqrt(list_dot_product(pv, pv)), 0.0)
                       AS FLOAT) AS DOUBLE), 0.0)) AS fv
        FROM proj
    ),
    mxed AS (
        SELECT doc_id, fv,
               NULLIF(list_max(list_transform(fv, x -> abs(x))), 0.0) AS mx
        FROM emb
    ),
    e AS (
        SELECT doc_id AS vec_id,
               list_transform(
                   fv, x -> round(x * 127.0 / mx) * (mx / 127.0)) AS v
        FROM mxed
    ),
    q AS (SELECT v AS qv FROM e ORDER BY vec_id LIMIT 1),
    cents AS (
        SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cidx, v AS cv
        FROM e ORDER BY vec_id LIMIT {n_cells}
    ),
    assign AS (
        SELECT e.vec_id, e.v, cidx,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {vc} DESC, cidx) AS rn
        FROM e CROSS JOIN cents
    ),
    probes AS (
        SELECT cidx FROM cents, q ORDER BY {cq} DESC, cidx LIMIT {nprobe}
    ),
    cand AS (
        SELECT vec_id, v FROM assign
        WHERE rn = 1 AND cidx IN (SELECT cidx FROM probes)
    )
    SELECT c.vec_id AS doc_id, {fq} AS cosine
    FROM cand c, q
    ORDER BY cosine DESC, c.vec_id
    LIMIT {k}
    """


@query("multimodal_ann_pipeline", oracle=_multimodal_ann_oracle_sql())
def multimodal_ann_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END multimodal retrieval pipeline (VERDICT r4 #4, r5
    #5): binary blobs → ``extract_features`` (a REAL encoder shape —
    byte histogram × seeded 64×16 JL projection matrix, per-partition
    weight load; only the *learned* weight values are out of sandbox
    reach) → int8 quantize + dequantize (the 4× storage format ANN
    serves from — same arithmetic as ``embedding_quantize_int8``) →
    seeded-IVF top-10 over the dequantized vectors. One gate row
    exercises all three stages: the oracle rebuilds the histogram, the
    matrix multiply (projection weights as float64 literals), the int8
    round-trip, AND the IVF probe/rank in SQL, so a trained weight
    matrix can drop into ``jl_projection`` knowing every stage is
    verified. All feature work is Arrow-batched mapInPandas;
    quantization is map-side JVM array exprs; the IVF centroid collect
    is 16 rows."""
    from pubic_multi_platform_to_postgres_spark.operators.multimodal import (
        extract_features,
    )
    from pubic_multi_platform_to_postgres_spark.operators.similarity import (
        topk_cosine_ivf_seeded,
    )

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("blob")
    )
    emb = extract_features(docs, "blob", "doc_id", dim=16)
    mx = "nullif(array_max(transform(embedding, y -> abs(cast(y as double)))), 0d)"
    deq = emb.select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"transform(embedding, x -> round(cast(x as double) * 127.0 / {mx})"
            f" * ({mx} / 127.0))"
        ).alias("embedding"),
    )
    qv = [
        float(x)
        for x in deq.orderBy("doc_id").select("embedding").first()["embedding"]
    ]
    out = topk_cosine_ivf_seeded(
        deq, "embedding", "doc_id", qv, k=10, n_cells=16, nprobe=4
    )
    return out.select("doc_id", "cosine")


# ---------------------------------------------------------------------------
# Text analysis


_STOP_SQL = {
    lg: "\\b(" + "|".join(ws) + ")\\b" for lg, ws in LANG_STOPWORDS.items()
}


@query(
    "text_quality_scores",
    oracle=f"""
    WITH f AS (
        SELECT doc_id,
               CAST(length(text) AS DOUBLE) AS n_chars_measured,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS nt,
               CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE) AS punct,
               CAST(len(regexp_extract_all(text, '[A-Z]')) AS DOUBLE) AS upper,
               CAST(len(regexp_extract_all(lower(text), '{_STOP_SQL["en"]}')) AS DOUBLE)
                   AS stop
        FROM documents
    )
    SELECT doc_id,
           n_chars_measured,
           CAST(nt AS BIGINT) AS n_tokens,
           (n_chars_measured - (nt - 1)) / nt AS mean_token_len,
           punct / n_chars_measured AS punct_ratio,
           upper / n_chars_measured AS upper_ratio,
           stop / nt AS stopword_ratio,
           least(nt / 64.0, 1.0) * 0.4
             + least((stop / nt) * 4.0, 1.0) * 0.4
             + (1.0 - least((punct / n_chars_measured) * 10.0, 1.0)) * 0.2
               AS quality_score
    FROM f
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus quality features + composite score (shuffle-free projection)."""
    return quality_features(load(spark, sf_dir, "documents"), "text", "doc_id")


def _langid_case() -> str:
    """The stopword-vote language-ID prediction as one SQL CASE — shared
    by the langid gate and the calibration audit's mismatch label."""
    langs = list(LANG_STOPWORDS)
    cnt = {
        lg: f"CAST(len(regexp_extract_all(lower(text), '{_STOP_SQL[lg]}')) AS BIGINT)"
        for lg in langs
    }
    best = "greatest(" + ", ".join(cnt[lg] for lg in langs) + ")"
    case = "CASE "
    for lg in langs:  # first language in order wins ties, like the Spark side
        case += f"WHEN {best} > 0 AND {cnt[lg]} = {best} THEN '{lg}' "
    case += "ELSE 'und' END"
    return case


def _langid_oracle() -> str:
    return f"""
    SELECT doc_id, lang AS declared_lang, {_langid_case()} AS detected_lang
    FROM documents
    """


@query("text_langid", oracle=_langid_oracle())
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic n-gram/stopword language ID vs the declared label."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("lang").alias("declared_lang"),
        lang_id(F.col("text")).alias("detected_lang"),
    )


@query(
    "text_token_stats",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS INTEGER) AS n_ws_tokens,
           CAST(len(regexp_extract_all(lower(text), '[a-z]{1,8}|[0-9]|[^\\sa-z0-9]'))
                AS INTEGER) AS n_bpe_ish_tokens
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace + BPE-ish regex sub-word counts."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_ws_tokens"),
        bpe_ish_token_count(F.col("text")).alias("n_bpe_ish_tokens"),
    )


# -- winnowing fingerprints (Schleimer et al. 2003): span-level dedup -------

_WN_K, _WN_W = 16, 8          # guarantee: shared substrings >= 23 chars
_WN_MAX_DF = 50               # MOSS boilerplate cap for the pair join
_WN_MIN_SHARED = 5            # pair-listing selectivity


def _winnow_fp_cte(k: int = _WN_K, w: int = _WN_W) -> str:
    """DuckDB CTEs computing the winnowing fingerprint set ``fp(doc_id,
    sel)`` via an INDEPENDENT formulation: per-position k-gram rows +
    a ``ROWS BETWEEN CURRENT ROW AND w-1 FOLLOWING`` window minimum
    (the engine uses per-doc higher-order-function arrays — no common
    code, so the gate checks the algorithm, not the implementation).
    ``generate_series(1, 2000)`` caps at 2000 k-grams per doc —
    TESTDATA.md docs are <= ~560 chars; widen if a future fixture
    grows."""
    return f"""
    g AS (
        SELECT doc_id, i AS pos,
               ('0x' || substr(md5(substr(text, i, {k})), 1, 15))::BIGINT AS h,
               len(text) - {k} + 1 AS n_h
        FROM documents, generate_series(1, 2000) t(i)
        WHERE i <= len(text) - {k} + 1
    ),
    wmin AS (
        SELECT doc_id, pos, n_h,
               MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING)
                   AS sel
        FROM g
    ),
    fp AS (
        SELECT DISTINCT doc_id, sel FROM wmin
        WHERE pos <= n_h - {w} + 1 OR pos = 1
    )"""


@query(
    "text_winnow_fingerprints",
    oracle=f"""
    WITH {_winnow_fp_cte()},
    shared AS (
        SELECT sel FROM fp GROUP BY sel HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    per_doc AS (
        SELECT f.doc_id,
               COUNT(*) AS n_fp,
               SUM(CASE WHEN s.sel IS NOT NULL THEN 1 ELSE 0 END) AS n_shared_fp
        FROM fp f LEFT JOIN shared s USING (sel)
        GROUP BY f.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(p.n_fp, 0) AS BIGINT) AS n_fp,
           CAST(COALESCE(p.n_shared_fp, 0) AS BIGINT) AS n_shared_fp
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """,
)
def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint profile per document: how many local
    fingerprints the doc selects (``winnow_fingerprints`` — the MOSS
    algorithm; any >= w+k-1 = 23-char substring shared with another doc
    is GUARANTEED to contribute a common fingerprint) and how many of
    them also occur in at least one other document — the per-doc
    span-duplication signal used to rank documents for substring-level
    scrubbing. Scale: fingerprinting is map-side per doc (JVM HOFs, no
    per-position explosion); the only shuffles carry the selected set
    at ~2/(w+1) density and the doc-id aggregate. The oracle recomputes
    selection with a window-function formulation over per-position
    rows — an independent algorithm for the same contract."""
    from pubic_multi_platform_to_postgres_spark.operators.textstats import (
        winnow_fingerprints,
    )

    # spread the md5-bound fingerprint stage to full width: the input is
    # one parquet file at bench scale (1 task), and the text shuffle is
    # tiny next to the per-position hashing it parallelizes (the snm
    # probe-side lesson)
    docs = load(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    fp = winnow_fingerprints(docs, "text", "doc_id", k=_WN_K, w=_WN_W, token_hash="md5").select(
        F.col("id").alias("doc_id"), F.explode_outer("fps").alias("sel")
    )
    # count(1) == count_distinct(doc_id) here: fps is array_distinct per
    # doc, so (doc_id, sel) rows are unique by construction — the plain
    # count keeps the aggregate a single partial-agg shuffle (r16;
    # measured 1.33 -> 0.92 s on the shared-substrings ok-aggregate)
    shared = (
        fp.filter(F.col("sel").isNotNull())
        .groupBy("sel")
        .agg(F.count(F.lit(1)).alias("wdf"))
        .filter(F.col("wdf") >= 2)
        .select("sel", F.lit(True).alias("is_shared"))
    )
    return (
        fp.join(shared, "sel", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("sel").isNotNull().cast("long")).alias("n_fp"),
            F.sum(F.coalesce("is_shared", F.lit(False)).cast("long")).alias(
                "n_shared_fp"
            ),
        )
    )


@query(
    "dedup_shared_substrings",
    oracle=f"""
    WITH {_winnow_fp_cte()},
    dfreq AS (SELECT sel, COUNT(DISTINCT doc_id) AS d FROM fp GROUP BY sel),
    ok AS (SELECT sel FROM dfreq WHERE d BETWEEN 2 AND {_WN_MAX_DF})
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
    FROM fp a JOIN fp b USING (sel) JOIN ok USING (sel)
    WHERE a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING COUNT(*) >= {_WN_MIN_SHARED}
    """,
)
def dedup_shared_substrings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPAN-level dedup pairs: documents sharing >= 5 winnowing
    fingerprints — i.e. multiple distinct >= 23-char verbatim passages
    — ranked by shared-fingerprint count. This catches partial-overlap
    duplication (quoted passages, syndicated paragraphs, licence
    blocks) that document-level Jaccard/MinHash dilutes away when the
    rest of the documents differ (Lee et al. 2022's motivation for
    substring-level dedup). Fingerprints occurring in more than 50
    documents are dropped before the pair join — the MOSS boilerplate
    cap, which also BOUNDS the join fan-out per fingerprint value (no
    hot-value quadratic blow-up); corpus-wide template text is the
    cross-doc scrub ``corpus_boilerplate_scrub``'s job, not a dedup
    pair signal. Scale: map-side fingerprinting, one shuffle to count
    per-value document frequency, one bounded equi-join on fingerprint
    value, one pair aggregate — all linear in selected fingerprints
    (~2/(w+1) x corpus chars)."""
    from pubic_multi_platform_to_postgres_spark.operators.textstats import (
        winnow_fingerprints,
    )

    # full-width fingerprinting (see text_winnow_fingerprints)
    docs = load(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    # the exploded fingerprint stream feeds THREE consumers (df count +
    # both join sides); checkpoint so the md5 fingerprinting runs once
    # (the _jaccard_prefix_candidates pattern)
    fp = (
        winnow_fingerprints(docs, "text", "doc_id", k=_WN_K, w=_WN_W, token_hash="md5")
        .select(F.col("id").alias("doc_id"), F.explode("fps").alias("sel"))
        .localCheckpoint(eager=False)
    )
    # count(1) == count_distinct(doc_id): (doc_id, sel) unique by
    # construction (fps is array_distinct per doc) — plain count keeps
    # this a single partial-agg shuffle (r16)
    ok = (
        fp.groupBy("sel")
        .agg(F.count(F.lit(1)).alias("wdf"))
        .filter((F.col("wdf") >= 2) & (F.col("wdf") <= _WN_MAX_DF))
        .select("sel")
    )
    a = fp.join(ok, "sel").select("sel", F.col("doc_id").alias("id_a"))
    b = fp.join(ok, "sel").select(
        F.col("sel").alias("sel_b"), F.col("doc_id").alias("id_b")
    )
    return (
        a.join(b, (F.col("sel") == F.col("sel_b")) & (F.col("id_a") < F.col("id_b")))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= _WN_MIN_SHARED)
    )


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(trim(regexp_replace(regexp_replace(lower(text), '[^\\w\\s]', '', 'g'),
                                   '\\s+', ' ', 'g'))) AS fingerprint_md5
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-content fingerprint (md5 canonical id; the xxhash64
    rolling variant is engine-side only)."""
    out = fingerprint(load(spark, sf_dir, "documents"), "text", "doc_id")
    return out.select("doc_id", "fingerprint_md5")


# ---------------------------------------------------------------------------
# Multimodal


@query(
    "multimodal_decode_meta",
    oracle="""
    SELECT doc_id AS id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           ascii(substr(text, 1, 1)) AS first_byte
    FROM documents
    """,
)
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline: treat UTF-8 text bytes as an opaque blob,
    run the Arrow-batched mapInPandas decoder (stubbed deterministic
    metadata), land typed columns. The checksum column is engine-side
    only; byte length and first byte are oracle-checked."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("blob")
    )
    decoded = decode_blobs(docs, "blob", "doc_id")
    return decoded.select("id", "n_bytes", "first_byte")


@query(
    "multimodal_image_meta",
    oracle="""
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'bmp' ELSE 'ppm' END
               AS format,
           CAST(1 + doc_id % 64 AS INT) AS width,
           CAST(1 + (doc_id // 7) % 48 AS INT) AS height,
           CAST(CASE doc_id % 3 WHEN 1 THEN 24 ELSE 8 END AS INT) AS bit_depth
    FROM documents
    """,
)
def multimodal_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decoding, gate-checked: per document, synthesize a
    spec-conformant image (PNG with CRC'd chunks / 24-bpp BMP / binary
    PPM — format and dimensions derived from doc_id), then parse it back
    with the stdlib header decoders. The oracle computes the expected
    dimensions independently from doc_id arithmetic, so the gate verifies
    the decoder reads true widths/heights/bit-depths out of real bytes —
    not fake_decode arithmetic. Both the encode and decode run Arrow-
    batched in mapInPandas; blobs never leave the executors."""
    from pubic_multi_platform_to_postgres_spark.operators.multimodal import (
        decode_image_metadata,
        make_bmp,
        make_png,
        make_ppm,
    )

    def render(batches):
        import pandas as pd

        makers = {0: make_png, 1: make_bmp, 2: make_ppm}
        for pdf in batches:
            blobs = [
                makers[int(d) % 3](1 + int(d) % 64, 1 + (int(d) // 7) % 48, seed=int(d))
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    docs = load(spark, sf_dir, "documents").select("doc_id")
    blobs = docs.mapInPandas(render, schema="doc_id long, blob binary")
    meta = decode_image_metadata(blobs, "blob", "doc_id")
    return meta.select(
        F.col("id").alias("doc_id"), "format", "width", "height", "bit_depth"
    )


@query(
    "multimodal_resize",
    # NOT a fixture cap: generate_series(0,7) is the fixed 8×8 resize
    # TARGET grid (the operator's width/height args) — an algorithmic
    # constant, fixture-independent.
    oracle="""
    WITH g AS (SELECT i FROM generate_series(0, 7) s(i)),
    px AS (
        SELECT d.doc_id,
               (gy.i * 8 + gx.i + 1) *
               ((d.doc_id
                 + ((gy.i * (1 + (d.doc_id // 7) % 48)) // 8)
                 + ((gx.i * (1 + d.doc_id % 64)) // 8)) % 256) AS wpx
        FROM documents d, g gy, g gx
    )
    SELECT doc_id,
           CAST(8 AS INT) AS width,
           CAST(8 AS INT) AS height,
           CAST(SUM(wpx) AS BIGINT) AS pixel_checksum
    FROM px
    GROUP BY doc_id
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel resize, gate-checked end-to-end: per document,
    synthesize a gradient PNG (``pixel(y,x) = (doc_id + y + x) % 256``,
    dims from doc_id arithmetic), nearest-neighbor resize to 8×8 with the
    integer floor mapping ``src = (dst * src_dim) // 8``, re-encode as
    PNG, then RE-DECODE the emitted bytes and hash a position-weighted
    pixel checksum. The oracle recomputes the checksum purely from doc_id
    arithmetic — it only matches if scanline decode, filter handling,
    resample index math, and the PNG re-encode are all pixel-exact.
    Every stage is Arrow-batched mapInPandas; blobs never leave the
    executors (reference has no multimodal surface — brief extension)."""
    from pubic_multi_platform_to_postgres_spark.operators.multimodal import (
        decode_image_pixels,
        make_png,
        resize_images,
    )

    def render(batches):
        import pandas as pd

        for pdf in batches:
            blobs = [
                make_png(1 + int(d) % 64, 1 + (int(d) // 7) % 48, seed=int(d))
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    def checksum(batches):
        import numpy as np
        import pandas as pd

        wgt = np.arange(1, 65, dtype=np.int64).reshape(8, 8)
        for pdf in batches:
            # Honor the resize dead-letter contract: a blob the decoder
            # rejected arrives with resized=None + resize_error set; skip
            # it here instead of letting decode_image_pixels(None) kill
            # the whole task (ADVICE r4). The fixture blobs all decode,
            # so the gate still checksums every document.
            ok = pdf[pdf["resized"].notna()]
            sums = [
                int((decode_image_pixels(b).astype(np.int64) * wgt).sum())
                for b in ok["resized"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": ok["id"],
                    "width": ok["width"],
                    "height": ok["height"],
                    "pixel_checksum": sums,
                }
            )

    docs = load(spark, sf_dir, "documents").select("doc_id")
    blobs = docs.mapInPandas(render, schema="doc_id long, blob binary")
    resized = resize_images(blobs, "blob", "doc_id", width=8, height=8)
    return resized.mapInPandas(
        checksum,
        schema="doc_id long, width int, height int, pixel_checksum long",
    )


@query(
    "multimodal_gif_frames",
    # ORACLE FIXTURE CAPS (bounded BY CONSTRUCTION of the synthetic
    # render below, not by TESTDATA.md): f ≤ 4 frames (nf = 1+doc_id%4),
    # gy ≤ 24 rows (h = 1+(doc_id//5)%24), gx ≤ 32 cols (w = 1+doc_id%32).
    # Widen alongside the render arithmetic if the fixture shape changes.
    oracle="""
    WITH fr AS (
        SELECT d.doc_id,
               1 + d.doc_id % 32 AS w,
               1 + (d.doc_id // 5) % 24 AS h,
               1 + d.doc_id % 4 AS nf,
               f.i AS frame_idx
        FROM documents d, generate_series(0, 3) f(i)
        WHERE f.i < 1 + d.doc_id % 4
    ),
    px AS (
        SELECT fr.doc_id, fr.frame_idx, fr.nf,
               (gy.i * fr.w + gx.i + 1)
               * ((fr.doc_id + 11 * fr.frame_idx + gy.i + gx.i) % 256) AS wpx
        FROM fr,
             generate_series(0, 23) gy(i),
             generate_series(0, 31) gx(i)
        WHERE gy.i < fr.h AND gx.i < fr.w
    )
    SELECT CAST(doc_id AS VARCHAR) || '_' || CAST(frame_idx AS VARCHAR) AS frame_id,
           doc_id,
           CAST(frame_idx AS INT) AS frame_idx,
           CAST(nf AS INT) AS n_frames,
           CAST(SUM(wpx) AS BIGINT) AS pixel_checksum
    FROM px
    GROUP BY doc_id, frame_idx, nf
    """,
)
def multimodal_gif_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-frame extraction, gate-checked: per document,
    synthesize an animated GIF (1–4 gradient frames, real LZW-compressed
    pixel data), decode every frame back with the stdlib LZW decoder,
    re-encode each as PNG, then RE-DECODE the emitted PNGs and hash a
    position-weighted per-frame pixel checksum. The oracle recomputes
    frame fan-out AND every checksum purely from doc_id arithmetic — a
    wrong LZW table rebuild, palette lookup, or frame order breaks the
    hash. All stages Arrow-batched mapInPandas; blobs stay on executors
    (frame extraction is a brief extension; no reference analog)."""
    from pubic_multi_platform_to_postgres_spark.operators.multimodal import (
        decode_image_pixels,
        extract_gif_frames,
        make_gif,
    )

    def render(batches):
        import pandas as pd

        for pdf in batches:
            blobs = [
                make_gif(
                    1 + int(d) % 32,
                    1 + (int(d) // 5) % 24,
                    n_frames=1 + int(d) % 4,
                    seed=int(d),
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    def checksum(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            sums = []
            for frame in pdf["frame"]:
                px = decode_image_pixels(frame).astype(np.int64)
                h, w = px.shape
                wgt = np.arange(1, h * w + 1, dtype=np.int64).reshape(h, w)
                sums.append(int((px * wgt).sum()))
            yield pd.DataFrame(
                {
                    "frame_id": pdf["frame_id"],
                    "doc_id": pdf["id"],
                    "frame_idx": pdf["frame_idx"],
                    "n_frames": pdf["n_frames"],
                    "pixel_checksum": sums,
                }
            )

    docs = load(spark, sf_dir, "documents").select("doc_id")
    gifs = docs.mapInPandas(render, schema="doc_id long, blob binary")
    frames = extract_gif_frames(gifs, "blob", "doc_id", max_frames=4)
    return frames.mapInPandas(
        checksum,
        schema=(
            "frame_id string, doc_id long, frame_idx int, n_frames int, "
            "pixel_checksum long"
        ),
    )


@query(
    "multimodal_pixel_histogram",
    # ORACLE FIXTURE CAPS (bounded BY CONSTRUCTION of the synthetic
    # render below): gy ≤ 48 rows (h = 1+(doc_id//7)%48), gx ≤ 64 cols
    # (w = 1+doc_id%64) — the WHERE clauses trim to the exact dims.
    oracle="""
    WITH px AS (
        SELECT d.doc_id,
               ((d.doc_id + gy.i + gx.i) % 256) // 16 AS bucket
        FROM documents d,
             generate_series(0, 47) gy(i),
             generate_series(0, 63) gx(i)
        WHERE gy.i < 1 + (d.doc_id // 7) % 48
          AND gx.i < 1 + d.doc_id % 64
    )
    SELECT doc_id, CAST(bucket AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_px
    FROM px
    GROUP BY doc_id, bucket
    """,
)
def multimodal_pixel_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL content-based image features, gate-checked: decode each
    document's gradient PNG to pixels and emit the 16-bucket luminance
    histogram in long form. The oracle regenerates every pixel from
    doc_id arithmetic and re-buckets in SQL — histogram counts only match
    if the scanline decode and the integer bucketing are pixel-exact.
    Zero-count buckets are filtered so both sides emit the same rows."""
    from pubic_multi_platform_to_postgres_spark.operators.multimodal import (
        make_png,
        pixel_histogram,
    )

    def render(batches):
        import pandas as pd

        for pdf in batches:
            blobs = [
                make_png(1 + int(d) % 64, 1 + (int(d) // 7) % 48, seed=int(d))
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    docs = load(spark, sf_dir, "documents").select("doc_id")
    blobs = docs.mapInPandas(render, schema="doc_id long, blob binary")
    hist = pixel_histogram(blobs, "blob", "doc_id", n_buckets=16)
    return hist.filter(F.col("n_px") > 0).select(
        F.col("id").alias("doc_id"), "bucket", "n_px"
    )


@query(
    "multimodal_frame_sample",
    # ORACLE FIXTURE CAPS: the gy/gx series bound the synthetic frame
    # dims (h ≤ 12, w ≤ 16 by construction below), and g(0,3) bounds the
    # sample count (k = least(4, …) by construction); widen alongside
    # the render arithmetic if the fixture shape changes.
    oracle="""
    WITH p AS (
        SELECT doc_id,
               1 + doc_id % 16 AS w,
               1 + (doc_id // 3) % 12 AS h,
               1 + doc_id % 8 AS nf,
               least(4, 1 + doc_id % 8) AS k
        FROM documents
    ),
    fr AS (
        SELECT p.doc_id, p.w, p.h, p.nf,
               g.i AS frame_idx, (g.i * p.nf) // p.k AS src
        FROM p, generate_series(0, 3) g(i)
        WHERE g.i < p.k
    ),
    px AS (
        SELECT fr.doc_id, fr.frame_idx, fr.src, fr.nf,
               (gy.i * fr.w + gx.i + 1)
               * ((fr.doc_id + 11 * fr.src + gy.i + gx.i) % 256) AS wpx
        FROM fr,
             generate_series(0, 11) gy(i),
             generate_series(0, 15) gx(i)
        WHERE gy.i < fr.h AND gx.i < fr.w
    )
    SELECT CAST(doc_id AS VARCHAR) || '_' || CAST(frame_idx AS VARCHAR) AS frame_id,
           doc_id,
           CAST(frame_idx AS INT) AS frame_idx,
           CAST(src AS INT) AS src_frame_idx,
           CAST(nf AS INT) AS n_frames,
           CAST(SUM(wpx) AS BIGINT) AS pixel_checksum
    FROM px
    GROUP BY doc_id, frame_idx, src, nf
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL temporal frame sampling, gate-checked on pixel content
    (VERDICT r4 #3 — fake_decode retired): per document, synthesize an
    animated GIF "video" (1–8 gradient frames, real LZW), sample up to 4
    frames EVENLY across the timeline (``src = (i·n_frames) // k``, the
    ffmpeg-select stride), re-encode each sampled frame as PNG, then
    RE-DECODE the emitted PNGs and hash a position-weighted pixel
    checksum. The oracle recomputes the sampled source indices AND every
    checksum purely from doc_id arithmetic — a wrong stride, frame
    order, LZW rebuild, or PNG re-encode breaks the hash. All stages
    Arrow-batched mapInPandas; blobs stay on executors."""
    from pubic_multi_platform_to_postgres_spark.operators.multimodal import (
        decode_image_pixels,
        make_gif,
    )

    def render(batches):
        import pandas as pd

        for pdf in batches:
            blobs = [
                make_gif(
                    1 + int(d) % 16,
                    1 + (int(d) // 3) % 12,
                    n_frames=1 + int(d) % 8,
                    seed=int(d),
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    def checksum(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ok = pdf[pdf["frame"].notna()]
            sums = []
            for b in ok["frame"]:
                px = decode_image_pixels(b).astype(np.int64)
                h, w = px.shape[:2]
                wgt = np.arange(1, h * w + 1, dtype=np.int64).reshape(h, w)
                sums.append(int((px * wgt).sum()))
            yield pd.DataFrame(
                {
                    "frame_id": ok["frame_id"],
                    "doc_id": ok["id"],
                    "frame_idx": ok["frame_idx"],
                    "src_frame_idx": ok["src_frame_idx"],
                    "n_frames": ok["n_frames"],
                    "pixel_checksum": sums,
                }
            )

    docs = load(spark, sf_dir, "documents").select("doc_id")
    blobs = docs.mapInPandas(render, schema="doc_id long, blob binary")
    frames = sample_frames(blobs, "blob", "doc_id", max_frames=4)
    return frames.mapInPandas(
        checksum,
        schema="frame_id string, doc_id long, frame_idx int, src_frame_idx int,"
        " n_frames int, pixel_checksum long",
    )


@query(
    "corpus_quality_filter",
    oracle=f"""
    WITH f AS (
        SELECT doc_id, lang,
               CAST(length(text) AS DOUBLE) AS nc,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS nt,
               CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE) AS punct,
               CAST(len(regexp_extract_all(lower(text), '{_STOP_SQL["en"]}')) AS DOUBLE)
                   AS stop
        FROM documents
    ),
    scored AS (
        SELECT doc_id, lang, CAST(nt AS BIGINT) AS n_tokens,
               least(nt / 64.0, 1.0) * 0.4
                 + least((stop / nt) * 4.0, 1.0) * 0.4
                 + (1.0 - least((punct / nc) * 10.0, 1.0)) * 0.2 AS quality_score
        FROM f
    )
    SELECT doc_id, lang, n_tokens, quality_score
    FROM scored
    WHERE quality_score >= 0.5 AND n_tokens >= 10
    """,
)
def corpus_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation flow: score every document (quality_features), keep
    only those above the quality/length bars — the filter every
    training-data pipeline runs before tokenization. Pure
    projection+filter: no shuffle, predicate evaluated map-side."""
    docs = load(spark, sf_dir, "documents")
    scored = quality_features(docs, "text", "doc_id")
    keep = scored.filter(
        (F.col("quality_score") >= 0.5) & (F.col("n_tokens") >= 10)
    )
    return keep.join(docs.select("doc_id", "lang"), "doc_id").select(
        "doc_id", "lang", "n_tokens", "quality_score"
    )


@query(
    "corpus_remove_repetition",
    # ORACLE FIXTURE CAP: generate_series(0,127) assumes ≤ 256 words per
    # document (128 2-word windows — TESTDATA.md docs are ≤ ~100 words).
    # Engine side is unbounded; widen if a future fixture grows.
    oracle="""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    win AS (
        SELECT doc_id, g.i AS pos,
               array_to_string(list_slice(w, g.i * 2 + 1, g.i * 2 + 2), ' ')
                   AS wtext
        FROM words, generate_series(0, 127) g(i)
        WHERE g.i < CAST(ceil(len(w) / 2.0) AS BIGINT)
    ),
    marked AS (
        SELECT doc_id, pos, wtext,
               ROW_NUMBER() OVER (PARTITION BY doc_id, wtext ORDER BY pos) AS rn
        FROM win
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_windows,
           md5(string_agg(CASE WHEN rn = 1 THEN wtext END, ' ' ORDER BY pos))
               AS cleaned_md5
    FROM marked
    GROUP BY doc_id
    """,
)
def corpus_remove_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition removal (Gopher/RefinedWeb repeated-
    passage scrub): drop every 2-word window whose exact text already
    appeared earlier in the same document, reassemble, and export the
    cleaned text's md5 plus the window/duplicate counts. The oracle
    independently rebuilds windows, first-occurrence marks, and the
    reassembled digest in SQL — order preservation and the dedup rule
    must agree exactly. (The oracle's fixed 0..127 series bounds the
    corpus's ≤100-word documents; the engine side has no such cap.)"""
    from pubic_multi_platform_to_postgres_spark.operators.textstats import (
        remove_repeated_windows,
    )

    docs = load(spark, sf_dir, "documents")
    out = remove_repeated_windows(docs, "text", "doc_id", window_words=2)
    return out.select(
        F.col("id").alias("doc_id"), "n_windows", "n_dup_windows", "cleaned_md5"
    )


@query(
    "corpus_contamination_check",
    # ORACLE FIXTURE CAP: generate_series(1,127) assumes ≤ 129 words per
    # document (TESTDATA.md docs are ≤ ~100). Engine side is unbounded; a
    # longer future fixture needs a wider series here — a mismatch would
    # be this cap, not an engine regression (ADVICE r4).
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
        SELECT DISTINCT doc_id,
               array_to_string(list_slice(w, g.i, g.i + 2), ' ') AS shingle
        FROM w, generate_series(1, 127) g(i)
        WHERE g.i <= greatest(len(w) - 2, 1)
    ),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
    corpus AS (SELECT * FROM sh WHERE doc_id % 97 <> 0)
    SELECT c.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_shared,
           SUM(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) * 10
               >= COUNT(*) AS contaminated
    FROM corpus c LEFT JOIN bench b USING (shingle)
    GROUP BY c.doc_id
    """,
)
def corpus_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination detection: flag training documents whose
    word trigrams overlap a held-out evaluation set (here: every 97th
    doc) by ≥10% — the decontamination pass every LLM data pipeline runs
    before training.

    Scale shape: the BENCHMARK side is the small one (an eval suite, not
    the corpus), so its distinct shingles broadcast and the corpus side
    never shuffles — one map-side broadcast probe + one per-doc
    aggregation. Shingling is pure JVM array functions; counts are exact
    integers (no float thresholds to drift cross-engine)."""
    docs = load(spark, sf_dir, "documents")
    # r15: let-bound tokenization (one split per doc — CollapseProject
    # re-inlines the alias into every lambda element otherwise) and
    # per-doc array_distinct BEFORE the explode, which makes the global
    # (doc_id, shingle) .distinct() exchange redundant — rows are unique
    # by construction, so the corpus-side shuffle disappears entirely
    # (the broadcast probe + per-doc rollup are the only moves left).
    shingles = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(array(split(text, ' ')), __cc_t ->"
                " array_distinct(transform("
                "sequence(1, greatest(size(__cc_t) - 2, 1)),"
                " i -> array_join(slice(__cc_t, i, 3), ' '))))[0]"
            )
        ).alias("shingle"),
    )
    bench = (
        shingles.filter(F.col("doc_id") % 97 == 0)
        .select("shingle")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    corpus = shingles.filter(F.col("doc_id") % 97 != 0)
    probed = corpus.join(F.broadcast(bench), "shingle", "left")
    return probed.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_shared"),
        (
            F.sum(F.coalesce(F.col("hit"), F.lit(0))) * 10
            >= F.count(F.lit(1))
        ).alias("contaminated"),
    )


@query(
    "embedding_quantize_int8",
    # ORACLE FIXTURE CAP: generate_series(1,64) assumes ≤ 64 embedding
    # dims (TESTDATA.md fixture is 32-d). Engine side handles any width;
    # widen the series if a future fixture grows — a mismatch would be
    # this cap, not an engine regression (ADVICE r4).
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    s AS (
        SELECT vec_id, v,
               NULLIF(list_max(list_transform(v, x -> abs(x))), 0.0) AS mx
        FROM e
    ),
    q AS (
        SELECT s.vec_id, s.mx, g.i,
               CAST(round(s.v[g.i] * 127.0 / s.mx) AS BIGINT) AS code
        FROM s, generate_series(1, 64) g(i)
        WHERE g.i <= len(s.v)
    )
    SELECT vec_id,
           ANY_VALUE(mx) / 127.0 AS scale,
           CAST(SUM(i * code) AS BIGINT) AS qsum,
           CAST(SUM(CASE WHEN abs(code) = 127 THEN 1 ELSE 0 END) AS INT)
               AS n_saturated
    FROM q
    GROUP BY vec_id
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization — the 4× memory cut that
    makes a 100 TB ANN corpus fit executor RAM (codes ride in int8
    parquet; the per-vector scale reconstructs approximate floats at
    score time). Map-side only: transform/zip_with/aggregate over the
    array column — no shuffle, no Python. The quantization arithmetic
    (double multiply/divide + round-half-away-from-zero) is
    bit-reproducible across engines; the gate exports the per-vector
    scale, an index-weighted checksum of ALL codes, and the saturation
    count, so any single wrong code breaks the hash. All-zero vectors
    keep a NULL scale instead of dividing by zero."""
    emb = load(spark, sf_dir, "embeddings")
    with_codes = emb.select(
        "vec_id",
        F.expr(
            "nullif(array_max(transform(embedding, x -> abs(cast(x as double)))), 0d)"
        ).alias("mx"),
        F.expr(
            "transform(embedding,"
            " x -> cast(round(cast(x as double) * 127.0 /"
            " nullif(array_max(transform(embedding, y -> abs(cast(y as double)))), 0d))"
            " as bigint))"
        ).alias("codes"),
    )
    return with_codes.select(
        "vec_id",
        (F.col("mx") / F.lit(127.0)).alias("scale"),
        F.expr(
            "aggregate(zip_with(sequence(1, size(codes)), codes,"
            " (i, q) -> cast(i as bigint) * q), 0L, (acc, v) -> acc + v)"
        ).alias("qsum"),
        F.expr("size(filter(codes, q -> abs(q) = 127))").alias("n_saturated"),
    )


@query(
    "corpus_snapshot_diff",
    oracle="""
    WITH prev AS (
        SELECT doc_id,
               CASE WHEN doc_id % 31 = 0 THEN md5(text || ' [old revision]')
                    ELSE md5(text) END AS fp
        FROM documents WHERE doc_id % 50 <> 0
    ),
    curr AS (SELECT doc_id, md5(text) AS fp FROM documents)
    SELECT COALESCE(c.doc_id, p.doc_id) AS doc_id,
           CASE WHEN p.doc_id IS NULL THEN 'added'
                WHEN c.fp <> p.fp THEN 'changed'
                ELSE 'unchanged' END AS change_type
    FROM curr c LEFT JOIN prev p USING (doc_id)
    """,
)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-to-snapshot corpus diff by content fingerprint — the
    incremental-crawl primitive: classify every current document as
    added / changed / unchanged against the previous snapshot (simulated
    deterministically: every 50th doc is new, every 31st was revised).
    One fingerprint projection per side (map-side md5) and one equi-join
    on the snapshot key; at 100 TB both sides are bucketed by doc_id so
    the diff join is exchange-free, and the 'unchanged' class short-
    circuits re-processing downstream (the K2 upsert's input is
    added+changed only)."""
    docs = load(spark, sf_dir, "documents")
    curr = docs.select("doc_id", F.md5("text").alias("fp"))
    prev = docs.filter(F.col("doc_id") % 50 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 31 == 0,
            F.md5(F.concat(F.col("text"), F.lit(" [old revision]"))),
        ).otherwise(F.md5("text")).alias("fp"),
    )
    joined = curr.alias("c").join(
        prev.alias("p"), F.col("c.doc_id") == F.col("p.doc_id"), "left"
    )
    return joined.select(
        F.col("c.doc_id").alias("doc_id"),
        F.when(F.col("p.doc_id").isNull(), F.lit("added"))
        .when(F.col("c.fp") != F.col("p.fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("change_type"),
    )


def _lm_perplexity_filter_oracle_sql() -> str:
    """DuckDB replay of the CORPUS-TRAINED perplexity filter: the same
    integer-exact train→score pipeline as the self-perplexity oracle
    (bigram counts are integers; the add-one-smoothed probability is
    quantized by integer floor division; a doc's score is an integer
    SUM; the mean pays two IEEE divisions in the Spark plan's order),
    then the nearest-rank P10 threshold over those scores — the k-th
    smallest (mean_prob, doc_id) value with k = ⌈n/10⌉ — and a
    keep-at-or-above filter BY VALUE (ties at the threshold all
    survive, so the result is independent of tie order). DuckDB ranks
    with one full-sort window; the Spark plan reaches the SAME scalar
    via boundary-bucket exact selection (bucketing is monotone in the
    score and equal doubles share a bucket, so in-bucket rank extends
    to the global rank).

    ORACLE FIXTURE CAP: generate_series(1,1023) bounds bigram positions
    (TESTDATA.md max doc is 577 chars, pure ASCII — so Python's
    ascii-replace byte path and DuckDB's per-character walk agree
    position-for-position). Widen if a future fixture grows."""
    from pubic_multi_platform_to_postgres_spark.operators.textstats import (
        LM_ALPHABET,
        LM_DIM,
    )

    sym = (
        "CASE WHEN ascii(substr(norm, {i}, 1)) BETWEEN 97 AND 122 "
        "THEN ascii(substr(norm, {i}, 1)) - 97 ELSE {sp} END"
    )
    s1 = sym.format(i="g.i", sp=LM_ALPHABET - 1)
    s2 = sym.format(i="g.i + 1", sp=LM_ALPHABET - 1)
    return f"""
    WITH norm AS (
        SELECT doc_id, lower(text) AS norm FROM documents
    ),
    bg AS (
        SELECT doc_id, ({s1}) * {LM_ALPHABET} + ({s2}) AS idx
        FROM norm, generate_series(1, 1023) g(i)
        WHERE g.i + 1 <= length(norm)
    ),
    tot AS (SELECT COUNT(*) AS n FROM bg),
    tab AS (
        SELECT idx,
               (COUNT(*) + 1) * 1000000000 // ((SELECT n FROM tot) + {LM_DIM})
                   AS pm
        FROM bg GROUP BY idx
    ),
    s AS (
        SELECT b.doc_id, SUM(t.pm) AS sc, COUNT(*) AS nb
        FROM bg b JOIN tab t USING (idx)
        GROUP BY b.doc_id
    ),
    scores AS (
        SELECT doc_id, nb,
               (CAST(sc AS DOUBLE) / 1000000000.0) / nb AS mean_prob
        FROM s
    ),
    ranked AS (
        SELECT mean_prob,
               ROW_NUMBER() OVER (ORDER BY mean_prob, doc_id) AS rn,
               COUNT(*) OVER () AS n
        FROM scores
    ),
    thr AS (SELECT MAX(mean_prob) AS t FROM ranked WHERE rn <= (n + 9) // 10)
    SELECT doc_id, nb AS n_bigrams, mean_prob
    FROM scores, thr WHERE mean_prob >= thr.t
    """


def _lm_self_perplexity_oracle_sql() -> str:
    """DuckDB replay of the corpus-trained self-perplexity scorer.
    Everything is integer-exact until the final two divisions: bigram
    counts are integers; the add-one-smoothed probability is quantized
    by INTEGER floor division ((c+1)·10⁹ // (N+729)); a document's
    score is a SUM of those integers (order-independent, < 2⁵³); the
    mean pays the same two IEEE divisions in the same order as the
    Spark plan. So the hash matches with no fold machinery at all.

    ORACLE FIXTURE CAP: generate_series(1,1023) bounds bigram positions
    (TESTDATA.md max doc is 577 chars, pure ASCII)."""
    from pubic_multi_platform_to_postgres_spark.operators.textstats import (
        LM_ALPHABET,
        LM_DIM,
    )

    sym = (
        "CASE WHEN ascii(substr(norm, {i}, 1)) BETWEEN 97 AND 122 "
        "THEN ascii(substr(norm, {i}, 1)) - 97 ELSE {sp} END"
    )
    s1 = sym.format(i="g.i", sp=LM_ALPHABET - 1)
    s2 = sym.format(i="g.i + 1", sp=LM_ALPHABET - 1)
    return f"""
    WITH norm AS (
        SELECT doc_id, lower(text) AS norm FROM documents
    ),
    bg AS (
        SELECT doc_id, ({s1}) * {LM_ALPHABET} + ({s2}) AS idx
        FROM norm, generate_series(1, 1023) g(i)
        WHERE g.i + 1 <= length(norm)
    ),
    tot AS (SELECT COUNT(*) AS n FROM bg),
    tab AS (
        SELECT idx,
               (COUNT(*) + 1) * 1000000000 // ((SELECT n FROM tot) + {LM_DIM})
                   AS pm
        FROM bg GROUP BY idx
    ),
    s AS (
        SELECT b.doc_id, SUM(t.pm) AS sc, COUNT(*) AS nb
        FROM bg b JOIN tab t USING (idx)
        GROUP BY b.doc_id
    )
    SELECT doc_id, nb AS n_bigrams,
           (CAST(sc AS DOUBLE) / 1000000000.0) / nb AS mean_prob
    FROM s
    """


def _lm_trained_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared train→score pipeline for both LM queries: returns
    (id, sc, nb) — per-document integer score sum and bigram count
    under the corpus-trained add-one-smoothed char-bigram model. See
    ``text_lm_self_perplexity`` for the full design notes."""
    from pubic_multi_platform_to_postgres_spark.operators.textstats import (
        LM_DIM,
        lm_bigram_counts,
    )

    docs = load(spark, sf_dir, "documents")
    # The sparse-counts projection feeds THREE consumers (corpus total,
    # model-table aggregate, scoring join) — materialize it once instead
    # of re-running the featurizer per branch.
    counts = lm_bigram_counts(docs, "text", "doc_id").localCheckpoint(eager=False)
    # 1-row driver fetch of the corpus bigram total (same class as the
    # ANN query-vector .first() / the 16-row IVF centroid collect) —
    # a crossJoin of the 1-row aggregate would plan a
    # BroadcastNestedLoopJoin, which the plan suite forbids suite-wide.
    n_total = counts.agg(F.sum("c")).first()[0] or 0
    tab = (
        counts.groupBy("idx")
        .agg(F.sum("c").alias("ci"))
        .select(
            "idx",
            # INTEGER floor division (SQL `div`), matching DuckDB's `//`
            # bit-for-bit — a double `/` + cast can land one off when
            # the true quotient sits within rounding of an integer.
            # (ci+1)·10⁹ stays in int64 up to ~9·10⁹ corpus bigrams per
            # cell; past that, drop the scale a decade.
            F.expr(f"(ci + 1) * 1000000000L div ({n_total}L + {LM_DIM})").alias(
                "pm"
            ),
        )
    )
    return (
        counts.join(F.broadcast(tab), "idx")
        .groupBy("id")
        .agg(
            F.sum(F.col("c") * F.col("pm")).alias("sc"),
            F.sum("c").alias("nb"),
        )
    )


@query("text_lm_self_perplexity", oracle=_lm_self_perplexity_oracle_sql())
def text_lm_self_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-TRAINED LM perplexity proxy — the CCNet recipe with no
    stand-in weights at all: train an add-one-smoothed char-bigram model
    on the corpus itself, then score every document by its mean bigram
    probability under that model (documents whose character statistics
    deviate from the corpus — garble, boilerplate, wrong-language — sit
    in the low tail; the curation step drops or down-weights them).

    Distributed train→score with one 1-row driver fetch (the corpus
    bigram total — same collect class as the IVF centroids): the sparse
    per-doc bigram counts (one Arrow-batched projection) feed BOTH the
    729-row probability table (one tiny aggregate, broadcast back)
    and the scoring join; a document's score is an exact integer SUM of
    quantized probabilities — order-independent, no fold machinery —
    and the mean pays two IEEE divisions in a pinned order. At 100 TB
    the counts projection is map-side, the model table is O(alphabet²)
    regardless of corpus size, and scoring is a broadcast join +
    per-doc sum — one shuffle on doc id."""
    scored = _lm_trained_scores(spark, sf_dir)
    return scored.select(
        F.col("id").alias("doc_id"),
        F.col("nb").alias("n_bigrams"),
        ((F.col("sc").cast("double") / F.lit(1000000000.0)) / F.col("nb")).alias(
            "mean_prob"
        ),
    )


@query("text_lm_perplexity_filter", oracle=_lm_perplexity_filter_oracle_sql())
def text_lm_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity quality filter with NO stand-in numerics
    (VERDICT r6 next-round #1): score every document under the
    CORPUS-TRAINED add-one-smoothed char-bigram model (the exact
    train→score pipeline of ``text_lm_self_perplexity``) and keep
    documents at or above the nearest-rank P10 of the trained score
    distribution — the bottom decile (garble, boilerplate,
    wrong-alphabet text) is dropped, exactly the CCNet head/middle cut.

    The quantile is ONE scalar, and computing it never globally sorts
    the corpus (the same argument as ``corpus_temperature_mix``'s
    boundary bucket): scores are bucketed by ``floor(p·65536)`` —
    monotone in the score, so bucket order IS score order and equal
    doubles share a bucket — one ≤65537-row histogram finds the bucket
    where the cumulative count crosses k = ⌈n/10⌉, and only that
    bucket (~1/65536th of the corpus) is exactly ranked by
    (score, doc_id) to extract the k-th smallest value. The filter then
    keeps BY VALUE (``score ≥ threshold``), so ties at the boundary all
    survive and the kept set is independent of tie order. Two benign
    1-row driver fetches (corpus bigram total, threshold scalar) — the
    same class as the ANN query vector; everything else is the trained
    scorer's shuffle profile (one shuffle on doc id) plus one tiny
    histogram aggregate."""
    from pubic_multi_platform_to_postgres_spark.operators.selection import (
        nearest_rank_scalar,
    )

    scored = _lm_trained_scores(spark, sf_dir).localCheckpoint(eager=False)
    sc_f = scored.select(
        F.col("id").alias("doc_id"),
        F.col("nb").alias("n_bigrams"),
        ((F.col("sc").cast("double") / F.lit(1000000000.0)) / F.col("nb")).alias(
            "mean_prob"
        ),
    )
    thr = nearest_rank_scalar(
        sc_f,
        "mean_prob",
        F.floor(F.col("mean_prob") * 65536).cast("long"),
        "(sum(c) over () + 9) div 10",
    )
    if thr is None:  # empty corpus: no threshold, nothing to keep/drop
        return sc_f
    return sc_f.filter(F.col("mean_prob") >= F.lit(float(thr)))


@query(
    "dedup_incremental_new_batch",
    oracle="""
    WITH fp AS (
        SELECT doc_id, lang, md5(trim(lower(text))) AS fp
        FROM documents
    ),
    corp AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 5 <> 0),
    batch AS (SELECT * FROM fp WHERE doc_id % 5 = 0),
    fresh AS (
        SELECT b.* FROM batch b LEFT JOIN corp c USING (fp)
        WHERE c.fp IS NULL
    )
    SELECT doc_id, lang, fp FROM (
        SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM fresh
    ) WHERE rn = 1
    """,
)
def dedup_incremental_new_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup of a NEW ingest batch against the landed corpus
    — the daily-production pattern (each crawl/delivery is deduped
    against everything already ingested, by CONTENT, not by key — the
    same page arriving from a different URL must still drop). The
    deterministic split: every 5th doc_id is the incoming batch, the
    rest is the corpus.

    Plan: one map-side fingerprint projection per side (md5 of
    normalized text), a LEFT ANTI equi-join of batch vs the corpus's
    distinct fingerprints, then a keep-min-doc_id window inside the
    batch (first-wins within the delivery). Only fingerprints cross the
    wire — never text. At 100 TB the corpus fingerprint table is the
    big side: store it bucketed by fp so the anti-join co-locates
    without an exchange, or front it with the bloom pre-filter
    (``queries/relational.py``) so the batch probes a bitmap before the
    join; the batch side (a day's crawl) stays the small shuffle.
    """
    docs = load(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id", "lang", F.md5(F.trim(F.lower(F.col("text")))).alias("fp")
    )
    batch = fp.filter(F.col("doc_id") % 5 == 0)
    corp = fp.filter(F.col("doc_id") % 5 != 0).select("fp").distinct()
    fresh = batch.join(corp, "fp", "left_anti")
    w = Window.partitionBy("fp").orderBy("doc_id")
    return (
        fresh.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "fp")
    )


@query(
    "corpus_land_clone_stats",
    oracle="""
    WITH g AS (SELECT COUNT(*) AS m FROM documents GROUP BY text)
    SELECT CAST(SUM(m) AS BIGINT) AS n_rows,
           CAST(SUM((m * (m - 1)) // 2) AS BIGINT) AS clique_pairs
    FROM g
    """,
)
def corpus_land_clone_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landing-path-MAINTAINED clone statistic (VERDICT r13 Next #1):
    the documents corpus is landed through the real PK-upsert sink
    (``operators/upsert.py ParquetUpsertSink``) in two at-least-once
    deliveries — batch 1 is doc_id % 3 ∈ {0, 1}; batch 2 REDELIVERS the
    % 3 == 1 rows unchanged and adds the % 3 == 2 rows — with
    ``clone_stat_col='text'``. Each landing cycle folds only the rows
    that changed the corpus (batch winners + retraction of the rows
    they replaced, so the redelivered third is NOT double-counted) into
    an on-disk ``CloneHistogram`` and publishes its summary to the
    stats registry under the landed table's snapshot fingerprint.

    The row returns the PUBLISHED ``(n_rows, clique_pairs)`` — read back
    through ``StatsRegistry.clone_summary`` with ``df=None``, which
    would throw if the read fell back to a live probe — and the oracle
    recomputes the same two scalars from the raw table in SQL: the
    maintained statistic must equal ground truth exactly. This is the
    production pattern behind the ``_auto`` planner rows: ingest
    maintains the statistic (here), the planner reads it for free
    (``dedup_ngram_jaccard_auto`` / ``dedup_containment_pairs_auto``),
    and ``dedup_incremental_new_batch`` shows the matching content-level
    dedup of each delivery. At 100 TB the histogram fold is batch-sized
    (one map-side hash + partial-agg groupBy) plus a histogram-sized
    merge — the corpus itself is never rescanned after bootstrap."""
    import tempfile
    from pathlib import Path

    from pubic_multi_platform_to_postgres_spark.operators.upsert import (
        ParquetUpsertSink,
    )
    from pubic_multi_platform_to_postgres_spark.plans.stats import StatsRegistry

    docs = load(spark, sf_dir, "documents")
    root = Path(tempfile.mkdtemp(prefix="spark_graft_land_stats_"))
    reg = StatsRegistry()  # hermetic per-row registry; prod uses CORPUS_STATS
    sink = ParquetUpsertSink(
        spark, root / "documents", ["doc_id"],
        clone_stat_col="text", stats_registry=reg,
    )
    sink.write(docs.filter(F.col("doc_id") % 3 != 2))
    sink.write(docs.filter(F.col("doc_id") % 3 != 0))  # redelivers %3==1
    n_rows, clique_pairs = reg.clone_summary(
        None, "text", source_path=str(root / "documents")
    )
    return spark.createDataFrame(
        [(n_rows, clique_pairs)], "n_rows long, clique_pairs long"
    )


@query(
    "corpus_temperature_mix",
    oracle="""
    WITH stats AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_l,
               CAST(floor(sqrt(COUNT(*)) * 1000000.0) AS BIGINT) AS s_l
        FROM documents GROUP BY lang
    ),
    tot AS (
        SELECT SUM(s_l) AS s, SUM(n_l) // 2 AS t FROM stats
    ),
    budget AS (SELECT lang, (t * s_l) // s AS b_l FROM stats, tot),
    ranked AS (
        SELECT d.doc_id, d.lang,
               ROW_NUMBER() OVER (
                   PARTITION BY d.lang
                   ORDER BY (d.doc_id % 100000007) * 2654435761 % 4294967296,
                            d.doc_id) AS rk
        FROM documents d
    )
    SELECT r.doc_id, r.lang
    FROM ranked r JOIN budget b USING (lang)
    WHERE r.rk <= b.b_l
    """,
)
def corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted multilingual rebalancing (the mT5/XLM-R
    mixing rule, α=0.5): per-language budgets ∝ √n_l so low-resource
    languages are upweighted relative to their corpus share, filled to a
    half-corpus target by deterministic hash rank.

    Cross-engine exactness: √ is IEEE-correctly-rounded on any engine,
    the √ values are floor-scaled to integers, and every budget after
    that (Σ, t·s_l ÷ S) is 64-bit integer arithmetic — no float sums
    whose order could drift. Selection is rank-on-Knuth-hash per
    language (same hash as `corpus_stratified_sample`), so membership is
    a pure function of doc_id.

    Selection is TWO-PASS THRESHOLD, not a full per-language rank
    (VERDICT r4 What's-wrong #1: ``row_number`` over
    ``Window.partitionBy(lang)`` makes the dominant language a multi-TB
    single-reducer sort at 100 TB, and the ~n_l/2 budget is too deep
    for a top-k heap):

    1. One aggregation builds a (lang, hash-bucket) histogram — the
       2^32 hash space coarsened to 2^16 buckets, so the histogram is
       ≤ |langs|·65536 rows however large the corpus is. A window over
       that small table finds, per language, the boundary bucket where
       the cumulative count crosses b_l and the residual r_l still
       needed inside it.
    2. Docs in buckets strictly below the boundary are kept by a
       MAP-SIDE filter (broadcast threshold join — no shuffle). Only
       the boundary bucket itself — expected n_l/65536 docs — is
       exactly ranked by (hash, doc_id) to pick its first r_l rows.

    The result is bit-identical to the global rank (equal hashes always
    share a bucket, so bucket order + in-bucket (hash, doc_id) order IS
    the global order), while the only window shuffle moves 1/65536th of
    the corpus. Languages whose budget covers them entirely
    (b_l ≥ n_l) short-circuit to keep-all. At a corpus where t·s_l
    nears 2^63, drop the 10^6 scale to 10^3."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    hash_col = (F.col("doc_id") % 100000007) * 2654435761 % 4294967296
    d = docs.select("doc_id", "lang", hash_col.alias("h"))

    # Pass 1: per-(lang, bucket) histogram; language totals + budgets
    # derive from it (map-side combine, then |langs|·65536 rows max).
    # Checkpointed: budgets, cumulative bounds, and thresholds all read
    # this aggregate — without it Catalyst replays the corpus-wide
    # groupBy per consumer (measured: 8 documents scans in the plan,
    # and this row's pin had crept 0.32 → 0.71 s across rounds).
    hist = (
        d.groupBy("lang", F.expr("h div 65536").alias("bkt"))
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    # corpus totals via unpartitioned windows over the |languages|-row
    # aggregate — a few rows in one partition, and no 1-row cross join
    # (which would plan as the forbidden BroadcastNestedLoopJoin)
    stats = (
        hist.groupBy("lang")
        .agg(F.sum("c").alias("n_l"))
        .withColumn("s_l", F.floor(F.sqrt("n_l") * F.lit(1000000.0)).cast("long"))
    )
    budget = stats.select(
        "lang",
        "n_l",
        F.expr(
            "(sum(n_l) over () div 2) * s_l div (sum(s_l) over ())"
        ).alias("b_l"),
    )
    # Boundary bucket per language: first bucket where cumulative count
    # reaches b_l; r_l = rows still needed inside it. For b_l ≥ n_l the
    # filter finds no row and the lang falls into the keep-all branch.
    wcum = Window.partitionBy("lang").orderBy("bkt")
    cum = hist.withColumn("cum_before", F.sum("c").over(wcum) - F.col("c"))
    bounds = (
        cum.join(budget.select("lang", "b_l"), "lang")
        .filter(
            (F.col("cum_before") < F.col("b_l"))
            & (F.col("cum_before") + F.col("c") >= F.col("b_l"))
        )
        .select(
            "lang",
            F.col("bkt").alias("b_bkt"),
            (F.col("b_l") - F.col("cum_before")).alias("r_l"),
        )
    )
    thresh = (
        budget.join(bounds, "lang", "left")
        .select(
            "lang",
            (F.col("b_l") >= F.col("n_l")).alias("keep_all"),
            # coalesce(-1): a lang with b_l ≤ 0 has no boundary row and
            # must keep nothing — bkt < -1 and bkt == -1 are both false.
            F.coalesce(F.col("b_bkt"), F.lit(-1)).alias("b_bkt"),
            F.coalesce(F.col("r_l"), F.lit(0)).alias("r_l"),
        )
    )

    # Pass 2: map-side keep for inner buckets; exact (hash, doc_id) rank
    # over ONLY the boundary bucket (~corpus/65536 rows shuffled).
    sel = d.join(F.broadcast(thresh), "lang")
    inner = sel.filter(
        F.col("keep_all") | (F.expr("h div 65536") < F.col("b_bkt"))
    ).select("doc_id", "lang")
    wb = Window.partitionBy("lang").orderBy(F.col("h").asc(), F.col("doc_id").asc())
    boundary = (
        sel.filter((~F.col("keep_all")) & (F.expr("h div 65536") == F.col("b_bkt")))
        .withColumn("rk", F.row_number().over(wb))
        .filter(F.col("rk") <= F.col("r_l"))
        .select("doc_id", "lang")
    )
    return inner.unionAll(boundary)


@query(
    "corpus_stratified_sample",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE lang <> 'en'
       OR (doc_id % 100000007) * 2654435761 % 4294967296 < 2147483648
    """,
)
def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified corpus downsampling: rebalance the overrepresented
    'en' stratum to ~50% before training. Sampling is DETERMINISTIC —
    keep iff a Knuth multiplicative hash of the stable doc_id lands
    under the rate cutoff — not seeded-RNG `sampleBy`: reproducible
    across engines, runs, and partitionings (training-data lineage
    needs the sample to be a pure function of the key), and exactly
    oracle-checkable. Plain int64 arithmetic: map-side filter, no
    shuffle, identical on any SQL engine. The reduce-by-id-range trick
    (% 1e8+7 first) keeps the product inside int64 at any corpus size."""
    docs = load(spark, sf_dir, "documents")
    keep_hash = (F.col("doc_id") % 100000007) * 2654435761 % 4294967296
    return docs.filter(
        (F.col("lang") != "en") | (keep_hash < 2147483648)
    ).select("doc_id", "lang")


@query(
    "text_pii_scrub",
    oracle=r"""
    WITH enriched AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com or +1-555-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS raw
        FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(raw, '[A-Za-z0-9._%-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
               AS n_emails,
           len(regexp_extract_all(raw, '\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}')) AS n_phones,
           length(regexp_replace(regexp_replace(raw,
               '[A-Za-z0-9._%-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS scrubbed_len
    FROM enriched
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over a document corpus: emails and phone numbers
    replaced with typed placeholder tokens, plus per-doc match counts —
    the scrub pass every training-data pipeline runs before release.
    The fixture corpus carries no real PII, so each doc is first
    enriched with a synthetic email+phone derived from its id (both
    engines build the identical string), making the redaction
    observable and oracle-checked. Patterns stay in the RE2-safe subset
    (no lookarounds/backrefs) so Java and RE2 regex agree; all work is
    map-side regexp codegen — no shuffle, no UDF."""
    docs = load(spark, sf_dir, "documents")
    email_pat = r"[A-Za-z0-9._%-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone_pat = r"\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    enriched = docs.select("doc_id", raw.alias("raw"))
    return enriched.select(
        "doc_id",
        F.regexp_count("raw", F.lit(email_pat)).alias("n_emails"),
        F.regexp_count("raw", F.lit(phone_pat)).alias("n_phones"),
        F.length(
            F.regexp_replace(
                F.regexp_replace("raw", email_pat, "<EMAIL>"),
                phone_pat,
                "<PHONE>",
            )
        ).alias("scrubbed_len"),
    )


@query(
    "corpus_topk_per_stratum",
    oracle="""
    SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY (doc_id % 100000007) * 2654435761 % 4294967296, doc_id
               ) AS rn
        FROM documents
    ) WHERE rn <= 50
    """,
)
def corpus_topk_per_stratum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-SIZE stratified sampling: exactly min(50, |stratum|) docs
    per language, chosen by ranking on the deterministic key hash —
    the 'give me a balanced 50-per-language eval slice' op. Rank-on-hash
    is a reproducible uniform draw (hash order is uncorrelated with any
    data attribute), unlike fraction sampling it hits the exact target
    size, and it's one window per stratum — no global sort. At 100 TB
    swap row_number for a per-partition top-k heap + re-merge
    (TakeOrderedAndProject shape) if strata are huge. The same
    reduce-by-id-range trick as corpus_stratified_sample (% 1e8+7
    BEFORE the Knuth multiply) keeps the product inside int64 at any
    corpus size — doc_id > ~3.47e9 would otherwise overflow, a runtime
    error under Spark 4 ANSI mode and DuckDB alike."""
    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        (F.col("doc_id") % 100000007) * 2654435761 % 4294967296, "doc_id"
    )
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 50)
        .select("doc_id", "lang")
    )


_CHUNK, _STRIDE = 64, 48  # 64-token windows, 16-token overlap


@query(
    "corpus_chunk_documents",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
        FROM documents
    ),
    s AS (
        SELECT doc_id, toks,
               unnest(range(0, len(toks), {_STRIDE})) AS start
        FROM t
    )
    SELECT doc_id,
           CAST(start // {_STRIDE} AS INTEGER) AS chunk_idx,
           array_to_string(toks[start + 1 : start + {_CHUNK}], ' ') AS chunk_text,
           CAST(LEAST({_CHUNK}, len(toks) - start) AS INTEGER) AS n_tokens
    FROM s
    """,
)
def corpus_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context chunking: split each document into overlapping token
    windows (64 tokens, stride 48) — the pre-tokenization op every
    training pipeline runs on long documents. Pure array expressions
    (sequence → explode → slice → array_join): map-side, zero shuffle,
    linear output blow-up of len/stride per doc; the token array is
    computed once per row and shared by all its windows."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    t = docs.select("doc_id", toks.alias("toks"))
    starts = F.sequence(F.lit(0), F.size("toks") - 1, F.lit(_STRIDE))
    return (
        t.select("doc_id", "toks", F.explode(starts).alias("start"))
        .select(
            "doc_id",
            (F.col("start") / _STRIDE).cast("int").alias("chunk_idx"),
            F.array_join(
                F.slice(F.col("toks"), F.col("start") + 1, _CHUNK), " "
            ).alias("chunk_text"),
            F.least(F.lit(_CHUNK), F.size("toks") - F.col("start"))
            .cast("int")
            .alias("n_tokens"),
        )
    )


_PACK_TARGET = 2048


@query(
    "corpus_pack_sequences",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
        FROM documents
    )
    SELECT doc_id, lang, n_tokens,
           CAST((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING) - n_tokens)
                // {_PACK_TARGET} AS BIGINT) AS bin_id
    FROM t
    """,
)
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents to ~2048-token training bins by
    the offset-bucket rule (bin = cumulative tokens BEFORE the doc //
    target) within each language shard — the deterministic, shuffle-once
    approximation of first-fit packing (true first-fit is sequential;
    offset-bucketing differs only at bin boundaries and parallelizes).
    Packing within a stratum (lang) keeps the window partitioned — no
    global single-partition cumsum, which is the non-scalable formulation."""
    docs = load(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = docs.select("doc_id", "lang", n_tok.alias("n_tokens"))
    return t.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens")) / _PACK_TARGET
        ).alias("bin_id"),
    )


# Sorted-neighborhood window width: each row is compared to its next W
# neighbors in (head, doc_id) order within a (lang, 8-prefix) block, so
# candidate pairs are O(W·n) regardless of block skew.
_SN_WINDOW = 10


@query(
    "dedup_levenshtein_prefix",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang, substring(trim(lower(text)), 1, 40) AS head
        FROM documents
    ), r AS (
        SELECT doc_id, lang, head, substring(head, 1, 8) AS blk,
               row_number() OVER (
                   PARTITION BY lang, substring(head, 1, 8)
                   ORDER BY head, doc_id
               ) AS rn
        FROM t
    )
    SELECT least(a.doc_id, b.doc_id) AS id_a,
           greatest(a.doc_id, b.doc_id) AS id_b,
           CAST(levenshtein(a.head, b.head) AS INTEGER) AS edit_dist
    FROM r a JOIN r b
      ON a.lang = b.lang AND a.blk = b.blk
     AND b.rn BETWEEN a.rn + 1 AND a.rn + {_SN_WINDOW}
    WHERE levenshtein(a.head, b.head) <= 12
    """,
)
def dedup_levenshtein_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy near-dup pairs by edit distance over document heads —
    the entity-resolution flavor of dedup (typos and small edits that
    token-set Jaccard misses).

    Blocking is (lang, 8-char prefix) **plus a sorted-neighborhood
    window** (Hernandez & Stolfo's merge/purge): rows are ranked by
    (head, doc_id) inside the block and each row is compared only to
    its next ``_SN_WINDOW`` neighbors. A plain prefix block is O(b²)
    in block size — a hot boilerplate prefix ("click here to…") at
    corpus scale is a quadratic skew bomb (measured: 5.72× wall-clock
    for 10× data at sf1, the worst curve in BENCH_SF1_r05). The window
    caps candidate pairs at W·n; near-identical heads sort adjacent, so
    edit-close pairs land inside the window.

    **Recall contract (W-bounded, deliberate)**: only pairs within
    ``_SN_WINDOW`` sorted ranks of each other inside a block are ever
    compared — an edit-close pair whose heads sort > W apart is NOT
    reported. That is the standard merge/purge trade (bounded candidates
    for bounded recall); it is quantified, not silent:
    ``test_sorted_neighborhood_recall_vs_full_block_quantified`` measures
    recall vs the full-block all-pairs reference on a hot-block fixture
    (95/105 at n=15, W=10), and adjacency completeness is
    property-tested. Raise ``_SN_WINDOW`` (or add a second sort pass on
    reversed heads — multi-pass SNM) to buy recall linearly.

    The neighbor join is a true 3-key EQUI-join — the a-side explodes
    each row into W (rn+j) probe keys — so Spark never enumerates a
    block's full cross product the way a 2-key join + rn-range filter
    would (plan-pinned by
    ``test_levenshtein_neighbor_join_is_bounded_equi_join``).
    """
    docs = load(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "lang",
        F.substring(F.trim(F.lower(F.col("text"))), 1, 40).alias("head"),
    )
    w = Window.partitionBy("lang", "blk").orderBy("head", "doc_id")
    r = t.withColumn("blk", F.substring("head", 1, 8)).withColumn(
        "rn", F.row_number().over(w)
    )
    a = r.select(
        F.col("doc_id").alias("doc_a"), "lang", "blk",
        F.col("head").alias("head_a"),
        # each row probes for its next W neighbors: rn+1 … rn+W
        F.explode(
            F.sequence(F.col("rn") + 1, F.col("rn") + _SN_WINDOW)
        ).alias("rn_peer"),
    )
    # The probe side's shuffle BYTES are tiny (ranks + 40-char heads) but
    # its CPU is the whole levenshtein budget; AQE sizes partitions by
    # bytes, so at mid scales it coalesces the window exchange to ~1
    # partition and the scoring stage runs single-task (measured: a 6 s
    # one-task stage at 10× data). The build side is a broadcast (no key
    # partitioning required of the probes — and a sort-merge promotion
    # at larger scale re-shuffles by key anyway), so spread the probes
    # round-robin to full width; explicit N is exempt from AQE coalesce.
    a = a.repartition(spark.sparkContext.defaultParallelism)
    b = r.select(
        F.col("doc_id").alias("doc_b"), F.col("lang").alias("lang_b"),
        F.col("blk").alias("blk_b"), F.col("head").alias("head_b"),
        F.col("rn").alias("rn_b"),
    )
    dist = F.levenshtein("head_a", "head_b")
    return (
        a.join(
            b,
            (F.col("lang") == F.col("lang_b"))
            & (F.col("blk") == F.col("blk_b"))
            & (F.col("rn_peer") == F.col("rn_b")),
        )
        .filter(dist <= 12)
        .select(
            F.least("doc_a", "doc_b").alias("id_a"),
            F.greatest("doc_a", "doc_b").alias("id_b"),
            dist.cast("int").alias("edit_dist"),
        )
    )


@query(
    "corpus_tfidf_top_terms",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
        FROM documents
    ),
    tf AS (
        SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token
    ),
    df AS (
        SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY token
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.token,
               ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
        FROM tf JOIN df USING (token) CROSS JOIN n
    )
    SELECT doc_id, token, tfidf FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY tfidf DESC, token) AS rn
        FROM scored
    ) WHERE rn <= 5
    """,
)
def corpus_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: the 5 most characteristic terms per document — the
    keyword-extraction / relevance-weighting primitive. Plan: one explode
    + two aggregations (term frequency per doc, document frequency per
    token), then a plain token EQUI-join tf⋈df — no broadcast hint. The
    df table is |vocab|-cardinality, and at web scale the typo/noise
    vocabulary is unbounded, so forcing it into executor memory is a
    scale hazard (VERDICT r6 "what's wrong" #2); AQE still chooses a
    broadcast at runtime when the measured size fits
    `spark.sql.autoBroadcastJoinThreshold`, so the toy-scale plan loses
    nothing. The 1-row corpus count is fetched as a scalar (not
    cross-joined). Scores are rounded to 1e-6 BEFORE
    ranking: Spark's Math.log and DuckDB's libm log can differ in the
    last ulp, and ranking on the raw double would let a 1e-15 gap decide
    a top-5 boundary differently per engine; after rounding, ties break
    by token."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("token")
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = toks.groupBy("token").agg(F.count_distinct("doc_id").alias("df"))
    # the corpus size is ONE scalar — fetch it once (same pattern as the
    # sim_topk probe vector) rather than cross-joining a 1-row frame,
    # which plans as a nested-loop join
    n_docs = float(docs.count())
    scored = tf.join(dfreq, "token").select(
        "doc_id",
        "token",
        F.round(F.col("tf") * F.log(F.lit(n_docs) / F.col("df")), 6).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "token")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("doc_id", "token", "tfidf")
    )


@query(
    "dedup_levenshtein_snm2",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang, substring(trim(lower(text)), 1, 40) AS head
        FROM documents
    ),
    r1 AS (
        SELECT doc_id, lang, head, substring(head, 1, 8) AS blk,
               row_number() OVER (
                   PARTITION BY lang, substring(head, 1, 8)
                   ORDER BY head, doc_id
               ) AS rn
        FROM t
    ),
    r2 AS (
        SELECT doc_id, lang, head, substring(head, 1, 8) AS blk,
               row_number() OVER (
                   PARTITION BY lang, substring(head, 1, 8)
                   ORDER BY reverse(head), doc_id
               ) AS rn
        FROM t
    ),
    cand AS (
        SELECT a.doc_id AS da, b.doc_id AS db, a.head AS ha, b.head AS hb
        FROM r1 a JOIN r1 b
          ON a.lang = b.lang AND a.blk = b.blk
         AND b.rn BETWEEN a.rn + 1 AND a.rn + {_SN_WINDOW}
        UNION ALL
        SELECT a.doc_id, b.doc_id, a.head, b.head
        FROM r2 a JOIN r2 b
          ON a.lang = b.lang AND a.blk = b.blk
         AND b.rn BETWEEN a.rn + 1 AND a.rn + {_SN_WINDOW}
    )
    SELECT DISTINCT least(da, db) AS id_a, greatest(da, db) AS id_b,
           CAST(levenshtein(ha, hb) AS INTEGER) AS edit_dist
    FROM cand
    WHERE levenshtein(ha, hb) <= 12
    """,
)
def dedup_levenshtein_snm2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-PASS sorted-neighborhood edit-distance dedup (Hernandez &
    Stolfo's multi-pass merge/purge): the W-bounded recall contract of
    ``dedup_levenshtein_prefix`` is bought back by a second pass that
    re-ranks each block by the REVERSED head — pairs whose heads differ
    early (scattered > W apart in forward order) but agree late sort
    adjacent in reverse order and land inside the second window. Each
    pass is the same O(W·n) exploded-rank equi-join plan (probe side
    spread to full width against AQE byte-coalescing); the union is
    pair-DISTINCT, so the output is a strict superset of the one-pass
    query at exactly 2× the bounded candidate budget. Recall gain is
    quantified by ``test_snm2_second_pass_buys_recall``.
    """
    docs = load(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "lang",
        F.substring(F.trim(F.lower(F.col("text"))), 1, 40).alias("head"),
    ).withColumn("blk", F.substring("head", 1, 8))

    def one_pass(sort_key):
        w = Window.partitionBy("lang", "blk").orderBy("skey", "doc_id")
        r = t.withColumn("skey", sort_key).withColumn(
            "rn", F.row_number().over(w)
        )
        a = r.select(
            F.col("doc_id").alias("doc_a"), "lang", "blk",
            F.col("head").alias("head_a"),
            F.explode(
                F.sequence(F.col("rn") + 1, F.col("rn") + _SN_WINDOW)
            ).alias("rn_peer"),
        ).repartition(spark.sparkContext.defaultParallelism)
        b = r.select(
            F.col("doc_id").alias("doc_b"), F.col("lang").alias("lang_b"),
            F.col("blk").alias("blk_b"), F.col("head").alias("head_b"),
            F.col("rn").alias("rn_b"),
        )
        return a.join(
            b,
            (F.col("lang") == F.col("lang_b"))
            & (F.col("blk") == F.col("blk_b"))
            & (F.col("rn_peer") == F.col("rn_b")),
        ).select("doc_a", "doc_b", "head_a", "head_b")

    cand = one_pass(F.col("head")).unionAll(one_pass(F.reverse(F.col("head"))))
    dist = F.levenshtein("head_a", "head_b")
    return (
        cand.filter(dist <= 12)
        .select(
            F.least("doc_a", "doc_b").alias("id_a"),
            F.greatest("doc_a", "doc_b").alias("id_b"),
            dist.cast("int").alias("edit_dist"),
        )
        .distinct()
    )


@query(
    "corpus_leakage_safe_split",
    oracle="""
    WITH RECURSIVE t AS (
        SELECT doc_id, lang, n_chars // 50 AS b1, (n_chars + 25) // 50 AS b2,
               list_distinct(string_split_regex(trim(lower(text)), '\\s+')) AS grams
        FROM documents
    ),
    p AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM t a JOIN t b
          ON a.lang = b.lang AND a.b1 = b.b1 AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
              / CAST(len(a.grams) + len(b.grams)
                     - len(list_intersect(a.grams, b.grams)) AS DOUBLE) >= 0.5
        UNION
        SELECT a.doc_id, b.doc_id
        FROM t a JOIN t b
          ON a.lang = b.lang AND a.b2 = b.b2 AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
              / CAST(len(a.grams) + len(b.grams)
                     - len(list_intersect(a.grams, b.grams)) AS DOUBLE) >= 0.5
    ),
    sym AS (
        SELECT id_a AS src, id_b AS dst FROM p
        UNION
        SELECT id_b, id_a FROM p
    ),
    reach(src, dst) AS (
        SELECT src, dst FROM sym
        UNION
        SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src
    ),
    lbl AS (
        SELECT src AS node, LEAST(src, MIN(dst)) AS label
        FROM reach GROUP BY src
    )
    SELECT d.doc_id,
           COALESCE(l.label, d.doc_id) AS group_id,
           CASE WHEN (COALESCE(l.label, d.doc_id) % 100000007)
                     * 2654435761 % 4294967296 < 429496729
                THEN 'val' ELSE 'train' END AS split
    FROM documents d LEFT JOIN lbl l ON l.node = d.doc_id
    """,
)
def corpus_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/validation split: assign WHOLE near-dup
    clusters — not individual documents — to splits, so no document in
    the validation set has a near-duplicate in the training set (the
    contamination that silently inflates held-out metrics; doc-level
    random splits leak through every near-dup pair). Group id = the
    connected-component label from the exact-Jaccard pair graph;
    unpaired documents are their own singleton group. Split membership
    is the same deterministic Knuth multiplicative hash as
    ``corpus_stratified_sample`` applied to the GROUP id (~10% val), so
    the split is a pure function of content clusters — reproducible
    across runs, partitionings, and engines, and every member of a
    cluster lands on the same side by construction.

    RECALL CONTRACT (exact): the pair graph comes from TWO
    prefix-filter passes blocked on ``(lang, length-bucket)`` with the
    two 50-char bucket grids offset by 25 chars (the multi-pass
    merge/purge lesson from ``dedup_levenshtein_snm2``). Two grids of
    width 50 offset by half a cell cover every length interval of
    ≤ 25 chars, so ANY same-lang pair whose ``n_chars`` differ by at
    most 25 is guaranteed candidacy — in particular near-dups
    straddling a single bucket boundary (149 vs 151 chars: one deleted
    word), which single-grid blocking provably misses (VERDICT r7
    What's-wrong #1). Pairs differing by MORE than 25 chars may still
    be missed; at Jaccard ≥ 0.5 over unigram token sets such a pair
    needs ≥ 25 chars of net insertion, which the threshold itself
    bounds away for all but very long documents. Cross-``lang``
    near-dups are out of contract by design. Scale: both passes are
    the measured linear-shuffle prefix-filter path (BENCH_SF1 curves),
    and the union is pair-distinct, so the candidate budget is exactly
    2× single-pass. The label join is a plain doc_id equi-join (labels
    ≤ |paired docs| rows, no broadcast hint — AQE decides) and the
    hash split is map-side. The oracle recomputes components from the
    same two-grid pair union with a recursive transitive-closure CTE —
    an independent algorithm, so cluster-atomicity itself is
    verified. Straddle-pair recall is pinned by
    ``test_leakage_safe_split_cluster_atomic``.

    Plan note: the two grids run as ONE prefix-filter pass, not two —
    the gram arrays, global rarest-first token order, and prefix sets
    are blocking-independent, so they are computed once; only the
    candidate join fans out ×2 over an exploded (grid, lang, bucket)
    key (``ngram_jaccard_pairs(block_grids=...)``), and the verify join
    runs once per distinct pair. Measured at sf0.1 this multi-grid plan
    beats both running the whole pipeline per grid and exploding the
    input rows."""
    docs = load(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, "text", "doc_id", block_cols=[],
        threshold=0.5, ngram=1,
        block_grids=[
            [F.col("lang"), F.floor(F.col("n_chars") / 50)],
            [F.col("lang"), F.floor((F.col("n_chars") + 25) / 50)],
        ],
    ).select("id_a", "id_b")
    labels = connected_components(pairs).withColumnRenamed("node", "doc_id")
    grouped = (
        docs.select("doc_id")
        .join(labels, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("label", "doc_id").alias("group_id"),
        )
    )
    keep_hash = (F.col("group_id") % 100000007) * 2654435761 % 4294967296
    return grouped.select(
        "doc_id",
        "group_id",
        F.when(keep_hash < 429496729, F.lit("val"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


@query(
    "corpus_boilerplate_scrub",
    # ORACLE FIXTURE CAP: generate_series(0,383) assumes <= 384 words per
    # document (TESTDATA.md docs are <= ~100 words). Engine side is
    # unbounded; widen if a future fixture grows.
    oracle="""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    win AS (
        SELECT doc_id, g.i AS pos,
               array_to_string(list_slice(w, g.i * 3 + 1, g.i * 3 + 3), ' ')
                   AS wtext
        FROM words, generate_series(0, 383) g(i)
        WHERE g.i < CAST(ceil(len(w) / 3.0) AS BIGINT)
    ),
    sh AS (
        SELECT doc_id,
               array_to_string(list_slice(w, g.i + 1, g.i + 3), ' ') AS wtext
        FROM words, generate_series(0, 383) g(i)
        WHERE g.i < len(w)
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    flag AS (
        SELECT wtext FROM sh
        GROUP BY wtext
        HAVING COUNT(DISTINCT doc_id) * 5 >= (SELECT n_docs FROM n)
    ),
    marked AS (
        SELECT w.doc_id, w.pos, w.wtext, f.wtext IS NOT NULL AS boiler
        FROM win w LEFT JOIN flag f USING (wtext)
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT)
               AS n_boiler_windows,
           md5(string_agg(CASE WHEN NOT boiler THEN wtext END, ' '
                          ORDER BY pos)) AS cleaned_md5
    FROM marked
    GROUP BY doc_id
    """,
)
def corpus_boilerplate_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate removal: drop every aligned 3-word
    window whose exact text occurs — AT ANY WORD OFFSET — in >= 20% of
    the corpus's documents (template chrome — navigation, banners,
    footers — is text SHARED across pages; the intra-doc scrub
    ``corpus_remove_repetition`` cannot see it) and reassemble the
    survivors per document. Detection counts document frequency over
    stride-1 shingles, so boilerplate preceded by different-length
    prefixes in different documents still accumulates its df votes
    (VERDICT r7 What's-wrong #2 — aligned-only counting could miss it
    entirely); removal stays aligned-window-granular (see
    ``scrub_boilerplate_windows`` for the exact recall/granularity
    contract). The 20% threshold is integer-exact on both engines
    (df·5 >= n_docs). The flagged set is corpus-size-INDEPENDENT by
    construction (<= mean words-per-doc / 0.2 distinct shingles can
    clear the bar), so at 100 TB the join-back is effectively a
    broadcast — but carries no hint; AQE decides from measured size
    (the tfidf lesson). Oracle rebuilds shingles, windows, the df
    threshold, and the reassembled digest independently; docs that are
    100% boilerplate yield NULL digests on both engines."""
    from pubic_multi_platform_to_postgres_spark.operators.textstats import (
        scrub_boilerplate_windows,
    )

    docs = load(spark, sf_dir, "documents")
    # one scalar (benign 1-row fetch, same class as the tfidf corpus
    # count): the absolute doc threshold for the 20% rule
    n_docs = docs.count()
    min_docs = -(-n_docs // 5)  # ceil(n/5): df*5 >= n  <=>  df >= ceil(n/5)
    out = scrub_boilerplate_windows(
        docs, "text", "doc_id", min_docs=min_docs, window_words=3
    )
    return out.select(
        F.col("id").alias("doc_id"), "n_windows", "n_boiler_windows",
        "cleaned_md5",
    )


def _ann_recall_oracle_sql(
    n_probes: int = 8, n_cells: int = 16, nprobe: int = 4, k: int = 10
) -> str:
    """DuckDB replay of the IVF recall evaluation: the same seeded
    quantizer as ``sim_topk_ivf`` generalized over the ``n_probes``
    lowest-id query vectors (cell assignment is probe-independent, so
    it is computed once), exact brute-force top-k per probe, and
    recall = |ivf top-k ∩ exact top-k| / k — one division of two small
    exact integers. Every cosine is the shared strict-fold expression,
    so both rankings agree bit-for-bit and the sets are identical even
    at top-k boundary ties (ties break by vec_id on both engines)."""
    vc = _COS.format(a="e.v", b="cv")
    cq = _COS.format(a="cv", b="qs.qv")
    ac = _COS.format(a="a.v", b="qs.qv")
    bc = _COS.format(a="e.v", b="qs.qv")
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    qs AS (SELECT vec_id AS pid, v AS qv FROM e ORDER BY vec_id LIMIT {n_probes}),
    cents AS (
        SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cidx, v AS cv
        FROM e ORDER BY vec_id LIMIT {n_cells}
    ),
    assign AS (
        SELECT vec_id, v, cidx FROM (
            SELECT e.vec_id, e.v, cidx,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                      ORDER BY {vc} DESC, cidx) AS rn
            FROM e CROSS JOIN cents
        ) WHERE rn = 1
    ),
    probes AS (
        SELECT pid, cidx FROM (
            SELECT qs.pid, cidx,
                   ROW_NUMBER() OVER (PARTITION BY qs.pid
                                      ORDER BY {cq} DESC, cidx) AS rn
            FROM cents CROSS JOIN qs
        ) WHERE rn <= {nprobe}
    ),
    ivf_topk AS (
        SELECT pid, vec_id FROM (
            SELECT p.pid, a.vec_id,
                   ROW_NUMBER() OVER (PARTITION BY p.pid
                                      ORDER BY {ac} DESC, a.vec_id) AS rn
            FROM assign a JOIN probes p ON a.cidx = p.cidx
            JOIN qs ON qs.pid = p.pid
        ) WHERE rn <= {k}
    ),
    brute_topk AS (
        SELECT pid, vec_id FROM (
            SELECT qs.pid, e.vec_id,
                   ROW_NUMBER() OVER (PARTITION BY qs.pid
                                      ORDER BY {bc} DESC, e.vec_id) AS rn
            FROM e CROSS JOIN qs
        ) WHERE rn <= {k}
    )
    SELECT b.pid AS probe_id,
           SUM(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END) / 10.0
               AS recall_at_10
    FROM brute_topk b LEFT JOIN ivf_topk i
      ON i.pid = b.pid AND i.vec_id = b.vec_id
    GROUP BY b.pid
    """


@query("ann_recall_at_k", oracle=_ann_recall_oracle_sql())
def ann_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index QUALITY measurement — the evaluation loop every
    production vector index needs next to its build path: for a
    deterministic probe sample (the 8 lowest-id embeddings), compute
    exact brute-force top-10 and seeded-IVF(16 cells, 4 probes) top-10,
    and report per-probe recall@10 = |approx ∩ exact| / 10. Probe count
    is a CONSTANT sample by design — at 100 TB you evaluate recall on a
    sampled probe set, never per corpus row — so the plan is 8 unioned
    constant-size top-k subplans (each a TakeOrderedAndProject /
    bounded candidate rank, the measured `sim_topk_*` machinery) plus
    one tiny join; the 8-row probe fetch is the same benign collect
    class as the IVF centroids. Recall is one IEEE division of two
    small exact integers. The oracle replays quantization, probing,
    both rankings, and the overlap independently.

    Plan (re-planned after the first pin measured 8× scan
    amplification from a per-probe loop): the cell ASSIGNMENT is
    probe-independent and computed ONCE (checkpointed); both rankings
    then come from single-scan batched scoring
    (``multiprobe_partition_topk``) — every partition scores all 8
    probes in one pass over the embedding column and emits only its
    per-partition top-k heads, so the only shuffles are
    ≤ probes·k·partitions head rows into two tiny rank windows."""
    import numpy as np

    from pubic_multi_platform_to_postgres_spark.operators.similarity import (
        fold_dots,
        multiprobe_partition_topk,
        seeded_centroids,
        with_ivf_cell_cosine,
    )

    emb = load(spark, sf_dir, "embeddings")
    probes = (
        emb.orderBy("vec_id").select("vec_id", "embedding").limit(8).collect()
    )
    centroids = seeded_centroids(emb, "embedding", "vec_id", n_cells=16)
    cnorm = np.sqrt(np.cumsum(centroids * centroids, axis=1)[:, -1])

    def probe_cells(qv: list[float]) -> list[int]:
        # same nearest-cell rule as topk_cosine_ivf_seeded (ties → lowest)
        q = np.asarray(qv, dtype=np.float64)
        qn = np.sqrt(np.cumsum(q * q)[-1])
        qcos = fold_dots(centroids, q) / (cnorm * qn)
        return [int(i) for i in
                sorted(range(len(qcos)), key=lambda i: (-qcos[i], i))[:4]]

    plist = [(p["vec_id"], [float(x) for x in p["embedding"]]) for p in probes]
    celled = with_ivf_cell_cosine(emb, "embedding", centroids).localCheckpoint(
        eager=False
    )
    heads_b = multiprobe_partition_topk(
        celled, "embedding", "vec_id",
        [(pid, qv, None) for pid, qv in plist], k=10, cell_col="cell",
    )
    heads_i = multiprobe_partition_topk(
        celled, "embedding", "vec_id",
        [(pid, qv, probe_cells(qv)) for pid, qv in plist], k=10,
        cell_col="cell",
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), "vec_id")
    brute = (
        heads_b.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10).select("probe_id", "vec_id")
    )
    ivf = (
        heads_i.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10).select("probe_id", "vec_id")
        .withColumn("hit", F.lit(1))
    )
    return (
        brute.join(ivf, ["probe_id", "vec_id"], "left")
        .groupBy("probe_id")
        .agg((F.sum(F.coalesce("hit", F.lit(0))) / F.lit(10.0)).alias("recall_at_10"))
    )


def _curation_funnel_oracle_sql() -> str:
    """DuckDB replay of the curation funnel: per-doc stage-survival
    flags (each stage = previous AND its own predicate) + first-wins
    exact-dedup rank, aggregated to per-stage survivor counts — all
    integers, so the gate is exact. The quality-score and langid
    expressions are the SAME SQL the `text_quality_scores` /
    `text_langid` oracles use (both independently gate-green), so the
    double comparison at the quality threshold cannot drift."""
    langs = list(LANG_STOPWORDS)
    cnt = {
        lg: f"CAST(len(regexp_extract_all(lower(text), '{_STOP_SQL[lg]}')) AS BIGINT)"
        for lg in langs
    }
    best = "greatest(" + ", ".join(cnt[lg] for lg in langs) + ")"
    case = "CASE "
    for lg in langs:
        case += f"WHEN {best} > 0 AND {cnt[lg]} = {best} THEN '{lg}' "
    case += "ELSE 'und' END"
    return f"""
    WITH f AS (
        SELECT doc_id, n_chars, md5(text) AS fp,
               CAST(length(text) AS DOUBLE) AS nc,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS nt,
               CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE) AS punct,
               CAST(len(regexp_extract_all(lower(text), '{_STOP_SQL["en"]}')) AS DOUBLE)
                   AS stop,
               {case} AS detected
        FROM documents
    ),
    s AS (
        SELECT doc_id, fp,
               (n_chars >= 150) AS s1,
               least(nt / 64.0, 1.0) * 0.4
                 + least((stop / nt) * 4.0, 1.0) * 0.4
                 + (1.0 - least((punct / nc) * 10.0, 1.0)) * 0.2 AS qs,
               detected
        FROM f
    ),
    g AS (
        SELECT doc_id, fp, s1,
               (s1 AND qs >= 0.5) AS s2,
               (s1 AND qs >= 0.5 AND detected <> 'und') AS s3
        FROM s
    ),
    r AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY s3 DESC, doc_id)
                      AS rn
        FROM g
    )
    SELECT 0 AS stage_idx, 'raw' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs FROM r
    UNION ALL
    SELECT 1, 'min_length', CAST(SUM(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) FROM r
    UNION ALL
    SELECT 2, 'quality', CAST(SUM(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) FROM r
    UNION ALL
    SELECT 3, 'langid', CAST(SUM(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) FROM r
    UNION ALL
    SELECT 4, 'exact_dedup',
           CAST(SUM(CASE WHEN s3 AND rn = 1 THEN 1 ELSE 0 END) AS BIGINT) FROM r
    """


@query("corpus_curation_funnel", oracle=_curation_funnel_oracle_sql())
def corpus_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation-pipeline ATTRITION funnel: how many documents survive
    each stage of the standard filter chain — raw → min-length →
    composite quality ≥ 0.5 → confident language ID → exact dedup
    (first-wins by content hash). The per-stage counts are the number
    every corpus-curation run reports (and the number that catches a
    mis-tuned filter silently dropping 90% of a language). One pass:
    all stage flags are map-side column expressions over one doc_id
    join of the quality-feature projection (each stage ANDs the
    previous — monotone by construction), the dedup stage is one
    row_number window on the content hash (survivors ranked first), and
    the funnel is a single aggregate exploded to (stage_idx, stage,
    n_docs) rows. At 100 TB: one |docs|-row equi-join, one bounded
    window shuffle on fp, one aggregate — no per-stage repeat scans of
    the corpus."""
    from pubic_multi_platform_to_postgres_spark.operators.textstats import (
        quality_features,
    )

    docs = load(spark, sf_dir, "documents")
    qf = quality_features(docs, "text", "doc_id").select("doc_id", "quality_score")
    base = docs.select(
        "doc_id", "n_chars",
        F.md5("text").alias("fp"),
        lang_id(F.col("text")).alias("detected"),
    ).join(qf, "doc_id")
    s1 = F.col("n_chars") >= 150
    s2 = s1 & (F.col("quality_score") >= 0.5)
    s3 = s2 & (F.col("detected") != "und")
    w = Window.partitionBy("fp").orderBy(F.col("s3").desc(), F.col("doc_id"))
    flags = (
        base.select("doc_id", "fp", s1.alias("s1"), s2.alias("s2"), s3.alias("s3"))
        .withColumn("rn", F.row_number().over(w))
    )
    agg = flags.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(F.col("s1").cast("long")).alias("n1"),
        F.sum(F.col("s2").cast("long")).alias("n2"),
        F.sum(F.col("s3").cast("long")).alias("n3"),
        F.sum((F.col("s3") & (F.col("rn") == 1)).cast("long")).alias("n4"),
    )
    def stage(i, name, col):
        return F.struct(
            F.lit(i).alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.col(col).alias("n_docs"),
        )

    stages = F.array(
        stage(0, "raw", "n0"),
        stage(1, "min_length", "n1"),
        stage(2, "quality", "n2"),
        stage(3, "langid", "n3"),
        stage(4, "exact_dedup", "n4"),
    )
    return agg.select(F.explode(stages).alias("s")).select("s.*")


# ---------------------------------------------------------------------------
# Corpus-trained data selection / classification

_DSIR_B = 1024  # hashed-unigram feature width (DSIR's fixed bucket count)


def _hashed_bucket_cte(where: str = "") -> str:
    """DuckDB replay of :func:`hashed_token_counts` over ``documents``
    (md5 60-bit token hash → mod-B bucket)."""
    return f"""
    toks AS (
        SELECT doc_id, source,
               unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
        FROM documents {where}
    ),
    bkts AS (
        SELECT doc_id, source,
               ('0x' || substr(md5(tok), 1, 15))::BIGINT % {_DSIR_B} AS bkt
        FROM toks
    )"""


def _dsir_oracle_sql() -> str:
    """DuckDB replay of the DSIR selection: hashed-unigram bucket counts
    → integer-quantized smoothed probabilities per side (target =
    ``src0``, raw = everything else) → micro-nat LLR weights → exact
    integer per-doc scores → nearest-rank top-decile keep BY VALUE.
    DuckDB ranks with one full-sort window; the Spark plan reaches the
    same threshold scalar via the boundary-bucket histogram."""
    return f"""
    WITH {_hashed_bucket_cte()},
    cnt AS (
        SELECT bkt,
               COUNT(*) FILTER (source = 'src0') AS ct,
               COUNT(*) FILTER (source <> 'src0') AS cr
        FROM bkts GROUP BY bkt
    ),
    tot AS (
        SELECT SUM(ct) AS nt, SUM(cr) AS nr FROM cnt
    ),
    w AS (
        SELECT g.x AS bkt,
               CAST(round((ln((COALESCE(c.ct, 0) + 1) * 1000000000
                              // ((SELECT nt FROM tot) + {_DSIR_B}))
                         - ln((COALESCE(c.cr, 0) + 1) * 1000000000
                              // ((SELECT nr FROM tot) + {_DSIR_B})))
                          * 1000000, 0) AS BIGINT) AS llr_q
        FROM generate_series(0, {_DSIR_B - 1}) g(x)
        LEFT JOIN cnt c ON c.bkt = g.x
    ),
    dc AS (
        SELECT doc_id, source, bkt, COUNT(*) AS c
        FROM bkts WHERE source <> 'src0'
        GROUP BY doc_id, source, bkt
    ),
    scores AS (
        SELECT d.doc_id, d.source,
               CAST(SUM(d.c * w.llr_q) AS BIGINT) AS sq,
               CAST(SUM(d.c) AS BIGINT) AS n_tokens
        FROM dc d JOIN w USING (bkt)
        GROUP BY d.doc_id, d.source
    ),
    ranked AS (
        SELECT sq, ROW_NUMBER() OVER (ORDER BY sq DESC, doc_id) AS rn,
               COUNT(*) OVER () AS n
        FROM scores
    ),
    thr AS (SELECT MIN(sq) AS t FROM ranked WHERE rn <= (n + 9) // 10)
    SELECT doc_id, source, n_tokens,
           CAST(sq AS DOUBLE) / 1000000.0 AS dsir_logratio
    FROM scores, thr WHERE sq >= thr.t
    """


@query("corpus_dsir_select", oracle=_dsir_oracle_sql())
def corpus_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al., NeurIPS 2023): pick the raw-pool
    documents whose hashed-unigram statistics look most like a target
    domain. Target = ``source = 'src0'`` (the quality anchor — DSIR's
    Wikipedia role); every other document is the raw pool. Per-bucket
    importance weight = micro-nat-quantized log-likelihood ratio of the
    two add-one-smoothed bucket distributions; a document's score is
    the EXACT INTEGER sum ``Σ c_b·llr_q[b]`` (order-independent — the
    LM family's quantization discipline), and the top decile by score
    is kept BY VALUE via the boundary-bucket nearest-rank threshold
    (ties at the boundary all survive).

    Plan: token hashing is map-side; both model tables are B=1024 rows
    REGARDLESS of corpus size (the point of hashed features); scoring
    is one plain equi-join on the bucket (AQE broadcasts the 1024-row
    weight table at runtime — no forced hint) + one shuffle on doc id;
    the threshold comes from a ≤~4k-row histogram + one boundary
    bucket, never a global sort. One benign 1-row driver fetch (the
    threshold scalar — same class as the perplexity filter's). The
    md5 bucket hash makes the oracle replay exact; xxhash64 is the
    production hash (same dataflow)."""
    from pubic_multi_platform_to_postgres_spark.operators.classify import (
        LLR_SCALE,
        dsir_weights,
        hashed_token_counts,
        smoothed_bucket_profile,
    )

    docs = load(spark, sf_dir, "documents")
    counts = hashed_token_counts(
        docs, "text", "doc_id", "source", n_buckets=_DSIR_B, token_hash="md5"
    ).localCheckpoint(eager=False)
    side = F.when(F.col("source") == "src0", "target").otherwise("raw")
    # groups pinned explicitly: a fixture with no src0 docs still gets a
    # full add-one-smoothed target profile (matching the oracle's dense
    # generate_series grid) instead of an empty join side.
    prof = smoothed_bucket_profile(
        counts.select(side.alias("side"), "bkt", "c"),
        "side",
        n_buckets=_DSIR_B,
        groups=["target", "raw"],
    ).localCheckpoint(eager=False)
    w = dsir_weights(
        prof.filter(F.col("side") == "target"), prof.filter(F.col("side") == "raw")
    )
    scores = (
        counts.filter(F.col("source") != "src0")
        .join(w, "bkt")
        .groupBy("doc_id", "source")
        .agg(
            F.sum(F.col("c") * F.col("llr_q")).alias("sq"),
            F.sum("c").alias("n_tokens"),
        )
        .localCheckpoint(eager=False)
    )
    # top-decile nearest-rank threshold via the boundary-bucket histogram
    # (text_lm_perplexity_filter's device, descending): integer scores
    # bucket by floor(sq/2^20) — monotone, equal scores share a bucket —
    # so only ~one 2^20-wide slice is ever exactly ranked.
    from pubic_multi_platform_to_postgres_spark.operators.selection import (
        nearest_rank_scalar,
    )

    thr = nearest_rank_scalar(
        scores,
        "sq",
        F.floor(F.col("sq") / F.lit(float(1 << 20))).cast("long"),
        "(sum(c) over () + 9) div 10",
        descending=True,
    )
    out = scores.select(
        "doc_id",
        "source",
        "n_tokens",
        (F.col("sq").cast("double") / F.lit(float(LLR_SCALE))).alias("dsir_logratio"),
        "sq",
    )
    if thr is not None:  # empty raw pool: nothing to threshold
        out = out.filter(F.col("sq") >= F.lit(int(thr)))
    return out.drop("sq")


def _centroid_classifier_oracle_sql() -> str:
    """DuckDB replay of the nearest-centroid classifier: dense smoothed
    per-source profiles over hashed buckets (train split doc_id%10<8),
    exact-integer dot-product scores for the held-out docs, argmax with
    (score DESC, source) tie-break, aggregated to a confusion matrix."""
    return f"""
    WITH {_hashed_bucket_cte()},
    train AS (SELECT * FROM bkts WHERE doc_id % 10 < 8),
    cnt AS (SELECT source, bkt, COUNT(*) AS c FROM train GROUP BY source, bkt),
    tot AS (SELECT source, COUNT(*) AS n FROM train GROUP BY source),
    prof AS (
        SELECT t.source, g.x AS bkt,
               (COALESCE(c.c, 0) + 1) * 1000000000 // (t.n + {_DSIR_B}) AS pm
        FROM tot t CROSS JOIN generate_series(0, {_DSIR_B - 1}) g(x)
        LEFT JOIN cnt c ON c.source = t.source AND c.bkt = g.x
    ),
    test AS (
        SELECT doc_id, source AS true_source, bkt, COUNT(*) AS c
        FROM bkts WHERE doc_id % 10 >= 8
        GROUP BY doc_id, source, bkt
    ),
    sc AS (
        SELECT t.doc_id, t.true_source, p.source AS cand,
               SUM(t.c * p.pm) AS s
        FROM test t JOIN prof p USING (bkt)
        GROUP BY t.doc_id, t.true_source, p.source
    ),
    pred AS (
        SELECT true_source, cand AS pred_source,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY s DESC, cand) AS rn
        FROM sc
    )
    SELECT true_source, pred_source, COUNT(*) AS n_docs
    FROM pred WHERE rn = 1
    GROUP BY true_source, pred_source
    """


@query("corpus_centroid_classifier", oracle=_centroid_classifier_oracle_sql())
def corpus_centroid_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-TRAINED source classifier — the fastText-style curation
    classifier role (GPT-3/CCNet quality filtering trains exactly this
    shape of linear model over hashed n-gram features): train Rocchio
    nearest-centroid profiles per ``source`` on the 80% split
    (``doc_id % 10 < 8``), classify the held-out 20%, and report the
    confusion matrix ``(true_source, pred_source, n_docs)`` — the
    curation metric that catches a collapsed or leaking domain label.

    Every score is an EXACT INTEGER (smoothed profiles use the LM
    family's ``(c+1)·10⁹ // (N+B)`` quantization; a doc×class score is
    ``Σ c_b·pm``), so the argmax is deterministic cross-engine with a
    (score DESC, source) tie-break — no floating-point anywhere.

    Plan: profiles are |sources|×1024 rows whatever the corpus size;
    scoring is one equi-join on the bucket with fan-out bounded by
    |sources| (partial aggregation runs map-side), one shuffle on
    (doc, class), one tiny window per doc for the argmax, and a
    |sources|²-row final aggregate. No driver fetch, no global sort,
    no forced broadcast."""
    from pubic_multi_platform_to_postgres_spark.operators.classify import (
        centroid_scores,
        hashed_token_counts,
        smoothed_bucket_profile,
    )

    docs = load(spark, sf_dir, "documents")
    counts = hashed_token_counts(
        docs, "text", "doc_id", "source", n_buckets=_DSIR_B, token_hash="md5"
    ).localCheckpoint(eager=False)
    prof = smoothed_bucket_profile(
        counts.filter(F.col("doc_id") % 10 < 8).select(
            F.col("source").alias("cand"), "bkt", "c"
        ),
        "cand",
        n_buckets=_DSIR_B,
    )
    test = counts.filter(F.col("doc_id") % 10 >= 8).select(
        "doc_id", F.col("source").alias("true_source"), "bkt", "c"
    )
    sc = centroid_scores(test, prof, "cand")
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_q"), "cand")
    return (
        sc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("true_source", F.col("cand").alias("pred_source"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def _lm_ccnet_buckets_oracle_sql() -> str:
    """DuckDB replay of the CCNet head/middle/tail assignment: the exact
    integer train→score pipeline of ``text_lm_self_perplexity``, then
    BOTH tercile thresholds by nearest rank (k₁=⌈n/3⌉, k₂=⌈2n/3⌉ over
    (mean_prob, doc_id)) and a BY-VALUE label: ``tail`` ≤ t₁ < ``middle``
    ≤ t₂ < ``head`` (high mean probability = low perplexity = head).

    ORACLE FIXTURE CAP: generate_series(1,1023) bounds bigram positions
    (TESTDATA.md max doc is 577 chars, pure ASCII)."""
    from pubic_multi_platform_to_postgres_spark.operators.textstats import (
        LM_ALPHABET,
        LM_DIM,
    )

    sym = (
        "CASE WHEN ascii(substr(norm, {i}, 1)) BETWEEN 97 AND 122 "
        "THEN ascii(substr(norm, {i}, 1)) - 97 ELSE {sp} END"
    )
    s1 = sym.format(i="g.i", sp=LM_ALPHABET - 1)
    s2 = sym.format(i="g.i + 1", sp=LM_ALPHABET - 1)
    return f"""
    WITH norm AS (
        SELECT doc_id, lower(text) AS norm FROM documents
    ),
    bg AS (
        SELECT doc_id, ({s1}) * {LM_ALPHABET} + ({s2}) AS idx
        FROM norm, generate_series(1, 1023) g(i)
        WHERE g.i + 1 <= length(norm)
    ),
    tot AS (SELECT COUNT(*) AS n FROM bg),
    tab AS (
        SELECT idx,
               (COUNT(*) + 1) * 1000000000 // ((SELECT n FROM tot) + {LM_DIM})
                   AS pm
        FROM bg GROUP BY idx
    ),
    s AS (
        SELECT b.doc_id, SUM(t.pm) AS sc, COUNT(*) AS nb
        FROM bg b JOIN tab t USING (idx)
        GROUP BY b.doc_id
    ),
    scores AS (
        SELECT doc_id, nb,
               (CAST(sc AS DOUBLE) / 1000000000.0) / nb AS mean_prob
        FROM s
    ),
    ranked AS (
        SELECT mean_prob,
               ROW_NUMBER() OVER (ORDER BY mean_prob, doc_id) AS rn,
               COUNT(*) OVER () AS n
        FROM scores
    ),
    t1 AS (SELECT MAX(mean_prob) AS v FROM ranked WHERE rn <= (n + 2) // 3),
    t2 AS (SELECT MAX(mean_prob) AS v FROM ranked WHERE rn <= (2 * n + 2) // 3)
    SELECT doc_id, nb AS n_bigrams, mean_prob,
           CASE WHEN mean_prob <= (SELECT v FROM t1) THEN 'tail'
                WHEN mean_prob <= (SELECT v FROM t2) THEN 'middle'
                ELSE 'head' END AS ccnet_bucket
    FROM scores
    """


@query("text_lm_ccnet_buckets", oracle=_lm_ccnet_buckets_oracle_sql())
def text_lm_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actual CCNet OUTPUT: every document labeled head / middle /
    tail by tercile of its corpus-trained LM score (high mean bigram
    probability = low perplexity = head). ``text_lm_perplexity_filter``
    drops the bottom decile; this keeps everything and attaches the
    quality stratum — the label downstream mixture/temperature sampling
    consumes (CCNet trains on head+middle, weights by stratum).

    Both tercile thresholds come from the boundary-bucket nearest-rank
    device over the SAME localCheckpointed score frame (two tiny
    histogram jobs + two 1-row fetches — never a global sort); labels
    are assigned BY VALUE, so boundary ties land in one stratum
    deterministically on every engine."""
    from pubic_multi_platform_to_postgres_spark.operators.selection import (
        nearest_rank_scalar,
    )

    scored = _lm_trained_scores(spark, sf_dir).localCheckpoint(eager=False)
    sc_f = scored.select(
        F.col("id").alias("doc_id"),
        F.col("nb").alias("n_bigrams"),
        ((F.col("sc").cast("double") / F.lit(1000000000.0)) / F.col("nb")).alias(
            "mean_prob"
        ),
    ).localCheckpoint(eager=False)
    bkt = F.floor(F.col("mean_prob") * 65536).cast("long")
    t1 = nearest_rank_scalar(
        sc_f, "mean_prob", bkt, "(sum(c) over () + 2) div 3"
    )
    t2 = nearest_rank_scalar(
        sc_f, "mean_prob", bkt, "(2 * sum(c) over () + 2) div 3"
    )
    if t1 is None:  # empty corpus
        return sc_f.withColumn("ccnet_bucket", F.lit("head"))
    return sc_f.withColumn(
        "ccnet_bucket",
        F.when(F.col("mean_prob") <= F.lit(float(t1)), "tail")
        .when(F.col("mean_prob") <= F.lit(float(t2)), "middle")
        .otherwise("head"),
    )


def _source_divergence_oracle_sql() -> str:
    """DuckDB replay of the pairwise Jensen-Shannon divergence: dense
    smoothed per-source bucket profiles (integer pm), per-bucket JS
    terms with the single-division-then-ln form quantized to micro-nats
    (the ``corpus_tfidf_top_terms`` ulp-tolerance class), exact integer
    sums, one fixed-order final division."""
    return f"""
    WITH {_hashed_bucket_cte()},
    cnt AS (SELECT source, bkt, COUNT(*) AS c FROM bkts GROUP BY source, bkt),
    tot AS (SELECT source, COUNT(*) AS n FROM bkts GROUP BY source),
    prof AS (
        SELECT t.source, g.x AS bkt,
               (COALESCE(c.c, 0) + 1) * 1000000000 // (t.n + {_DSIR_B}) AS pm
        FROM tot t CROSS JOIN generate_series(0, {_DSIR_B - 1}) g(x)
        LEFT JOIN cnt c ON c.source = t.source AND c.bkt = g.x
    ),
    pairterms AS (
        SELECT a.source AS source_a, b.source AS source_b,
               a.pm * CAST(round(ln(2.0 * a.pm / (a.pm + b.pm)) * 1000000, 0)
                           AS BIGINT)
               + b.pm * CAST(round(ln(2.0 * b.pm / (a.pm + b.pm)) * 1000000, 0)
                             AS BIGINT) AS term
        FROM prof a JOIN prof b
          ON a.bkt = b.bkt AND a.source < b.source
    )
    SELECT source_a, source_b,
           CAST(CAST(SUM(term) AS BIGINT) AS DOUBLE)
               / 2000000000000000.0 AS js_divergence
    FROM pairterms
    GROUP BY source_a, source_b
    """


@query("corpus_source_divergence", oracle=_source_divergence_oracle_sql())
def corpus_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between every two sources'
    hashed-unigram distributions — the domain-shift map that drives
    mixture design (which sources are near-duplicates of each other,
    which add diversity) and catches a mislabeled or collapsed feed.
    JSD = ½KL(p‖m) + ½KL(q‖m), m = (p+q)/2, symmetric and bounded by
    ln 2.

    Exactness: profiles are the integer-quantized LM smoothing; each
    bucket's JS term computes ONE IEEE division (exact, both engines)
    then ``ln`` quantized to micro-nats (the tfidf ulp-tolerance
    class); per-pair sums are exact integers (|term| ≤ pm·ln2·10⁶ ≈
    7·10¹⁴ × 1024 buckets < 2⁶³), and the final division is one fixed
    double op.

    Plan: profiles are |sources|×1024 rows whatever the corpus size;
    the pair join is profile×profile on the bucket — |sources|²/2 ×
    1024 rows of MODEL-TABLE work, independent of corpus bytes; one
    aggregate on (source_a, source_b). The corpus itself is touched
    exactly once (the bucket-count aggregate)."""
    from pubic_multi_platform_to_postgres_spark.operators.classify import (
        hashed_token_counts,
        smoothed_bucket_profile,
    )

    docs = load(spark, sf_dir, "documents")
    counts = hashed_token_counts(
        docs, "text", "doc_id", "source", n_buckets=_DSIR_B, token_hash="md5"
    )
    prof = smoothed_bucket_profile(
        counts.select("source", "bkt", "c"), "source", n_buckets=_DSIR_B
    ).localCheckpoint(eager=False)
    a = prof.select(F.col("source").alias("source_a"), "bkt", F.col("pm").alias("pm_a"))
    b = prof.select(F.col("source").alias("source_b"), "bkt", F.col("pm").alias("pm_b"))
    term = F.expr(
        "pm_a * CAST(round(ln(2.0 * pm_a / (pm_a + pm_b)) * 1000000, 0) AS BIGINT)"
        " + pm_b * CAST(round(ln(2.0 * pm_b / (pm_a + pm_b)) * 1000000, 0) AS BIGINT)"
    )
    return (
        a.join(b, (a.bkt == b.bkt) & (F.col("source_a") < F.col("source_b")))
        .select("source_a", "source_b", term.alias("term"))
        .groupBy("source_a", "source_b")
        .agg(
            (F.sum("term").cast("double") / F.lit(2.0e15)).alias("js_divergence")
        )
    )


# ---------------------------------------------------------------------------
# Training-run data logistics

_SHUFFLE_EPOCHS = 3
_SHUFFLE_SHARDS = 1024


@query(
    "corpus_epoch_shuffle",
    oracle=f"""
    SELECT g.e AS epoch, d.doc_id,
           ('0x' || substr(md5(d.doc_id || ':' || g.e), 1, 15))::BIGINT AS pos,
           ('0x' || substr(md5(d.doc_id || ':' || g.e), 1, 15))::BIGINT
               % {_SHUFFLE_SHARDS} AS shard
    FROM documents d, generate_series(0, {_SHUFFLE_EPOCHS - 1}) g(e)
    """,
)
def corpus_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch training-order shuffle — the data-order
    reproducibility primitive every training run needs: each (doc,
    epoch) gets a seeded 60-bit position (md5 of ``doc_id:epoch``, so
    every epoch is an independent permutation, reproducible bit-for-bit
    across reruns and engines) plus a writer shard ``pos % 1024``.

    Pure map-side ×epochs — no shuffle, no state, no RNG object. The
    global training order within an epoch is ORDER BY pos; at 100 TB
    the writer range-partitions on pos (sortWithinPartitions after a
    range exchange — Spark's distributed total order), so no global
    single-reducer sort ever materializes and sharded output files are
    themselves in-order slices."""
    docs = load(spark, sf_dir, "documents")
    pos = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col("doc_id"), F.col("epoch"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return (
        docs.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(_SHUFFLE_EPOCHS - 1))).alias(
                "epoch"
            ),
        )
        .select("epoch", "doc_id", pos.alias("pos"))
        .withColumn("shard", F.col("pos") % _SHUFFLE_SHARDS)
    )


@query(
    "corpus_mixture_plan",
    oracle="""
    WITH n AS (
        SELECT source,
               CAST(SUM(len(string_split_regex(trim(lower(text)), '\\s+')))
                    AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ),
    q AS (
        SELECT source, n_tokens,
               CAST(round(sqrt(n_tokens) * 1000000, 0) AS BIGINT) AS sq_q
        FROM n
    ),
    t AS (
        SELECT SUM(sq_q) AS sq_tot, SUM(n_tokens) AS n_tot FROM q
    )
    SELECT q.source, q.n_tokens,
           CAST(q.sq_q AS DOUBLE) / (SELECT sq_tot FROM t) AS weight,
           CAST(CAST(q.sq_q AS HUGEINT) * ((SELECT n_tot FROM t) // 2)
                // (SELECT sq_tot FROM t) AS BIGINT) AS target_tokens,
           CAST(CAST(q.sq_q AS HUGEINT) * ((SELECT n_tot FROM t) // 2)
                // (SELECT sq_tot FROM t) AS DOUBLE) / q.n_tokens
               AS repeat_factor
    FROM q
    """,
)
def corpus_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The data RECIPE table (the LLaMA/Pile mixture computation):
    per-source token counts → temperature-flattened sampling weights
    ``w_s ∝ n_s^α`` with α=1/2 (sqrt damping: big sources are
    down-weighted, small ones up-weighted — the standard multilingual /
    multi-source rebalance), a target token budget of half the corpus,
    and each source's target tokens + repeat factor (>1 = that source
    will be epoch-repeated — the data-constrained scaling regime).

    Exactness: ``sqrt`` of an integer is a correctly-rounded IEEE op on
    every engine; it is quantized to micro-units and every downstream
    sum/allocation is exact integer arithmetic (``sq_q·B // Σsq_q``) —
    the only doubles in the output are single fixed-order divisions.
    The ``sq_q·budget`` product is computed in DECIMAL(38,0) (DuckDB:
    HUGEINT) — int64 alone would overflow once ``√n_s·10⁶ · n_tot/2``
    passes 2⁶³, i.e. around ~7·10⁸ total tokens; the widened product is
    exact to ~10³⁰-token corpora and the QUOTIENT (≤ budget < 2⁶³)
    always fits the int64 output column.
    Plan: one map-side token-count aggregate (the ONLY corpus-sized
    work), then |sources|-row arithmetic with an unpartitioned window
    over the tiny aggregate."""
    docs = load(spark, sf_dir, "documents")
    n = docs.groupBy("source").agg(
        F.sum(F.size(F.split(F.trim(F.lower("text")), r"\s+"))).alias("n_tokens")
    )
    return mixture_plan_from_counts(n)


def mixture_plan_from_counts(n: DataFrame) -> DataFrame:
    """The mixture arithmetic over a ``(source, n_tokens)`` counts table
    (factored so the int64-overflow guard is testable against synthetic
    100 TB-scale token counts without a 100 TB corpus)."""
    q = n.select(
        "source",
        "n_tokens",
        F.expr("CAST(round(sqrt(n_tokens) * 1000000, 0) AS BIGINT)").alias("sq_q"),
    )
    # unpartitioned windows over the |sources|-row aggregate (the tiny-
    # table idiom, not a corpus sort)
    q = q.select(
        "source",
        "n_tokens",
        "sq_q",
        F.expr("sum(sq_q) over ()").alias("sq_tot"),
        F.expr("sum(n_tokens) over () div 2").alias("budget"),
    )
    # DECIMAL(38,0)-widened product: sq_q·budget exceeds int64 past
    # ~7e8 total tokens (ANSI mode would raise; non-ANSI would wrap).
    target = "CAST(sq_q AS DECIMAL(38,0)) * budget div sq_tot"
    return q.select(
        "source",
        "n_tokens",
        (F.col("sq_q").cast("double") / F.col("sq_tot")).alias("weight"),
        F.expr(target).alias("target_tokens"),
        (F.expr(target).cast("double") / F.col("n_tokens")).alias("repeat_factor"),
    )


def _ivf_incremental_oracle_sql(n_cells: int = 16, batch_mod: int = 5) -> str:
    """DuckDB replay of the incremental-IVF maintenance report: frozen
    centroids from the CORPUS's lowest vec_ids, cosine argmax assignment
    of every vector (ties → lowest cell), per-cell corpus/batch
    occupancy over the dense cell grid."""
    vc = _COS.format(a="e2.v", b="cv")
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    corp AS (SELECT * FROM e WHERE vec_id % {batch_mod} <> 0),
    cents AS (
        SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cidx, v AS cv
        FROM corp ORDER BY vec_id LIMIT {n_cells}
    ),
    assign AS (
        SELECT e2.vec_id, e2.vec_id % {batch_mod} = 0 AS is_batch, cidx,
               ROW_NUMBER() OVER (PARTITION BY e2.vec_id
                                  ORDER BY {vc} DESC, cidx) AS rn
        FROM e e2 CROSS JOIN cents
    ),
    cnt AS (
        SELECT cidx,
               COUNT(*) FILTER (NOT is_batch) AS n_corpus,
               COUNT(*) FILTER (is_batch) AS n_batch
        FROM assign WHERE rn = 1 GROUP BY cidx
    )
    SELECT g.x AS cidx,
           CAST(COALESCE(c.n_corpus, 0) AS BIGINT) AS n_corpus,
           CAST(COALESCE(c.n_batch, 0) AS BIGINT) AS n_batch,
           CASE WHEN COALESCE(c.n_corpus, 0) > 0
                THEN CAST(c.n_batch AS DOUBLE) / c.n_corpus
           END AS batch_growth
    FROM generate_series(0, {n_cells - 1}) g(x)
    LEFT JOIN cnt c ON c.cidx = g.x
    """


@query("sim_incremental_ivf_assign", oracle=_ivf_incremental_oracle_sql())
def sim_incremental_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index MAINTENANCE — the incremental face of the IVF family
    (the dedup catalog already has exact and near-dup incremental
    screens; this is the vector-index analog): a new ingest batch
    (``vec_id % 5 = 0``) is assigned to the FROZEN quantizer trained on
    the landed corpus (the seeded centroids of ``sim_topk_ivf``), and
    the report is per-cell occupancy — corpus count, batch count, and
    batch growth ratio over the dense cell grid. A cell whose growth
    ratio runs hot is the re-train / re-balance trigger every serving
    IVF index monitors (unbalanced cells destroy probe recall).

    Plan: the centroid table is a 16-row driver collect (the IVF
    build-time cost, same as ``sim_topk_ivf``); assignment is one
    Arrow-batched map-side pass (strict-fold cosines under the gate,
    GEMM in bench mode); the occupancy aggregate carries (cell, flag)
    only; the dense grid is a 16-row range joined to the aggregate.
    At 100 TB only the assignment pass grows — embarrassingly
    parallel, no shuffle beyond the 16-group aggregate."""
    from pubic_multi_platform_to_postgres_spark.operators.similarity import (
        seeded_centroids,
        with_ivf_cell_cosine,
    )

    emb = load(spark, sf_dir, "embeddings")
    corp = emb.filter(F.col("vec_id") % 5 != 0)
    cents = seeded_centroids(corp, "embedding", "vec_id", n_cells=16)
    assigned = with_ivf_cell_cosine(
        emb.select("vec_id", "embedding"), "embedding", cents
    ).select(
        "cell", (F.col("vec_id") % 5 == 0).alias("is_batch")
    )
    cnt = assigned.groupBy("cell").agg(
        F.sum((~F.col("is_batch")).cast("long")).alias("n_corpus"),
        F.sum(F.col("is_batch").cast("long")).alias("n_batch"),
    )
    grid = spark.range(16).select(F.col("id").alias("cidx"))
    return grid.join(cnt, grid.cidx == cnt.cell, "left").select(
        "cidx",
        F.coalesce("n_corpus", F.lit(0)).alias("n_corpus"),
        F.coalesce("n_batch", F.lit(0)).alias("n_batch"),
        F.when(
            F.coalesce("n_corpus", F.lit(0)) > 0,
            F.col("n_batch").cast("double") / F.col("n_corpus"),
        ).alias("batch_growth"),
    )


@query(
    "multimodal_audio_features",
    # ORACLE FIXTURE CAP: generate_series(0,499) bounds sample positions
    # (n = 200 + doc_id % 300 ≤ 499 by construction — an algorithmic
    # constant of the synthesized clips, not a data-dependent guess).
    oracle="""
    WITH p AS (
        SELECT doc_id,
               200 + doc_id % 300 AS n,
               CASE WHEN doc_id % 2 = 0 THEN 8000 ELSE 16000 END AS rate,
               doc_id % 97 = 0 AS corrupt
        FROM documents
    ),
    s AS (
        SELECT p.doc_id, g.i,
               (p.doc_id * 7919 + g.i * 104729) % 65536 - 32768 AS v
        FROM p, generate_series(0, 499) g(i)
        WHERE NOT p.corrupt AND g.i < p.n
    ),
    lagged AS (
        SELECT doc_id, i, v,
               LAG(v) OVER (PARTITION BY doc_id ORDER BY i) AS prev
        FROM s
    ),
    f AS (
        SELECT doc_id,
               CAST(MAX(abs(v)) AS BIGINT) AS peak,
               CAST(SUM(CASE WHEN prev IS NOT NULL
                             AND ((v >= 0) <> (prev >= 0))
                        THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
               CAST(SUM(CAST(v AS BIGINT) * v) AS BIGINT) AS energy
        FROM lagged GROUP BY doc_id
    )
    SELECT p.doc_id, NOT p.corrupt AS decode_ok,
           CASE WHEN p.corrupt THEN NULL ELSE CAST(p.n AS BIGINT) END
               AS n_samples,
           CASE WHEN p.corrupt THEN NULL ELSE CAST(p.rate AS BIGINT) END
               AS sample_rate,
           CASE WHEN p.corrupt THEN NULL
                ELSE CAST(p.n * 1000 // p.rate AS BIGINT) END AS duration_ms,
           f.peak, f.zero_crossings, f.energy
    FROM p LEFT JOIN f USING (doc_id)
    """,
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decoding, gate-checked — the third modality beside
    images and GIF video: per document, synthesize a spec-conformant
    16-bit mono PCM WAV (RIFF container, length/rate derived from
    doc_id; every 97th container is TRUNCATED to exercise the
    dead-letter path), parse it back with the independent chunk-walking
    RIFF decoder, and emit the integer-exact triage features an audio
    curation pass filters on: duration, peak |amplitude| (clipping),
    zero-crossing count (silence/noise split), total energy. The oracle
    recomputes every feature from doc_id arithmetic, so the gate proves
    the encode→container-walk→decode→feature chain is bit-faithful —
    and that corrupt containers land as ``decode_ok = false`` rows with
    null features, never batch failures.

    Scale: both stages are Arrow-batched ``mapInPandas`` chained
    narrowly (blobs never shuffle, never reach the driver);
    embarrassingly parallel like the image tier."""
    from pubic_multi_platform_to_postgres_spark.operators.multimodal import (
        decode_audio_features,
        make_wav,
    )

    def render(batches):
        import pandas as pd

        for pdf in batches:
            blobs = []
            for d in pdf["doc_id"]:
                d = int(d)
                blob = make_wav(200 + d % 300, 8000 if d % 2 == 0 else 16000,
                                seed=d)
                blobs.append(blob[:11] if d % 97 == 0 else blob)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    docs = load(spark, sf_dir, "documents").select("doc_id")
    blobs = docs.mapInPandas(render, schema="doc_id long, blob binary")
    feats = decode_audio_features(blobs, "blob", "doc_id")
    return feats.select(
        F.col("id").alias("doc_id"), "decode_ok", "n_samples",
        "sample_rate", "duration_ms", "peak", "zero_crossings", "energy",
    )


@query(
    "multimodal_audio_silence",
    # ORACLE FIXTURE CAP: generate_series(0,698) bounds sample positions
    # (n = 100 + doc_id % 600 <= 699 by construction of the synthesized
    # clips — an algorithmic constant, not a data-dependent guess).
    oracle="""
    WITH p AS (
        SELECT doc_id,
               100 + doc_id % 600 AS n,
               doc_id % 89 = 0 AS corrupt
        FROM documents
    ),
    s AS (
        SELECT p.doc_id, g.i,
               CASE WHEN ((g.i // 64) + p.doc_id) % 4 = 0 THEN 0
                    ELSE (p.doc_id * 7919 + g.i * 104729) % 65536 - 32768
               END AS v
        FROM p, generate_series(0, 698) g(i)
        WHERE NOT p.corrupt AND g.i < (p.n // 64) * 64
    ),
    w AS (
        SELECT doc_id, g_w, MAX(abs(v)) AS peak,
               SUM(CAST(v AS BIGINT) * v) AS energy
        FROM (SELECT doc_id, i // 64 AS g_w, v FROM s)
        GROUP BY doc_id, g_w
    ),
    f AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN peak < 1000 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_silent,
               MIN(CASE WHEN peak >= 1000 THEN g_w END) AS first_active,
               MAX(CASE WHEN peak >= 1000 THEN g_w END) AS last_active,
               CAST(MAX(energy) AS BIGINT) AS max_window_energy
        FROM w GROUP BY doc_id
    )
    SELECT p.doc_id, NOT p.corrupt AS decode_ok,
           CASE WHEN p.corrupt THEN NULL
                ELSE CAST(p.n // 64 AS BIGINT) END AS n_windows,
           CASE WHEN p.corrupt THEN NULL
                ELSE COALESCE(f.n_silent, 0) END AS n_silent,
           CASE WHEN p.corrupt THEN NULL
                WHEN f.first_active IS NULL THEN CAST(p.n // 64 AS BIGINT)
                ELSE CAST(f.first_active AS BIGINT) END AS lead_trim,
           CASE WHEN p.corrupt THEN NULL
                WHEN f.last_active IS NULL THEN 0
                ELSE CAST(p.n // 64 - 1 - f.last_active AS BIGINT)
           END AS trail_trim,
           CASE WHEN p.corrupt THEN NULL
                ELSE COALESCE(f.max_window_energy, 0)
           END AS max_window_energy
    FROM p LEFT JOIN f USING (doc_id)
    """,
)
def multimodal_audio_silence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silence detection + trim decision over real WAV containers — the
    stage after decode in an audio curation pass: synthesize a PCM clip
    per document (length from doc_id; every 4th 64-sample block ZEROED
    at a doc-dependent phase to inject silence; every 89th container
    truncated for the dead-letter path), then compute non-overlapping
    64-sample window stats with :func:`audio_window_stats` — silent
    window count, leading/trailing silent-run lengths (the trim
    offsets), and the loudest window's energy. The oracle rebuilds every
    window from doc_id arithmetic, so the gate proves the whole
    encode→chunk-walk→reshape→classify chain integer-exact, including
    the all-silent and sub-window-tail edge cases.

    Scale: two chained Arrow-batched ``mapInPandas`` stages, narrow end
    to end (plan-pinned shuffle-free); blobs never shuffle or reach the
    driver."""
    from pubic_multi_platform_to_postgres_spark.operators.multimodal import (
        audio_window_stats,
        make_wav,
    )

    def render(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            blobs = []
            for d in pdf["doc_id"]:
                d = int(d)
                n = 100 + d % 600
                blob = bytearray(make_wav(n, 8000, seed=d))
                # zero every 4th 64-sample block (doc-dependent phase) by
                # patching the data chunk in place: samples start at byte
                # 44 in make_wav's fixed fmt+data layout, little-endian i2
                i = np.arange(n)
                mask = ((i // 64) + d) % 4 == 0
                pcm = np.frombuffer(bytes(blob[44:44 + 2 * n]), dtype="<i2").copy()
                pcm[mask] = 0
                blob[44:44 + 2 * n] = pcm.tobytes()
                blobs.append(bytes(blob[:11]) if d % 89 == 0 else bytes(blob))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    docs = load(spark, sf_dir, "documents").select("doc_id")
    blobs = docs.mapInPandas(render, schema="doc_id long, blob binary")
    stats = audio_window_stats(blobs, "blob", "doc_id",
                               window=64, silence_peak=1000)
    return stats.select(
        F.col("id").alias("doc_id"), "decode_ok", "n_windows", "n_silent",
        "lead_trim", "trail_trim", "max_window_energy",
    )


@query(
    "text_cms_heavy_hitters",
    oracle="""
    WITH toks AS (
        SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
        FROM documents
    ),
    tc AS (SELECT token, COUNT(*) AS n FROM toks GROUP BY token),
    probe AS (
        SELECT token, n, g.r,
               ('0x' || substr(md5(CAST(g.r AS VARCHAR) || '|' || token),
                               1, 15))::BIGINT % 256 AS bucket
        FROM tc, generate_series(0, 3) g(r)
    ),
    sketch AS (
        SELECT r, bucket, SUM(n) AS cell FROM probe GROUP BY r, bucket
    ),
    est AS (
        SELECT token, MIN(n) AS true_n, MIN(cell) AS cms_estimate
        FROM probe JOIN sketch USING (r, bucket)
        GROUP BY token
    )
    SELECT token, CAST(true_n AS BIGINT) AS true_n,
           CAST(cms_estimate AS BIGINT) AS cms_estimate,
           CAST(cms_estimate - true_n AS BIGINT) AS overestimate
    FROM est
    ORDER BY cms_estimate DESC, token
    LIMIT 20
    """,
)
def text_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters by Count-Min Sketch (Cormode & Muthukrishnan 2005),
    the sublinear-memory answer to "top tokens" when the exact vocabulary
    table no longer fits: build a 4x256 counter sketch over all token
    occurrences, point-query every distinct token, and report the top-20
    by ESTIMATED count alongside the true count and the collision
    overestimate. The oracle replays the full sketch (same md5 row
    hashes, same cells), so the gate checks the estimator itself, not
    just the ranking; ``cms_estimate >= true_n`` by construction.

    Scale: ONE corpus scan+shuffle to token counts; everything after is
    vocab-sized — a window sum over (r, bucket) materializes the cells
    in the probe rows (single lineage; the join-based draft scanned the
    corpus twice) and a per-token min finishes. Plan-pinned to a single
    FileScan. The cell aggregate (`cms_cells`) is incrementally
    maintainable — the same sketch serves Structured Streaming."""
    from pubic_multi_platform_to_postgres_spark.operators.sketches import (
        cms_estimates,
        cms_token_rows,
    )

    docs = load(spark, sf_dir, "documents")
    rows = cms_token_rows(docs, "text", depth=4, width=256)
    est = cms_estimates(rows)
    return est.orderBy(F.desc("cms_estimate"), "token").limit(20)


from pubic_multi_platform_to_postgres_spark.operators import (  # noqa: E402
    decomposition as _decomp,
)


@query("embedding_pca_power", oracle=_decomp.oracle_sql(dim=64, iters=120))
def embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal direction of the embedding corpus + per-vector
    projection, every step integer-exact (see ``operators/
    decomposition.py``): quantized centered scatter matrix, 120
    power-iteration rounds with truncating renormalization, map-side
    dot-product projection. The oracle replays the ENTIRE chain in
    HUGEINT SQL — quantizer, scatter, all 120 iterations, projection —
    so the gate proves the distributed partial-scatter combine and the
    driver matvec bit-faithful, not just the final ranking. The
    direction itself is meaningful, not merely deterministic:
    ``test_pca_power_matches_numpy_direction`` pins cosine alignment
    with numpy's exact eigenvector.

    Curation roles: embedding-drift monitoring (batch-vs-corpus dominant
    direction), decorrelation audit before cosine near-dup thresholds,
    1-D stratification keys.

    Scale: one Arrow-batched ``mapInPandas`` corpus pass emitting
    per-batch (n, colsum, X'X) partials — a bounded
    O(partitions x 64^2) driver fetch, the IVF-centroid-collect
    pattern — then a 64x64 driver iteration and a map-side literal
    projection. No corpus-sized shuffle at all."""
    emb = load(spark, sf_dir, "embeddings")
    scores = _decomp.pc1_scores(emb, "embedding", ["vec_id", "label"], dim=64)
    return scores.select(
        "vec_id", F.col("label").cast("int").alias("label"), "pc1_score"
    )


@query(
    "text_vocab_coverage",
    oracle="""
    WITH toks AS (
        SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
        FROM documents
    ),
    tc AS (SELECT token, COUNT(*) AS n FROM toks GROUP BY token),
    hist AS (
        SELECT n, COUNT(*) AS n_tokens, n * COUNT(*) AS mass
        FROM tc GROUP BY n
    ),
    cum AS (
        SELECT n, n_tokens,
               SUM(n_tokens) OVER (ORDER BY n DESC) AS cum_tokens,
               SUM(mass) OVER (ORDER BY n DESC) AS cum_mass,
               SUM(n_tokens) OVER () AS vocab_total,
               SUM(mass) OVER () AS total_tokens
        FROM hist
    ),
    hit AS (
        SELECT g.nv AS vocab_budget, c.*
        FROM cum c, (VALUES (10), (100), (1000), (10000)) g(nv)
        WHERE (c.cum_tokens >= g.nv AND c.cum_tokens - c.n_tokens < g.nv)
           OR (c.vocab_total < g.nv AND c.cum_tokens = c.vocab_total)
    )
    SELECT CAST(vocab_budget AS BIGINT) AS vocab_budget,
           CAST(CASE WHEN vocab_total < vocab_budget THEN 0 ELSE n END
                AS BIGINT) AS threshold_count,
           CAST(CASE WHEN vocab_total < vocab_budget THEN cum_mass
                     ELSE cum_mass - (cum_tokens - vocab_budget) * n END
                AS BIGINT) AS covered_tokens,
           CAST(total_tokens AS BIGINT) AS total_tokens,
           CAST(CASE WHEN vocab_total < vocab_budget THEN cum_mass
                     ELSE cum_mass - (cum_tokens - vocab_budget) * n END
                AS DOUBLE) / CAST(total_tokens AS DOUBLE) AS coverage_frac
    FROM hit
    """,
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve — the tokenizer-design question "what
    fraction of corpus token occurrences does a top-N vocabulary
    cover?" for N in {10, 100, 1k, 10k}. Computed WITHOUT ranking any
    token: the count-of-counts histogram determines coverage exactly
    (every token tied at the crossing frequency contributes the same
    mass, so the crossing row's cumulative arithmetic closes the
    answer) — the same insight behind the repo's boundary-bucket
    selection devices. Budgets beyond the vocabulary return full
    coverage with threshold_count 0 (exercised at sf0.01, where
    |vocab| < 10k).

    Scale: one corpus scan + token-count shuffle; the histogram is
    count-of-counts-sized (O(sqrt total) distinct frequencies by
    Heap's-law-style tail shape), so its global cumulative window is a
    bounded single-partition step, and the budget probe is an explode +
    filter over histogram rows — no non-equi join, no global token
    sort, nothing vocab-sized past the histogram aggregate."""
    toks = load(spark, sf_dir, "documents").select(
        F.explode(tokenize(F.col("text"))).alias("token")
    )
    tc = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    hist = tc.groupBy("n").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (F.col("n") * F.count(F.lit(1))).alias("mass"),
    )
    w = Window.orderBy(F.desc("n")).rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = hist.select(
        "n", "n_tokens",
        F.sum("n_tokens").over(w).alias("cum_tokens"),
        F.sum("mass").over(w).alias("cum_mass"),
        F.sum("n_tokens").over(wall).alias("vocab_total"),
        F.sum("mass").over(wall).alias("total_tokens"),
    )
    hit = cum.withColumn(
        "vocab_budget",
        F.explode(F.array(*[F.lit(n) for n in (10, 100, 1000, 10000)])),
    ).filter(
        (
            (F.col("cum_tokens") >= F.col("vocab_budget"))
            & (F.col("cum_tokens") - F.col("n_tokens") < F.col("vocab_budget"))
        )
        | (
            (F.col("vocab_total") < F.col("vocab_budget"))
            & (F.col("cum_tokens") == F.col("vocab_total"))
        )
    )
    overflow = F.col("vocab_total") < F.col("vocab_budget")
    covered = F.when(overflow, F.col("cum_mass")).otherwise(
        F.col("cum_mass") - (F.col("cum_tokens") - F.col("vocab_budget")) * F.col("n")
    )
    return hit.select(
        F.col("vocab_budget").cast("long").alias("vocab_budget"),
        F.when(overflow, F.lit(0)).otherwise(F.col("n"))
        .cast("long").alias("threshold_count"),
        covered.cast("long").alias("covered_tokens"),
        F.col("total_tokens").cast("long").alias("total_tokens"),
        (covered.cast("double") / F.col("total_tokens").cast("double"))
        .alias("coverage_frac"),
    )


@query(
    "corpus_shard_manifest",
    oracle="""
    WITH assign AS (
        SELECT doc_id, source,
               ('0x' || substr(md5('shard:' || doc_id), 1, 15))::BIGINT % 16
                   AS shard_id,
               n_chars,
               len(string_split_regex(trim(lower(text)), '\\s+')) AS n_toks
        FROM documents
    )
    SELECT shard_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc_id,
           COUNT(DISTINCT source) AS n_sources
    FROM assign GROUP BY shard_id
    """,
)
def corpus_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard assignment + manifest — the webdataset/tar-shard
    bookkeeping a 100 TB corpus ships with: every document lands in one
    of 16 shards by the portable 60-bit md5 of ``'shard:' || doc_id``
    (deterministic, rerun-stable, no coordination), and the manifest
    records per-shard doc/token/char totals, the doc-id range, and
    source diversity — what a training loader needs to plan epochs and
    what an auditor needs to verify nothing was dropped (Σ n_docs =
    corpus size by construction; pinned by
    ``test_shard_manifest_conserves_corpus``).

    Scale: assignment is map-side hash arithmetic; the manifest is ONE
    shuffle keyed by shard — 16 output rows whatever the corpus. Hash
    sharding (vs size-balanced bin packing) is the deliberate choice:
    it needs no global order, stays stable under re-runs and appends,
    and balances within ~sqrt variance at millions of docs per shard;
    the token totals the manifest carries are exactly what a packer
    needs if a later stage wants balanced physical files."""
    docs = load(spark, sf_dir, "documents")
    assign = docs.select(
        "doc_id", "source", "n_chars",
        (
            F.conv(
                F.substring(F.md5(F.concat(F.lit("shard:"), F.col("doc_id"))), 1, 15),
                16, 10,
            ).cast("long") % 16
        ).alias("shard_id"),
        F.size(tokenize(F.col("text"))).alias("n_toks"),
    )
    return assign.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("n_tokens"),
        F.sum("n_chars").alias("n_chars"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
        F.countDistinct("source").alias("n_sources"),
    )


@query(
    "text_html_extract",
    oracle="""
    WITH wrapped AS (
        SELECT doc_id,
               trim(regexp_replace(text, '\\s+', ' ', 'g')) AS norm_orig,
               '<html><head><title>Doc ' || doc_id || '</title>'
               || '<style>body{margin:0}</style>'
               || CASE WHEN doc_id % 3 <> 0
                       THEN '<script>if(a<b){track()}</script>' ELSE '' END
               || '</head><body><!-- id=' || doc_id || ' -->'
               || '<div class="nav">Home | About</div><p>'
               || replace(replace(replace(text,
                      '&', '&amp;'), '<', '&lt;'), '>', '&gt;')
               || '</p><footer>&copy; 2026 Example</footer></body></html>'
                   AS html
        FROM documents
    ),
    x AS (
        SELECT doc_id, norm_orig, html,
               trim(regexp_replace(
                   replace(replace(replace(replace(
                       regexp_replace(
                           regexp_replace(
                               regexp_replace(html,
                                   '<(script|style)[^>]*>.*?</(script|style)>',
                                   ' ', 'gs'),
                               '<!--.*?-->', ' ', 'gs'),
                           '<[^>]*>', ' ', 'g'),
                       '&lt;', '<'), '&gt;', '>'),
                       '&copy;', chr(169)), '&amp;', '&'),
                   '\\s+', ' ', 'g')) AS clean_text
        FROM wrapped
    )
    SELECT doc_id, clean_text,
           CAST(length(clean_text) AS BIGINT) AS n_chars_clean,
           len(regexp_extract_all(html, '<[^>]*>')) > 0
               AND doc_id % 3 <> 0 AS had_script,
           contains(clean_text, norm_orig) AS recovered
    FROM x
    """,
)
def text_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-ingest main-text extraction, gate-checked byte-for-byte: wrap
    every document in a deterministic HTML page (title, style, script
    on 2/3 of docs, comment, nav chrome, entity-escaped body, footer),
    then recover the text with :func:`html_extract` (script/style/
    comment subtree removal -> tag strip -> entity decode -> whitespace
    collapse). ``recovered`` asserts the round trip: the extracted text
    must contain the whitespace-normalized original — true for EVERY
    row (pinned by ``test_html_extract_roundtrip``); nav/footer chrome
    survives by design (boilerplate removal is its own operator,
    ``corpus_boilerplate_scrub``). The oracle replays both the wrap and
    the extraction, so the gate proves Java-regex/RE2 dialect agreement
    on the exact pattern set, not just similar behavior.

    Scale: pure map-side ``regexp_replace``/``replace`` chain inside
    whole-stage codegen — no UDF, no shuffle (plan-pinned)."""
    docs = load(spark, sf_dir, "documents")
    esc = F.replace(
        F.replace(
            F.replace(F.col("text"), F.lit("&"), F.lit("&amp;")),
            F.lit("<"), F.lit("&lt;"),
        ),
        F.lit(">"), F.lit("&gt;"),
    )
    html = F.concat(
        F.lit("<html><head><title>Doc "), F.col("doc_id"), F.lit("</title>"),
        F.lit("<style>body{margin:0}</style>"),
        F.when(F.col("doc_id") % 3 != 0,
               F.lit("<script>if(a<b){track()}</script>")).otherwise(F.lit("")),
        F.lit("</head><body><!-- id="), F.col("doc_id"), F.lit(" -->"),
        F.lit('<div class="nav">Home | About</div><p>'),
        esc,
        F.lit("</p><footer>&copy; 2026 Example</footer></body></html>"),
    )
    wrapped = docs.select(
        "doc_id",
        F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")).alias("norm_orig"),
        html.alias("html"),
    )
    x = wrapped.select(
        "doc_id", "norm_orig", "html",
        html_extract(F.col("html")).alias("clean_text"),
    )
    return x.select(
        "doc_id", "clean_text",
        F.length("clean_text").cast("long").alias("n_chars_clean"),
        (
            (F.size(F.regexp_extract_all(F.col("html"), F.lit(r"<[^>]*>"), F.lit(0))) > 0)
            & (F.col("doc_id") % 3 != 0)
        ).alias("had_script"),
        F.contains(F.col("clean_text"), F.col("norm_orig")).alias("recovered"),
    )


def _quality_calibration_oracle() -> str:
    """Replay: micro-quantized quality score -> nine one-pass decile
    thresholds (ceil nearest-rank, ties by doc_id) -> per-decile
    composition with the langid-mismatch weak label."""
    return f"""
    WITH f AS (
        SELECT doc_id, lang,
               {_langid_case()} AS detected,
               CAST(length(text) AS DOUBLE) AS nc,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS nt,
               CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE) AS punct,
               CAST(len(regexp_extract_all(lower(text), '{_STOP_SQL["en"]}'))
                    AS DOUBLE) AS stop
        FROM documents
    ),
    scored AS MATERIALIZED (
        SELECT doc_id, lang, detected,
               CAST(floor((least(nt / 64.0, 1.0) * 0.4
                 + least((stop / nt) * 4.0, 1.0) * 0.4
                 + (1.0 - least((punct / nc) * 10.0, 1.0)) * 0.2) * 1000000)
                    AS BIGINT) AS q_int
        FROM f
    ),
    ranked AS (
        SELECT q_int, ROW_NUMBER() OVER (ORDER BY q_int, doc_id) AS rk,
               COUNT(*) OVER () AS n
        FROM scored
    ),
    th AS MATERIALIZED (
        SELECT g.d, MAX(r.q_int) AS t
        FROM generate_series(1, 9) g(d)
        JOIN ranked r ON r.rk <= (r.n * g.d + 9) // 10
        GROUP BY g.d
    ),
    labeled AS (
        SELECT s.*,
               COALESCE((SELECT MIN(th.d) FROM th WHERE s.q_int <= th.t), 10)
                   AS decile
        FROM scored s
    )
    SELECT CAST(decile AS INT) AS decile,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN detected <> lang THEN 1 ELSE 0 END) AS BIGINT)
               AS n_lang_mismatch,
           CAST(SUM(CASE WHEN detected <> lang THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) AS mismatch_rate,
           CAST(MIN(q_int) AS BIGINT) AS min_q,
           CAST(MAX(q_int) AS BIGINT) AS max_q
    FROM labeled GROUP BY decile
    """


@query("corpus_quality_calibration", oracle=_quality_calibration_oracle())
def corpus_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does the quality score actually separate junk? Calibration audit:
    micro-quantize the composite quality score (floor(score * 1e6) —
    the float formula is IEEE-identical across engines, the
    quantization makes ranking/thresholding integer-exact), cut the
    corpus into nearest-rank deciles, and report each decile's
    language-ID mismatch rate (declared lang != stopword-vote
    prediction — the weak junk label available without human ratings).
    A score worth its thresholds shows mismatch concentrating in the
    low deciles. Ties at a threshold fall to the LOWER decile (both
    engines label by min matching threshold), so decile sizes can be
    uneven under mass ties — the deterministic contract, not a bug.

    Scale: the nine thresholds come from ONE histogram pass via
    ``nearest_rank_multi`` (`operators/selection.py`) — the multi-k
    boundary-bucket device: histogram aggregate, all nine crossing
    buckets found in one frame, one row_number over ~9/65536ths of the
    corpus, nine-value driver fetch. Labeling + composition is then one
    map-side CASE and a 10-row aggregate. The oracle replays the exact
    ceil-rank/tie contract with a global ROW_NUMBER (fine at sf0.01;
    the engine side never global-sorts)."""
    from pubic_multi_platform_to_postgres_spark.operators.selection import (
        nearest_rank_multi,
    )

    docs = load(spark, sf_dir, "documents")
    scored = quality_features(docs, "text", "doc_id", keep_cols=("lang", "text"))
    # r15 (guide §5): three consumers read this projection — the
    # threshold histogram, nearest_rank_multi's boundary join, and the
    # final decile aggregate — and the quality_features + lang_id
    # regex battery is the query's dominant map-side cost; the lazy
    # checkpoint computes the (4-narrow-column) frame once instead of
    # three times. At 100 TB this is one text pass instead of three.
    s = scored.select(
        "doc_id", "lang",
        lang_id(F.col("text")).alias("detected"),
        F.floor(F.col("quality_score") * 1e6).cast("long").alias("q_int"),
    ).localCheckpoint(eager=False)
    ks = {d: f"(sum(c) over () * {d} + 9) div 10" for d in range(1, 10)}
    th = nearest_rank_multi(s, "q_int", F.expr("q_int div 65536"), ks)
    decile = F.lit(10)
    for d in sorted(th, reverse=True):
        decile = F.when(F.col("q_int") <= F.lit(th[d]), F.lit(d)).otherwise(decile)
    mism = (F.col("detected") != F.col("lang")).cast("long")
    return (
        s.withColumn("decile", decile.cast("int"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(mism).alias("n_lang_mismatch"),
            (F.sum(mism).cast("double") / F.count(F.lit(1))).alias("mismatch_rate"),
            F.min("q_int").alias("min_q"),
            F.max("q_int").alias("max_q"),
        )
    )


def _source_matrix_oracle() -> str:
    """Minhash pair replay + source labeling + symmetric-pair rollup."""
    cte, band_conds, est = _minhash_sig_fragments(64, 3, 16)
    return f"""{cte},
    p AS (
        SELECT id_a, id_b FROM (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   ({est}) / 64.0 AS est_jaccard
            FROM sigs a JOIN sigs b
              ON a.doc_id < b.doc_id AND ({band_conds})
        ) WHERE est_jaccard >= 0.4
    )
    SELECT least(da.source, db.source) AS source_a,
           greatest(da.source, db.source) AS source_b,
           COUNT(*) AS n_pairs
    FROM p
    JOIN documents da ON da.doc_id = p.id_a
    JOIN documents db ON db.doc_id = p.id_b
    GROUP BY 1, 2
    """


@query("dedup_source_matrix", oracle=_source_matrix_oracle())
def dedup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHO copies from WHOM: the near-dup pair stream rolled up into a
    symmetric source x source matrix (pair key ordered by least/greatest
    source so (web, books) and (books, web) are one cell). Off-diagonal
    mass is cross-source contamination — syndicated content, mirrors,
    wiki scrapes inside web crawls — the signal that drives per-source
    dedup policy and mixture corrections; the diagonal is within-source
    redundancy. Composes the measured ``dedup_minhash_pairs`` machinery
    (md5-portable hashes, banded LSH, no all-pairs) with two keyed joins
    back to the source labels and a |sources|^2-bounded aggregate.

    Scale: the pair stream is the banded join's output (linear in
    near-dup mass, measured through 100x); each labeling join shuffles
    pairs + the (doc_id, source) projection on doc_id; the rollup output
    is at most |sources|^2 / 2 rows whatever the corpus."""
    docs = load(spark, sf_dir, "documents")
    pairs = minhash_dedup_pairs(
        docs, "text", "doc_id", num_hashes=64, bands=16, threshold=0.4,
        token_hash="md5",
    )
    src = docs.select("doc_id", "source")
    lab = (
        pairs.join(src.withColumnRenamed("doc_id", "id_a")
                      .withColumnRenamed("source", "src_a"), "id_a")
        .join(src.withColumnRenamed("doc_id", "id_b")
                 .withColumnRenamed("source", "src_b"), "id_b")
    )
    return (
        lab.select(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@query(
    "dedup_savings_report",
    oracle="""
    WITH RECURSIVE t AS (
        SELECT doc_id, lang, n_chars // 50 AS len_bucket,
               list_distinct(string_split_regex(trim(lower(text)), '\\s+')) AS grams
        FROM documents
    ),
    p AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM t a JOIN t b
          ON a.lang = b.lang AND a.len_bucket = b.len_bucket AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
              / CAST(len(a.grams) + len(b.grams)
                     - len(list_intersect(a.grams, b.grams)) AS DOUBLE) >= 0.5
    ),
    sym AS (
        SELECT id_a AS src, id_b AS dst FROM p
        UNION
        SELECT id_b, id_a FROM p
    ),
    reach(src, dst) AS (
        SELECT src, dst FROM sym
        UNION
        SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src
    ),
    comp AS (
        SELECT src AS node, LEAST(src, MIN(dst)) AS label
        FROM reach GROUP BY src
    ),
    per AS (
        SELECT c.label, COUNT(*) AS size,
               SUM(d.n_chars) AS chars_total,
               SUM(CASE WHEN c.node = c.label THEN d.n_chars ELSE 0 END)
                   AS chars_kept
        FROM comp c JOIN documents d ON d.doc_id = c.node
        GROUP BY c.label
    )
    SELECT CAST(CASE WHEN size >= 5 THEN 5 ELSE size END AS INT)
               AS cluster_size_bucket,
           COUNT(*) AS n_clusters,
           CAST(SUM(size) AS BIGINT) AS n_docs,
           CAST(SUM(size - 1) AS BIGINT) AS n_removable_docs,
           CAST(SUM(chars_total - chars_kept) AS BIGINT) AS chars_removable
    FROM per GROUP BY 1
    """,
)
def dedup_savings_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What does dedup actually BUY? The decision-support rollup of the
    measured ``dedup_clusters`` path: collapse near-dup clusters, then
    report — per cluster-size bucket (2, 3, 4, 5+) — how many clusters
    exist, how many documents they hold, how many are removable
    (keep-one-per-cluster), and how many characters of training data
    that removal saves. This is the table a curation review reads
    before turning a dedup pass on; the oracle re-derives the clusters
    with the independent recursive transitive-closure CTE and replays
    the savings arithmetic.

    Scale: everything up to the components is the measured cluster
    machinery (prefix-filter candidates + local-contraction union-find,
    curves through 100x on file); the savings roll-up adds one keyed
    join of the component table to (doc_id, n_chars) and two bounded
    aggregates (|clusters|, then 4 output rows)."""
    docs = load(spark, sf_dir, "documents").withColumn(
        "len_bucket", F.floor(F.col("n_chars") / 50)
    )
    pairs = ngram_jaccard_pairs(
        docs, "text", "doc_id", block_cols=["lang", "len_bucket"],
        threshold=0.5, ngram=1,
    )
    comp = connected_components(pairs)
    per = (
        comp.join(
            docs.select(F.col("doc_id").alias("node"), "n_chars"), "node"
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("size"),
            F.sum("n_chars").alias("chars_total"),
            F.sum(
                F.when(F.col("node") == F.col("label"), F.col("n_chars"))
                .otherwise(F.lit(0))
            ).alias("chars_kept"),
        )
    )
    bucket = F.when(F.col("size") >= 5, F.lit(5)).otherwise(F.col("size"))
    return (
        per.groupBy(bucket.cast("int").alias("cluster_size_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum("size").alias("n_docs"),
            F.sum(F.col("size") - 1).alias("n_removable_docs"),
            F.sum(F.col("chars_total") - F.col("chars_kept"))
            .alias("chars_removable"),
        )
    )


def render_image_fixture(feed: DataFrame) -> DataFrame:
    """Render the image-tier fixture container for each ``(uid, d)``
    row — content keyed by ``d`` (group ``d // 10``, md5-seeded
    squared-LCG noise, single-pixel perturbation, every 101st container
    truncated), returned as ``(uid, blob)``. Factored so the
    content-addressed ingest query can re-upload a container under a
    NEW uid with bit-identical bytes (uid != d) while
    ``multimodal_image_ahash_neardup`` renders the plain corpus
    (uid == d)."""
    from pubic_multi_platform_to_postgres_spark.operators.multimodal import (
        encode_png,
    )

    def render(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in batches:
            uids, blobs = [], []
            for u, d in zip(pdf["uid"], pdf["d"]):
                u, d = int(u), int(d)
                g = d // 10
                h = int(hashlib.md5(f"img:{g}".encode()).hexdigest()[:15], 16)
                a = 1 + h % 65519
                b = (h // 65536) % 65521
                idx = np.arange(256, dtype=np.int64)
                r = (a * (idx + 1) + b) % 65521
                px = (((r * r) % 65521) % 256).reshape(16, 16)
                px[d % 16, (d // 16) % 16] += d % 7
                px = px % 256
                blob = encode_png(px.astype(np.uint8))
                uids.append(u)
                blobs.append(blob[:10] if d % 101 == 0 else blob)
            yield pd.DataFrame({"uid": uids, "blob": blobs})

    return feed.mapInPandas(render, schema="uid long, blob binary")


_IMAGE_NEARDUP_ORACLE = """
    WITH p AS (
        SELECT doc_id, doc_id // 10 AS g,
               1 + ('0x' || substr(md5('img:' || (doc_id // 10)), 1, 15))
                   ::BIGINT % 65519 AS a,
               (('0x' || substr(md5('img:' || (doc_id // 10)), 1, 15))
                   ::BIGINT // 65536) % 65521 AS b,
               doc_id % 101 = 0 AS corrupt
        FROM documents
    ),
    pr AS (
        SELECT p.doc_id, gy.i AS y, gx.i AS x,
               (p.a * (gy.i * 16 + gx.i + 1) + p.b) % 65521 AS r,
               CASE WHEN gy.i = p.doc_id % 16
                     AND gx.i = (p.doc_id // 16) % 16
                    THEN p.doc_id % 7 ELSE 0 END AS pert
        FROM p, generate_series(0, 15) gy(i), generate_series(0, 15) gx(i)
        WHERE NOT p.corrupt
    ),
    px AS (
        SELECT doc_id, y, x,
               (((r * r) % 65521) % 256 + pert) % 256 AS v
        FROM pr
    ),
    blk AS (
        SELECT doc_id, y // 2 AS by, x // 2 AS bx, SUM(v) // 4 AS bm
        FROM px GROUP BY 1, 2, 3
    ),
    gm AS (SELECT doc_id, SUM(bm) // 64 AS m FROM blk GROUP BY 1),
    bits AS (
        SELECT b.doc_id,
               SUM(CASE WHEN b.bm > gm.m AND (b.by * 8 + b.bx) < 32
                        THEN (1::BIGINT << (b.by * 8 + b.bx))
                        ELSE 0 END) AS lo,
               SUM(CASE WHEN b.bm > gm.m AND (b.by * 8 + b.bx) >= 32
                        THEN (1::BIGINT << (b.by * 8 + b.bx - 32))
                        ELSE 0 END) AS hi
        FROM blk b JOIN gm USING (doc_id) GROUP BY b.doc_id
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))
                AS INT) AS hamming
    FROM bits a JOIN bits b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3
    """


@query(
    "multimodal_image_ahash_neardup",
    # ORACLE FIXTURE CAP: 16x16 images by construction of the render
    # below. The 64-bit hash is carried as two BIGINT halves (lo/hi)
    # because bit 63 overflows a signed BIGINT shift; hamming = sum of
    # the halves' bit_count(xor).
    oracle=_IMAGE_NEARDUP_ORACLE,
)
def multimodal_image_ahash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IMAGE near-dup dedup — the multimodal face of the dedup family:
    render a real 16x16 grayscale PNG per document (per-group pattern
    keyed by ``doc_id // 10`` — group SIZE is a constant ~10 docs
    however large the corpus, so the planted pair count grows LINEARLY
    with scale; the first ``% 50`` keying fixed the group COUNT instead
    and everything grew quadratically — 52 s at 10x, timeout at 100x.
    The pattern itself is md5-seeded SQUARED-LCG noise: with
    ``r = (a*(idx+1) + b) % 65521`` and per-group ``(a, b)`` drawn from
    the portable md5 of the group key, pixel(idx) =
    ``((r*r) % 65521) % 256`` — ~4.3e9 pattern classes AND
    near-uniform aHash bits. Uniformity is the second scale lesson this
    fixture taught: a smooth md5-seeded GRADIENT had plenty of classes,
    but gradients concentrate their aHash chunk values onto a few hot
    16-bit buckets, and the banded join spilled 10.8 GB at 30x (17.8x
    wall) from bucket SKEW alone — and the PLAIN LCG is not enough
    either (its additive lattice makes adjacent blocks/windows
    correlate, concentrating the audio tier's chunks onto alternating
    bit patterns like 0xAAAA at 588 of 38k groups); squaring mod the
    prime destroys the lattice (max bucket 8 of 50k groups, measured).
    Fingerprint ENTROPY, not just class count, is what keeps LSH
    buckets ~|corpus|/65536) — with a per-doc
    single-pixel perturbation, so planted near-dup groups exist; every
    101st container truncated for the dead-letter path), decode it back
    with the real PNG codec, fingerprint with the 64-bit average hash
    (``multimodal.ahash64`` — 8x8 integer block means vs grid mean),
    and find Hamming <= 3 pairs with the SAME pigeonhole banding AND
    chunk geometry that back SimHash (``dedup.hamming_neardup_pairs``,
    4 chunks of 16 bits — max_hamming < n_chunks for pigeonhole). The
    oracle rebuilds every pixel, block mean, and hash bit from doc_id
    arithmetic and brute-forces the pairs, so the gate proves the
    encode -> decode -> hash -> banded-join chain bit-exact INCLUDING
    the banding's losslessness at this threshold.

    Scale: render/decode/hash are narrow Arrow-batched stages; the pair
    search is the measured linear x4 chunk explode + equi-join — no
    all-pairs anywhere on the engine side (the brute-force join lives
    only in the sf0.01 oracle)."""
    from pubic_multi_platform_to_postgres_spark.operators.dedup import (
        hamming_neardup_pairs,
    )
    from pubic_multi_platform_to_postgres_spark.operators.multimodal import (
        ahash64,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id")
    blobs = render_image_fixture(docs.select(
        F.col("doc_id").alias("uid"), F.col("doc_id").alias("d")))
    fp = (
        ahash64(blobs, "blob", "uid")
        .filter(F.col("decode_ok"))
        .select(F.col("id").alias("doc_id"), "ahash64")
        .localCheckpoint()
    )
    # 4 chunks of 16 bits, NOT 8 of 8: 8-bit chunk values give only 256
    # join buckets, so bucket size grows linearly with the corpus and the
    # candidate join quadratically (the simhash family's 16-bit setting
    # keeps buckets ~|corpus|/65536); hamming <= 3 preserves pigeonhole
    return hamming_neardup_pairs(fp, "doc_id", "ahash64",
                                 max_hamming=3, n_chunks=4)


_AUDIO_NEARDUP_ORACLE = """
    WITH p AS (
        SELECT doc_id, doc_id // 13 AS g,
               1 + ('0x' || substr(md5('aud:' || (doc_id // 13)), 1, 15))
                   ::BIGINT % 65519 AS a,
               (('0x' || substr(md5('aud:' || (doc_id // 13)), 1, 15))
                   ::BIGINT // 65536) % 65521 AS b,
               doc_id % 103 = 0 AS corrupt
        FROM documents
    ),
    sr AS (
        SELECT p.doc_id, g_i.i,
               (p.a * (g_i.i + 1) + p.b) % 65521 AS r,
               CASE WHEN g_i.i % 64 = p.doc_id % 64
                    THEN p.doc_id % 11 ELSE 0 END AS pert
        FROM p, generate_series(0, 255) g_i(i)
        WHERE NOT p.corrupt
    ),
    s AS (
        SELECT doc_id, i,
               ((r * r) % 65521) % 4096 - 2048 + pert AS v
        FROM sr
    ),
    w AS (
        SELECT doc_id, i // 4 AS wi, SUM(CAST(v AS BIGINT) * v) AS e
        FROM s GROUP BY 1, 2
    ),
    med AS (
        SELECT doc_id, e AS m FROM (
            SELECT doc_id, e,
                   ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY e) AS rk
            FROM w
        ) WHERE rk = 32
    ),
    bits AS (
        SELECT w.doc_id,
               SUM(CASE WHEN w.e > med.m AND w.wi < 32
                        THEN (1::BIGINT << w.wi) ELSE 0 END) AS lo,
               SUM(CASE WHEN w.e > med.m AND w.wi >= 32
                        THEN (1::BIGINT << (w.wi - 32)) ELSE 0 END) AS hi
        FROM w JOIN med USING (doc_id) GROUP BY w.doc_id
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))
                AS INT) AS hamming
    FROM bits a JOIN bits b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3
    """


@query(
    "multimodal_audio_fingerprint_neardup",
    # ORACLE FIXTURE CAP: 256-sample clips by construction (64 windows
    # of 4). Fingerprints carried as lo/hi BIGINT halves (bit 63
    # overflows a signed shift); lower median = the rank-32 energy.
    oracle=_AUDIO_NEARDUP_ORACLE,
)
def multimodal_audio_fingerprint_neardup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """AUDIO near-dup dedup — completing the modality matrix (text:
    minhash/simhash/jaccard/levenshtein; image: aHash; audio: THIS):
    synthesize a real 256-sample WAV per document (clip content keyed
    by ``doc_id // 13`` — constant group size, so planted pairs grow
    linearly with corpus scale, the image-tier re-key lesson — and
    sampled from md5-seeded SQUARED-LCG noise — ``r = (a*(i+1) + b) %
    65521``, sample = ``((r*r) % 65521) % 4096 - 2048`` — the ENTROPY
    lesson twice over: the first fixture was a linear ramp whose
    per-group content differed only by a 16-bit shift (banded join
    spilled 32.8 GB at 30x from hot buckets), and the PLAIN LCG still
    carried its additive lattice into the window energies — 588 of 38k
    groups landed on the alternating chunk pattern 0xAAAA and sf10
    spilled 4.8 GB at 31x wall; squaring mod the prime kills the
    lattice (max chunk bucket 11 of 38k groups, all fingerprints
    distinct, measured); a
    per-doc 4-sample perturbation keeps group members near- but not
    exactly identical; every 103rd container truncated), decode with the
    chunk-walking RIFF parser, fingerprint with the 64-window
    energy-contour hash (``multimodal.audio_fingerprint64``), and find
    Hamming <= 3 pairs with the SAME pigeonhole banding as SimHash and
    the image aHash. The oracle rebuilds every sample, window energy,
    median, bit, and pair from doc_id arithmetic (brute-force join), so
    the gate proves the banding lossless at the threshold and the whole
    encode -> decode -> contour -> pair chain integer-exact.

    Scale: render/decode/fingerprint are narrow Arrow-batched stages;
    pair search is the measured linear x4 chunk explode + equi-join —
    no all-pairs on the engine side."""
    from pubic_multi_platform_to_postgres_spark.operators.dedup import (
        hamming_neardup_pairs,
    )
    from pubic_multi_platform_to_postgres_spark.operators.multimodal import (
        audio_fingerprint64,
        make_wav,
    )

    def render(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, blobs = [], []
            import hashlib

            for d in pdf["doc_id"]:
                d = int(d)
                g = d // 13
                h = int(hashlib.md5(f"aud:{g}".encode()).hexdigest()[:15], 16)
                a = 1 + h % 65519
                b = (h // 65536) % 65521
                # overwrite the data chunk with the LCG-noise samples:
                # samples start at byte 44 of make_wav's fixed layout,
                # little-endian int16
                blob = bytearray(make_wav(256, 8000, seed=0))
                i = np.arange(256, dtype=np.int64)
                r = (a * (i + 1) + b) % 65521
                s = ((r * r) % 65521) % 4096 - 2048
                s = s + np.where(i % 64 == d % 64, d % 11, 0)
                blob[44:44 + 512] = s.astype("<i2").tobytes()
                ids.append(d)
                blobs.append(bytes(blob[:11]) if d % 103 == 0 else bytes(blob))
            yield pd.DataFrame({"doc_id": ids, "blob": blobs})

    docs = load(spark, sf_dir, "documents").select("doc_id")
    blobs = docs.mapInPandas(render, schema="doc_id long, blob binary")
    fp = (
        audio_fingerprint64(blobs, "blob", "doc_id")
        .filter(F.col("decode_ok"))
        .select(F.col("id").alias("doc_id"), "fp64")
        .localCheckpoint()
    )
    return hamming_neardup_pairs(fp, "doc_id", "fp64",
                                 max_hamming=3, n_chunks=4)


@query(
    "multimodal_video_framehash_neardup",
    # ORACLE FIXTURE CAP: 4 frames of 16x16 by construction. Hash
    # carried as lo/hi BIGINT halves (bit 63 overflows a signed shift).
    oracle="""
    WITH p AS (
        SELECT doc_id, doc_id // 11 AS g,
               1 + ('0x' || substr(md5('vid:' || (doc_id // 11)), 1, 15))
                   ::BIGINT % 65519 AS a,
               (('0x' || substr(md5('vid:' || (doc_id // 11)), 1, 15))
                   ::BIGINT // 65536) % 65521 AS b,
               doc_id % 107 = 0 AS corrupt
        FROM documents
    ),
    pr AS (
        SELECT p.doc_id, gy.i AS y, gx.i AS x,
               (p.a * (gf.i * 256 + gy.i * 16 + gx.i + 1) + p.b)
                   % 65521 AS r,
               CASE WHEN gf.i = p.doc_id % 4
                     AND gy.i = p.doc_id % 16
                     AND gx.i = (p.doc_id // 16) % 16
                    THEN p.doc_id % 9 ELSE 0 END AS pert
        FROM p, generate_series(0, 3) gf(i),
             generate_series(0, 15) gy(i), generate_series(0, 15) gx(i)
        WHERE NOT p.corrupt
    ),
    px AS (
        SELECT doc_id, y, x,
               SUM((((r * r) % 65521) % 256 + pert) % 256) AS sv
        FROM pr
        GROUP BY 1, 2, 3
    ),
    blk AS (
        SELECT doc_id, y // 2 AS by, x // 2 AS bx, SUM(sv) // 4 AS bm
        FROM px GROUP BY 1, 2, 3
    ),
    gm AS (SELECT doc_id, SUM(bm) // 64 AS m FROM blk GROUP BY 1),
    bits AS (
        SELECT b.doc_id,
               SUM(CASE WHEN b.bm > gm.m AND (b.by * 8 + b.bx) < 32
                        THEN (1::BIGINT << (b.by * 8 + b.bx))
                        ELSE 0 END) AS lo,
               SUM(CASE WHEN b.bm > gm.m AND (b.by * 8 + b.bx) >= 32
                        THEN (1::BIGINT << (b.by * 8 + b.bx - 32))
                        ELSE 0 END) AS hi
        FROM blk b JOIN gm USING (doc_id) GROUP BY b.doc_id
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))
                AS INT) AS hamming
    FROM bits a JOIN bits b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3
    """,
)
def multimodal_video_framehash_neardup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """VIDEO near-dup dedup — the last cell of the modality-dedup
    matrix (text: minhash/simhash/jaccard/levenshtein; image: aHash;
    audio: energy contour; video: THIS): synthesize a real 4-frame
    16x16 animated GIF89a per document (``multimodal.encode_gif`` —
    real LZW data any decoder accepts), content keyed by
    ``doc_id // 11`` with BOTH image-tier scale lessons applied from
    the start: constant group SIZE so planted pairs grow linearly with
    the corpus, and md5-seeded SQUARED-LCG noise — one stream across
    all 1024 (frame, pixel) positions, ``r = (a*(f*256+idx+1) + b) %
    65521``, pixel = ``((r*r) % 65521) % 256`` (squaring mod the prime
    kills the plain LCG's additive lattice, the audio-tier lesson) —
    so fingerprint chunk values spread across all 65,536 banding
    buckets (~4.3e9 pattern classes). A per-doc single-pixel
    perturbation in ONE frame keeps group members near- but not exactly
    identical; every 107th container truncated for the dead-letter
    path. Decode with the real GIF-LZW parser, fingerprint with the
    temporal-mean frame hash (``multimodal.video_framehash64`` — aHash
    arithmetic over the temporal SUM), and find Hamming <= 3 pairs
    with the SAME pigeonhole banding as SimHash/aHash/audio
    (``dedup.hamming_neardup_pairs``, 4 chunks of 16 bits). The oracle
    rebuilds every frame pixel, temporal sum, block mean, and hash bit
    from doc_id arithmetic and brute-forces the pairs, proving the
    encode -> multi-frame decode -> temporal hash -> banded-join chain
    bit-exact including the banding's losslessness at the threshold.

    Scale: render/decode/hash are narrow Arrow-batched stages (blobs
    never leave the executor); pair search is the measured linear x4
    chunk explode + equi-join — no all-pairs on the engine side."""
    from pubic_multi_platform_to_postgres_spark.operators.dedup import (
        hamming_neardup_pairs,
    )
    from pubic_multi_platform_to_postgres_spark.operators.multimodal import (
        encode_gif,
        video_framehash64,
    )

    def render(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, blobs = [], []
            for d in pdf["doc_id"]:
                d = int(d)
                g = d // 11
                h = int(hashlib.md5(f"vid:{g}".encode()).hexdigest()[:15], 16)
                a = 1 + h % 65519
                b = (h // 65536) % 65521
                idx = np.arange(256, dtype=np.int64)
                frames = []
                for f in range(4):
                    r = (a * (f * 256 + idx + 1) + b) % 65521
                    fr = ((r * r) % 65521) % 256
                    fr = fr.reshape(16, 16)
                    if f == d % 4:
                        fr[d % 16, (d // 16) % 16] += d % 9
                        fr = fr % 256
                    frames.append(fr.astype(np.uint8))
                blob = encode_gif(frames)
                ids.append(d)
                blobs.append(blob[:12] if d % 107 == 0 else blob)
            yield pd.DataFrame({"doc_id": ids, "blob": blobs})

    docs = load(spark, sf_dir, "documents").select("doc_id")
    blobs = docs.mapInPandas(render, schema="doc_id long, blob binary")
    fp = (
        video_framehash64(blobs, "blob", "doc_id")
        .filter(F.col("decode_ok"))
        .select(F.col("id").alias("doc_id"), "vhash64")
        .localCheckpoint()
    )
    return hamming_neardup_pairs(fp, "doc_id", "vhash64",
                                 max_hamming=3, n_chunks=4)


@query(
    "text_bpe_pair_counts",
    # Ties broken deterministically (count DESC, then pair ASC) so the
    # top-50 cut is engine-independent.
    oracle="""
    WITH words AS (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        FROM documents
    ),
    vocab AS (
        SELECT w, COUNT(*) AS c FROM words WHERE length(w) >= 2 GROUP BY w
    ),
    pairs AS (
        SELECT substr(w, i::INT, 2) AS pair,
               CAST(SUM(c) AS BIGINT) AS pair_count
        FROM (SELECT w, c, unnest(range(1, length(w))) AS i FROM vocab)
        GROUP BY 1
    )
    SELECT pair, pair_count FROM pairs
    ORDER BY pair_count DESC, pair LIMIT 50
    """,
)
def text_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training, the inner statistic: corpus-wide adjacent
    symbol-pair frequencies at the character stage (iteration zero of
    byte-pair encoding — the table whose argmax becomes the first
    merge). The classic scale trick is the whole design: pair counting
    runs over the word VOCABULARY weighted by word counts, not over the
    raw token stream, so the expensive character-pair explode touches
    |vocab| rows (Zipf-bounded, grows ~sublinearly) instead of |corpus
    tokens|. Two shuffles end to end: the word-count groupBy (linear,
    map-side combine) and the pair-sum groupBy whose OUTPUT is bounded
    by the alphabet squared (<= 36^2 = 1,296 rows at any corpus size);
    the top-50 is a TakeOrdered over that bounded table, not a global
    sort. Words are ASCII ``[a-z0-9]+`` runs of the lowercased text —
    the Java-regex/DuckDB-dialect-agreement choice the HTML extractor
    documents. A length-1 word has no adjacent pair and drops out (the
    oracle's ``length >= 2`` mirrors ``sequence(1, len-1)`` being empty
    at len 1 — made explicit on both sides). Ties at the cut are broken
    by (count DESC, pair ASC) on both engines.

    At 100 TB: the token->vocab reduction is the measured linear
    hashed-count machinery; everything after it is vocabulary-sized.
    Real BPE iterates merge->recount; each iteration is this same
    bounded plan over a rewritten vocab, so the statistic's cost model
    is the training loop's cost model."""
    docs = load(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ).alias("w")
    ).filter(F.length("w") >= 2)
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    pairs = vocab.select(
        F.explode(
            F.expr("transform(sequence(1, char_length(w) - 1),"
                   " i -> substring(w, i, 2))")
        ).alias("pair"),
        "c",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("c").alias("pair_count"))
        .orderBy(F.desc("pair_count"), F.asc("pair"))
        .limit(50)
    )


_SCENE_CUTS_ORACLE = """
    WITH p AS (
        SELECT doc_id, doc_id // 11 AS g,
               1 + ('0x' || substr(md5('scn:' || (doc_id // 11)), 1, 15))
                   ::BIGINT % 65519 AS a,
               (('0x' || substr(md5('scn:' || (doc_id // 11)), 1, 15))
                   ::BIGINT // 65536) % 65521 AS b,
               doc_id % 109 = 0 AS corrupt
        FROM documents
    ),
    pr AS (
        SELECT p.doc_id, gf.i AS f, gy.i AS y, gx.i AS x,
               (p.a * (CASE WHEN gf.i < 2 THEN 0 ELSE 512 END
                       + gy.i * 16 + gx.i + 1) + p.b) % 65521 AS r,
               CASE WHEN gf.i IN (1, 3)
                    THEN (gy.i * 16 + gx.i) % 3 ELSE 0 END AS wob,
               CASE WHEN gf.i = p.doc_id % 4
                     AND gy.i = p.doc_id % 16
                     AND gx.i = (p.doc_id // 16) % 16
                    THEN p.doc_id % 7 ELSE 0 END AS pert
        FROM p, generate_series(0, 3) gf(i),
             generate_series(0, 15) gy(i), generate_series(0, 15) gx(i)
        WHERE NOT p.corrupt
    ),
    px AS (
        SELECT doc_id, f, y, x,
               (((r * r) % 65521) % 256 + wob + pert) % 256 AS v
        FROM pr
    ),
    d AS (
        SELECT cur.doc_id, cur.f AS transition,
               CAST(SUM(ABS(cur.v - prv.v)) AS BIGINT) AS sad
        FROM px cur
        JOIN px prv ON cur.doc_id = prv.doc_id AND cur.y = prv.y
                   AND cur.x = prv.x AND prv.f = cur.f - 1
        WHERE cur.f >= 1
        GROUP BY 1, 2
    )
    SELECT doc_id, transition, sad,
           CAST(sad // 256 AS BIGINT) AS mad,
           sad // 256 > 16 AS is_cut
    FROM d
    """


@query(
    "multimodal_video_scene_cuts",
    # ORACLE FIXTURE CAP: 4 frames of 16x16 (two planted 2-frame
    # shots). SAD/mean are integer-exact; threshold mad > 16.
    oracle=_SCENE_CUTS_ORACLE,
)
def multimodal_video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VIDEO scene-cut detection — the analysis face of the video tier
    (near-dup is its dedup face): synthesize a real 4-frame 16x16
    animated GIF per document with PLANTED SHOT STRUCTURE — frames 0-1
    are one shot (frame 1 = frame 0 plus a tiny ``idx % 3`` wobble,
    the re-encode jitter), frames 2-3 a second shot drawn from a
    DIFFERENT stretch of the group's squared-LCG stream (offset 512),
    so transition 2 is a true cut (mean abs pixel delta ~85) while
    transitions 1 and 3 are within-shot (~2); a per-doc single-pixel
    perturbation and every 109th container truncated, as in the rest
    of the tier. Decode with the real GIF-LZW parser, profile with
    ``multimodal.video_frame_deltas`` (integer SAD + per-pixel mean
    per consecutive frame pair), and threshold ``mad > 16`` — the
    classic cheap shot detector a frame-sampling pipeline runs before
    choosing keyframes. The oracle rebuilds every frame pixel and
    every SAD from doc_id arithmetic, so the gate proves the
    encode -> multi-frame decode -> delta-profile chain integer-exact.

    Scale: one Arrow-batched map-side pass over the blobs — no
    shuffle at all on the engine side (the transition rows are emitted
    directly by the decode stage); output is (n_frames - 1) rows per
    document, linear by construction."""
    from pubic_multi_platform_to_postgres_spark.operators.multimodal import (
        encode_gif,
        video_frame_deltas,
    )

    def render(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, blobs = [], []
            for d in pdf["doc_id"]:
                d = int(d)
                g = d // 11
                h = int(hashlib.md5(f"scn:{g}".encode()).hexdigest()[:15], 16)
                a = 1 + h % 65519
                b = (h // 65536) % 65521
                idx = np.arange(256, dtype=np.int64)
                frames = []
                for f in range(4):
                    off = 0 if f < 2 else 512
                    r = (a * (off + idx + 1) + b) % 65521
                    fr = ((r * r) % 65521) % 256
                    if f in (1, 3):
                        fr = fr + idx % 3
                    fr = fr.reshape(16, 16)
                    if f == d % 4:
                        fr[d % 16, (d // 16) % 16] += d % 7
                    frames.append((fr % 256).astype(np.uint8))
                blob = encode_gif(frames)
                ids.append(d)
                blobs.append(blob[:12] if d % 109 == 0 else blob)
            yield pd.DataFrame({"doc_id": ids, "blob": blobs})

    docs = load(spark, sf_dir, "documents").select("doc_id")
    blobs = docs.mapInPandas(render, schema="doc_id long, blob binary")
    deltas = video_frame_deltas(blobs, "blob", "doc_id")
    return deltas.filter(F.col("decode_ok")).select(
        F.col("id").alias("doc_id"),
        "transition",
        "sad",
        "mad",
        (F.col("mad") > 16).alias("is_cut"),
    )


@query(
    "dedup_crossmodal_consensus",
    # Composes the two full fixture-rebuild oracles verbatim (module
    # constants, nested-WITH subqueries) and intersects their pair sets.
    oracle=f"""
    SELECT img.id_a, img.id_b,
           img.hamming AS hamming_image, aud.hamming AS hamming_audio
    FROM ({_IMAGE_NEARDUP_ORACLE}) img
    JOIN ({_AUDIO_NEARDUP_ORACLE}) aud
      ON img.id_a = aud.id_a AND img.id_b = aud.id_b
    """,
)
def dedup_crossmodal_consensus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-signal dedup consensus — the capstone composition of the
    modality matrix: a document pair is removed ONLY when two
    INDEPENDENT fingerprint families both call it a near-dup (image
    aHash pairs INNER JOIN audio energy-contour pairs on the pair
    key), the standard web-scale trick for cutting fingerprint false
    positives — each family's collision set is (approximately)
    independent noise, so requiring agreement multiplies the
    false-positive rates while true re-uploads survive both. Emits the
    surviving pairs with BOTH families' Hamming distances, the
    evidence columns a curation review reads. On the planted fixtures
    the intersection is exactly the pairs inside BOTH a ``// 10``
    image group and a ``// 13`` audio group, so the gate has real mass
    (docs near each other in id space) and real rejections (pairs one
    family finds and the other doesn't).

    Scale: both inputs are the measured banded pair generators (linear
    planted output, ~uniform 16-bit banding buckets); the consensus is
    ONE equi-join on (id_a, id_b) — pair-stream-sized, AQE-planned, no
    new shuffle pattern."""
    img = multimodal_image_ahash_neardup(spark, sf_dir).select(
        "id_a", "id_b", F.col("hamming").alias("hamming_image"))
    aud = multimodal_audio_fingerprint_neardup(spark, sf_dir).select(
        "id_a", "id_b", F.col("hamming").alias("hamming_audio"))
    return img.join(aud, ["id_a", "id_b"])


@query(
    "text_ngram_novelty_curve",
    # Deciles are value-based over the dense doc_id range (scaled
    # fixtures keep ids dense: replica k = doc_id + k*N), so both
    # engines bucket identically with integer arithmetic.
    oracle="""
    WITH words AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
        FROM documents
    ),
    tri AS (
        SELECT doc_id,
               ws[i::INT] || ' ' || ws[i::INT + 1] || ' ' || ws[i::INT + 2]
                   AS g
        FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - 1)) AS i
              FROM words)
    ),
    firsts AS (SELECT g, MIN(doc_id) AS fd FROM tri GROUP BY g),
    n AS (SELECT MAX(doc_id) + 1 AS nd FROM documents),
    d AS (
        SELECT LEAST(9, fd * 10 // nd) AS decile,
               COUNT(*) AS new_ngrams
        FROM firsts, n GROUP BY 1
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(new_ngrams AS BIGINT) AS new_ngrams,
           CAST(SUM(new_ngrams) OVER (ORDER BY decile) AS BIGINT)
               AS cum_ngrams
    FROM d
    """,
)
def text_ngram_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus n-gram novelty curve (the Heaps-law saturation signal):
    bucket the corpus into 10 ingestion deciles by doc_id, and for
    each decile count how many word TRIGRAMS appear there for the
    FIRST time, plus the cumulative distinct-trigram count — the curve
    a curation review reads to decide whether more of the same source
    still buys new content or the corpus is saturating (flattening
    new_ngrams = diminishing novelty; near-linear = still fresh).
    Words are the ASCII ``[a-z0-9]+`` runs of the lowercased text (the
    established dialect-parity tokenization); a doc with fewer than 3
    words contributes nothing.

    Scale: the only corpus-sized work is the trigram explode (map-side)
    and ONE linear groupBy(g) -> min(doc_id) shuffle with map-side
    partial min — the same cost class as the hashed-token machinery.
    Everything after is 10-row arithmetic: the decile rollup, a
    broadcast 1-row max-doc scalar, and a 10-row running sum (the
    unpartitioned window is bounded by construction — it never sees
    more than 10 rows). At 100 TB the min-aggregation carries (g, id)
    pairs only; trigram keys could be hashed to 64-bit to shrink the
    shuffle further without changing the counts (collisions ~n^2/2^64)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    words = docs.select(
        "doc_id",
        F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").alias("ws"),
    )
    # Spark sequence(1, n) DESCENDS when n < 1 — guard short docs with
    # an explicit empty array, not greatest()
    tri = words.select(
        "doc_id",
        F.explode(F.expr(
            "CASE WHEN size(ws) >= 3 THEN transform("
            " sequence(1, size(ws) - 2),"
            " i -> concat_ws(' ', ws[i-1], ws[i], ws[i+1]))"
            " ELSE array() END"
        )).alias("g"),
    )
    firsts = tri.groupBy("g").agg(F.min("doc_id").alias("fd"))
    # the doc-count scalar is a driver-side 1-ROW aggregate fetch (the
    # catalog's documented benign pattern — same class as the perplexity
    # threshold and IVF centroid fetches); joining it in on a literal
    # key would fold to the nested-loop plan the plan-quality suite
    # forbids, and a scalar literal keeps the decile math map-side
    nd = int(docs.agg(F.max("doc_id")).first()[0]) + 1
    d = (
        firsts.select(
            F.expr(f"least(9, fd * 10 div {nd}L)").alias("decile"))
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("new_ngrams"))
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return d.select(
        F.col("decile").cast("long").alias("decile"),
        F.col("new_ngrams").cast("long").alias("new_ngrams"),
        F.sum("new_ngrams").over(w).cast("long").alias("cum_ngrams"),
    )


@query(
    "multimodal_keyframe_select",
    # Composes the scene-cut oracle verbatim; LEAD default 4 = the
    # fixture's frame count (documented cap).
    oracle=f"""
    WITH cuts AS ({_SCENE_CUTS_ORACLE}),
    kf AS (
        SELECT doc_id, transition AS f FROM cuts WHERE is_cut
        UNION ALL
        SELECT DISTINCT doc_id, 0 FROM cuts
    ),
    seq AS (
        SELECT doc_id, f,
               ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY f) - 1
                   AS shot_id,
               LEAD(f, 1, 4) OVER (PARTITION BY doc_id ORDER BY f) AS nxt
        FROM kf
    )
    SELECT doc_id, CAST(shot_id AS BIGINT) AS shot_id,
           CAST(f AS BIGINT) AS keyframe,
           CAST(nxt - f AS BIGINT) AS shot_frames
    FROM seq
    """,
)
def multimodal_keyframe_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyframe selection — the step a frame-sampling pipeline runs ON
    TOP of shot detection: segment each clip's frames into shots at
    the ``multimodal_video_scene_cuts`` boundaries and emit one
    keyframe per shot (the shot's FIRST frame — the deterministic
    representative; content-based 'best frame' scoring would slot into
    the same shape) with the shot's id and frame span. On the planted
    two-shot fixture every doc yields exactly two shots with keyframes
    0 and 2. Output is (doc, shot) rows — strictly fewer than frames,
    linear by construction.

    Scale: the delta profile is the measured map-side pass; shot
    assembly is ONE per-doc window (row_number + lead over <= n_frames
    rows per partition key — a bounded-width window partitioned by
    doc_id, no skew possible) — the same single-shuffle shape as the
    catalog's other per-entity window queries.

    r15: ``cuts`` is lazily checkpointed — it feeds TWO consumers (the
    cut rows and the per-doc frame-0 anchor), and without the
    checkpoint the whole GIF encode→LZW-decode→delta Python pipeline
    ran TWICE (the dedup_minhash_eval shared-subtree lesson; plan had
    two MapInPandas chains). Measured sf0.1: ~2× on the decode cost."""
    cuts = multimodal_video_scene_cuts(spark, sf_dir).localCheckpoint(
        eager=False
    )
    kf = cuts.filter(F.col("is_cut")).select(
        "doc_id", F.col("transition").alias("f")
    ).unionAll(
        cuts.select("doc_id").distinct().select("doc_id", F.lit(0).alias("f"))
    )
    w = Window.partitionBy("doc_id").orderBy("f")
    return kf.select(
        "doc_id",
        (F.row_number().over(w) - 1).cast("long").alias("shot_id"),
        F.col("f").cast("long").alias("keyframe"),
        (F.lead("f", 1, 4).over(w) - F.col("f")).cast("long")
        .alias("shot_frames"),
    )


@query(
    "multimodal_content_addressed_dedup",
    # Re-upload uids are d + 10,000,000 (disjoint from any fixture id
    # range); content is keyed by the ORIGINAL d, so a re-upload's
    # bytes are bit-identical to the original container.
    oracle="""
    WITH feed AS (
        SELECT doc_id AS uid, doc_id AS d FROM documents
        UNION ALL
        SELECT doc_id + 10000000 AS uid, doc_id AS d FROM documents
        WHERE doc_id % 7 = 0
    ),
    p AS (
        SELECT uid, d,
               1 + ('0x' || substr(md5('img:' || (d // 10)), 1, 15))
                   ::BIGINT % 65519 AS a,
               (('0x' || substr(md5('img:' || (d // 10)), 1, 15))
                   ::BIGINT // 65536) % 65521 AS b,
               d % 101 = 0 AS corrupt
        FROM feed
    ),
    pr AS (
        SELECT p.uid, gy.i AS y, gx.i AS x,
               (p.a * (gy.i * 16 + gx.i + 1) + p.b) % 65521 AS r,
               CASE WHEN gy.i = p.d % 16
                     AND gx.i = (p.d // 16) % 16
                    THEN p.d % 7 ELSE 0 END AS pert
        FROM p, generate_series(0, 15) gy(i), generate_series(0, 15) gx(i)
        WHERE NOT p.corrupt
    ),
    px AS (
        SELECT uid, y, x,
               (((r * r) % 65521) % 256 + pert) % 256 AS v
        FROM pr
    ),
    blk AS (
        SELECT uid, y // 2 AS by, x // 2 AS bx, SUM(v) // 4 AS bm
        FROM px GROUP BY 1, 2, 3
    ),
    gm AS (SELECT uid, SUM(bm) // 64 AS m FROM blk GROUP BY 1),
    bits AS (
        SELECT b.uid,
               SUM(CASE WHEN b.bm > gm.m AND (b.by * 8 + b.bx) < 32
                        THEN (1::BIGINT << (b.by * 8 + b.bx))
                        ELSE 0 END) AS lo,
               SUM(CASE WHEN b.bm > gm.m AND (b.by * 8 + b.bx) >= 32
                        THEN (1::BIGINT << (b.by * 8 + b.bx - 32))
                        ELSE 0 END) AS hi
        FROM blk b JOIN gm USING (uid) GROUP BY b.uid
    )
    SELECT CAST(MIN(uid) AS BIGINT) AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM bits GROUP BY lo, hi
    """,
)
def multimodal_content_addressed_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Content-addressed exactly-once ingest — the modality tier's
    answer to at-least-once delivery: every 7th clip is RE-UPLOADED
    under a fresh id with bit-identical bytes (the duplicate feed a
    retrying uploader produces), and dedup collapses on the CONTENT
    fingerprint (``multimodal.ahash64`` over the real PNG container),
    not the delivery id — so re-uploads collapse onto the first copy
    (``min(uid)``) no matter what id they arrive under, and
    coincidentally hash-identical group members (a ``d % 7 == 0``
    perturbation is a no-op) collapse too, which is exactly the
    content-addressed contract. Emits one row per distinct content
    hash: the kept id and how many feed rows collapsed into it. The
    oracle rebuilds every re-upload's pixels and hash bits from id
    arithmetic and replays the collapse.

    Scale: render/hash are map-side; the collapse is ONE groupBy on
    the 64-bit fingerprint (near-uniform by the measured squared-LCG
    entropy, no hot keys) carrying (hash, uid) pairs — the same linear
    shape as exact dedup. The STREAMING face — the same fingerprint
    aggregate as a stateful Structured Streaming query over
    micro-batched uploads, state bounded by distinct content — is
    asserted batch==streaming in ``test_streaming.py``."""
    from pubic_multi_platform_to_postgres_spark.operators.multimodal import (
        ahash64,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id")
    feed = docs.select(
        F.col("doc_id").alias("uid"), F.col("doc_id").alias("d")
    ).unionAll(
        docs.filter(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + 10_000_000).alias("uid"),
            F.col("doc_id").alias("d"),
        )
    )
    blobs = render_image_fixture(feed)
    fp = ahash64(blobs, "blob", "uid").filter(F.col("decode_ok"))
    return fp.groupBy("ahash64").agg(
        F.min("id").cast("long").alias("doc_id"),
        F.count(F.lit(1)).cast("long").alias("n_copies"),
    ).select("doc_id", "n_copies")


def _eval_grams_cte(table: str = "documents") -> str:
    return f"""
    g AS (
        SELECT doc_id, lang, n_chars // 50 AS b1, (n_chars + 25) // 50 AS b2,
               list_distinct(
                   CASE WHEN len(toks) >= 3
                        THEN list_transform(range(0, len(toks) - 2),
                                 i -> array_to_string(
                                     list_slice(toks, i + 1, i + 3), ' '))
                        ELSE [array_to_string(toks, ' ')]
                   END) AS grams
        FROM (SELECT doc_id, lang, n_chars,
                     string_split_regex(trim(lower(text)), '\\s+') AS toks
              FROM {table})
    )"""


_EVAL_GRAMS_CTE = _eval_grams_cte()

_EVAL_JAC = (
    "CAST(len(list_intersect({a}.grams, {b}.grams)) AS DOUBLE)"
    " / CAST(len({a}.grams) + len({b}.grams)"
    " - len(list_intersect({a}.grams, {b}.grams)) AS DOUBLE)"
)


# deterministic subcorpus sample for the sampled audit face: Knuth
# multiplicative scramble mod a prime, smallest-N by scrambled key.
# (doc_id % M) < 2^20 and (A % M) < 2^20, so the product stays < 2^40 —
# exact in BIGINT on both engines at any corpus size.
_EVAL_SAMPLE_N = 256
_EVAL_SAMPLE_M = 1_048_573
_EVAL_SAMPLE_A = 2_654_435_761 % _EVAL_SAMPLE_M  # 497498


def _minhash_eval_oracle_sql(sample_n: int | None = None) -> str:
    """Compose the full MinHash replay (predictions) with the exact
    3-shingle Jaccard truth set (two-grid blocking) into the confusion
    metrics row. With ``sample_n`` both sides run on the deterministic
    scrambled-key smallest-N subcorpus instead of the full table."""
    table, lead = "documents", ""
    if sample_n is not None:
        table = "sdocs"
        lead = f"""sdocs AS (
        SELECT doc_id, lang, n_chars, text FROM documents
        ORDER BY ((doc_id % {_EVAL_SAMPLE_M}) * {_EVAL_SAMPLE_A})
                     % {_EVAL_SAMPLE_M}, doc_id
        LIMIT {sample_n}
    )"""
    cte, band_conds, est = _minhash_sig_fragments(
        64, 3, 16, table=table, lead_ctes=lead
    )
    jac_ab = _EVAL_JAC.format(a="a", b="b")
    return f"""{cte},
    {_eval_grams_cte(table).strip()},
    pred AS (
        SELECT id_a, id_b FROM (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   ({est}) / 64.0 AS est_jaccard
            FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id AND ({band_conds})
        ) WHERE est_jaccard >= 0.4
    ),
    truth AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM g a JOIN g b
          ON a.lang = b.lang AND a.b1 = b.b1 AND a.doc_id < b.doc_id
        WHERE {jac_ab} >= 0.4
        UNION
        SELECT a.doc_id, b.doc_id
        FROM g a JOIN g b
          ON a.lang = b.lang AND a.b2 = b.b2 AND a.doc_id < b.doc_id
        WHERE {jac_ab} >= 0.4
    ),
    m AS (
        SELECT (SELECT COUNT(*) FROM pred) AS n_pred,
               (SELECT COUNT(*) FROM truth) AS n_truth,
               (SELECT COUNT(*) FROM pred JOIN truth USING (id_a, id_b))
                   AS n_hit,
               (SELECT COUNT(*) FROM pred p
                JOIN g ga ON ga.doc_id = p.id_a
                JOIN g gb ON gb.doc_id = p.id_b
                WHERE {_EVAL_JAC.format(a="ga", b="gb")} >= 0.4)
                   AS n_pred_exact
    )
    SELECT CAST(n_pred AS BIGINT) AS n_pred,
           CAST(n_truth AS BIGINT) AS n_truth,
           CAST(n_hit AS BIGINT) AS n_hit,
           CAST(n_pred_exact AS BIGINT) AS n_pred_exact,
           CASE WHEN n_pred > 0
                THEN CAST(n_pred_exact AS DOUBLE) / CAST(n_pred AS DOUBLE)
           END AS precision,
           CASE WHEN n_truth > 0
                THEN CAST(n_hit AS DOUBLE) / CAST(n_truth AS DOUBLE)
           END AS recall
    FROM m
    """


@query("dedup_minhash_eval", oracle=_minhash_eval_oracle_sql())
def dedup_minhash_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured precision/recall of the MinHash+LSH near-dup screen
    against exact 3-shingle Jaccard — the dedup-family companion of
    ``ann_recall_at_k``: before trusting a sketch on 100 TB you measure
    what it misses on data where the exact answer is computable.
    Predictions are the registered ``dedup_minhash_pairs`` pipeline
    (64 hashes, 16 bands, estimate ≥ 0.4); exact truth is the two-grid
    (lang, offset length-bucket) blocked exact-Jaccard join at the same
    threshold — the ``corpus_leakage_safe_split`` recall contract, so
    the truth set is every same-lang pair within 25 chars of length.
    One output row: candidate/truth/hit counts, the count of candidates
    that survive EXACT verification, precision (exact-verified fraction
    of predictions — banding collisions and estimator variance are the
    gap) and recall (truth pairs the bands caught — banding probability
    at 0.4 ≈ threshold means some true pairs never collide).

    Measured at sf0.01/sf0.1: precision = recall = 1.0, and
    ``n_pred_exact`` (25/256) EXCEEDS ``n_truth`` (6/79) — the unblocked
    banding catches exact-verified true pairs that sit OUTSIDE the
    two-grid length blocking (same-lang pairs > 25 chars apart), i.e.
    the eval also measures the truth-blocking's own blind spot, which is
    exactly the honesty this audit row exists to provide. Audit-tier
    cost: the row runs BOTH full pipelines (~2 s minhash + ~6 s exact
    SSJoin at sf0.1) plus exact verification of every prediction.

    Scale: both sides are the already-measured linear-shuffle pipelines
    (signature banding; SSJoin prefix filter); the exact verification
    of predictions joins gram arrays on the (small) prediction list,
    and the metrics are three one-row aggregates cross-joined — nothing
    new shuffles at corpus scale. The oracle replays BOTH pipelines and
    the confusion arithmetic in one statement."""
    return _minhash_eval_metrics(load(spark, sf_dir, "documents"))


def _minhash_eval_metrics(docs: DataFrame) -> DataFrame:
    """Shared audit body: MinHash predictions vs exact 3-shingle
    Jaccard truth over ``docs``, folded into the one-row confusion
    metrics frame (see :func:`dedup_minhash_eval` for the contract)."""
    pred = minhash_dedup_pairs(
        docs, "text", "doc_id", num_hashes=64, bands=16, threshold=0.4,
        token_hash="md5",
    ).select("id_a", "id_b").localCheckpoint(eager=False)
    truth = ngram_jaccard_pairs(
        docs, "text", "doc_id", block_cols=[], threshold=0.4, ngram=3,
        block_grids=[
            [F.col("lang"), F.floor(F.col("n_chars") / 50)],
            [F.col("lang"), F.floor((F.col("n_chars") + 25) / 50)],
        ],
    ).select("id_a", "id_b").localCheckpoint(eager=False)

    from pubic_multi_platform_to_postgres_spark.operators.dedup import (
        hashed_gram_sets,
    )

    # r15 (guide §8 — decide with small rows): the exact-verification
    # gram arrays are only ever probed at pred's ids (both joins below
    # are inner on id_a/id_b), so the expensive shingle build runs on
    # the prediction NEIGHBORHOOD — a left-semi join against the
    # exploded prediction ids (AQE broadcasts the tiny id list) — not on
    # the whole corpus. Output-identical by construction; at 100 TB the
    # predicted-pair doc set is the sketch's hit surface, orders of
    # magnitude under the corpus. The verification only intersects the
    # sets, so grams are hash-equivalence classes (hashed_gram_sets) —
    # no shingle strings built at all.
    pred_ids = pred.select(
        F.explode(F.array("id_a", "id_b")).alias("doc_id")
    ).distinct()
    grams = (
        docs.join(pred_ids, "doc_id", "left_semi")
        .select(
            "doc_id",
            hashed_gram_sets(F.col("text"), 3).alias("grams"),
        )
        .localCheckpoint(eager=False)
    )  # feeds BOTH sides of the pair join
    ga = grams.select(F.col("doc_id").alias("id_a"), F.col("grams").alias("ga"))
    gb = grams.select(F.col("doc_id").alias("id_b"), F.col("grams").alias("gb"))
    inter = F.size(F.array_intersect("ga", "gb"))
    jac = inter.cast("double") / (
        F.size("ga") + F.size("gb") - inter
    ).cast("double")
    pred_scored = (
        pred.join(ga, "id_a").join(gb, "id_b").select((jac >= 0.4).alias("ok"))
    )
    # 1-row aggregates combined on a literal equi-key (a bare crossJoin
    # plans as BroadcastNestedLoopJoin, which the catalog-wide plan
    # invariant forbids; the literal key makes these hash joins)
    # the key is produced BY the aggregate (max(1)) so it is a genuine
    # attribute, not a foldable literal — a literal key folds to `true`
    # and the join degenerates to nested-loop again; the coalesce keeps
    # the key non-NULL when an aggregate sees zero input rows (max over
    # nothing is NULL, and a NULL key would drop the metrics row)
    pa = pred_scored.agg(
        F.count(F.lit(1)).alias("n_pred"),
        F.sum(F.col("ok").cast("long")).alias("n_pred_exact"),
        F.max(F.lit(1)).alias("k0"),
    ).withColumn("k", F.coalesce(F.col("k0"), F.lit(1)))
    ta = truth.agg(
        F.count(F.lit(1)).alias("n_truth"), F.max(F.lit(1)).alias("k0")
    ).withColumn("k", F.coalesce(F.col("k0"), F.lit(1)))
    ha = (
        pred.join(truth, ["id_a", "id_b"])
        .agg(F.count(F.lit(1)).alias("n_hit"), F.max(F.lit(1)).alias("k0"))
        .withColumn("k", F.coalesce(F.col("k0"), F.lit(1)))
    )
    return (
        pa.join(ta, "k")
        .join(ha, "k")
        .select(
            F.col("n_pred").cast("long").alias("n_pred"),
            F.col("n_truth").cast("long").alias("n_truth"),
            F.col("n_hit").cast("long").alias("n_hit"),
            F.coalesce(F.col("n_pred_exact"), F.lit(0))
            .cast("long")
            .alias("n_pred_exact"),
            F.when(
                F.col("n_pred") > 0,
                F.col("n_pred_exact").cast("double")
                / F.col("n_pred").cast("double"),
            ).alias("precision"),
            F.when(
                F.col("n_truth") > 0,
                F.col("n_hit").cast("double") / F.col("n_truth").cast("double"),
            ).alias("recall"),
        )
    )


@query(
    "dedup_minhash_eval_sampled",
    oracle=_minhash_eval_oracle_sql(sample_n=_EVAL_SAMPLE_N),
)
def dedup_minhash_eval_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch-quality audit a 100-TB operator actually runs
    (VERDICT r10 Next #5): :func:`dedup_minhash_eval` on a FIXED-SIZE
    deterministic subcorpus sample instead of the whole corpus, making
    the audit's cost constant in corpus size. BASELINE.md's attribution
    showed the full audit's cost IS its exact ground-truth pipelines —
    un-shaveable by design — so the at-scale face bounds the input
    instead: the smallest ``_EVAL_SAMPLE_N`` documents by a Knuth
    multiplicative scramble of ``doc_id`` (mod the prime
    ``_EVAL_SAMPLE_M``, tie-broken by ``doc_id`` so the order is total)
    — a content-independent pseudo-random draw that both engines replay
    exactly in 64-bit integer arithmetic. The selection is one TopK
    (``TakeOrderedAndProject``: linear scan, 256-row heap, no shuffle);
    everything downstream — signature build, banded candidate join,
    exact-Jaccard truth join, per-prediction verification, confusion
    metrics — touches only the 256 sampled documents, so the audit
    costs the same at sf0.01 and at 100 TB (plus the one linear scan).
    Statistically this estimates the corpus-level precision/recall from
    the within-sample pair population; both-endpoint sampling thins
    pairs quadratically, which is the standard price of a subcorpus
    audit — the full row stays registered as the exhaustive gate.

    The sampled subcorpus is lazily checkpointed so the TopK (the only
    corpus-sized stage) runs once and feeds predictions, truth, and the
    verification grams."""
    docs = load(spark, sf_dir, "documents")
    scr = (
        (F.col("doc_id") % _EVAL_SAMPLE_M) * _EVAL_SAMPLE_A
    ) % _EVAL_SAMPLE_M
    sdocs = (
        docs.select("doc_id", "lang", "n_chars", "text")
        .orderBy(scr.asc(), F.col("doc_id").asc())
        .limit(_EVAL_SAMPLE_N)
        .localCheckpoint(eager=False)
    )
    return _minhash_eval_metrics(sdocs)


_COMPACT_TARGET = 200_000  # chars per compaction bin


@query(
    "layout_compaction_plan",
    oracle=f"""
    WITH assign AS (
        SELECT doc_id, source,
               ('0x' || substr(md5('shard:' || doc_id), 1, 15))::BIGINT % 16
                   AS shard_id,
               n_chars
        FROM documents
    ),
    files AS (
        SELECT source, shard_id, CAST(SUM(n_chars) AS BIGINT) AS file_chars
        FROM assign GROUP BY source, shard_id
    ),
    planned AS (
        SELECT source, shard_id, file_chars,
               CAST(COALESCE(SUM(file_chars) OVER (
                   ORDER BY source, shard_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) // {_COMPACT_TARGET} AS BIGINT) AS bin_id
        FROM files
    )
    SELECT source, CAST(shard_id AS BIGINT) AS shard_id,
           file_chars, bin_id
    FROM planned
    """,
)
def layout_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner — the lakehouse maintenance step
    that keeps a 100 TB table readable: given the physical file manifest
    (here the ``corpus_shard_manifest`` (source, shard) grid with its
    char totals — the docstring's promised packer), assign every file to
    a compaction bin by ordered coalesce: files in stable (source,
    shard) order, running prefix sum, ``bin = chars_before // target`` —
    the deterministic strategy behind ``coalesce``-style compactors
    (OPTIMIZE/rewriteDataFiles): neighboring small files merge, a bin
    never splits a file, every bin except possibly the last holds ≥
    target chars once its first file starts before the boundary, and
    re-planning after appends only changes bins at or after the first
    new file. Output is the per-file assignment (the executable plan).

    Scale: the corpus-sized work is the manifest aggregate already
    measured by ``corpus_shard_manifest`` (one shuffle); the plan itself
    runs on the FILE manifest — O(files), millions of rows at 100 TB —
    whose global prefix sum is one narrow range-partitioned sort, the
    same shape as ``corpus_pack_sequences``. Integer-exact on both
    engines (char counts are longs; the bin id is a floor division of
    positive prefix sums)."""
    docs = load(spark, sf_dir, "documents")
    files = (
        docs.select(
            "source",
            "n_chars",
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit("shard:"), F.col("doc_id"))), 1, 15
                    ),
                    16,
                    10,
                ).cast("long")
                % 16
            ).alias("shard_id"),
        )
        .groupBy("source", "shard_id")
        .agg(F.sum("n_chars").cast("long").alias("file_chars"))
    )
    w = (
        Window.orderBy("source", "shard_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return files.select(
        "source",
        F.col("shard_id").cast("long").alias("shard_id"),
        "file_chars",
        F.floor(
            F.coalesce(F.sum("file_chars").over(w), F.lit(0))
            / F.lit(_COMPACT_TARGET)
        )
        .cast("long")
        .alias("bin_id"),
    )


from pubic_multi_platform_to_postgres_spark.operators import pq as _pq  # noqa: E402


@query("sim_topk_pq", oracle=_pq.pq_oracle_sql())
def sim_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011) — the memory face of
    the similarity family next to brute/IVF/LSH: train M=8 per-subspace
    codebooks (K=16, two fixed integer k-means rounds, deterministic
    lowest-id seeding), encode the corpus to 8 one-byte codes per
    vector (32× smaller than raw float32 at D=64), and answer the fixed
    8-lowest-id probe set by ADC — per-probe distance TABLES from the
    probes' exact subvectors, corpus scored by M table lookups per
    vector. Every step is integer arithmetic (quantize floor(x·2^10);
    truncating-division centroid updates; see ``operators/pq.py`` for
    the DuckDB ``//``-vs-Python ``//`` truncation note and int64
    bounds), so the oracle replays the WHOLE chain — both k-means
    rounds, empty-cell carry-over, encoding, distance tables, ADC,
    ranking. Output: (probe_id, rank, vec_id, adc_dist).

    Scale: training collapses to M·K·DSUB driver rows per round (the
    IVF-centroid-collect class); assignment/encoding are Arrow-batched
    map-side passes with codebook literals; the ADC scan reads ONLY the
    codes column and each partition emits per-probe top-k heads, so the
    shuffle is probes·k·partitions rows into one rank window."""
    emb = load(spark, sf_dir, "embeddings")
    qsub = _pq.quantized_subvectors(emb, "embedding", "vec_id").localCheckpoint(
        eager=False
    )
    cents = _pq.train_codebooks(qsub)
    probes = [
        (r["vec_id"], r["qv"])
        for r in qsub.filter(F.col("vec_id") < _pq.N_PROBES).orderBy("vec_id").collect()
    ]
    return _pq.adc_topk(qsub, cents, probes)


_BPE_MERGES = 4


def _bpe_train_cte_prefix(merges: int = _BPE_MERGES) -> str:
    """The shared WITH-RECURSIVE prefix of both BPE oracles: vocabulary
    build plus all ``merges`` unrolled count→argmax→rewrite rounds,
    ending with the fully merged vocab ``v{merges}`` available to the
    caller's final SELECT."""
    parts = ["""WITH RECURSIVE words AS (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        FROM documents
    ),
    v0 AS MATERIALIZED (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS c,
               list_transform(range(1, length(w) + 1),
                              i -> substr(w, i::INT, 1)) AS syms
        FROM words GROUP BY w
    )"""]
    for t in range(1, merges + 1):
        prev = f"v{t - 1}"
        parts.append(f""",
    p{t} AS MATERIALIZED (
        SELECT pa, pb, CAST(SUM(c) AS BIGINT) AS pc FROM (
            SELECT c, syms[i] AS pa, syms[i + 1] AS pb FROM (
                SELECT c, syms, unnest(range(1, len(syms))) AS i
                FROM {prev} WHERE len(syms) >= 2
            )
        ) GROUP BY pa, pb
    ),
    b{t} AS MATERIALIZED (
        SELECT pa, pb, pc FROM (
            SELECT pa, pb, pc,
                   ROW_NUMBER() OVER (ORDER BY pc DESC, pa, pb) AS rn
            FROM p{t}
        ) WHERE rn = 1
    ),
    wk{t}(w, pos, acc) AS (
        SELECT w, 1, [syms[1]] FROM {prev}
        UNION ALL
        SELECT k.w, k.pos + 1,
               CASE WHEN k.acc[-1] = b.pa AND v.syms[k.pos + 1] = b.pb
                    THEN list_append(list_slice(k.acc, 1, len(k.acc) - 1),
                                     b.pa || b.pb)
                    ELSE list_append(k.acc, v.syms[k.pos + 1])
               END
        FROM wk{t} k JOIN {prev} v ON v.w = k.w CROSS JOIN b{t} b
        WHERE k.pos < len(v.syms)
    ),
    v{t} AS MATERIALIZED (
        SELECT v.w, v.c, k.acc AS syms
        FROM wk{t} k JOIN {prev} v ON v.w = k.w
        WHERE k.pos = len(v.syms)
    ),
    s{t} AS MATERIALIZED (
        SELECT (SELECT COUNT(DISTINCT s) FROM (
                    SELECT unnest(syms) AS s FROM v{t})) AS n_symbols_after,
               (SELECT CAST(SUM(c * len(syms)) AS BIGINT) FROM v{t})
                   AS total_units_after
    )""")
    return "".join(parts)


def _bpe_merge_oracle_sql(merges: int = _BPE_MERGES) -> str:
    """DuckDB replay of the full BPE training loop: vocabulary build,
    then per merge step the weighted adjacent-pair count, the argmax
    (tie-broken lexicographically), and the greedy left-to-right
    non-overlapping rewrite of every vocab word as a recursive CTE over
    symbol positions — all ``merges`` steps unrolled, so the gate proves
    each distributed count→argmax→rewrite round, not just the final
    merge table."""
    selects = [
        f"""SELECT {t} AS step, pa, pb, pc AS pair_count,
           CAST(n_symbols_after AS BIGINT) AS n_symbols_after,
           total_units_after
    FROM b{t} CROSS JOIN s{t}"""
        for t in range(1, merges + 1)
    ]
    return (
        _bpe_train_cte_prefix(merges)
        + "\n    "
        + "\n    UNION ALL\n    ".join(selects)
    )


@query("text_bpe_merge_steps", oracle=_bpe_merge_oracle_sql())
def text_bpe_merge_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE training LOOP (Sennrich et al. 2016) —
    ``text_bpe_pair_counts`` is iteration zero; this runs the first
    four merges end-to-end, distributed: per step, (1) weighted
    adjacent-pair counts over the symbolized VOCABULARY (the classic
    trick — the pair explode touches |vocab| rows, corpus frequency
    rides along as the weight), (2) the argmax pair (1-row TakeOrdered,
    lexicographic tie-break), (3) a greedy left-to-right
    non-overlapping rewrite of every vocab word's symbol list — a
    single map-side ``aggregate`` HOF whose accumulator replays exactly
    the scan a tokenizer trainer runs (``"aaaa"`` + merge (a,a) →
    ``["aa","aa"]``, never the overlapping middle pair). Output: the
    merge table a tokenizer ships — (step, pa, pb, pair_count) — plus
    per-step audit columns (distinct symbols, total corpus units after
    the merge, which must strictly decrease by pair_count··· exactly
    ``total_units_t = total_units_{t-1} − pair_count_t`` when no merged
    occurrence overlaps; the invariant test pins the bookkeeping).

    Scale: every step is one |vocab|-sized map-side pass + one bounded
    pair aggregate + a 1-row argmax collect (the IVF-centroid class);
    the corpus is read ONCE to build the weighted vocabulary; K merges
    = K linear vocab passes with lineage cut per step. The oracle
    unrolls all four steps — pair counts, argmax, and the greedy
    rewrite as a recursive CTE over symbol positions — so every round
    is hash-verified, not just the final table."""
    docs = load(spark, sf_dir, "documents")
    out = []

    def on_step(step, pa, pb, pc, v):
        # r15: one exploded aggregate yields BOTH audit numbers — over
        # the exploded (symbol, c) rows, sum(c) = Σ c·|syms| is exactly
        # the post-merge unit total and countDistinct(s) the symbol
        # count — halving the per-step driver jobs (2 collects → 1).
        # coalesce: an all-empty-syms vocab explodes to zero rows, where
        # sum(c) is NULL but the pre-r15 unexploded formulation yielded
        # 0 (ADVICE r15) — unreachable for real BPE states, kept exact.
        row = (
            v.select(F.explode("syms").alias("s"), "c")
            .agg(
                F.countDistinct("s").alias("n"),
                F.coalesce(F.sum("c").cast("long"), F.lit(0)).alias("u"),
            )
            .collect()[0]
        )
        out.append((step, pa, pb, pc, int(row["n"]), int(row["u"])))

    _bpe_train(docs, _BPE_MERGES, on_step)
    return spark.createDataFrame(
        out,
        "step int, pa string, pb string, pair_count long,"
        " n_symbols_after long, total_units_after long",
    )


def _bpe_train(docs: DataFrame, merges: int, on_step=None) -> DataFrame:
    """The distributed BPE training loop shared by ``text_bpe_merge_steps``
    (which audits every round via ``on_step``) and ``text_bpe_encode``
    (which only needs the final merged vocabulary). Returns the vocab
    frame ``(w, c, syms)`` after ``merges`` rounds; each round is one
    |vocab|-sized pair aggregate, a 1-row argmax collect, and a map-side
    greedy rewrite, with lineage cut per step."""
    v = (
        docs.select(
            F.explode(
                F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .select(
            "w",
            "c",
            F.expr(
                "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
            ).alias("syms"),
        )
        .localCheckpoint(eager=False)
    )
    for step in range(1, merges + 1):
        pairs = (
            v.filter(F.size("syms") >= 2)
            .select(
                "c",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1),"
                        " i -> named_struct('pa', element_at(syms, i), 'pb', element_at(syms, i + 1)))"
                    )
                ).alias("p"),
            )
            .groupBy("p.pa", "p.pb")
            .agg(F.sum("c").alias("pc"))
        )
        best = pairs.orderBy(F.desc("pc"), "pa", "pb").limit(1).collect()
        if not best:
            break
        pa, pb, pc = best[0]["pa"], best[0]["pb"], int(best[0]["pc"])
        merged = F.concat(F.lit(pa), F.lit(pb))
        rewrite = F.when(F.size("syms") < 2, F.col("syms")).otherwise(
            F.aggregate(
                F.slice(F.col("syms"), F.lit(2), F.size("syms") - 1),
                F.slice(F.col("syms"), 1, 1),
                lambda acc, x: F.when(
                    (F.element_at(acc, -1) == F.lit(pa)) & (x == F.lit(pb)),
                    F.concat(
                        F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(merged)
                    ),
                ).otherwise(F.concat(acc, F.array(x))),
            )
        )
        v = v.select("w", "c", rewrite.alias("syms")).localCheckpoint(eager=False)
        if on_step is not None:
            on_step(step, pa, pb, pc, v)
    return v


@query(
    "text_bpe_encode",
    oracle=_bpe_train_cte_prefix(_BPE_MERGES)
    + f""",
    dw AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
            AS w
        FROM documents
    )
    SELECT dw.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(len(v.syms)) AS BIGINT) AS n_tokens,
           CAST(SUM(length(dw.w)) AS BIGINT) AS n_units0,
           CAST(SUM(len(v.syms)) AS DOUBLE) / SUM(length(dw.w)) AS compression
    FROM dw JOIN v{_BPE_MERGES} v ON v.w = dw.w
    GROUP BY dw.doc_id
    """,
)
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODING — the other half of the tokenizer
    (``text_bpe_merge_steps`` trains; this applies): run the trained
    merge table over the corpus and report per document the REAL token
    count under the learned vocabulary, the pre-merge unit count
    (characters of word content), and the compression ratio — the
    numbers a token-budget planner (``corpus_mixture_plan``,
    ``corpus_pack_sequences``) actually needs, where whitespace proxies
    under- or over-count.

    The classic trick makes encode corpus-cheap: merges apply per WORD,
    so the rewrite runs once over the |vocab| table (not the corpus) and
    documents join their words against the encoded vocab — token counts
    ride the join. Self-trained on the same corpus (the merge table is
    the ``_BPE_MERGES``-round loop), so every doc word is in the vocab
    by construction.

    Scale: training is K linear vocab passes (measured family —
    ``text_bpe_merge_steps``); doc scoring explodes words map-side,
    joins the |vocab|-sized encoded table on the word (AQE decides the
    strategy — no hint), and rolls up per doc — one shuffle each. The
    oracle replays training via the shared unrolled recursive-CTE
    prefix, then the same join/rollup."""
    docs = load(spark, sf_dir, "documents")
    v = _bpe_train(docs, _BPE_MERGES)
    dw = docs.select(
        "doc_id",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ).alias("w"),
    )
    return (
        dw.join(v.select("w", F.size("syms").alias("nt")), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("nt").alias("n_tokens"),
            F.sum(F.length("w")).alias("n_units0"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_tokens",
            "n_units0",
            (F.col("n_tokens").cast("double") / F.col("n_units0")).alias(
                "compression"
            ),
        )
    )


# The URL fixture (each engine builds it in its own dialect — integer
# division and string casts don't share syntax): every document gets a
# primary URL derived from its id (7 hosts, per-doc path, tracking
# query on even ids) and every 5th doc repeats its NEIGHBOR's canonical
# URL under a different scheme/www/query dressing — the exact-dup class
# URL normalization exists to catch.
_URL_WRAP_SQL = (
    "text || ' https://' || CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END"
    " || 'site' || CAST(doc_id % 7 AS VARCHAR) || '.example/p/'"
    " || CAST(doc_id // 7 AS VARCHAR)"
    " || CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed' ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0"
    "         THEN ' http://site' || CAST((doc_id + 1) % 7 AS VARCHAR)"
    "              || '.example/p/' || CAST((doc_id + 1) // 7 AS VARCHAR)"
    "              || '?ref=copy'"
    "         ELSE '' END"
)


def _url_wrap_col() -> Column:
    d = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.lit(" https://"),
        F.when(d % 3 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.lit("site"), (d % 7).cast("string"),
        F.lit(".example/p/"), F.floor(d / 7).cast("long").cast("string"),
        F.when(d % 2 == 0, F.lit("?utm_source=feed")).otherwise(F.lit("")),
        F.when(
            d % 5 == 0,
            F.concat(
                F.lit(" http://site"), ((d + 1) % 7).cast("string"),
                F.lit(".example/p/"),
                F.floor((d + 1) / 7).cast("long").cast("string"),
                F.lit("?ref=copy"),
            ),
        ).otherwise(F.lit("")),
    )


@query(
    "text_url_domain_stats",
    oracle=f"""
    WITH wrapped AS (
        SELECT doc_id,
               {_URL_WRAP_SQL} AS body
        FROM documents
    ),
    urls AS (
        SELECT doc_id, unnest(regexp_extract_all(body,
            'https?://[^ ]+')) AS url
        FROM wrapped
    ),
    norm AS (
        SELECT doc_id,
               split_part(regexp_replace(
                   regexp_replace(url, '^https?://', ''), '^www\\.', ''),
                   '?', 1) AS canon
        FROM urls
    ),
    keyed AS (
        SELECT doc_id, canon, split_part(canon, '/', 1) AS host FROM norm
    )
    SELECT host,
           CAST(COUNT(*) AS BIGINT) AS n_urls,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT canon) AS BIGINT) AS n_canonical,
           CAST(COUNT(*) - COUNT(DISTINCT canon) AS BIGINT) AS n_dup_urls
    FROM keyed GROUP BY host
    """,
)
def text_url_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL extraction + canonicalization + per-domain rollup — the web
    half of corpus curation: pull every URL out of the text (regex on
    the raw bytes — matching Java and RE2 dialects, same policy as
    ``text_html_extract``), canonicalize (scheme off, leading ``www.``
    off, query string off), and report per host: URL mentions, citing
    documents, distinct canonical URLs, and the dup-mention count —
    the per-domain fetch/dedup planning table every crawl pipeline
    keeps. The fixture plants id-derived URLs including cross-doc
    repeats under different scheme/www/query dressings, so the
    canonicalization provably collapses exactly those (pinned by the
    dup-count column: mentions − canonicals).

    Scale: extraction + canonicalization are map-side regex/split
    chains (JVM codegen); the rollup is ONE shuffle keyed by host —
    the same linear shape as every count-distinct rollup in the
    catalog (exact distincts expand per-key; swap to HLL sketches at
    100 TB if the host key ever skews, the same trade
    ``agg_approx_distinct`` documents). The oracle replays wrap,
    extraction, canonicalization, and the rollup."""
    docs = load(spark, sf_dir, "documents")
    wrapped = docs.select(
        "doc_id",
        _url_wrap_col().alias("body"),
    )
    urls = wrapped.select(
        "doc_id",
        F.explode(
            F.expr("regexp_extract_all(body, 'https?://[^ ]+', 0)")
        ).alias("url"),
    )
    norm = urls.select(
        "doc_id",
        F.split_part(
            F.regexp_replace(
                F.regexp_replace("url", F.lit("^https?://"), F.lit("")),
                F.lit("^www\\."),
                F.lit(""),
            ),
            F.lit("?"),
            F.lit(1),
        ).alias("canon"),
    )
    keyed = norm.select(
        "doc_id", "canon", F.split_part("canon", F.lit("/"), F.lit(1)).alias("host")
    )
    return keyed.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_urls"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.countDistinct("canon").cast("long").alias("n_canonical"),
        (F.count(F.lit(1)) - F.countDistinct("canon"))
        .cast("long")
        .alias("n_dup_urls"),
    )


@query(
    "corpus_url_dedup",
    oracle=f"""
    WITH wrapped AS (
        SELECT doc_id, n_chars, {_URL_WRAP_SQL} AS body FROM documents
    ),
    urls AS (
        SELECT doc_id, n_chars,
               unnest(regexp_extract_all(body, 'https?://[^ ]+')) AS url
        FROM wrapped
    ),
    pairs AS (
        SELECT DISTINCT doc_id, n_chars,
               split_part(regexp_replace(
                   regexp_replace(url, '^https?://', ''), '^www\\.', ''),
                   '?', 1) AS canon
        FROM urls
    ),
    mentions AS (
        SELECT split_part(regexp_replace(
                   regexp_replace(url, '^https?://', ''), '^www\\.', ''),
                   '?', 1) AS canon,
               CAST(COUNT(*) AS BIGINT) AS n_mentions
        FROM urls GROUP BY 1
    ),
    ranked AS (
        SELECT doc_id, n_chars, canon,
               ROW_NUMBER() OVER (PARTITION BY canon
                                  ORDER BY n_chars DESC, doc_id) AS rn
        FROM pairs
    ),
    grp AS (
        SELECT canon,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               MAX(CASE WHEN rn = 1 THEN doc_id END) AS kept_doc,
               CAST(COALESCE(SUM(CASE WHEN rn > 1 THEN n_chars END), 0)
                    AS BIGINT) AS dropped_chars
        FROM ranked GROUP BY canon
    )
    SELECT g.canon, g.kept_doc, g.n_docs, m.n_mentions, g.dropped_chars
    FROM grp g JOIN mentions m USING (canon)
    WHERE g.n_docs >= 2
    """,
)
def corpus_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-level canonical-URL dedup — the fetch-manifest collapse every
    web pipeline runs before content dedup: extract every URL, normalize
    to its canonical form (scheme off, ``www.`` off, query string off —
    the same policy as ``text_url_domain_stats``), and for each canonical
    URL cited by ≥2 documents elect the KEEP document (longest text, then
    lowest id — keep-best survivorship, same rule as
    ``corpus_dedup_keep_best``) and price the collapse: citing docs,
    raw mentions, and the characters the dropped citations represent.
    The fixture's every-5th-doc neighbor repeats under different
    scheme/www/query dressings are exactly the rows this returns.

    Scale: map-side regex extract/normalize (JVM codegen), one DISTINCT
    on (doc, canon), then — HOT-CANON-PROOF by construction (VERDICT
    r11 Next #4) — the keep-doc election runs as a pure ASSOCIATIVE
    aggregate, not a rank window: ``kept_doc = max_by(doc_id,
    (n_chars, −doc_id))`` and ``dropped_chars = Σ n_chars − kept's
    n_chars``, both partial-aggregable, so a Zipf-head canonical URL
    cited by 10% of the corpus is map-side-combined before the shuffle
    and there is no per-canon sort group to salt at ANY citer-set size
    (the r11 docstring promised tournament salting as the remedy;
    deleting the sort beats salting it — measured on the planted
    hot-canon fixture by ``tools/bench_skew.py``'s urlhot section,
    where this plan holds flat while the retained window face
    :func:`url_dedup_window_face` pays the hot sort group). Output is
    bit-identical: the election key (n_chars, −doc_id) is unique per
    (canon, doc), so argmax ≡ rank-1."""
    docs = load(spark, sf_dir, "documents")
    wrapped = docs.select("doc_id", "n_chars", _url_wrap_col().alias("body"))
    return url_dedup_over(wrapped)


def url_dedup_over(wrapped: DataFrame, use_window: bool = False) -> DataFrame:
    """Canonical-URL dedup over ``(doc_id, n_chars, body)`` — the plan
    behind ``corpus_url_dedup``. ``use_window=True`` is the retired
    rank-window election kept as a measurement face (one sort group per
    canon — the hot-canon liability); the default aggregate-only
    election is output-identical (pinned by
    ``test_llmdata.py::test_url_dedup_window_and_aggregate_faces_agree``)
    and partial-aggregable end to end."""
    urls = wrapped.select(
        "doc_id",
        "n_chars",
        F.explode(
            F.expr("regexp_extract_all(body, 'https?://[^ ]+', 0)")
        ).alias("url"),
    )
    canon = F.split_part(
        F.regexp_replace(
            F.regexp_replace("url", F.lit("^https?://"), F.lit("")),
            F.lit("^www\\."),
            F.lit(""),
        ),
        F.lit("?"),
        F.lit(1),
    ).alias("canon")
    with_canon = urls.select("doc_id", "n_chars", canon)
    pairs = with_canon.distinct()
    mentions = with_canon.groupBy("canon").agg(
        F.count(F.lit(1)).cast("long").alias("n_mentions")
    )
    if use_window:
        w = Window.partitionBy("canon").orderBy(F.desc("n_chars"), "doc_id")
        ranked = pairs.withColumn("rn", F.row_number().over(w))
        grp = ranked.groupBy("canon").agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).alias(
                "kept_doc"
            ),
            F.coalesce(
                F.sum(F.when(F.col("rn") > 1, F.col("n_chars"))), F.lit(0)
            ).cast("long").alias("dropped_chars"),
        )
    else:
        # argmax election: lexicographic max of (n_chars, -doc_id) IS
        # rank-1 of ORDER BY n_chars DESC, doc_id — and every term here
        # map-side-combines, so the hot canon never forms a sort group
        key = F.struct(
            F.col("n_chars").alias("nc"), (-F.col("doc_id")).alias("nid")
        )
        grp = pairs.groupBy("canon").agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.max_by("doc_id", key).alias("kept_doc"),
            (F.sum("n_chars") - F.max(key).getField("nc"))
            .cast("long").alias("dropped_chars"),
        )
    return (
        grp.join(mentions, "canon")
        .filter(F.col("n_docs") >= 2)
        .select("canon", "kept_doc", "n_docs", "n_mentions", "dropped_chars")
    )


def url_dedup_window_face(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retired RANK-WINDOW election as a measurement face for
    ``tools/bench_skew.py`` (same wrap, ``use_window=True``) — exists so
    the hot-canon fixture can price the sort group the aggregate plan
    deleted."""
    docs = load(spark, sf_dir, "documents")
    wrapped = docs.select("doc_id", "n_chars", _url_wrap_col().alias("body"))
    return url_dedup_over(wrapped, use_window=True)


def _url_wrap_hot_col(hot_mod: int = 10) -> Column:
    """The standard URL wrap PLUS a planted Zipf-head citation: every
    ``doc_id % hot_mod == 0`` document also cites one canonical URL
    (``hub.example/front``) under a per-doc query-string dressing — at
    ``hot_mod=10`` that is 10% of the corpus citing ONE canon, the
    hot-canon case the r11 verdict asked to measure (Next #4)."""
    d = F.col("doc_id")
    return F.concat(
        _url_wrap_col(),
        F.when(
            d % hot_mod == 0,
            F.concat(
                F.lit(" https://hub.example/front?src="), d.cast("string")
            ),
        ).otherwise(F.lit("")),
    )


# ---------------------------------------------------------------------------
# Round 9: corpus lexical-statistics family (novelty, concentration,
# block-level dedup with reassembly)

_TOKS_LOWER_CTE = (
    "SELECT doc_id, source,"
    " string_split_regex(trim(lower(text)), '\\s+') AS toks FROM documents"
)


@query(
    "corpus_ngram_novelty",
    oracle=f"""
    WITH t AS ({_TOKS_LOWER_CTE}),
    g AS (
        SELECT doc_id, ('0x' || substr(md5(gram), 1, 15))::BIGINT AS gh
        FROM (
            SELECT doc_id, unnest(list_distinct(
                CASE WHEN len(toks) >= 3
                     THEN list_transform(range(0, len(toks) - 2),
                              i -> array_to_string(list_slice(toks, i + 1, i + 3), ' '))
                     ELSE [array_to_string(toks, ' ')] END)) AS gram
            FROM t
        )
    ),
    fst AS (SELECT gh, MIN(doc_id) AS first_doc FROM g GROUP BY gh)
    SELECT g.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CAST(f.first_doc < g.doc_id AS INT)) AS BIGINT) AS n_repeated,
           CAST(COUNT(*) - SUM(CAST(f.first_doc < g.doc_id AS INT)) AS DOUBLE)
               / COUNT(*) AS novelty
    FROM g JOIN fst f USING (gh)
    GROUP BY g.doc_id
    """,
)
def corpus_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram NOVELTY against everything ingested before it
    — the 'how much of this doc have we already seen' curve from the
    dedup-analysis literature (novelty decays as a crawl grows; docs
    with near-zero novelty are recombinations of seen text even when no
    single near-dup pair catches them). A document's distinct 3-shingles
    are matched against the global first-occurrence table (min doc_id
    per shingle — ingest order); ``n_repeated`` counts shingles some
    earlier doc already contributed, and ``novelty`` is the fresh
    fraction ``(n_grams − n_repeated)/n_grams`` (single fixed-order
    division, exact integers inside). PER-DOCUMENT granularity — the
    curation filter signal; ``text_ngram_novelty_curve`` is the same
    first-occurrence idea rolled up to the corpus decile curve.

    Scale: shingles build map-side (the ``word_shingles`` expression —
    no Python) and are hashed to the 60-bit md5 integer BEFORE any
    shuffle, so both gram-keyed exchanges carry 8-byte keys instead of
    ~25-byte shingle strings (~3× less shuffle width; any hash
    collision is IDENTICAL on both engines, so the oracle gate stays
    exact); with the build checkpointed the query measures 6.5→4.0 s
    at sf0.1 — the residual is the one-time shingle-string build
    itself, the same HOF cost the whole jaccard family pays; the
    first-occurrence table is one linear shuffle with a map-side MIN
    combiner; the
    scoring join is hash-keyed against that distinct table (no fan-out
    blowup: left side is per-doc DISTINCT shingles), and the per-doc
    rollup is one shuffle on doc id. Nothing is quadratic; no broadcast
    hint — AQE sizes the join. Incremental form at 100 TB: persist
    ``fst`` and anti-join new batches, exactly like
    ``dedup_incremental_new_batch``."""
    docs = load(spark, sf_dir, "documents")
    # the shingle build (string HOFs) is the expensive map-side stage and
    # feeds BOTH the first-occurrence aggregate and the scoring join —
    # checkpoint it lazily so it runs once (the dedup_minhash_eval
    # shared-subtree lesson; measured ~2x at sf0.1)
    # (r15: a one-window rewrite — min(doc_id) over partitionBy(gh) —
    # was measured at 5.69 s vs 4.59 s for this plan and rejected; the
    # window's full sort of the gram stream costs more than the hash
    # aggregate + join-probe it replaces)
    grams = (
        docs.select(
            "doc_id",
            F.explode(
                F.array_distinct(word_shingles(tokenize(F.col("text")), 3))
            ).alias("gram"),
        )
        .select(
            "doc_id",
            F.conv(F.substring(F.md5("gram"), 1, 15), 16, 10)
            .cast("long")
            .alias("gh"),
        )
        .localCheckpoint(eager=False)
    )
    fst = grams.groupBy("gh").agg(F.min("doc_id").alias("first_doc"))
    seen = (F.col("first_doc") < F.col("doc_id")).cast("long")
    return (
        grams.join(fst, "gh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(seen).alias("n_repeated"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_repeated",
            (
                (F.col("n_grams") - F.col("n_repeated")).cast("double")
                / F.col("n_grams")
            ).alias("novelty"),
        )
    )


@query(
    "corpus_token_gini",
    oracle=f"""
    WITH t AS ({_TOKS_LOWER_CTE}),
    tok AS (SELECT source, unnest(toks) AS tok FROM t),
    cnt AS (SELECT source, tok, COUNT(*) AS c FROM tok GROUP BY source, tok),
    rk AS (
        SELECT source, tok, c,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY c, tok) AS r
        FROM cnt
    ),
    ag AS (
        SELECT source, COUNT(*) AS nv, CAST(SUM(c) AS BIGINT) AS st,
               SUM(CAST(r AS HUGEINT) * c) AS sw
        FROM rk GROUP BY source
    )
    SELECT source, CAST(nv AS BIGINT) AS n_vocab, st AS n_tokens,
           CAST(2 * sw - CAST(nv + 1 AS HUGEINT) * st AS DOUBLE)
               / CAST(CAST(nv AS HUGEINT) * st AS DOUBLE) AS gini
    FROM ag
    """,
)
def corpus_token_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary CONCENTRATION: the Gini coefficient of the
    token-frequency distribution — the one-number answer to 'is this
    source natural text or template chrome' (natural language sits high
    ~0.8+ by Zipf; machine-generated or fixed-vocabulary sources sit
    visibly lower/higher). Exact rank-sum form over ascending counts:
    ``G = (2·Σ r·c_r − (n+1)·Σc) / (n·Σc)`` with the rank tie broken by
    token text so both engines rank identically. The rank-weighted sum
    is computed in DECIMAL(38,0) (DuckDB: HUGEINT) — ``r·c`` exceeds
    int64 once vocab × corpus-tokens passes ~9·10¹⁸ — and the output
    pays exactly one double division.

    Scale: token counting is one linear shuffle with map-side combine;
    the rank window runs over the per-source VOCAB table (a model table
    — Heaps' law bounds it at ~1e8 rows per source at 100 TB, and each
    source sorts independently), never the corpus; the final rollup is
    |sources| rows."""
    docs = load(spark, sf_dir, "documents")
    cnt = (
        docs.select("source", F.explode(tokenize(F.col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    rk = cnt.withColumn(
        "r", F.row_number().over(Window.partitionBy("source").orderBy("c", "tok"))
    )
    ag = rk.groupBy("source").agg(
        F.count(F.lit(1)).alias("nv"),
        F.sum("c").alias("st"),
        F.expr("sum(CAST(r AS DECIMAL(38,0)) * c)").alias("sw"),
    )
    return ag.select(
        "source",
        F.col("nv").cast("long").alias("n_vocab"),
        F.col("st").alias("n_tokens"),
        F.expr(
            "CAST(2 * sw - CAST(nv + 1 AS DECIMAL(38,0)) * st AS DOUBLE)"
            " / CAST(CAST(nv AS DECIMAL(38,0)) * st AS DOUBLE)"
        ).alias("gini"),
    )


_BLOCK_W = 16  # words per aligned dedup block


@query(
    "corpus_block_dedup",
    oracle=f"""
    WITH t AS ({_TOKS_LOWER_CTE}),
    blk AS (
        SELECT doc_id, g.i - 1 AS block_idx,
               array_to_string(list_slice(toks, (g.i - 1) * {_BLOCK_W} + 1,
                                          (g.i - 1) * {_BLOCK_W} + {_BLOCK_W}),
                               ' ') AS btext
        FROM t, generate_series(1, 1024) g(i)
        WHERE g.i <= CAST(ceil(len(toks) / {_BLOCK_W}.0) AS BIGINT)
    ),
    rk AS (
        SELECT doc_id, block_idx, btext,
               ROW_NUMBER() OVER (PARTITION BY btext
                                  ORDER BY doc_id, block_idx) AS rn
        FROM blk
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_blocks,
           CAST(SUM(CAST(rn = 1 AS INT)) AS BIGINT) AS n_kept,
           CAST(SUM(CAST(rn = 1 AS INT)) AS DOUBLE) / COUNT(*) AS kept_frac,
           COALESCE(string_agg(CASE WHEN rn = 1 THEN btext END, ' '
                               ORDER BY block_idx), '') AS text_dedup
    FROM rk GROUP BY doc_id
    """,
)
def corpus_block_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document EXACT dedup with document reassembly — the
    CCNet/RefinedWeb 'duplicated paragraph removal' step: the corpus is
    cut into aligned 16-word blocks (the paragraph analog for the
    unpunctuated fixture; on real corpora the splitter is newline
    paragraphs, the dataflow is identical), every block text keeps only
    its FIRST occurrence in ingest order (global winner = smallest
    (doc_id, block_idx)), and each document is REASSEMBLED from its
    surviving blocks in position order — the output is a cleaned corpus
    plus per-doc retention stats, not just a flag. Repeated template
    chrome shared across documents survives exactly once, in the
    earliest document that carried it.

    Alignment contract (same as ``corpus_boilerplate_scrub``): blocks
    start at word offsets 0, 16, 32, …, so identical text preceded
    by different-length prefixes lands in different blocks and is NOT
    collapsed — exact-block dedup trades that recall for never needing
    more than one linear shuffle per stage.

    Scale: block build is map-side (``sequence``/``transform``/
    ``slice`` — no Python); the winner table is one shuffle on block
    text with a map-side MIN(struct) combiner; the keep-join is
    block-keyed; reassembly is one shuffle on doc id with a per-doc
    bounded ``collect_list`` (a document's own blocks — never corpus
    data). No broadcast hint, no quadratic stage.

    ORACLE FIXTURE CAP: generate_series(1, 1024) bounds blocks per doc
    (TESTDATA.md max doc ≈ 110 tokens → 7 blocks); the Spark side has
    no cap."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokenize(F.col("text")).alias("w"))
    blk = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, CAST(ceil(size(w) / {_BLOCK_W}.0) AS INT)"
                f" - 1), b -> array_join(slice(w, b * {_BLOCK_W} + 1,"
                f" {_BLOCK_W}), ' '))"
            )
        ).alias("block_idx", "btext"),
    )
    win = blk.groupBy("btext").agg(
        F.min(F.struct("doc_id", "block_idx")).alias("w0")
    )
    j = blk.join(win, "btext")
    kept = (F.col("doc_id") == F.col("w0.doc_id")) & (
        F.col("block_idx") == F.col("w0.block_idx")
    )
    return (
        j.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum(kept.cast("long")).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(kept, F.struct("block_idx", "btext"))
                        )
                    ),
                    lambda s: s.getField("btext"),
                ),
                " ",
            ).alias("text_dedup"),
        )
        .select(
            "doc_id",
            "n_blocks",
            "n_kept",
            (F.col("n_kept").cast("double") / F.col("n_blocks")).alias("kept_frac"),
            "text_dedup",
        )
    )


@query(
    "text_char_trigram_entropy",
    oracle="""
    WITH norm AS (
        SELECT doc_id, lower(text) AS nm FROM documents
        WHERE length(text) >= 3
    ),
    g AS (
        SELECT doc_id, substr(nm, g.i, 3) AS gram
        FROM norm, generate_series(1, 1024) g(i)
        WHERE g.i <= length(nm) - 2
    ),
    c AS (SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY doc_id, gram),
    a AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
               CAST(SUM(c * CAST(round(ln(c) * 1000000, 0) AS BIGINT))
                    AS BIGINT) AS s
        FROM c GROUP BY doc_id
    )
    SELECT doc_id, n AS n_grams,
           CAST(round(ln(n) * 1000000, 0) AS BIGINT) - s // n AS h_micro_nats,
           CAST(CAST(round(ln(n) * 1000000, 0) AS BIGINT) - s // n AS DOUBLE)
               / 1000000.0 AS entropy
    FROM a
    """,
)
def text_char_trigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-trigram Shannon entropy — the model-free
    quality signal that needs no trained weights at all: natural text
    sits in a tight entropy band; base64/hex garble scores near the
    uniform ceiling and template chrome (repeated trigrams) scores low.
    ``H = ln n − (Σ c·ln c)/n`` over the doc's trigram counts, computed
    in integer micro-nats: ``ln`` is quantized to ``round(ln(x)·10⁶)``
    per distinct count value, products and sums are exact integers, and
    the one integer division pins the result — the same 1e-6-grid
    engine-``ln`` tolerance as ``dsir_weights`` (ulp differences absorb
    except within ~1e-8 of a half). Docs under 3 chars are out of
    domain on both engines.

    Scale: the ENTIRE computation is map-side (r15, guide §2.4): a
    document's trigram histogram is a pure function of its own text, so
    instead of exploding every trigram occurrence into a row and paying
    two text-sized shuffles (groupBy (doc, gram), then groupBy doc —
    the r14 plan, 2 Exchanges), the counts come from one run-length
    fold over the doc's SORTED trigram array: ``array_sort`` groups
    equal trigrams adjacently and a single ``aggregate`` HOF walks the
    runs, folding ``Σ c·lnq(c)`` with the identical integer micro-nat
    quantization per run. Zero Exchanges — scan → project → done; at
    100 TB this removes the ×3-text-bytes shuffle entirely. Measured
    sf0.1 (noop sink, 5 repeats): 4.67 s pinned → 4.05 s median, with
    the plan down to a single scan→project stage. The lowered text and the
    sorted array are let-bound (``transform(array(x), v -> …)[0]``, the
    ``textstats._let`` idiom) so CollapseProject cannot re-inline the
    sort into every lambda reference.

    ORACLE FIXTURE CAP: generate_series(1, 1024) bounds trigram
    positions (TESTDATA.md max doc 577 chars); the Spark side has no
    cap."""
    docs = load(spark, sf_dir, "documents").filter(F.length("text") >= 3)
    lnq = "CAST(round(ln({x}) * 1000000, 0) AS BIGINT)"
    # run-length fold over the sorted trigram array: acc = (run, s);
    # run = 0 marks the initial state (first element starts run 1), a
    # value change terminates the run and folds c·lnq(c); the finish
    # lambda folds the last run. n ≥ 1 is guaranteed by the length
    # filter, so the finish fold always sees run ≥ 1.
    fold = (
        "aggregate("
        "  sequence(1, size(__st)),"
        "  named_struct('run', CAST(0 AS BIGINT), 's', CAST(0 AS BIGINT)),"
        "  (acc, i) -> IF(acc.run = 0,"
        "    named_struct('run', CAST(1 AS BIGINT), 's', acc.s),"
        "    IF(element_at(__st, i) = element_at(__st, i - 1),"
        "      named_struct('run', acc.run + CAST(1 AS BIGINT), 's', acc.s),"
        "      named_struct('run', CAST(1 AS BIGINT),"
        f"        's', acc.s + acc.run * {lnq.format(x='acc.run')}))),"
        f"  acc -> acc.s + acc.run * {lnq.format(x='acc.run')})"
    )
    stats = (
        "transform(array(lower(text)), __lt -> "
        "transform(array(array_sort("
        "    transform(sequence(1, length(__lt) - 2),"
        "              i -> substring(__lt, i, 3)))), __st -> "
        f"named_struct('n', CAST(size(__st) AS BIGINT), 's', {fold})"
        ")[0])[0]"
    )
    a = docs.select("doc_id", F.expr(stats).alias("__te")).select(
        "doc_id", F.col("__te.n").alias("n"), F.col("__te.s").alias("s")
    )
    h = F.expr(f"{lnq.format(x='n')} - s div n")
    return a.select(
        "doc_id",
        F.col("n").alias("n_grams"),
        h.alias("h_micro_nats"),
        (h.cast("double") / F.lit(1000000.0)).alias("entropy"),
    )


def _kneser_ney_oracle_sql() -> str:
    """DuckDB replay of the interpolated Kneser-Ney scorer: the same
    count tables, the same common-denominator integer probability
    (HUGEINT for the widened products), the same two final divisions."""
    return f"""
    WITH t AS ({_TOKS_LOWER_CTE}),
    bg AS (
        SELECT doc_id, toks[g.i] AS w1, toks[g.i + 1] AS w2
        FROM t, generate_series(1, 1024) g(i)
        WHERE g.i <= len(toks) - 1
    ),
    dc AS (SELECT doc_id, w1, w2, COUNT(*) AS cd FROM bg GROUP BY doc_id, w1, w2),
    m AS (SELECT w1, w2, CAST(SUM(cd) AS BIGINT) AS cb FROM dc GROUP BY w1, w2),
    l AS (SELECT w1, CAST(SUM(cb) AS BIGINT) AS c1, COUNT(*) AS n1f
          FROM m GROUP BY w1),
    r AS (SELECT w2, COUNT(*) AS n1p FROM m GROUP BY w2),
    tt AS (SELECT COUNT(*) AS nt FROM m),
    p AS (
        SELECT m.w1, m.w2,
               CAST((CAST(greatest(4 * m.cb - 3, 0) AS HUGEINT)
                         * (SELECT nt FROM tt)
                     + 3 * CAST(l.n1f AS HUGEINT) * r.n1p) * 1000000000
                    // (4 * CAST(l.c1 AS HUGEINT) * (SELECT nt FROM tt))
                    AS BIGINT) AS pq
        FROM m JOIN l USING (w1) JOIN r USING (w2)
    )
    SELECT dc.doc_id,
           CAST(SUM(dc.cd) AS BIGINT) AS n_bigrams,
           (CAST(SUM(dc.cd * p.pq) AS DOUBLE) / 1000000000.0)
               / CAST(SUM(dc.cd) AS BIGINT) AS kn_mean_prob
    FROM dc JOIN p USING (w1, w2)
    GROUP BY dc.doc_id
    """


@query("text_lm_kneser_ney", oracle=_kneser_ney_oracle_sql())
def text_lm_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney word-bigram scoring, corpus-trained —
    the LM-quality step up from the add-one char model
    (``text_lm_self_perplexity``): absolute discounting D=3/4 moves
    mass from observed bigrams to a CONTINUATION unigram (how many
    distinct left-contexts a word follows — 'francisco' is frequent but
    follows only 'san', so its continuation mass is tiny), the
    Chen–Goodman fix for burstiness that add-one smoothing cannot see.
    ``P(w2|w1) = (max(c₁₂−D,0) + D·N1+(w1,·)·N1+(·,w2)/T) / c₁``,
    computed EXACTLY on the common denominator ``4·c₁·T`` (D=3/4 →
    numerator ``max(4c₁₂−3,0)·T + 3·N1f·N1p``), widened to
    DECIMAL(38,0)/HUGEINT (the products pass int64 at web scale), and
    quantized to an integer 1e-9 grid — a document's score is an exact
    integer sum, so the oracle matches bit-for-bit with no ln at all.
    Self-scored like the add-one model: every doc bigram is in the
    training counts by construction, so no unseen-event path is needed.

    Scale: bigram extraction is map-side; the model tables (bigram
    types, left-context totals, continuation counts) aggregate with
    map-side combiners and join on their own keys — model-scale, not
    corpus-scale; T is one 1-row driver fetch (the same class as the
    corpus bigram total in ``_lm_trained_scores``); scoring is one
    equi-join of per-doc counts against the probability table plus one
    shuffle on doc id."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokenize(F.col("text")).alias("w")).filter(
        F.size("w") >= 2
    )
    bg = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(w) - 1),"
                " i -> struct(w[i-1] AS w1, w[i] AS w2))"
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    dc = (
        bg.groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("cd"))
        .localCheckpoint(eager=False)
    )
    m = (
        dc.groupBy("w1", "w2")
        .agg(F.sum("cd").alias("cb"))
        .localCheckpoint(eager=False)
    )
    # 1-row driver fetch of the bigram-type total (same class as the
    # corpus bigram total in _lm_trained_scores)
    nt = m.count()
    left = m.groupBy("w1").agg(
        F.sum("cb").alias("c1"), F.count(F.lit(1)).alias("n1f")
    )
    right = m.groupBy("w2").agg(F.count(F.lit(1)).alias("n1p"))
    p = (
        m.join(left, "w1")
        .join(right, "w2")
        .select(
            "w1",
            "w2",
            F.expr(
                f"CAST((CAST(greatest(4 * cb - 3, 0) AS DECIMAL(38,0)) * {nt}L"
                f" + 3 * CAST(n1f AS DECIMAL(38,0)) * n1p) * 1000000000"
                f" div (4 * CAST(c1 AS DECIMAL(38,0)) * {nt}L) AS BIGINT)"
            ).alias("pq"),
        )
    )
    return (
        dc.join(p, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(F.sum(F.expr("cd * pq")).alias("sc"), F.sum("cd").alias("nb"))
        .select(
            "doc_id",
            F.col("nb").alias("n_bigrams"),
            (
                (F.col("sc").cast("double") / F.lit(1000000000.0)) / F.col("nb")
            ).alias("kn_mean_prob"),
        )
    )


@query(
    "corpus_source_overlap",
    oracle=f"""
    WITH t AS ({_TOKS_LOWER_CTE}),
    g AS (
        SELECT DISTINCT source,
               ('0x' || substr(md5(gram), 1, 15))::BIGINT AS gh
        FROM (
            SELECT source, unnest(
                CASE WHEN len(toks) >= 3
                     THEN list_transform(range(0, len(toks) - 2),
                              i -> array_to_string(list_slice(toks, i + 1, i + 3), ' '))
                     ELSE [array_to_string(toks, ' ')] END) AS gram
            FROM t
        )
    ),
    n AS (SELECT source, COUNT(*) AS ng FROM g GROUP BY source),
    sh AS (
        SELECT a.source AS src_a, b.source AS src_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM g a JOIN g b ON a.gh = b.gh AND a.source < b.source
        GROUP BY a.source, b.source
    )
    SELECT sh.src_a, sh.src_b, sh.n_shared,
           CAST(na.ng AS BIGINT) AS n_grams_a,
           CAST(nb.ng AS BIGINT) AS n_grams_b,
           CAST(sh.n_shared AS DOUBLE)
               / (na.ng + nb.ng - sh.n_shared) AS jaccard
    FROM sh
    JOIN n na ON na.source = sh.src_a
    JOIN n nb ON nb.source = sh.src_b
    """,
)
def corpus_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cross-source CONTAMINATION MATRIX: 3-shingle overlap between
    every pair of sources — the corpus-level generalization of the
    per-benchmark ``corpus_contamination_check`` (which sources are
    copying each other / sharing pipelines / mirroring the same crawl
    is the first question when a mixture plan double-counts text).
    Output: one row per unordered source pair that shares at least one
    shingle, with the shared count, each side's distinct-shingle count,
    and the Jaccard overlap (single fixed-order division).

    Scale: shingles hash to the 60-bit md5 integer BEFORE any shuffle
    (8-byte keys instead of shingle strings — the ``corpus_ngram_
    novelty`` trade; collisions are identical on both engines, so the
    gate stays exact); per-source distinct hashes are one linear
    shuffle; the pair join is keyed on the HASH (each gram contributes
    at most |sources|² pair rows — sources number dozens, so the
    fan-out is a constant, never corpus-sized); totals join on the
    |sources|-row table. A popular shingle shared by all sources
    produces |sources|·(|sources|−1)/2 rows for that gram — bounded
    skew by construction."""
    docs = load(spark, sf_dir, "documents")
    g = (
        docs.select(
            "source",
            F.explode(
                F.array_distinct(word_shingles(tokenize(F.col("text")), 3))
            ).alias("gram"),
        )
        .select(
            "source",
            F.conv(F.substring(F.md5("gram"), 1, 15), 16, 10)
            .cast("long")
            .alias("gh"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = g.groupBy("source").agg(F.count(F.lit(1)).alias("ng"))
    ga = g.select(F.col("source").alias("src_a"), "gh")
    gb = g.select(F.col("source").alias("src_b"), "gh")
    sh = (
        ga.join(gb, "gh")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        sh.join(n.select(F.col("source").alias("src_a"), F.col("ng").alias("n_grams_a")), "src_a")
        .join(n.select(F.col("source").alias("src_b"), F.col("ng").alias("n_grams_b")), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_shared",
            "n_grams_a",
            "n_grams_b",
            (
                F.col("n_shared").cast("double")
                / (F.col("n_grams_a") + F.col("n_grams_b") - F.col("n_shared"))
            ).alias("jaccard"),
        )
    )


@query(
    "corpus_vocab_growth",
    oracle=f"""
    WITH t AS ({_TOKS_LOWER_CTE}),
    mx AS (SELECT MAX(doc_id) AS m FROM t),
    tok AS (
        SELECT doc_id,
               greatest(1, (doc_id * 10 + (SELECT m FROM mx) - 1)
                           // (SELECT m FROM mx)) AS b,
               unnest(toks) AS tok
        FROM t
    ),
    per_b AS (
        SELECT b, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nd,
               CAST(COUNT(*) AS BIGINT) AS ntk
        FROM tok GROUP BY b
    ),
    fb AS (SELECT tok, MIN(b) AS b FROM tok GROUP BY tok),
    nv AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS nvb FROM fb GROUP BY b),
    g AS (
        SELECT p.b, p.nd, p.ntk, COALESCE(nv.nvb, 0) AS nvb
        FROM per_b p LEFT JOIN nv USING (b)
    )
    SELECT b AS decile,
           CAST(SUM(nd) OVER w AS BIGINT) AS n_docs,
           CAST(SUM(ntk) OVER w AS BIGINT) AS n_tokens,
           CAST(SUM(nvb) OVER w AS BIGINT) AS n_vocab,
           CAST(SUM(nvb) OVER w AS DOUBLE) / SUM(ntk) OVER w
               AS type_token_ratio
    FROM g
    WINDOW w AS (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def corpus_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Heaps'-law VOCABULARY GROWTH curve: cumulative distinct
    tokens vs cumulative tokens processed, at ten ingest checkpoints
    (doc-id deciles — ingest order) — the 'is this source saturating'
    diagnostic every crawl review reads before paying for more of the
    same data (a flattening curve means new data is mostly old words).
    Companion of ``text_ngram_novelty_curve`` (which counts new
    TRIGRAMS per decile): this one tracks the unigram VOCABULARY with
    doc/token cumulatives and the type-token ratio, the pair a review
    reads together — fresh words vs fresh phrasing.
    Checkpoint bucketing is pure integer arithmetic
    (``ceil(doc_id·10 / max_id)`` clamped to [1,10]) so both engines
    bucket identically; each token's FIRST bucket attributes it to the
    checkpoint that introduced it, and cumulative sums run over the
    10-row checkpoint table (the tiny-table unpartitioned-window
    idiom, never corpus data).

    Scale: tokenization is map-side; the first-bucket table is one
    linear shuffle on the token with a map-side MIN combiner; per-bucket
    doc/token counts are one aggregate keyed by 10 buckets (count-
    distinct docs expands per-key — swap to HLL at 100 TB, the
    ``agg_approx_distinct`` trade); one 1-row driver fetch (max doc id,
    the documented scalar class)."""
    docs = load(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokenize(F.col("text")).alias("toks"))
    max_id = t.agg(F.max("doc_id")).first()[0] or 1  # id-0-only corpus: one bucket
    tok = t.select(
        "doc_id",
        F.expr(
            f"greatest(1L, (doc_id * 10 + {max_id}L - 1) div {max_id}L)"
        ).alias("b"),
        F.explode("toks").alias("tok"),
    )
    per_b = tok.groupBy("b").agg(
        F.countDistinct("doc_id").alias("nd"),
        F.count(F.lit(1)).alias("ntk"),
    )
    nv = (
        tok.groupBy("tok")
        .agg(F.min("b").alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("nvb"))
    )
    g = per_b.join(nv, "b", "left").select(
        "b", "nd", "ntk", F.coalesce("nvb", F.lit(0)).alias("nvb")
    )
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    return g.select(
        F.col("b").alias("decile"),
        F.sum("nd").over(w).alias("n_docs"),
        F.sum("ntk").over(w).alias("n_tokens"),
        F.sum("nvb").over(w).alias("n_vocab"),
        (
            F.sum("nvb").over(w).cast("double") / F.sum("ntk").over(w)
        ).alias("type_token_ratio"),
    )


_PMI_WINDOW = 4  # forward co-occurrence offsets 1..4
_PMI_MIN_PAIR = 5  # min pair support
_PMI_TOP_K = 50


def _pmi_oracle_sql() -> str:
    """DuckDB replay of the PMI collocation extraction: forward-window
    pair counts, unigram counts, the micro-nat quantized PMI
    (per-value ln rounding — the ``dsir_weights`` tolerance), min
    support, top-k by (pmi DESC, pair)."""
    lnq = "CAST(round(ln({x}) * 1000000, 0) AS BIGINT)"
    return f"""
    WITH t AS ({_TOKS_LOWER_CTE}),
    pos AS (
        SELECT doc_id, g.i AS i, toks[g.i] AS w, len(toks) AS n
        FROM t, generate_series(1, 1024) g(i)
        WHERE g.i <= len(toks)
    ),
    prs AS (
        SELECT a.w AS wa, b.w AS wb
        FROM pos a JOIN pos b
          ON a.doc_id = b.doc_id
         AND b.i - a.i BETWEEN 1 AND {_PMI_WINDOW}
    ),
    cp AS (SELECT wa, wb, CAST(COUNT(*) AS BIGINT) AS cab
           FROM prs GROUP BY wa, wb),
    cu AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cw FROM pos GROUP BY w),
    tot AS (
        SELECT (SELECT CAST(SUM(cw) AS BIGINT) FROM cu) AS n,
               (SELECT CAST(SUM(cab) AS BIGINT) FROM cp) AS np
    ),
    scored AS (
        SELECT cp.wa, cp.wb, cp.cab,
               {lnq.format(x="cp.cab")} - {lnq.format(x="ca.cw")}
                   - {lnq.format(x="cb.cw")} + 2 * {lnq.format(x="tot.n")}
                   - {lnq.format(x="tot.np")} AS pmi_micro_nats
        FROM cp JOIN cu ca ON ca.w = cp.wa
                JOIN cu cb ON cb.w = cp.wb
                CROSS JOIN tot
        WHERE cp.cab >= {_PMI_MIN_PAIR}
    )
    SELECT wa, wb, cab AS pair_count, pmi_micro_nats,
           CAST(pmi_micro_nats AS DOUBLE) / 1000000.0 AS pmi
    FROM scored
    ORDER BY pmi_micro_nats DESC, wa, wb
    LIMIT {_PMI_TOP_K}
    """


@query("corpus_pmi_collocations", oracle=_pmi_oracle_sql())
def corpus_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI COLLOCATION extraction — the classic corpus-linguistics pass
    (Church & Hanks 1990) a tokenizer/vocab team runs to find multiword
    units worth merging: count ordered co-occurrences within a forward
    window of 4 tokens, score each pair by pointwise mutual
    information ``ln(p(a,b) / (p(a)·p(b)))`` against the unigram model,
    require min support, and keep the global top-50. PMI is computed
    in integer micro-nats — per-value quantized ``round(ln·10⁶)`` then
    pure integer add/subtract — the ``dsir_weights`` ln-tolerance
    discipline, so the oracle matches on values, and ties break on the
    pair text.

    Scale: pair building is a map-side self-window inside each doc's
    token array (offsets 1..4 — linear in corpus size, constant
    fan-out 4); pair and unigram counts are linear shuffles with
    map-side combiners; two corpus scalars (total tokens, total pairs)
    are 1-row driver fetches (the documented class); top-k is a
    TakeOrdered, never a global sort.

    ORACLE FIXTURE CAP: generate_series(1, 1024) bounds token positions
    (TESTDATA.md max doc ≈ 110 tokens); the Spark side has no cap."""
    docs = load(spark, sf_dir, "documents")
    # r15 (guide §1.2/§5): the token arrays feed THREE consumers (pair
    # stream, unigram counts, and the two corpus scalars) — checkpoint
    # them lazily so the corpus is scanned + tokenized once, not three
    # times per action chain.
    t = docs.select("doc_id", tokenize(F.col("text")).alias("toks")).localCheckpoint(
        eager=False
    )
    # size >= 2 guard: sequence(a, b) runs DESCENDING when a > b, so a
    # 1-token doc would fabricate out-of-range pairs instead of none
    prs = (
        t.filter(F.size("toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    f"flatten(transform(sequence(1, size(toks) - 1),"
                    f" i -> transform(sequence(i + 1, least(i + {_PMI_WINDOW},"
                    f" size(toks))), j -> named_struct('wa', toks[i-1],"
                    f" 'wb', toks[j-1]))))"
                )
            ).alias("p")
        )
        .select("p.wa", "p.wb")
    )
    cp = prs.groupBy("wa", "wb").agg(F.count(F.lit(1)).alias("cab"))
    cu = (
        t.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cw"))
        .localCheckpoint(eager=False)
    )
    n = cu.agg(F.sum("cw")).first()[0]
    # r15 (guide §1.2): the total-pair scalar used to be sum(cab) over
    # the materialized pair groupBy — which forced the query's most
    # expensive stage (pair explode + shuffle) to run TWICE, once for
    # this 1-row fetch and once for the final scoring chain. The count
    # of forward-window pairs is a closed form of the doc's token count
    # alone (Σ_{d=1..L-1} min(W, d)), so fetch it map-side from the
    # checkpointed token arrays instead: identical value, no pair
    # materialization.
    _L = F.size("toks")
    _W = _PMI_WINDOW
    np_ = t.select(
        F.sum(
            F.when(
                _L - 1 >= _W,
                F.lit(_W) * _L.cast("long") - F.lit(_W * (_W + 1) // 2),
            )
            .when(_L >= 2, (_L * (_L - 1) / 2).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        ).alias("np")
    ).first()["np"]
    lnq = "CAST(round(ln({x}) * 1000000, 0) AS BIGINT)"
    if not n or not np_:  # empty / pairless corpus: nothing to score
        return spark.createDataFrame(
            [], "wa string, wb string, pair_count long,"
            " pmi_micro_nats long, pmi double",
        )
    const = (
        2 * int(round(__import__("math").log(n) * 1_000_000))
        - int(round(__import__("math").log(np_) * 1_000_000))
    )
    scored = (
        cp.filter(F.col("cab") >= _PMI_MIN_PAIR)
        .join(cu.select(F.col("w").alias("wa"), F.col("cw").alias("ca")), "wa")
        .join(cu.select(F.col("w").alias("wb"), F.col("cw").alias("cb")), "wb")
        .select(
            "wa",
            "wb",
            F.col("cab").alias("pair_count"),
            (
                F.expr(lnq.format(x="cab"))
                - F.expr(lnq.format(x="ca"))
                - F.expr(lnq.format(x="cb"))
                + F.lit(const)
            ).alias("pmi_micro_nats"),
        )
    )
    return scored.orderBy(
        F.desc("pmi_micro_nats"), "wa", "wb"
    ).limit(_PMI_TOP_K).select(
        "wa",
        "wb",
        "pair_count",
        "pmi_micro_nats",
        (F.col("pmi_micro_nats").cast("double") / F.lit(1000000.0)).alias("pmi"),
    )


@query("sim_topk_ivfpq", oracle=_pq.ivfpq_oracle_sql())
def sim_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ composed — THE billion-scale ANN index (the FAISS
    ``IVFPQ`` shape), completing the similarity family's scale story:
    a frozen 16-cell coarse quantizer routes every vector to an
    inverted list; PQ codes the RESIDUAL (vector − cell centroid —
    residuals concentrate near zero, so the same 8×16 codebook budget
    carries more precision than raw-vector PQ); a query probes only its
    4 nearest cells and scores each probed cell's codes against a
    per-(probe, cell) distance table built from the query's residual in
    THAT cell. Codebook seeding skips the coarse-centroid ids (their
    residuals are all-zero — seeding there would collapse every initial
    codeword; ``train_codebooks(init_lo=NCELLS)``). Integer-exact end
    to end: the oracle replays coarse assignment, residuals, both
    k-means rounds, encoding, cell probing, the residual distance
    tables, the cell-scoped ADC join, and the ranking.

    Scale: everything ``sim_topk_pq`` measured, PLUS the probe filter —
    the scan touches NPROBE/NCELLS of the corpus per query (at 100 TB
    the corpus is PARTITIONED BY CELL, so unprobed cells are never
    read; here the cell rides as a column and the filter happens in the
    scan kernel). Output: (probe_id, rank, vec_id, adc_dist)."""
    emb = load(spark, sf_dir, "embeddings")
    qsub = _pq.quantized_subvectors(emb, "embedding", "vec_id").localCheckpoint(
        eager=False
    )
    return _pq.ivfpq_topk(qsub)


@query(
    "dedup_containment_pairs",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang,
               string_split_regex(trim(lower(text)), '\\s+') AS w
        FROM documents
    ),
    t AS (
        SELECT doc_id, lang,
               list_distinct(
                   CASE WHEN len(w) >= 3
                        THEN [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                              for i in range(1, len(w) - 1)]
                        ELSE [array_to_string(w, ' ')] END
               ) AS grams
        FROM toks
    )
    SELECT * FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                   / CAST(len(a.grams) AS DOUBLE) AS containment
        FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id <> b.doc_id
    ) WHERE containment >= 0.5
    """,
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment near-dup pairs over 3-gram shingle sets,
    same-language blocks: every ordered pair where ≥50% of document
    A's shingles appear in B — the quote/repost/subset relation that
    symmetric Jaccard structurally under-scores (the container's bulk
    inflates the union). Candidates via the one-sided rarest-first
    prefix filter, exact ``array_intersect`` verification — lossless,
    so the DuckDB oracle is the blocked all-pairs scorer over the SAME
    shingle construction (space-joined word 3-grams, whole-text
    fallback under 3 tokens — ``word_shingles``' contract). See
    ``operators/dedup.py containment_pairs`` for the prefix theorem
    and the Σ prefix-df·df candidate bound."""
    from pubic_multi_platform_to_postgres_spark.operators.dedup import (
        containment_pairs,
    )

    docs = load(spark, sf_dir, "documents")
    return containment_pairs(
        docs, "text", "doc_id", ["lang"], threshold=0.5, ngram=3
    )


_CONTAINMENT_PAIRS_ORACLE = """
    WITH toks AS (
        SELECT doc_id, lang,
               string_split_regex(trim(lower(text)), '\\s+') AS w
        FROM documents
    ),
    t AS (
        SELECT doc_id, lang,
               list_distinct(
                   CASE WHEN len(w) >= 3
                        THEN [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                              for i in range(1, len(w) - 1)]
                        ELSE [array_to_string(w, ' ')] END
               ) AS grams
        FROM toks
    )
    SELECT * FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                   / CAST(len(a.grams) AS DOUBLE) AS containment
        FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id <> b.doc_id
    ) WHERE containment >= 0.5
    """


def dedup_containment_pairs_collapsed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``dedup_containment_pairs`` through the FORCED mass-duplication
    re-plan (the jaccard collapse's asymmetric sibling): identical
    (gram set, lang) classes run the one-sided prefix filter as one
    representative; verified ordered rep pairs expand to member cross
    products (containment is a pure function of the two gram sets) and
    within-class ordered pairs emit directly at containment 1.0. SAME
    ANSWER as the direct row at m²→1 candidate cost per clone clique.
    Demoted from a permanent gate row to a measurement FACE in r12
    (VERDICT r11 Next #3) — the choice is now the planner rule behind
    ``dedup_containment_pairs_auto``; ``tools/bench_skew.py`` still
    measures this forced face and the property tests still pin output
    equality."""
    from pubic_multi_platform_to_postgres_spark.operators.dedup import (
        containment_pairs,
    )

    docs = load(spark, sf_dir, "documents")
    return containment_pairs(
        docs, "text", "doc_id", ["lang"], threshold=0.5, ngram=3,
        collapse_exact=True,
    )


@query("dedup_containment_pairs_auto", oracle=_CONTAINMENT_PAIRS_ORACLE)
def dedup_containment_pairs_auto(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The PLANNER row for asymmetric containment pairs — the same
    measured-duplication-mass rule as ``dedup_ngram_jaccard_auto``
    (``clone_mass`` first pass → ``collapse_strategy`` pure decision):
    ``direct`` on clone-light corpora (this fixture; the forced
    collapse face measured ~1.4× slower at skew30 despite the clone
    clique, because the quote stratum's expansion joins dominate),
    ``collapse`` once clique pair mass clears ~1 pair/doc. Both
    branches are bit-identical in output, so one oracle gates either
    branch; the collapse branch is oracle-replayed on a clone-heavy
    corpus in ``test_llmdata.py``.

    r13: reads the statistic through ``plans/stats.py CORPUS_STATS``
    under the same (corpus snapshot, column) key as the jaccard auto
    row — in a sweep, whichever auto row runs first pays the one probe
    and the other reads it for free."""
    from pubic_multi_platform_to_postgres_spark.operators.dedup import (
        collapse_strategy,
        containment_pairs,
    )
    from pubic_multi_platform_to_postgres_spark.plans.stats import CORPUS_STATS

    docs = load(spark, sf_dir, "documents")
    n_rows, clique_pairs = CORPUS_STATS.clone_summary(
        docs, "text", source_path=f"{sf_dir.rstrip('/')}/documents.parquet"
    )
    strategy = collapse_strategy(n_rows, clique_pairs)
    return containment_pairs(
        docs, "text", "doc_id", ["lang"], threshold=0.5, ngram=3,
        collapse_exact=(strategy == "collapse"),
    )
