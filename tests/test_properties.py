"""Property-based tests (hypothesis): the Spark flattener vs a faithful
pure-Python model of the reference's ``flatten_json``, date round-trips,
and the MinHash estimator's statistical bound (SURVEY.md §5 #3/#4)."""

from __future__ import annotations

import json
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

from pubic_multi_platform_to_postgres_spark.operators.flatten import (
    flatten,
    infer_array_limits,
)

# -- a faithful python model of the reference flatten (dash names, indexed
# scalars-in-lists, preserved keys) restricted to the shapes the Spark
# version handles (homogeneous-typed arrays, struct-typed objects) --------


def model_flatten(obj: dict, preserve=(), sep="-") -> dict:
    out: dict = {}

    def walk(x, prefix):
        if isinstance(x, dict):
            for k, v in x.items():
                walk(v, f"{prefix}{sep}{k}" if prefix else k)
        elif isinstance(x, list):
            for i, v in enumerate(x):
                walk(v, f"{prefix}{sep}{i}")
        else:
            out[prefix] = x

    for k, v in obj.items():
        if k in preserve:
            out[k] = v
        else:
            walk(v, k)
    return out


# strategy: nested records with a FIXED shape per example set (Spark needs a
# single schema across rows), values varying
_LEAF_TYPES = (
    st.integers(-1000, 1000),
    st.text("abc", min_size=0, max_size=5),
)


@st.composite
def record_batch(draw):
    """A list of records sharing one nested shape: scalar fields, one
    struct field, one scalar-array field of varying length. Leaf TYPES are
    fixed per field across the batch (a Spark column has one type;
    mixed-type JSON fields get coerced to string by schema merge, which is
    inference behavior, not flattener behavior)."""
    n_rows = draw(st.integers(1, 5))
    n_scalar = draw(st.integers(1, 3))
    scalar_types = [draw(st.sampled_from(_LEAF_TYPES)) for _ in range(n_scalar)]
    c_type = draw(st.sampled_from(_LEAF_TYPES))
    rows = []
    for _ in range(n_rows):
        row = {f"s{i}": draw(scalar_types[i]) for i in range(n_scalar)}
        row["nested"] = {"a": draw(st.integers(0, 9)), "b": {"c": draw(c_type)}}
        row["xs"] = draw(st.lists(st.integers(0, 99), min_size=0, max_size=3))
        rows.append(row)
    return rows


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(record_batch())
def test_flatten_matches_reference_model(spark, rows):
    df = spark.read.json(spark.sparkContext.parallelize([json.dumps(r) for r in rows]))
    limits = infer_array_limits(df, ["xs"])
    flat = flatten(df, array_limits=limits)
    got = [r.asDict() for r in flat.collect()]

    max_n = limits.get("xs", 0)
    for g in got:
        # match by scalar identity (rows have no pk; use full dict compare)
        pass
    want = []
    for r in rows:
        m = model_flatten(r)
        # spark emits NULL for missing indices up to the batch max
        for i in range(max_n):
            m.setdefault(f"xs-{i}", None)
        want.append(m)

    keyfn = lambda d: json.dumps(d, sort_keys=True, default=str)  # noqa: E731
    assert sorted(got, key=keyfn) == sorted(want, key=keyfn)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.integers(0, 4_102_444_800_000))  # epoch ms up to year 2100
def test_dotnet_date_roundtrip_property(spark, ms):
    from pubic_multi_platform_to_postgres_spark.functions.dates import (
        parse_dotnet_date,
    )

    df = spark.createDataFrame(
        [(f"/Date({ms}+0545)/",), (f"/Date({ms}-1100)/",), (f"/Date({ms})/",)],
        ["wire"],
    )
    out = df.select(F.unix_millis(parse_dotnet_date("wire")).alias("back")).collect()
    # offset variants are DISCARDED (reference parity): all parse to the
    # same UTC epoch ms
    assert [r["back"] for r in out] == [ms, ms, ms]


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.integers(0, 2**31), st.floats(0.2, 0.9))
def test_minhash_estimator_error_bound(spark, seed, overlap):
    """For two docs with known shingle overlap, |est - exact| stays within
    4σ of the binomial bound at 64 hashes (flaky-proof margin)."""
    import random

    from pubic_multi_platform_to_postgres_spark.operators.dedup import (
        minhash_signatures,
        tokenize,
        word_shingles,
    )

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(400)]
    base = [rng.choice(vocab) for _ in range(120)]
    n_keep = int(len(base) * overlap)
    other = base[:n_keep] + [rng.choice(vocab) + "x" for _ in range(len(base) - n_keep)]
    df = spark.createDataFrame(
        [(1, " ".join(base)), (2, " ".join(other))], ["doc_id", "text"]
    )
    sigs = {r["doc_id"]: r["signature"]
            for r in minhash_signatures(df, "text", "doc_id", num_hashes=64).collect()}
    est = sum(a == b for a, b in zip(sigs[1], sigs[2])) / 64.0

    grams = {r["doc_id"]: set(r["g"]) for r in df.select(
        "doc_id", word_shingles(tokenize(F.col("text")), 3).alias("g")).collect()}
    exact = len(grams[1] & grams[2]) / len(grams[1] | grams[2])

    sigma = math.sqrt(exact * (1 - exact) / 64) if 0 < exact < 1 else 0.07
    assert abs(est - exact) <= 4 * sigma + 0.02, (est, exact)


@st.composite
def merge_scenario(draw):
    """Random target table + changelog over a tiny key space (forces
    matched/unmatched/delete/out-of-order collisions)."""
    keys = list(range(6))
    tgt = [
        (k, draw(st.integers(0, 99)))
        for k in draw(st.lists(st.sampled_from(keys), unique=True, max_size=6))
    ]
    n_ch = draw(st.integers(0, 8))
    seqs = draw(st.lists(st.integers(1, 9), min_size=n_ch, max_size=n_ch))
    ops = draw(st.lists(st.sampled_from(["I", "U", "D"]), min_size=n_ch, max_size=n_ch))
    chs = [
        (draw(st.sampled_from(keys)), draw(st.integers(0, 99)), seqs[i], ops[i])
        for i in range(n_ch)
    ]
    return tgt, chs


def model_apply_cdc(tgt, chs):
    """Pure-python reference: latest change per key (highest seq; on seq
    ties the spark side picks an unspecified winner, so scenarios dedup
    (key, seq) first), D deletes, I/U upserts, D-for-absent no-op."""
    latest = {}
    for k, v, seq, op in chs:
        if k not in latest or seq > latest[k][1]:
            latest[k] = ((k, v, seq, op), seq)
    out = dict(tgt)
    for k, ((_, v, seq, op), _s) in latest.items():
        if op == "D":
            out.pop(k, None)
        else:
            out[k] = v
    return out


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(merge_scenario())
def test_apply_cdc_matches_python_model(spark, scenario):
    from pubic_multi_platform_to_postgres_spark.operators.merge import apply_cdc

    tgt_rows, ch_rows = scenario
    # drop seq ties per key (tie-break order is unspecified on both sides)
    seen, chs = set(), []
    for k, v, seq, op in ch_rows:
        if (k, seq) not in seen:
            seen.add((k, seq))
            chs.append((k, v, seq, op))

    tgt = spark.createDataFrame(tgt_rows or [(99, 0)], "id int, v int")
    if not tgt_rows:
        tgt = tgt.filter("id < 0")
    ch = spark.createDataFrame(chs or [(99, 0, 1, "U")], "id int, v int, seq int, op string")
    if not chs:
        ch = ch.filter("id < 0")

    got = {r["id"]: r["v"] for r in apply_cdc(tgt, ch, ["id"], "seq").collect()}
    assert got == model_apply_cdc(tgt_rows, chs)


# --- round-6 re-planned dedup algorithms vs reference models ---------------


@st.composite
def tiny_corpus(draw):
    """Small docs over a tiny vocabulary — forces shared tokens, shared
    prefixes, and multi-member blocks."""
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    n_docs = draw(st.integers(2, 8))
    docs = []
    for i in range(n_docs):
        words = draw(st.lists(st.sampled_from(vocab), min_size=1, max_size=6))
        docs.append((i, " ".join(words)))
    return docs


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(tiny_corpus())
def test_prefix_filter_jaccard_equals_bruteforce(spark, docs):
    """The SSJoin/AllPairs prefix-filter candidate generation must be
    LOSSLESS: output pairs and jaccard values identical to the all-pairs
    reference model (same block, distinct-token Jaccard >= t)."""
    from pubic_multi_platform_to_postgres_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    df = spark.createDataFrame(docs, "doc_id long, text string").withColumn(
        "blk", F.lit(1)
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            df, "text", "doc_id", ["blk"], threshold=0.5, ngram=1
        ).collect()
    }
    sets = {i: set(t.lower().split()) for i, t in docs}
    want = {}
    for a in sets:
        for b in sets:
            if a < b:
                inter = len(sets[a] & sets[b])
                union = len(sets[a] | sets[b])
                if union and inter / union >= 0.5:
                    want[(a, b)] = inter / union
    assert got == want


def test_prefix_filter_jaccard_user_column_names(spark):
    """User columns named like the r6 internals (``g``, ``sg``, ``gdf``)
    must pass through untouched (ADVICE r6: they used to shadow the
    working columns), and the genuinely reserved names must be rejected
    loudly rather than silently corrupt the join."""
    import pytest as _pytest

    from pubic_multi_platform_to_postgres_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    df = spark.createDataFrame(
        [(1, "alpha beta gamma", 1, 7), (2, "alpha beta gamma", 1, 7),
         (3, "zeta", 1, 7)],
        "sg long, text string, g long, gdf long",
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            df, "text", "sg", ["g", "gdf"], threshold=0.5
        ).collect()
    }
    assert got == {(1, 2): 1.0}
    with _pytest.raises(ValueError, match="reserved"):
        ngram_jaccard_pairs(df, "text", "sg", ["id_a"])
    with _pytest.raises(ValueError, match="reserved"):
        ngram_jaccard_pairs(df, "text", "__njp_id", ["g"])


def test_snm2_second_pass_buys_recall(spark):
    """Multi-pass SNM: a pair adjacent in REVERSED-head order but > W
    ranks apart in forward order (same 8-char block, shared tail,
    divergent 9th char, 12 fillers between) is invisible to the one-pass
    query and found by the two-pass one; the two-pass output is a strict
    superset of the one-pass output on the same corpus."""
    import pubic_multi_platform_to_postgres_spark.queries.llmdata as L

    tail = "same0"
    docs = [(0, "en", "abcdefgh" + "a" + tail), (13, "en", "abcdefgh" + "z" + tail)]
    docs += [(i, "en", "abcdefgh" + "bcdefghijklm"[i - 1] + "other")
             for i in range(1, 13)]
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    orig = L.load
    L.load = lambda spark, sf, table: df
    try:
        one = {(r["id_a"], r["id_b"])
               for r in L.dedup_levenshtein_prefix(spark, "unused").collect()}
        two = {(r["id_a"], r["id_b"])
               for r in L.dedup_levenshtein_snm2(spark, "unused").collect()}
    finally:
        L.load = orig
    assert one <= two  # superset contract
    assert (0, 13) not in one  # 13 forward ranks apart, W=10 -> missed
    assert (0, 13) in two      # adjacent in reversed order -> found


def test_leakage_safe_split_cluster_atomic(spark):
    """Leakage-safe split: every member of a near-dup cluster gets the
    cluster's min doc_id as group_id and the SAME split side (the whole
    point — no near-dup may straddle train/val); singletons group as
    themselves; the split side matches the Knuth-hash rule exactly.

    Docs 20/21 pin the VERDICT-r7 recall hole: a near-dup pair whose
    lengths straddle a 50-char bucket boundary (39 vs 50 chars →
    buckets 0 vs 1) is invisible to single-grid blocking; the
    offset-25 second grid (buckets 1 vs 1) must land them in ONE group
    on one split side."""
    import pubic_multi_platform_to_postgres_spark.queries.llmdata as L

    straddle_a = "tok1 tok2 tok3 tok4 tok5 tok6 tok7 tok8"   # 39 chars
    straddle_b = straddle_a + " extratoken"                  # 50 chars
    assert len(straddle_a) // 50 != len(straddle_b) // 50    # straddles grid 1
    df = spark.createDataFrame(
        [
            (1, "en", "alpha beta gamma delta"),
            (2, "en", "alpha beta gamma delta"),   # near-dup of 1
            (7, "en", "alpha beta gamma epsilon"), # near-dup of both
            (9, "en", "completely different words here"),  # singleton
            (20, "en", straddle_a),  # Jaccard 8/9 with 21, bucket 0
            (21, "en", straddle_b),  # bucket 1 — caught by offset grid only
        ],
        "doc_id long, lang string, text string",
    ).withColumn("n_chars", F.length("text"))
    orig = L.load
    L.load = lambda spark, sf, table: df
    try:
        out = {r["doc_id"]: (r["group_id"], r["split"])
               for r in L.corpus_leakage_safe_split(spark, "unused").collect()}
    finally:
        L.load = orig
    assert out[1][0] == out[2][0] == out[7][0] == 1  # min-id group label
    assert out[9][0] == 9
    assert out[1][1] == out[2][1] == out[7][1]  # cluster atomicity
    assert out[20][0] == out[21][0] == 20  # straddle pair: one group
    assert out[20][1] == out[21][1]        # ... and one split side
    for did, (gid, split) in out.items():
        expect = "val" if (gid % 100000007) * 2654435761 % 4294967296 < 429496729 \
            else "train"
        assert split == expect, (did, gid, split)


@st.composite
def head_corpus(draw):
    """Docs sharing a handful of 8-char prefixes with small suffix edits
    — exercises block formation and window adjacency."""
    prefixes = ["abcdefgh", "abcdefgx", "zzzzzzzz"]
    n = draw(st.integers(2, 10))
    docs = []
    for i in range(n):
        p = draw(st.sampled_from(prefixes))
        tail = draw(st.text(alphabet="abc", min_size=0, max_size=6))
        docs.append((i, "en", p + tail))
    return docs


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(head_corpus())
def test_sorted_neighborhood_lev_sound_and_neighbor_complete(spark, docs):
    """Sorted-neighborhood edit-distance pairs: every reported pair must
    be VALID (same lang+prefix block, dist <= 12), and every ADJACENT
    pair in the block's (head, doc_id) sort order with dist <= 12 must
    be reported (W >= 1 guarantees at least adjacency coverage)."""
    import pubic_multi_platform_to_postgres_spark.queries.llmdata as L

    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    df = df.withColumn("n_chars", F.length("text"))
    orig = L.load
    L.load = lambda spark, sf, table: df
    try:
        got = {
            (r["id_a"], r["id_b"]): r["edit_dist"]
            for r in L.dedup_levenshtein_prefix(spark, "unused").collect()
        }
    finally:
        L.load = orig

    def lev(a, b):
        # reference edit distance (dp)
        m, n = len(a), len(b)
        dp = list(range(n + 1))
        for i in range(1, m + 1):
            prev, dp[0] = dp[0], i
            for j in range(1, n + 1):
                cur = min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
                )
                prev, dp[j] = dp[j], cur
        return dp[n]

    heads = {i: t.strip().lower()[:40] for i, _, t in docs}
    # soundness: every reported pair valid
    for (a, b), d in got.items():
        assert heads[a][:8] == heads[b][:8]
        assert d == lev(heads[a], heads[b]) <= 12
    # neighbor completeness: adjacent sorted pairs within a block
    from collections import defaultdict

    blocks = defaultdict(list)
    for i, h in heads.items():
        blocks[h[:8]].append((h, i))
    for members in blocks.values():
        members.sort()
        for (h1, i1), (h2, i2) in zip(members, members[1:]):
            if lev(h1, h2) <= 12:
                key = (min(i1, i2), max(i1, i2))
                assert key in got, (key, got)


def test_sorted_neighborhood_recall_vs_full_block_quantified(spark):
    """The W-bounded RECALL CONTRACT, measured (ADVICE r6): against the
    full-block all-pairs reference on a skewed hot-block fixture, the
    sorted-neighborhood plan reports exactly the pairs within W sorted
    ranks — here 15 edit-close docs share one block, so the reference
    has C(15,2)=105 pairs, the plan finds the sum_{d=1..W}(15-d)=95
    within-window ones, and recall is 95/105 ≈ 0.905. The oracle was
    rewritten in lockstep with the re-plan, so the gate can't see this
    trade — this test pins it as an explicit, quantified contract
    rather than a silent drop."""
    import pubic_multi_platform_to_postgres_spark.queries.llmdata as L

    W = L._SN_WINDOW
    n = 15
    assert n > W + 1  # the fixture must actually exceed the window
    # one hot block: identical 8-char prefix, single-char variations at
    # position 9 -> every pair is within edit distance 2 <= 12
    docs = [(i, "en", "abcdefgh" + "abcdefghijklmno"[i] + "tail") for i in range(n)]
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    orig = L.load
    L.load = lambda spark, sf, table: df
    try:
        got = {
            (r["id_a"], r["id_b"])
            for r in L.dedup_levenshtein_prefix(spark, "unused").collect()
        }
    finally:
        L.load = orig
    full_block = {(a, b) for a in range(n) for b in range(a + 1, n)}
    # sorted order == doc_id order here (heads sort by the varied char)
    within_window = {(a, b) for a, b in full_block if b - a <= W}
    assert got == within_window  # soundness + exact W-bounded recall
    recall = len(got) / len(full_block)
    expect = sum(n - d for d in range(1, W + 1)) / (n * (n - 1) / 2)
    assert recall == expect  # 95/105 for n=15, W=10


@st.composite
def window_corpus(draw):
    """Small docs over a 4-word vocabulary — forces shared 3-word
    windows across documents at every threshold."""
    vocab = ["aa", "bb", "cc", "dd"]
    n = draw(st.integers(2, 8))
    return [
        (i, " ".join(draw(st.lists(st.sampled_from(vocab), min_size=1,
                                   max_size=9))))
        for i in range(n)
    ]


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(window_corpus(), st.integers(1, 4))
def test_boilerplate_scrub_matches_python_model(spark, docs, min_docs):
    """Cross-doc boilerplate scrub vs a direct python model: stride-1
    shingle document frequency, >= min_docs flags, aligned-3-word-window
    removal, order-preserving reassembly of survivors. Also pins the
    superset contract: shingled flags ⊇ aligned-df flags."""
    import hashlib

    from pubic_multi_platform_to_postgres_spark.operators.textstats import (
        scrub_boilerplate_windows,
    )

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["id"]: r for r in
           scrub_boilerplate_windows(df, "text", "doc_id",
                                     min_docs=min_docs).collect()}

    def windows(text):
        w = text.split(" ")
        return [" ".join(w[i * 3:i * 3 + 3])
                for i in range(math.ceil(len(w) / 3))]

    def shingles(text):
        w = text.split(" ")
        return {" ".join(w[i:i + 3]) for i in range(len(w))}

    dfreq: dict[str, set] = {}
    aligned_dfreq: dict[str, set] = {}
    for i, t in docs:
        for sh in shingles(t):
            dfreq.setdefault(sh, set()).add(i)
        for win in set(windows(t)):
            aligned_dfreq.setdefault(win, set()).add(i)
    flagged = {w for w, ids in dfreq.items() if len(ids) >= min_docs}
    aligned_flagged = {w for w, ids in aligned_dfreq.items()
                       if len(ids) >= min_docs}
    assert aligned_flagged <= flagged  # superset: never less recall
    for i, t in docs:
        wins = windows(t)
        kept = [w for w in wins if w not in flagged]
        assert got[i]["n_windows"] == len(wins)
        assert got[i]["n_boiler_windows"] == sum(w in flagged for w in wins)
        expect = (hashlib.md5(" ".join(kept).encode()).hexdigest()
                  if kept else None)
        assert got[i]["cleaned_md5"] == expect, (i, t, kept)


# -- boundary-bucket nearest-rank vs a sorted() python model ---------------


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.floats(-100, 100, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=40,
    ),
    st.integers(1, 40),
    st.booleans(),
    st.sampled_from([0.25, 1.0, 16.0]),
)
def test_nearest_rank_scalar_property(spark, vals, k, descending, bscale):
    """nearest_rank_scalar must equal the k-th element of the fully
    sorted list for ANY value distribution (duplicates, negatives, all
    values in one bucket), any direction, and any monotone bucket
    granularity — including bucket widths that force everything into
    the boundary bucket."""
    from pubic_multi_platform_to_postgres_spark.operators.selection import (
        nearest_rank_scalar,
    )
    from pyspark.sql import Row

    k = min(k, len(vals))
    df = spark.createDataFrame(
        [Row(doc_id=i, v=float(x)) for i, x in enumerate(vals)]
    )
    got = nearest_rank_scalar(
        df,
        "v",
        F.floor(F.col("v") * bscale).cast("long"),
        f"{k}",
        descending=descending,
    )
    expect = sorted(vals, reverse=descending)[k - 1]
    assert got == expect


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 15),
                  st.integers(1, 9)),
        min_size=1,
        max_size=30,
    )
)
def test_smoothed_profile_dense_and_normalized(spark, obs):
    """smoothed_bucket_profile invariants vs a python model: every
    (group, bucket) cell exists (dense), pm matches the exact integer
    formula, and per-group pm mass approaches the scale (within the
    floor-division undershoot bound of B units)."""
    from pubic_multi_platform_to_postgres_spark.operators.classify import (
        PROB_SCALE,
        smoothed_bucket_profile,
    )
    from pyspark.sql import Row

    B = 16
    df = spark.createDataFrame(
        [Row(g=g, bkt=b, c=c) for g, b, c in obs]
    )
    out = smoothed_bucket_profile(df, "g", n_buckets=B).collect()
    from collections import defaultdict

    model_counts: dict = defaultdict(int)
    totals: dict = defaultdict(int)
    for g, b, c in obs:
        model_counts[(g, b)] += c
        totals[g] += c
    groups = set(totals)
    assert {(r["g"], r["bkt"]) for r in out} == {
        (g, b) for g in groups for b in range(B)
    }
    for r in out:
        expect = (model_counts[(r["g"], r["bkt"])] + 1) * PROB_SCALE // (
            totals[r["g"]] + B
        )
        assert r["pm"] == expect
    mass: dict = defaultdict(int)
    for r in out:
        mass[r["g"]] += r["pm"]
    for g, m in mass.items():
        assert PROB_SCALE - B <= m <= PROB_SCALE


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=12),
        min_size=1, max_size=8,
    ),
    st.integers(2, 8),
)
def test_cms_matches_python_model(spark, texts, width):
    """The Spark CMS (cells AND per-token estimates) must equal a direct
    Python model of the Cormode-Muthukrishnan construction on arbitrary
    tiny corpora and tiny widths (heavy collisions on purpose)."""
    import hashlib
    from collections import Counter

    from pyspark.sql import Row

    from pubic_multi_platform_to_postgres_spark.operators.sketches import (
        cms_cells,
        cms_estimates,
        cms_token_rows,
    )

    def md5_60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    counts = Counter(t for x in texts for t in x.strip().lower().split() or [""])
    model_cells: Counter = Counter()
    for tok, n in counts.items():
        for r in range(4):
            model_cells[(r, md5_60(f"{r}|{tok}") % width)] += n
    model_est = {
        tok: min(model_cells[(r, md5_60(f"{r}|{tok}") % width)] for r in range(4))
        for tok in counts
    }

    df = spark.createDataFrame([Row(text=t) for t in texts])
    rows = cms_token_rows(df, "text", depth=4, width=width)
    got_cells = {(r["r"], r["bucket"]): r["cell"] for r in cms_cells(rows).collect()}
    assert got_cells == dict(model_cells)
    got_est = {r["token"]: (r["true_n"], r["cms_estimate"])
               for r in cms_estimates(rows).collect()}
    assert got_est == {t: (counts[t], model_est[t]) for t in counts}


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(-1000, 1000), min_size=1, max_size=40),
    st.lists(st.integers(1, 40), min_size=1, max_size=5, unique=True),
    st.sampled_from([1, 64, 100000]),
)
def test_nearest_rank_multi_property(spark, vals, ks, bwidth):
    """nearest_rank_multi must equal the sorted()-model k-th element for
    EVERY requested k simultaneously — one histogram pass, any bucket
    granularity (including one-bucket-per-value and everything-in-one-
    bucket), duplicate-heavy distributions included."""
    from pyspark.sql import Row

    from pubic_multi_platform_to_postgres_spark.operators.selection import (
        nearest_rank_multi,
    )

    ks = [min(k, len(vals)) for k in ks]
    df = spark.createDataFrame(
        [Row(doc_id=i, v=int(x)) for i, x in enumerate(vals)]
    )
    got = nearest_rank_multi(
        df, "v", F.expr(f"v div {bwidth}"), {k: str(k) for k in set(ks)}
    )
    srt = sorted(vals)
    assert got == {k: srt[k - 1] for k in set(ks)}


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    frames=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 2**30 - 1)),
        min_size=1, max_size=5,
    ),
    dims=st.sampled_from([(8, 8), (16, 16), (8, 24), (5, 7)]),
)
def test_encode_gif_decode_roundtrip(frames, dims):
    """encode_gif -> decode_gif_frames is the identity on arbitrary
    grayscale frame stacks (any shape, any frame count, any content —
    including non-8-divisible dims, which only the HASH stage rejects):
    frame count, shapes, and every pixel byte survive the real LZW
    encode/decode."""
    import numpy as np

    from pubic_multi_platform_to_postgres_spark.operators.multimodal import (
        decode_gif_frames,
        encode_gif,
    )

    h, w = dims
    arrs = []
    for mode, seed in frames:
        rng = np.random.default_rng(seed)
        if mode == 0:
            a = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        elif mode == 1:
            a = np.full((h, w), seed % 256, dtype=np.uint8)
        elif mode == 2:
            a = (np.add.outer(np.arange(h), np.arange(w)) + seed) % 256
            a = a.astype(np.uint8)
        else:
            a = np.zeros((h, w), dtype=np.uint8)
            a[seed % h, seed % w] = 255
        arrs.append(a)
    out = decode_gif_frames(encode_gif(arrs))
    assert len(out) == len(arrs)
    for got, want in zip(out, arrs):
        assert got.shape == want.shape
        assert (got == want).all()


# -- weighted PageRank vs a direct python model ----------------------------


def test_pagerank_matches_python_model(spark):
    """``weighted_pagerank`` on a hand-built graph must equal a direct
    Python replay of the integer recurrence (teleport + damped floored
    contributions) — an independent implementation, so the distributed
    join/aggregate rounds are verified against the arithmetic spec, not
    against themselves. Graph: a 5-node weighted digraph with an
    isolated node (6) that must stay at TELEPORT, a self-loop, and a
    weight-skewed hub."""
    from pubic_multi_platform_to_postgres_spark.operators.graph import (
        D_DEN,
        D_NUM,
        SCALE,
        TELEPORT,
        weighted_pagerank,
        weighted_pagerank_converged,
    )

    edge_list = [
        (1, 2, 3), (1, 3, 1), (2, 3, 5), (3, 1, 2), (4, 3, 7),
        (2, 2, 1),  # self-loop
        (5, 3, 100),  # weight-skewed hub feed
    ]
    node_ids = [1, 2, 3, 4, 5, 6]
    iters = 7

    ranks = {n: SCALE for n in node_ids}
    wdeg = {}
    for s, _, w in edge_list:
        wdeg[s] = wdeg.get(s, 0) + w
    for _ in range(iters):
        nxt = {n: TELEPORT for n in node_ids}
        for s, d, w in edge_list:
            nxt[d] += (D_NUM * ranks[s] * w) // (D_DEN * wdeg[s])
        ranks = nxt

    nodes = spark.createDataFrame([(n,) for n in node_ids], "node long")
    edges = spark.createDataFrame(edge_list, "src long, dst long, w long")
    got = {
        r["node"]: r["rank_q"]
        for r in weighted_pagerank(nodes, edges, iters=iters, checkpoint_every=3).collect()
    }
    assert got == ranks
    assert got[6] == TELEPORT  # isolated: teleport-only, still present
    assert got[3] == max(got.values())  # the hub every edge feeds


def test_pagerank_n_nodes_statistic_routes_identically(spark):
    """r16 (VERDICT r15 Next #1): the regime route reads a caller-supplied
    node-count statistic instead of running a live ``count()`` job; the
    decision — and therefore the executed plan and the output — must be
    IDENTICAL to the count path for the same number, in both regimes."""
    from pubic_multi_platform_to_postgres_spark.operators.graph import (
        _rank_vector_broadcastable,
        weighted_pagerank,
    )

    nodes = spark.createDataFrame([(n,) for n in range(1, 7)], "node long")
    edges = spark.createDataFrame(
        [(1, 2, 3), (2, 3, 5), (3, 1, 2)], "src long, dst long, w long"
    )
    cached = nodes.localCheckpoint(eager=True)
    # same decision from the statistic as from the live count
    assert _rank_vector_broadcastable(cached, 6) == _rank_vector_broadcastable(
        cached
    )
    # a statistic big enough to overflow the threshold flips the route
    assert not _rank_vector_broadcastable(cached, 10**9)
    # threaded statistic: same output as the probe path
    want = {
        r["node"]: r["rank_q"]
        for r in weighted_pagerank(nodes, edges, iters=2).collect()
    }
    got = {
        r["node"]: r["rank_q"]
        for r in weighted_pagerank(nodes, edges, iters=2, n_nodes=6).collect()
    }
    assert got == want


def test_local_clustering_cap_faces_identical(spark):
    """r16 (VERDICT r15 Next #5): ``local_clustering``'s degree-capped
    attach must produce the same exact integers as the uncapped face and
    as a direct Python count, on a graph that exercises ALL THREE paths:
    small-small edges (map-side intersect), hub-spoke edges (attached
    capped array exploded into the membership join), and hub-hub edges
    (both endpoints over the cap — the fetch join)."""
    import itertools

    from pubic_multi_platform_to_postgres_spark.operators.graph import (
        local_clustering,
    )

    # two hubs (degree 8 and 7) joined to each other, sharing spokes
    # (hub-hub triangles), plus a 4-clique and a pendant chain
    edges = set()
    h1, h2 = 100, 200
    for i in range(1, 9):
        edges.add((h1, h1 + i) if h1 < h1 + i else (h1 + i, h1))
    for i in range(1, 7):
        edges.add((h2, h2 + i))
    edges.add((h1, h2))
    edges.add((h1, h2 + 1))          # triangle h1-h2-(h2+1)
    edges.add((h2, h1 + 1))          # triangle h2-h1-(h1+1)
    for a, b in itertools.combinations([1, 2, 3, 4], 2):
        edges.add((a, b))
    edges.add((4, 5))
    edges = sorted(edges)

    # direct python model
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = {v: 0 for v in adj}
    for a, b in edges:
        t = len(adj[a] & adj[b])
        tri[a] += t  # a triangle at v lies on exactly two of v's
        tri[b] += t  # incident edges -> halve below
    want = {v: (len(adj[v]), tri[v] // 2) for v in adj}

    p = spark.createDataFrame(edges, "id_a long, id_b long")
    # cap=4: hubs (deg 8/9 and 7/8) are OVER the cap -> hub-hub edge
    # (h1,h2) takes the fetch path, hub-spoke edges the attached path,
    # clique/chain edges the map-side path
    for cap in (4, 10**6):
        got = {
            r["doc_id"]: (r["degree"], r["n_triangles"])
            for r in local_clustering(p, deg_cap=cap).collect()
        }
        assert got == want, f"cap={cap}: {got} != {want}"


def test_parquet_rows_footer_statistic_exact():
    """``plans.stats.parquet_rows`` must equal the engine's own row
    count for a single-file table, sum part files for a directory, and
    return None (probe fallback) on a missing path."""
    import pyarrow.parquet as pq

    from pubic_multi_platform_to_postgres_spark.plans.stats import parquet_rows

    f = f"{SF_SMOKE}/customer.parquet"
    assert parquet_rows(f) == pq.ParquetFile(f).metadata.num_rows
    assert parquet_rows(f) > 0
    assert parquet_rows("/nonexistent/nowhere.parquet") is None
    # directory-of-parts layout (the scaled fixtures' shape)
    import shutil
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        shutil.copy(f, f"{d}/part-0.parquet")
        shutil.copy(f, f"{d}/part-1.parquet")
        open(f"{d}/_SUCCESS", "w").close()
        assert parquet_rows(d) == 2 * parquet_rows(f)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(0, 6), min_size=1, max_size=60),
    st.integers(2, 10),
    st.booleans(),
)
def test_ntile_tuple_device_matches_ntile_property(spark, vals, tiles, heavy):
    """The boundary-bucket tuple device + map-side assignment must
    reproduce ``ntile(t) over (order by value, key)`` EXACTLY — same
    remainder-fill, same value-tie split by key — for any tie structure
    (0..6 values force massive ties), any tile count (including
    t > n), in BOTH shapes: heavy-ties (exact-value bucket + tie-bucket
    stage) and crossing-cell rank (coarse monotone bucket)."""
    from pyspark.sql import Row, Window

    from pubic_multi_platform_to_postgres_spark.operators.selection import (
        nearest_rank_multi_tuple,
        ntile_assign,
        ntile_boundary_ks,
    )

    df = spark.createDataFrame(
        [Row(v=v, k=i * 7 % 61) for i, v in enumerate(vals)]
    ).localCheckpoint(eager=False)
    expect = {
        (r["v"], r["k"]): r["b"]
        for r in df.select(
            "v", "k", F.ntile(tiles).over(Window.orderBy("v", "k")).alias("b")
        ).collect()
    }
    ks = ntile_boundary_ks(tiles)
    if heavy:
        bnds = nearest_rank_multi_tuple(
            df, "v", "k", F.col("v"), ks, tie_bucket=F.expr("k div 5")
        )
    else:
        bnds = nearest_rank_multi_tuple(
            df, "v", "k", (F.col("v") / 3).cast("long"), ks
        )
    boundaries = [bnds[label] for label in ks if label in bnds]
    got = {
        (r["v"], r["k"]): r["b"]
        for r in df.select(
            "v", "k", ntile_assign("v", "k", boundaries).alias("b")
        ).collect()
    }
    assert got == expect


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.integers(1, 25), min_size=1, max_size=50),
       st.sampled_from([0.5, 0.99]))
def test_nearest_rank_exact_matches_rank_row(spark, ns, q):
    """nearest_rank_exact must equal the value at row_number rank
    ceil(q*n) under ORDER BY (value, tie) for any tie structure — the
    p50/p99 selection dq_join_skew_audit replaced its |keys|-sized
    unpartitioned window with."""
    from pyspark.sql import Row

    from pubic_multi_platform_to_postgres_spark.operators.selection import (
        nearest_rank_exact,
    )

    df = spark.createDataFrame(
        [Row(n=n, key=i) for i, n in enumerate(ns)]
    ).localCheckpoint(eager=False)
    rank = int(math.ceil(q * len(ns)))
    expect = sorted(ns)[rank - 1]
    got = nearest_rank_exact(
        df, "n", {"x": f"cast(ceil({q} * sum(c) over ()) as bigint)"}
    )["x"]
    assert got == expect


def test_pagerank_early_exit_matches_model_at_exit_round(spark):
    """``tol_q`` early-exit (VERDICT r9 Next #7): a Python replay of the
    integer recurrence AND of the check rule (every ``check_every``
    rounds, exact L1 against the previously CHECKED vector, stop at
    ≤ tol) predicts both the exit round and the exact rank vector; the
    distributed implementation must match both, exit before the round
    cap, and the fixed-round face must keep returning a bare DataFrame
    (the converged face is its own function per round-10 advice)."""
    from pyspark.sql import DataFrame

    from pubic_multi_platform_to_postgres_spark.operators.graph import (
        D_DEN,
        D_NUM,
        SCALE,
        TELEPORT,
        weighted_pagerank,
        weighted_pagerank_converged,
    )

    edge_list = [(1, 2, 1), (2, 1, 1), (3, 1, 2), (1, 3, 2)]
    node_ids = [1, 2, 3, 4]
    iters, tol_q, check_every = 40, 10**8, 2

    wdeg: dict = {}
    for s, _, w in edge_list:
        wdeg[s] = wdeg.get(s, 0) + w
    ranks = {n: SCALE for n in node_ids}
    prev_checked = dict(ranks)
    want_rounds = iters
    for i in range(iters):
        nxt = {n: TELEPORT for n in node_ids}
        for s, d, w in edge_list:
            nxt[d] += (D_NUM * ranks[s] * w) // (D_DEN * wdeg[s])
        ranks = nxt
        if (i + 1) % check_every == 0 and i + 1 < iters:
            delta = sum(abs(ranks[n] - prev_checked[n]) for n in node_ids)
            prev_checked = dict(ranks)
            if delta <= tol_q:
                want_rounds = i + 1
                break
    assert want_rounds < iters  # the fixture must actually converge

    nodes = spark.createDataFrame([(n,) for n in node_ids], "node long")
    edges = spark.createDataFrame(edge_list, "src long, dst long, w long")
    assert isinstance(weighted_pagerank(nodes, edges, iters=3), DataFrame)
    early, rounds = weighted_pagerank_converged(
        nodes, edges, iters=iters, tol_q=tol_q, check_every=check_every
    )
    got = {r["node"]: r["rank_q"] for r in early.collect()}
    assert rounds == want_rounds
    assert got == ranks


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=40),
        min_size=2,
        max_size=12,
    ),
    st.sampled_from([0.4, 0.6, 0.9]),
)
def test_containment_pairs_matches_python_model(spark, texts, thr):
    """containment_pairs must equal the brute-force all-pairs scorer
    (|A∩B|/|A| over distinct 3-gram shingle sets, ordered pairs within
    one block) for ANY text shape — short docs (single whole-text
    shingle fallback), empty-ish strings, heavy overlap — proving the
    one-sided prefix filter lossless, not just fixture-green."""
    from pyspark.sql import Row

    from pubic_multi_platform_to_postgres_spark.operators.dedup import (
        containment_pairs,
    )

    def model_set(t):
        # tokenize() splits trimmed lowercase text on \s+; an all-space
        # string yields the single empty token, like split() on ""
        w = t.strip().lower().split() or [""]
        if len(w) >= 3:
            return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}
        return {" ".join(w)}

    sets = [model_set(t) for t in texts]
    want = {}
    for i, a in enumerate(sets):
        for j, b in enumerate(sets):
            if i != j and a:
                c = len(a & b) / len(a)
                if c >= thr:
                    want[(i, j)] = c
    df = spark.createDataFrame(
        [Row(doc_id=i, lang="x", text=t) for i, t in enumerate(texts)]
    )
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_pairs(
            df, "text", "doc_id", ["lang"], threshold=thr, ngram=3
        ).collect()
    }
    assert set(got) == set(want)
    for k, v in got.items():
        assert abs(v - want[k]) < 1e-12


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        # a 3-letter alphabet with spaces makes exact-duplicate texts
        # (clone cliques) and near-dups both common under shrinking
        st.text(alphabet="ab c", min_size=0, max_size=25),
        min_size=2,
        max_size=10,
    ),
    st.sampled_from([0.4, 0.8]),
)
def test_collapse_exact_equals_direct_for_any_corpus(spark, texts, thr):
    """The mass-duplication re-plan is LOSSLESS for ANY corpus, not just
    the fixture: both prefix-filter generators must emit the identical
    (pair, score) multiset with and without ``collapse_exact`` —
    including random clone cliques, whole-text-shingle short docs, and
    empty-ish strings the generator strategy produces."""
    from pyspark.sql import Row

    from pubic_multi_platform_to_postgres_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    df = spark.createDataFrame(
        [Row(doc_id=i, lang="x", text=t) for i, t in enumerate(texts)]
    )

    def pairs(frame):
        cols = frame.columns
        return sorted(
            (r[cols[0]], r[cols[1]], round(r[cols[2]], 12))
            for r in frame.collect()
        )

    for collapse in (False, True):
        if collapse:
            assert pairs(
                ngram_jaccard_pairs(
                    df, "text", "doc_id", ["lang"], threshold=thr, ngram=3,
                    collapse_exact=True,
                )
            ) == jac_direct
            assert pairs(
                containment_pairs(
                    df, "text", "doc_id", ["lang"], threshold=thr, ngram=3,
                    collapse_exact=True,
                )
            ) == ct_direct
        else:
            jac_direct = pairs(
                ngram_jaccard_pairs(
                    df, "text", "doc_id", ["lang"], threshold=thr, ngram=3
                )
            )
            ct_direct = pairs(
                containment_pairs(
                    df, "text", "doc_id", ["lang"], threshold=thr, ngram=3
                )
            )
