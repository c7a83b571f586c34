"""Product quantization ANN (Jégou, Douze & Schmid 2011), integer-exact.

PQ is the memory face of billion-scale ANN: split each D-dim vector
into M subvectors, k-means each subspace into K codes, store M bytes
per vector instead of 4·D, and answer queries by ADC (asymmetric
distance computation) — the query keeps its exact subvectors, corpus
vectors are looked up in a per-query distance table. This module is the
full train→encode→scan chain with every step in integer arithmetic so a
DuckDB oracle replays it bit-for-bit (the ``operators/decomposition.py``
playbook):

- quantize ``q = floor(x · 2^10)`` (exact — see decomposition.py);
- codebooks: K-means with FIXED iteration count and deterministic
  seeding (initial centroids = the subvectors of the ``K`` lowest-id
  vectors); assignment = argmin of the integer squared distance,
  tie-broken on the smallest code; update = element-wise TRUNCATING
  integer division of the assigned sums (DuckDB's ``//`` truncates
  toward zero on integers while Python's floors, so the driver mirrors
  truncation explicitly: ``sign · (|s| // n)``); empty cells keep their
  previous centroid;
- encode: final-round argmin per (vector, subspace);
- ADC: per-probe distance table (M·K integer entries, driver-built
  from the probes' exact subvectors) + a codes-only corpus scan.

int64 bounds: |q| ≤ 2^10·max|x| (~10^3 for unit-scale embeddings), a
subspace distance ≤ dsub·(2|q|)^2 (~3·10^7), an ADC total ≤ M× that —
orders of magnitude inside int64.

Scale shape (100 TB): training aggregates collapse to
O(M·K·dsub) driver rows (the IVF-centroid-collect class); assignment
and encoding are map-side Arrow-batched passes with the codebooks as
closure literals; the ADC scan reads M bytes of codes per vector
(32× less than raw float32 at D=64/M=8) and each partition emits only
its per-probe top-k heads, so the only shuffle is
probes·k·partitions head rows into one rank window — the
``multiprobe_partition_topk`` shape.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QSCALE = 1024
M = 8  # subspaces
DSUB = 8  # dims per subspace (D = 64)
K = 16  # codes per subspace
ITERS = 2
N_PROBES = 8
TOPK = 10


def _trunc_div(s: int, n: int) -> int:
    """Truncating integer division (toward zero), matching DuckDB ``//``
    — Python's ``//`` floors, which differs on negative sums."""
    q = abs(s) // n
    return -q if s < 0 else q


def quantized_subvectors(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """``(id, qv)`` with ``qv = floor(x · QSCALE)`` per component —
    float→double is exact and the power-of-two multiply only shifts the
    exponent, so both engines floor the same value."""
    return df.select(
        F.col(id_col).alias("vec_id"),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * QSCALE).cast("long"),
        ).alias("qv"),
    )


def _codes_udf(centroids: np.ndarray):
    """Pandas UDF: per vector, the argmin code of every subspace
    (numpy int64 throughout; ``argmin`` keeps the first = smallest code
    on ties, matching the oracle's ``ORDER BY dist, j`` rank)."""
    cl = centroids.tolist()  # (M, K, DSUB) — closure-captured literals

    @F.pandas_udf("array<int>")
    def codes_of(qvs):
        import pandas as pd

        c = np.asarray(cl, dtype=np.int64)  # (M, K, DSUB)

        def one(qv):
            q = np.asarray(qv, dtype=np.int64).reshape(M, 1, DSUB)
            d = ((q - c) ** 2).sum(axis=2)  # (M, K)
            return d.argmin(axis=1).astype(np.int32)

        return qvs.apply(one)

    return codes_of


def train_codebooks(qsub: DataFrame) -> np.ndarray:
    """Fixed-iteration integer k-means per subspace over the quantized
    vectors: returns the (M, K, DSUB) int64 codebooks. Each round is one
    map-side assignment pass + ONE aggregate collapsing to
    M·K·DSUB driver rows; the corpus never moves."""
    init = (
        qsub.filter(F.col("vec_id") < K)
        .orderBy("vec_id")
        .collect()
    )
    cents = np.asarray(
        [[row["qv"][m * DSUB : (m + 1) * DSUB] for row in init] for m in range(M)],
        dtype=np.int64,
    )  # (M, K, DSUB)
    for _ in range(ITERS):
        coded = qsub.select("vec_id", "qv", _codes_udf(cents)(F.col("qv")).alias("codes"))
        sub = coded.select(
            F.posexplode(
                F.array(*[
                    F.struct(
                        F.col("codes")[m].alias("j"),
                        F.slice("qv", m * DSUB + 1, DSUB).alias("s"),
                    )
                    for m in range(M)
                ])
            ).alias("m", "a")
        )
        parts = (
            sub.select("m", F.col("a.j").alias("j"), F.posexplode("a.s").alias("pos", "val"))
            .groupBy("m", "j", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        nxt = cents.copy()  # empty cells keep their previous centroid
        for row in parts:
            nxt[row["m"], row["j"], row["pos"]] = _trunc_div(row["s"], row["n"])
        cents = nxt
    return cents


def adc_topk(
    qsub: DataFrame, cents: np.ndarray, probes: list[tuple[int, list[int]]]
) -> DataFrame:
    """ADC scan: encode the corpus with the final codebooks, build the
    per-probe distance tables from the probes' EXACT subvectors
    (driver-side — M·K·|probes| integers), score every corpus vector by
    M table lookups, and emit per-partition top-k heads per probe into
    one global rank window. Output: (probe_id, rank, vec_id, adc_dist).
    """
    import pandas as pd

    c = cents  # (M, K, DSUB)
    dt = np.empty((len(probes), M, K), dtype=np.int64)
    pids = []
    for pi, (pid, qv) in enumerate(probes):
        pq = np.asarray(qv, dtype=np.int64).reshape(M, 1, DSUB)
        dt[pi] = ((pq - c) ** 2).sum(axis=2)
        pids.append(pid)
    dt_l, pids_l, cl = dt.tolist(), list(pids), c.tolist()

    coded = qsub.select("vec_id", _codes_udf(cents)(F.col("qv")).alias("codes"))

    def heads(batches):
        dtn = np.asarray(dt_l, dtype=np.int64)  # (P, M, K)
        pn = np.asarray(pids_l, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            codes = np.stack(
                [np.asarray(cd, dtype=np.int64) for cd in pdf["codes"]]
            )  # (n, M)
            # dist[p, v] = Σ_m dt[p, m, codes[v, m]] — index arrays for
            # the (m, code) axes broadcast to (n, M), giving (P, n, M)
            d = dtn[:, np.arange(M)[None, :], codes].sum(axis=2)
            out = {"probe_id": [], "vec_id": [], "adc_dist": []}
            for pi in range(len(pn)):
                keep = ids != pn[pi]  # never return the probe itself
                dv, iv = d[pi][keep], ids[keep]
                order = np.lexsort((iv, dv))[:TOPK]
                out["probe_id"].extend([int(pn[pi])] * len(order))
                out["vec_id"].extend(iv[order].tolist())
                out["adc_dist"].extend(dv[order].tolist())
            yield pd.DataFrame(out)

    head_rows = coded.mapInPandas(
        heads, "probe_id long, vec_id long, adc_dist long"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("probe_id").orderBy("adc_dist", "vec_id")
    return (
        head_rows.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOPK)
        .select("probe_id", F.col("rank").cast("int").alias("rank"), "vec_id", "adc_dist")
    )


def pq_oracle_sql() -> str:
    """DuckDB replay of the ENTIRE PQ chain — quantization, both k-means
    rounds (assignment CTE + truncating-division update CTE + empty-cell
    carry-over per round), encoding, per-probe distance tables, the ADC
    aggregate, and the rank window — so the gate proves the distributed
    train/encode/scan bit-faithful."""
    sqdist = (
        "list_sum(list_transform(range(1, 9),"
        " i -> (sub.s[i] - {c}.c[i]) * (sub.s[i] - {c}.c[i])))"
    )
    parts = [f"""WITH q AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * {QSCALE}) AS BIGINT))
                   AS qv
        FROM embeddings
    ),
    sub AS (
        SELECT vec_id, m.i AS m,
               list_slice(qv, m.i * {DSUB} + 1, m.i * {DSUB} + {DSUB}) AS s
        FROM q, generate_series(0, {M - 1}) m(i)
    ),
    c0 AS (SELECT m, vec_id AS j, s AS c FROM sub WHERE vec_id < {K})"""]
    for t in range(1, ITERS + 1):
        prev, d = f"c{t - 1}", sqdist.format(c=f"c{t - 1}")
        parts.append(f""",
    a{t} AS (
        SELECT vec_id, m, j FROM (
            SELECT sub.vec_id, sub.m, {prev}.j,
                   ROW_NUMBER() OVER (PARTITION BY sub.vec_id, sub.m
                                      ORDER BY {d}, {prev}.j) AS rn
            FROM sub JOIN {prev} ON {prev}.m = sub.m
        ) WHERE rn = 1
    ),
    u{t} AS (
        SELECT m, j, pos,
               CAST(SUM(val) AS BIGINT) AS sv, COUNT(*) AS n
        FROM (
            SELECT a{t}.m, a{t}.j, g.i AS pos, sub.s[g.i] AS val
            FROM a{t} JOIN sub USING (vec_id, m),
                 generate_series(1, {DSUB}) g(i)
        ) GROUP BY m, j, pos
    ),
    c{t} AS (
        SELECT {prev}.m, {prev}.j,
               COALESCE(u.c, {prev}.c) AS c
        FROM {prev} LEFT JOIN (
            SELECT m, j, list(sv // n ORDER BY pos) AS c
            FROM u{t} GROUP BY m, j
        ) u ON u.m = {prev}.m AND u.j = {prev}.j
    )""")
    fin, dfin = f"c{ITERS}", sqdist.format(c=f"c{ITERS}")
    parts.append(f""",
    enc AS (
        SELECT vec_id, m, j AS code FROM (
            SELECT sub.vec_id, sub.m, {fin}.j,
                   ROW_NUMBER() OVER (PARTITION BY sub.vec_id, sub.m
                                      ORDER BY {dfin}, {fin}.j) AS rn
            FROM sub JOIN {fin} ON {fin}.m = sub.m
        ) WHERE rn = 1
    ),
    dt AS (
        SELECT sub.vec_id AS probe_id, sub.m, {fin}.j,
               CAST({dfin} AS BIGINT) AS d
        FROM sub JOIN {fin} ON {fin}.m = sub.m
        WHERE sub.vec_id < {N_PROBES}
    ),
    adc AS (
        SELECT dt.probe_id, e.vec_id, CAST(SUM(dt.d) AS BIGINT) AS adc_dist
        FROM enc e JOIN dt ON dt.m = e.m AND dt.j = e.code
        WHERE e.vec_id <> dt.probe_id
        GROUP BY dt.probe_id, e.vec_id
    )
    SELECT probe_id, CAST(rank AS INTEGER) AS rank, vec_id, adc_dist FROM (
        SELECT probe_id, vec_id, adc_dist,
               ROW_NUMBER() OVER (PARTITION BY probe_id
                                  ORDER BY adc_dist, vec_id) AS rank
        FROM adc
    ) WHERE rank <= {TOPK}""")
    return "".join(parts)
