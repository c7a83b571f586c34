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


def train_codebooks(qsub: DataFrame, init_lo: int = 0) -> np.ndarray:
    """Fixed-iteration integer k-means per subspace over the quantized
    vectors: returns the (M, K, DSUB) int64 codebooks. Each round is one
    map-side assignment pass + ONE aggregate collapsing to
    M·K·DSUB driver rows; the corpus never moves.

    ``init_lo`` shifts the deterministic seed window to vec_ids
    ``[init_lo, init_lo + K)`` — the IVF+PQ residual trainer must skip
    the coarse-centroid ids, whose residuals are all-zero and would
    collapse every initial codeword onto one point."""
    init = (
        qsub.filter(
            (F.col("vec_id") >= init_lo) & (F.col("vec_id") < init_lo + K)
        )
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


def _kmeans_round_parts(sqdist: str) -> list[str]:
    """The unrolled k-means training rounds (assignment CTE +
    truncating-division update CTE + empty-cell carry-over), shared by
    the PQ and IVF+PQ oracles — both train over a CTE named ``sub``
    with columns (vec_id, m, s)."""
    parts = []
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
    return parts


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
    parts.extend(_kmeans_round_parts(sqdist))
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


NCELLS = 16  # coarse cells (IVF)
NPROBE = 4  # probed cells per query


def _coarse_centroids(qsub: DataFrame) -> np.ndarray:
    """Frozen coarse quantizer: the quantized vectors of the NCELLS
    lowest vec_ids (the ``sim_incremental_ivf_assign`` convention — a
    deterministic, oracle-replayable cell grid; cell id = centroid's
    vec_id)."""
    rows = qsub.filter(F.col("vec_id") < NCELLS).orderBy("vec_id").collect()
    return np.asarray([r["qv"] for r in rows], dtype=np.int64)  # (NCELLS, D)


def _assign_residuals(qsub: DataFrame, coarse: np.ndarray) -> DataFrame:
    """Map-side coarse assignment + integer residual: per vector the
    argmin-L2 cell (tie → lowest cell) and ``rv = qv − centroid[cell]``.
    Output: (vec_id, cell, rv)."""
    cl = coarse.tolist()

    @F.pandas_udf("struct<cell: int, rv: array<long>>")
    def one(qvs):
        import pandas as pd

        c = np.asarray(cl, dtype=np.int64)  # (NCELLS, D)
        cells, rvs = [], []
        for qv in qvs:
            q = np.asarray(qv, dtype=np.int64)
            d = ((q[None, :] - c) ** 2).sum(axis=1)
            cell = int(d.argmin())  # first minimum = lowest cell on ties
            cells.append(cell)
            rvs.append((q - c[cell]).tolist())
        return pd.DataFrame({"cell": cells, "rv": rvs})

    out = qsub.select("vec_id", one(F.col("qv")).alias("a"))
    return out.select("vec_id", "a.cell", "a.rv")


def ivfpq_topk(qsub: DataFrame) -> DataFrame:
    """IVF+PQ — the canonical billion-scale index (Jégou et al. 2011,
    the FAISS ``IVFPQ`` shape): a coarse quantizer routes each vector to
    one of NCELLS inverted lists, PQ codes the RESIDUAL (vector −
    centroid — residuals concentrate near zero, so the same K codes
    carry more precision than raw-vector PQ), and a query probes only
    its NPROBE nearest cells, scoring each probed cell's codes against
    a PER-CELL distance table built from the query's residual in THAT
    cell. Every step integer-exact for oracle replay.

    Scale shape: the coarse grid is NCELLS driver rows; assignment +
    residuals are one map-side Arrow pass; PQ training is the measured
    ``train_codebooks`` (M·K·DSUB driver rows per round); the scan
    reads (cell, M bytes of codes) per vector and each partition emits
    per-probe top-k heads — at 100 TB the corpus is PARTITIONED BY
    CELL, so a query touches NPROBE/NCELLS of the data; here cells ride
    as a column and the probe filter happens in the scan kernel.
    Output: (probe_id, rank, vec_id, adc_dist)."""
    import pandas as pd

    coarse = _coarse_centroids(qsub)
    asg = _assign_residuals(qsub, coarse).localCheckpoint(eager=False)
    res = asg.select("vec_id", F.col("rv").alias("qv"))
    cents = train_codebooks(res, init_lo=NCELLS)

    probes = [
        (r["vec_id"], np.asarray(r["qv"], dtype=np.int64))
        for r in qsub.filter(F.col("vec_id") < N_PROBES)
        .orderBy("vec_id")
        .collect()
    ]
    # per probe: NPROBE nearest cells (integer L2, tie -> lowest cell),
    # then a distance table per probed cell from the probe's residual
    # in THAT cell — (P, NPROBE, M, K) integers, driver-built
    c = cents  # (M, K, DSUB)
    pids, pcells, dts = [], [], []
    for pid, q in probes:
        d = ((q[None, :] - coarse) ** 2).sum(axis=1)
        cells = np.argsort(d, kind="stable")[:NPROBE]
        tabs = []
        for cell in cells:
            rq = (q - coarse[cell]).reshape(M, 1, DSUB)
            tabs.append(((rq - c) ** 2).sum(axis=2))  # (M, K)
        pids.append(int(pid))
        pcells.append([int(x) for x in cells])
        dts.append(np.stack(tabs).tolist())  # (NPROBE, M, K)

    coded = asg.select(
        "vec_id", "cell", _codes_udf(cents)(F.col("rv")).alias("codes")
    )

    def heads(batches):
        dtn = np.asarray(dts, dtype=np.int64)  # (P, NPROBE, M, K)
        pc = np.asarray(pcells, dtype=np.int64)  # (P, NPROBE)
        pn = np.asarray(pids, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            cells = pdf["cell"].to_numpy(dtype=np.int64)
            codes = np.stack(
                [np.asarray(cd, dtype=np.int64) for cd in pdf["codes"]]
            )  # (n, M)
            out = {"probe_id": [], "vec_id": [], "adc_dist": []}
            marange = np.arange(M)[None, :]
            for pi in range(len(pn)):
                for ci in range(NPROBE):
                    keep = (cells == pc[pi, ci]) & (ids != pn[pi])
                    if not keep.any():
                        continue
                    dv = dtn[pi, ci][marange, codes[keep]].sum(axis=1)
                    iv = ids[keep]
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
        .select(
            "probe_id", F.col("rank").cast("int").alias("rank"),
            "vec_id", "adc_dist",
        )
    )


def ivfpq_oracle_sql() -> str:
    """DuckDB replay of the ENTIRE IVF+PQ chain: quantization, coarse
    assignment (integer L2 argmin, tie → lowest cell), residuals,
    residual-PQ training (the shared unrolled rounds), encoding with
    the cell carried, per-probe cell selection (rank NPROBE cells),
    per-(probe, cell) residual distance tables, the cell-scoped ADC
    join, and the rank window."""
    d = DSUB * M
    l2 = (
        "list_sum(list_transform(range(1, {n} + 1),"
        " i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
    )
    l2_full = l2.format(n=d, a="q.qv", b="cc.cv")
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
    cc AS (SELECT vec_id AS cell, qv AS cv FROM q WHERE vec_id < {NCELLS}),
    asg AS (
        SELECT vec_id, cell FROM (
            SELECT q.vec_id, cc.cell,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                      ORDER BY {l2_full}, cc.cell) AS rn
            FROM q CROSS JOIN cc
        ) WHERE rn = 1
    ),
    res AS (
        SELECT q.vec_id, asg.cell,
               list_transform(range(1, {d + 1}), i -> q.qv[i] - cc.cv[i]) AS rv
        FROM q JOIN asg USING (vec_id) JOIN cc USING (cell)
    ),
    sub AS (
        SELECT vec_id, m.i AS m,
               list_slice(rv, m.i * {DSUB} + 1, m.i * {DSUB} + {DSUB}) AS s
        FROM res, generate_series(0, {M - 1}) m(i)
    ),
    c0 AS (
        SELECT m, vec_id - {NCELLS} AS j, s AS c FROM sub
        WHERE vec_id >= {NCELLS} AND vec_id < {NCELLS + K}
    )"""]
    parts.extend(_kmeans_round_parts(sqdist))
    fin, dfin = f"c{ITERS}", sqdist.format(c=f"c{ITERS}")
    pdist = (
        "list_sum(list_transform(range(1, 9),"
        f" i -> (psub.s[i] - {fin}.c[i]) * (psub.s[i] - {fin}.c[i])))"
    )
    parts.append(f""",
    enc AS (
        SELECT e.vec_id, a.cell, e.m, e.code
        FROM (
            SELECT vec_id, m, j AS code FROM (
                SELECT sub.vec_id, sub.m, {fin}.j,
                       ROW_NUMBER() OVER (PARTITION BY sub.vec_id, sub.m
                                          ORDER BY {dfin}, {fin}.j) AS rn
                FROM sub JOIN {fin} ON {fin}.m = sub.m
            ) WHERE rn = 1
        ) e JOIN asg a USING (vec_id)
    ),
    pcell AS (
        SELECT probe_id, cell FROM (
            SELECT q.vec_id AS probe_id, cc.cell,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                      ORDER BY {l2_full}, cc.cell) AS rn
            FROM q CROSS JOIN cc
            WHERE q.vec_id < {N_PROBES}
        ) WHERE rn <= {NPROBE}
    ),
    pres AS (
        SELECT p.vec_id AS probe_id, pc.cell,
               list_transform(range(1, {d + 1}), i -> p.qv[i] - cc.cv[i]) AS rv
        FROM q p JOIN pcell pc ON pc.probe_id = p.vec_id
                JOIN cc ON cc.cell = pc.cell
    ),
    psub AS (
        SELECT probe_id, cell, m.i AS m,
               list_slice(rv, m.i * {DSUB} + 1, m.i * {DSUB} + {DSUB}) AS s
        FROM pres, generate_series(0, {M - 1}) m(i)
    ),
    dt AS (
        SELECT psub.probe_id, psub.cell, psub.m, {fin}.j,
               CAST({pdist} AS BIGINT) AS pd
        FROM psub JOIN {fin} ON {fin}.m = psub.m
    ),
    adc AS (
        SELECT dt.probe_id, e.vec_id, CAST(SUM(dt.pd) AS BIGINT) AS adc_dist
        FROM enc e JOIN dt ON dt.cell = e.cell AND dt.m = e.m
                          AND dt.j = e.code
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
