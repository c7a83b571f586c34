#!/usr/bin/env python
"""End-to-end training-data CURATION demo: the recipe a 100 TB text
pipeline runs, composed from the catalog's model tier, runnable
standalone on the bundled fixture:

    python examples/run_curation_demo.py [sf_dir]

1. **Dedup decision** — near-dup clusters collapsed, longest member
   kept per cluster (`corpus_dedup_keep_best`).
2. **Quality stratification** — every survivor labeled head/middle/tail
   by tercile of its corpus-trained LM score (`text_lm_ccnet_buckets`);
   the tail stratum is dropped (the CCNet cut).
3. **Domain selection** — DSIR importance resampling ranks the
   remaining pool against the `src0` quality anchor
   (`corpus_dsir_select`).
4. **Recipe table** — per-source temperature weights, target tokens,
   and repeat factors for the final mixture (`corpus_mixture_plan`).
5. **Training order** — deterministic per-epoch shuffle positions +
   writer shards (`corpus_epoch_shuffle`).
6. **Lexical audits** — sub-document retention after block dedup
   (`corpus_block_dedup`), mean shingle novelty
   (`corpus_ngram_novelty`), and the real token bill under the
   corpus-trained BPE vocabulary (`text_bpe_encode`).

Every stage is the exact oracle-gated query the correctness gate runs;
this demo only wires their outputs together (keep-joins are doc_id
semi-joins — the composition itself adds no new shuffle patterns).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

from pyspark.sql import functions as F  # noqa: E402

from pubic_multi_platform_to_postgres_spark.queries.registry import REGISTRY  # noqa: E402
from pubic_multi_platform_to_postgres_spark.session import get_session  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session(app_name="curation_demo")
    q = {name: REGISTRY[name].fn for name in REGISTRY}

    n_raw = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    print(f"raw corpus: {n_raw} docs")

    # 1. dedup: keep the longest member of every near-dup cluster
    keep = q["corpus_dedup_keep_best"](spark, sf_dir).filter("keep")
    print(f"after keep-best dedup: {keep.count()} docs")

    # 2. CCNet stratification; drop the tail tercile
    buckets = q["text_lm_ccnet_buckets"](spark, sf_dir)
    quality = buckets.filter(F.col("ccnet_bucket") != "tail")
    survivors = quality.join(keep.select("doc_id"), "doc_id", "semi")
    print(f"after dropping LM tail: {survivors.count()} docs")

    # 3. DSIR: target-likeness scores over the raw pool (src0 = anchor)
    dsir = q["corpus_dsir_select"](spark, sf_dir)
    selected = dsir.join(survivors.select("doc_id"), "doc_id", "semi")
    print(f"DSIR top-decile ∩ survivors: {selected.count()} docs")
    print("  top 5 by target-likeness:")
    for r in selected.orderBy(F.desc("dsir_logratio"), "doc_id").limit(5).collect():
        print(f"    doc {r['doc_id']:>6} [{r['source']}]  "
              f"logratio={r['dsir_logratio']:.3f}")

    # 4. the mixture recipe the training run consumes
    print("mixture plan (temperature α=1/2, half-corpus budget):")
    for r in q["corpus_mixture_plan"](spark, sf_dir).orderBy(
        F.desc("target_tokens"), "source"
    ).limit(5).collect():
        print(f"    {r['source']:>6}: {r['n_tokens']:>8} tokens  "
              f"w={r['weight']:.4f}  target={r['target_tokens']:>8}  "
              f"repeat={r['repeat_factor']:.2f}")

    # 5. deterministic training order for epoch 0
    order = (
        q["corpus_epoch_shuffle"](spark, sf_dir)
        .filter("epoch = 0")
        .join(selected.select("doc_id"), "doc_id", "semi")
    )
    head = order.orderBy("pos").limit(3).collect()
    print("epoch-0 order head:",
          [(r["doc_id"], r["shard"]) for r in head])

    # 6. round-9 lexical audits over the selected pool: sub-document
    # retention after block dedup, per-doc novelty, and the REAL token
    # bill under the corpus-trained BPE vocabulary
    blocks = q["corpus_block_dedup"](spark, sf_dir).join(
        selected.select("doc_id"), "doc_id", "semi"
    )
    ret = blocks.agg(
        F.sum("n_blocks").alias("nb"), F.sum("n_kept").alias("nk")
    ).first()
    print(f"block dedup over the selection: kept {ret['nk']}/{ret['nb']} "
          f"16-word blocks")
    nov = (
        q["corpus_ngram_novelty"](spark, sf_dir)
        .join(selected.select("doc_id"), "doc_id", "semi")
        .agg(F.avg("novelty").alias("m"))
        .first()["m"]
    )
    print(f"mean shingle novelty of the selection: {nov:.3f}")
    toks = (
        q["text_bpe_encode"](spark, sf_dir)
        .join(selected.select("doc_id"), "doc_id", "semi")
        .agg(F.sum("n_tokens").alias("t"), F.sum("n_units0").alias("u"))
        .first()
    )
    print(f"BPE token bill: {toks['t']} tokens "
          f"({toks['t'] / toks['u']:.3f} of raw units)")
    print("curation demo complete.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
