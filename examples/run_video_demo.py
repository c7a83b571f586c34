#!/usr/bin/env python
"""End-to-end VIDEO ingest demo: the multimodal recipe a training-data
pipeline runs on clip containers, composed from the catalog's video
tier, runnable standalone on the bundled fixture:

    python examples/run_video_demo.py [sf_dir]

1. Render the planted-fixture clips (real 4-frame animated GIF89a per
   document — the same containers the oracle gates rebuild).
2. SHOT ANALYSIS: frame-delta profile -> scene cuts -> one keyframe
   per shot (`multimodal_video_scene_cuts` / `multimodal_keyframe_select`).
3. NEAR-DUP SCREEN: temporal-mean frame hash -> pigeonhole-banded
   Hamming pairs (`multimodal_video_framehash_neardup`).
4. CROSS-MODAL CONSENSUS: image aHash pairs JOIN audio energy-contour
   pairs — the multi-signal dedup decision (`dedup_crossmodal_consensus`).

Every stage here is a registered catalog query with a full DuckDB
oracle; this demo just runs them in pipeline order and prints the
shape of each result the way a curation review would read it.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

from pyspark.sql import functions as F  # noqa: E402

from pubic_multi_platform_to_postgres_spark.queries.registry import REGISTRY  # noqa: E402
from pubic_multi_platform_to_postgres_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session(app_name="video_demo", master="local[4]",
                        shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    cuts = REGISTRY["multimodal_video_scene_cuts"].fn(spark, sf_dir)
    n_cuts = cuts.filter("is_cut").count()
    n_docs = cuts.select("doc_id").distinct().count()
    print(f"[1] scene cuts: {n_docs} decodable clips, {n_cuts} cut "
          f"transitions (planted: exactly one per clip)")

    kf = REGISTRY["multimodal_keyframe_select"].fn(spark, sf_dir)
    shots = kf.groupBy("doc_id").count().agg(F.avg("count")).first()[0]
    print(f"[2] keyframes: {kf.count()} (shots/clip avg {shots:.1f}; "
          f"planted: 2 shots, keyframes 0 and 2)")

    vid = REGISTRY["multimodal_video_framehash_neardup"].fn(spark, sf_dir)
    print(f"[3] video near-dup pairs: {vid.count()} "
          f"(temporal-mean hash, Hamming <= 3, banded — no all-pairs)")

    both = REGISTRY["dedup_crossmodal_consensus"].fn(spark, sf_dir)
    img = REGISTRY["multimodal_image_ahash_neardup"].fn(spark, sf_dir)
    aud = REGISTRY["multimodal_audio_fingerprint_neardup"].fn(spark, sf_dir)
    print(f"[4] consensus: image {img.count()} ∩ audio {aud.count()} "
          f"-> {both.count()} pairs survive BOTH families")

    spark.stop()


if __name__ == "__main__":
    main()
