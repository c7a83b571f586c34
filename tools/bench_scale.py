#!/usr/bin/env python
"""Scale-proof bench: measure the LLM-data family at 10× and 100× the
bench scale (VERDICT r4, Next-round #1).

SCALE.md argues every operator survives 100×; this converts the argument
into measurement. Fixtures come from ``tools/make_scaled_sf.py``
(replica-mutated sf0.1 — NO artificial cross-replica near-dups, so pair
counts stay honest). For every query we record, per scale point:

- wall-clock (median of ``--repeats`` at sf0.1/sf1; sf10 runs once —
  the 100× point is a curve check, not a pin),
- growth ratios vs sf0.1,
- shuffle evidence from the Spark UI REST API (first run): total
  shuffle-write bytes, the widest stage's task count, and the task
  count of the heaviest-shuffle stage — a query "collapsing to a single
  task" or exploding its shuffle shows up here, not just in wall-clock.

A watchdog cancels any query exceeding ``--timeout`` (recorded as
``timed_out``), so one quadratic blow-up cannot stall the evidence run.

Usage::

    python tools/bench_scale.py --out BENCH_SF1_r05.json
"""

from __future__ import annotations

import argparse
import json
import math
import statistics
import sys
import threading
import time
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

import __spark_entry__ as entry  # noqa: E402
from make_scaled_sf import build  # noqa: E402

from pubic_multi_platform_to_postgres_spark.session import get_session  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/spark_graft_sf1"
SF3 = "/tmp/spark_graft_sf3"
SF10 = "/tmp/spark_graft_sf10"

# Every query of the LLM-data family named by the verdict, measured at
# sf0.1 and sf1 (10×):
SF1_QUERIES = [
    # dedup family
    "dedup_exact_keep_min", "dedup_minhash_pairs", "dedup_simhash",
    "dedup_simhash_pairs", "dedup_ngram_jaccard", "dedup_clusters",
    "dedup_embedding_neardup", "dedup_levenshtein_prefix",
    # ANN family
    "sim_topk_bruteforce", "sim_topk_lsh", "sim_topk_ivf",
    "multimodal_ann_pipeline",
    # corpus curation
    "corpus_contamination_check", "corpus_temperature_mix",
    "corpus_remove_repetition", "corpus_stratified_sample",
    "corpus_quality_filter", "corpus_chunk_documents",
    "corpus_pack_sequences", "corpus_snapshot_diff",
    "text_lm_perplexity_filter", "dedup_incremental_new_batch",
    "text_lm_self_perplexity",
    "text_pii_scrub", "text_fingerprint", "embedding_quantize_int8",
    # heaviest multimodal (real codecs)
    "multimodal_gif_frames", "multimodal_resize", "multimodal_frame_sample",
    # r7 additions
    "corpus_leakage_safe_split", "corpus_boilerplate_scrub",
    "dedup_levenshtein_snm2", "corpus_curation_funnel", "ann_recall_at_k",
    # r8 additions
    "text_winnow_fingerprints", "dedup_shared_substrings",
    "dedup_semantic_clusters", "corpus_dedup_keep_best",
    "dedup_incremental_neardup",
    # r8: corpus-trained selection/classification/stratification (fixed-
    # width hashed feature space: model tables are O(B) / O(classes x B)
    # at any scale; ccnet buckets = the measured LM scorer + thresholds)
    "corpus_dsir_select", "corpus_centroid_classifier",
    "text_lm_ccnet_buckets", "corpus_source_divergence",
    "corpus_epoch_shuffle", "corpus_mixture_plan",
    "sim_incremental_ivf_assign",
    # r8: the audio modality (real RIFF/WAV decode, map-side)
    "multimodal_audio_features", "multimodal_audio_silence",
    "text_cms_heavy_hitters", "embedding_pca_power",
    "text_vocab_coverage", "corpus_shard_manifest", "text_html_extract",
    "corpus_quality_calibration", "dedup_source_matrix", "dedup_savings_report", "multimodal_image_ahash_neardup",
    "multimodal_audio_fingerprint_neardup", "multimodal_video_framehash_neardup",
    # r8: BPE pair counts — vocab-weighted, bounded pair table
    "text_bpe_pair_counts",
    # r8: video analysis — pure map-side frame-delta profile
    "multimodal_video_scene_cuts",
    # r8: multi-signal consensus — one pair-stream equi-join on top of
    # the two measured banded generators
    "dedup_crossmodal_consensus",
    # r8: Heaps-law novelty curve — one linear min-agg shuffle
    "text_ngram_novelty_curve",
    # r8: shot segmentation + keyframes on top of the delta profile
    "multimodal_keyframe_select",
    # r8: content-addressed ingest collapse (one fingerprint groupBy)
    "multimodal_content_addressed_dedup",
    # r8: iterative graph centrality (10 join+agg rounds, K fixed)
    "graph_pagerank_purchases",
    # r8: blocked fuzzy ER join + the sketch-quality audit (two full
    # measured pipelines composed)
    "er_fuzzy_customer_match", "dedup_minhash_eval",
    # r8: PQ ANN (train->encode->ADC scan, codes-only corpus read)
    "sim_topk_pq",
    # r8: compaction planner (manifest aggregate + O(files) prefix sum)
    "layout_compaction_plan",
    # r8: BPE merge loop (K vocab-sized passes + 1-row argmax collects)
    "text_bpe_merge_steps",
    # r8: pair-graph triangles + URL rollup (one-shuffle shapes)
    "graph_cluster_coefficient", "text_url_domain_stats",
    # r8: Markov transition matrix (one user-window shuffle)
    "journey_transition_matrix",
    # r8: Benford digit audit (map-side extract + 9-group aggregate)
    "stats_benford_order_values",
    # r9: lexical-statistics family — first-occurrence / vocab / pair
    # model tables, all linear shuffles
    "corpus_ngram_novelty", "corpus_token_gini", "corpus_block_dedup",
    "text_char_trigram_entropy", "text_lm_kneser_ney", "text_bpe_encode",
    "corpus_source_overlap", "corpus_vocab_growth",
    "corpus_pmi_collocations",
    # r9 second half: composed ANN index, DQ profiler, outer interval
    # join, MDM survivorship
    "sim_topk_ivfpq", "dq_column_profile", "stream_unattributed_clicks",
    "er_golden_record", "stats_chisq_source_lang",
    # r10: the three re-planned boundary-bucket queries (VERDICT r9
    # What's-wrong #1) — new plans need fresh scale evidence
    "histogram_equidepth_order_values", "rfm_customer_segments",
    "dq_join_skew_audit",
    # r10: lexical/drift audits — one token-count shuffle + constant
    # arithmetic (zipf), bounded dense-grid ECDF pair join (ks)
    "stats_zipf_exponent", "stats_ks_source_chars",
    # r10: asymmetric containment (one-sided prefix filter; the pair
    # family — also takes an sf3 point + output counts below)
    "dedup_containment_pairs",
    # r11: the sampled sketch audit — its claim is CONSTANT cost at any
    # corpus (256-doc scrambled-key sample + one linear TopK scan), so
    # the flat curve is the evidence
    "dedup_minhash_eval_sampled",
    # r11 second batch: measure rather than argue — the basket pair
    # self-join's bounded fan-out, the URL dedup's canon rollup, the
    # EWMA window pair (the streaming face's claim is FIXED Python-tier
    # overhead, so its 10× point should grow by the data term only),
    # the FK audit's join-priced edges, and the streak islands
    "basket_lift_part_pairs", "corpus_url_dedup", "ts_ewma_anomaly",
    "stream_ewma_alerts", "dq_referential_integrity",
    "window_longest_streak",
]
# 100× point: the operators whose scale ledger claims map-side / single
# bounded shuffle behavior (the codec-bound multimodal tier and the
# blocked pair generators are 10×-verified above; at 100× their
# per-replica fan-out would time-dominate the run without adding
# scaling information).
SF10_QUERIES = [
    "corpus_stratified_sample", "text_pii_scrub", "text_fingerprint",
    "embedding_quantize_int8", "corpus_quality_filter",
    "corpus_chunk_documents", "corpus_pack_sequences",
    "corpus_snapshot_diff", "corpus_temperature_mix",
    "dedup_exact_keep_min", "sim_topk_bruteforce", "sim_topk_lsh",
    "sim_topk_ivf",
    "text_lm_perplexity_filter", "dedup_incremental_new_batch",
    "text_lm_self_perplexity",
    # r7 (VERDICT r6 #6): the sorted-neighborhood plan is O(W·n) with a
    # bounded verify (levenshtein over 40-char heads), so the FULL query
    # is affordable at 100x — its curve no longer stops at sf3. The
    # jaccard verify join's output-sized shuffle is not; its 100x point
    # is candidate-count-only (see sf10_candidate_counts below).
    "dedup_levenshtein_prefix",
    # r7 additions whose ledger rows claim bounded-shuffle behavior
    "dedup_levenshtein_snm2", "corpus_boilerplate_scrub",
    "corpus_curation_funnel", "ann_recall_at_k",
    # r8: map-side fingerprinting + bounded joins
    "text_winnow_fingerprints", "dedup_shared_substrings",
    "dedup_incremental_neardup",
    # r8: hashed-feature model ops — the profile/weight tables stay
    # 1024-row at every scale; scoring is one bounded-fan-out equi-join
    "corpus_dsir_select", "corpus_centroid_classifier",
    "text_lm_ccnet_buckets", "corpus_source_divergence",
    "corpus_epoch_shuffle", "corpus_mixture_plan",
    "sim_incremental_ivf_assign",
    "multimodal_audio_features", "multimodal_audio_silence",
    "text_cms_heavy_hitters", "embedding_pca_power",
    "text_vocab_coverage", "corpus_shard_manifest", "text_html_extract",
    "corpus_quality_calibration", "dedup_source_matrix", "dedup_savings_report",
    # r8: image/audio near-dup sustain sf10 once the fixture draws
    # md5-seeded LCG noise — constant group SIZE keeps planted pairs
    # linear, and near-uniform fingerprint bits keep the banded join's
    # 16-bit buckets ~|corpus|/65536 (the skewed gradient/ramp fixtures
    # spilled 10.8/32.8 GB at 30x from hot buckets alone)
    "multimodal_image_ahash_neardup", "multimodal_audio_fingerprint_neardup",
    "multimodal_video_framehash_neardup",
    "text_bpe_pair_counts", "multimodal_video_scene_cuts",
    "dedup_crossmodal_consensus", "text_ngram_novelty_curve",
    "multimodal_keyframe_select", "multimodal_content_addressed_dedup",
    "graph_pagerank_purchases", "er_fuzzy_customer_match",
    "dedup_minhash_eval", "sim_topk_pq", "text_bpe_merge_steps",
    # r9: the map-side / single-bounded-shuffle tier of the new family
    # (the PMI pair fan-out and the source-overlap gram self-join are
    # 10×-verified above; their 100× cost is fan-out-dominated)
    "corpus_ngram_novelty", "corpus_token_gini", "corpus_block_dedup",
    "text_char_trigram_entropy", "text_lm_kneser_ney", "text_bpe_encode",
    "corpus_vocab_growth",
    # r9 second half: codes-only probed scan / one-scan profiler /
    # user-keyed join / single-aggregate survivorship — bounded shuffles
    "sim_topk_ivfpq", "dq_column_profile", "stream_unattributed_clicks",
    "er_golden_record", "stats_chisq_source_lang",
    # r10 (VERDICT r9 Next #5): the two pair-fan-out generators whose
    # curves stopped at 10× — now measured through 100× (they also take
    # sf3 below so the curve has >= 3 points, the jaccard-quadratic rule)
    "corpus_pmi_collocations", "corpus_source_overlap",
    # r10: the re-planned boundary-bucket queries at the 100× point
    "histogram_equidepth_order_values", "rfm_customer_segments",
    "dq_join_skew_audit",
    # r10: lexical/drift audits at the 100× point
    "stats_zipf_exponent", "stats_ks_source_chars",
    # r11: the constant-cost claim holds through 100× or it is false
    "dedup_minhash_eval_sampled",
    # r12: the collapse PLANNER rows (VERDICT r11 Next #3) replace the
    # retired forced-collapse gate rows here — on the benign replica
    # corpora the rule measures ~zero clique mass and takes the direct
    # branch, so these rows price the stats pass + direct plan; the
    # forced faces stay measured in tools/bench_skew.py
    "dedup_ngram_jaccard_auto", "dedup_containment_pairs_auto",
    # r11 (VERDICT r10 Next #2a): the containment VERIFY join at 100× —
    # r10 measured only the candidate face there; the verify join is
    # output-sized, and the 100× replica corpus keeps output linear
    # (replicas are token-disjoint), so the full row is affordable
    "dedup_containment_pairs",
]
# 30× point for the banded/blocked PAIR generators (VERDICT r5 #4): the
# claim that band fan-out is linear needs a curve (>= 3 scale points),
# not the single sf1 measurement. One repeat — a curve check, not a pin.
SF3_QUERIES = [
    "dedup_minhash_pairs", "dedup_simhash_pairs", "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_auto", "dedup_containment_pairs_auto",
    "dedup_levenshtein_prefix",
    # r7 (VERDICT r6 #5): end-to-end curve for the re-planned candidate
    # generator feeding connected components.
    "dedup_clusters",
    # r7: the multi-pass SNM variant (2x the one-pass candidate budget)
    "dedup_levenshtein_snm2",
    # r8: the image/audio near-dup pair generators ALSO take an sf3
    # point so they appear in the pair-family growth table next to the
    # text dedup families
    "multimodal_image_ahash_neardup", "multimodal_audio_fingerprint_neardup",
    "multimodal_video_framehash_neardup",
    # r10 (VERDICT r9 Next #5): pair-fan-out generators need the 30×
    # curve point between the measured 10× and the new 100×
    "corpus_pmi_collocations", "corpus_source_overlap",
    # r10: containment joins the pair-generator curve (its verify join
    # is output-sized like jaccard's, so 100× stays candidate-policy)
    "dedup_containment_pairs",
]


# ---------------------------------------------------------------------------
# Scale-evidence census (VERDICT r10 Next #3): every registry row is either
# MEASURED above (its sf points land in this report) or EXEMPT with a stated
# reason — no row is silently absent. The census is emitted into the report
# and `tests/test_plan_quality.py::test_scale_census_has_no_undispositioned_rows`
# fails the suite the moment a new registration ships without a disposition.
_R = {
    "elt": "ELT interop face over the fixed mock-REST fixture: map-side "
           "flatten/explode/projection per record, no data-volume knob — the "
           "per-record map tier's scaling is measured by the documents "
           "map-side family (text_fingerprint, text_pii_scrub)",
    "rel": "textbook single-shuffle relational plan (scan→[broadcast-]join→"
           "agg/sort); Catalyst's standard shape, pushdown/broadcast pinned "
           "by tests/test_plan_quality.py — no novel scale face to measure",
    "win": "single keyed-window shuffle partitioned on a bounded-cardinality "
           "key (user/customer/day); the window tier's 10×/100× behavior is "
           "measured via rfm/histogram/dq_join_skew boundary-bucket rows",
    "strm": "Structured Streaming face run AvailableNow over the driver "
            "fixture; state is watermark-bounded (SCALE.md §Streaming) and "
            "the batch equivalent of the same join/window shape is in the "
            "measured set (stream_unattributed_clicks carries the family's "
            "scale row)",
    "txt": "single token-explode + groupBy linear shuffle — same shape and "
           "constants as the measured corpus_token_gini/text_vocab_coverage",
    "mm": "map-side codec tier (decode/feature per blob, no shuffle); the "
          "measured multimodal rows (resize/frames/audio) carry the tier's "
          "curve",
    "bounded": "output and state bounded by construction (fixed expectation "
               "/ bucket / percentile count) on top of one measured-shape "
               "aggregate",
    "device": "nearest-rank boundary-bucket device — the device itself is "
              "measured at 10×/100× via histogram_equidepth_order_values "
              "and rfm_customer_segments",
    "meta": "metadata/manifest-only query (parquet footer statistics, "
            "O(#files) not O(rows))",
    "sink": "keyed upsert/merge face: one pk-window dedup shuffle + "
            "staging-swap write — the same single-shuffle shape as the "
            "measured dedup_exact_keep_min",
}
EXEMPT = {
    # ELT/interop faces
    **{n: _R["elt"] for n in (
        "elt_analytics_explode", "elt_association_unnest",
        "elt_budget_lines_unnest", "elt_dotnet_date_roundtrip",
        "elt_end_to_end_land", "elt_epoch_ms_to_iso", "elt_flatten_struct",
        "elt_prefix_rename", "elt_properties_merge", "elt_schema_projection",
        "elt_substream_split", "incremental_bookmark_filter",
    )},
    "catalog_table_manifest": _R["meta"],
    # textbook relational plans
    **{n: _R["rel"] for n in (
        "q01_pricing_summary", "q02_order_durations", "join_anti_idle_customers",
        "join_asof_latest_event", "join_bloom_prefiltered",
        "join_full_outer_daily_activity", "join_left_order_items",
        "join_range_followup_events", "join_region_revenue",
        "join_salted_order_items", "join_semi_active_customers",
        "join_topk_revenue", "setop_except_nations", "setop_intersect_nations",
        "setop_union_nations", "sort_limit_expensive_items",
        "sql_exists_customers_with_urgent", "sql_scalar_subquery_parts",
        "agg_approx_distinct", "agg_distinct_counts", "cube_flag_status",
        "rollup_status_priority", "grouping_sets_mixed", "dates_monthly_orders",
        "histogram_order_values", "filter_pattern_documents",
        "pivot_user_event_matrix", "unpivot_part_metrics",
        "json_extract_events", "stats_discount_price_corr",
    )},
    # keyed-window / sequence family
    **{n: _R["win"] for n in (
        "window_distinct_priorities_7d", "window_lag_gap",
        "window_rank_family_orders", "window_ratio_to_report",
        "window_rolling_5_purchases", "window_running_value",
        "window_topk_per_customer", "window_trailing_7d_spend",
        "cohort_weekly_retention", "sessionize_events",
        "scd2_user_event_state", "funnel_signup_click_purchase",
        "user_event_journey", "journey_pattern_match", "ts_gapfill_hourly",
        "stats_zscore_outlier_orders",
    )},
    # streaming faces
    **{n: _R["strm"] for n in (
        "stream_dedup_redelivery", "stream_interval_join_attribution",
        "stream_session_30m", "stream_sliding_30m_15m",
        "stream_tumbling_hourly",
    )},
    # text map-side/linear-shuffle tier
    **{n: _R["txt"] for n in (
        "text_langid", "text_quality_scores", "text_token_stats",
        "text_top_tokens", "corpus_tfidf_top_terms", "corpus_topk_per_stratum",
    )},
    # multimodal metadata tier
    **{n: _R["mm"] for n in (
        "multimodal_decode_meta", "multimodal_image_meta",
        "multimodal_pixel_histogram",
    )},
    # bounded-output audits / devices
    "dq_expectations_summary": _R["bounded"],
    "percentiles_approx_order_value": _R["bounded"],
    "percentiles_disc_order_value": _R["device"],
    "percentiles_order_value": _R["device"],
    "udaf_mad_order_value": _R["device"],
    "udtf_doc_windows": _R["txt"],
    "layout_zorder_clustering": "manifest aggregate + bounded interleave "
                                "sort — same shape as the measured "
                                "layout_compaction_plan",
    # sinks
    "merge_cdc_orders": _R["sink"],
    "upsert_redelivery_dedup": _R["sink"],
    # r11 second batch
    "sim_topk_filtered": "prefiltered exact scan: pushed predicate + the "
                         "measured sim_topk_bruteforce scoring shape on a "
                         "strict subset of the corpus",
    "sim_topk_filtered_post": "the measured sim_topk_ivf plan plus one "
                              "candidate-side filter — no new shuffle, "
                              "candidates bounded by the probed cells",
    # (ts_ewma_anomaly / stream_ewma_alerts / corpus_url_dedup /
    # dq_referential_integrity / window_longest_streak /
    # basket_lift_part_pairs moved to the SF1 measured list — their
    # scale claims are measured, not argued)
    "window_rolling_median_value": _R["win"],
    "dq_k_anonymity": _R["rel"],
    "dq_l_diversity": _R["rel"],
    "join_asof_tolerance_events": "the measured asof union+window shape "
                                  "(join_asof_latest_event family) plus one "
                                  "map-side staleness comparison — no new "
                                  "scale face",
    "join_asof_forward_events": "the measured asof union+window shape with "
                                "the frame mirrored (first-over-following "
                                "instead of last-over-preceding) — same one "
                                "key shuffle, no new scale face",
    "join_asof_nearest_events": "both asof frames over the SAME window "
                                "partitioning (one exchange, plan-pinned) "
                                "plus a map-side distance arbitration — no "
                                "new scale face beyond the measured family",
    # geo_grid_radius_join: measured via the DENSITY-PRESERVING section
    # (measure_geo_density / report["geo_density"]) — the r11 exemption
    # argument made executable (VERDICT r11 Next #5); see emit_census.
    "attribution_multitouch": "user-keyed bounded-interval range join "
                              "(same shape as the measured "
                              "join_range_followup_events family) + two "
                              "row_numbers and one aggregate on the "
                              "purchase key — fan-out bounded by "
                              "clicks-per-user-week",
    "corpus_land_clone_stats": "two PK-upsert landings (the measured sink "
                               "shape: one pk-window dedup shuffle + "
                               "staging-swap, same as dedup_exact_keep_min) "
                               "plus the maintained-histogram fold, which is "
                               "batch-sized by construction (map-side hash + "
                               "partial-agg groupBy of the DELTA only, then "
                               "a histogram-sized merge) — the fold never "
                               "rescans the corpus, so its growth face IS "
                               "the sink family's",
    "corpus_land_key_share": "three PK-upsert landings (the measured sink "
                             "shape, as corpus_land_clone_stats) plus "
                             "per-key histogram folds that are batch-sized "
                             "by construction, and a route decision that is "
                             "one key-cardinality histogram merge — by "
                             "design NOTHING in this row scans a corpus "
                             "after bootstrap (the row raises if the live "
                             "probe fires), so its growth face is the sink "
                             "family's plus an O(|keys|) aggregate",
}


def emit_census(report: dict) -> list[str]:
    """Attach the per-registry-row disposition; return undispositioned."""
    measured = set(SF1_QUERIES) | set(SF3_QUERIES) | set(SF10_QUERIES)
    census, undisp = {}, []
    for name in entry.queries():
        if name == "join_asof_salted_events":
            # measured on the planted hot-key fixture (the skew bench's
            # asof_hot_key section: base vs salted at 1x/10x/30x) — the
            # replica corpora plant no hot key, so the skew face is the
            # honest scale evidence for this plan
            census[name] = {
                "disposition": "measured",
                "sf_points": ["skew1", "skew10", "skew30"],
                "section": "BENCH_SKEW asof_hot_key",
            }
        elif name == "join_asof_auto_events":
            # the execution plans are the measured base/salted family;
            # the NEW artifact is the ROUTE, recorded with its inputs
            # per corpus by the skew bench (skew-free pair -> base,
            # planted hot key -> salted once past breakeven)
            census[name] = {
                "disposition": "measured",
                "sf_points": ["events_sf0.1", "hot1", "hot10", "hot30"],
                "section": "BENCH_SKEW asof_auto_route",
            }
        elif name == "join_asof_salted_nearest_events":
            # like join_asof_salted_events: the hot-key fixture is the
            # honest scale face for the two-face salted nearest plan
            census[name] = {
                "disposition": "measured",
                "sf_points": ["skew1", "skew10", "skew30"],
                "section": "BENCH_SKEW asof_hot_key_nearest",
            }
        elif name == "geo_grid_radius_join":
            # measured on the density-preserving generated point sets
            # (replica corpora would price the quadratic TRUE-pair
            # growth of a fixed coordinate space, not the plan)
            census[name] = {
                "disposition": "measured",
                "sf_points": ["geo1", "geo10", "geo30"],
                "section": "geo_density",
            }
        elif name in measured:
            pts = report.get("queries", {}).get(name, {})
            census[name] = {
                "disposition": "measured",
                "sf_points": sorted(pts) if pts else sorted(
                    lbl for lbl, qs in (
                        ("sf1", SF1_QUERIES), ("sf3", SF3_QUERIES),
                        ("sf10", SF10_QUERIES),
                    ) if name in qs
                ),
            }
        elif name in EXEMPT:
            census[name] = {"disposition": "exempt", "reason": EXEMPT[name]}
        else:
            census[name] = {"disposition": "UNDISPOSITIONED"}
            undisp.append(name)
    report["census"] = {
        "n_measured": sum(
            1 for c in census.values() if c["disposition"] == "measured"
        ),
        "n_exempt": sum(
            1 for c in census.values() if c["disposition"] == "exempt"
        ),
        "n_undispositioned": len(undisp),
        "rows": census,
    }
    return undisp


def measure_stats_registry(spark, timeout_s: float) -> dict:
    """VERDICT r12 Next #1 done-criterion: the sf10 auto rows
    re-measured WITHOUT the extra corpus scan. r15 (VERDICT r14 Next
    #3): the r14 artifact recorded ONE cold and ONE warm run per row,
    and the documented ±2-3× sf10 ambient band (larger than the
    ~0.6-0.9 s probe saving) inverted them. Now each row runs 3
    INTERLEAVED cold/warm pairs (invalidate→cold, warm; the
    interleaving cancels drift) and reports medians, plus — the
    noise-immune instrument — the probe stage timed ALONE inside each
    cold run via a wrapped ``StatsRegistry.scalar``, with the warm
    runs asserting zero probe calls. The per-stage number is what the
    cached read saves regardless of where the ambient band sits."""
    import statistics as _st
    import time as _t

    from pubic_multi_platform_to_postgres_spark.operators.dedup import (
        clone_mass,
    )
    from pubic_multi_platform_to_postgres_spark.plans import stats
    from pubic_multi_platform_to_postgres_spark.queries.registry import load

    section: dict = {"design": (
        "per auto row at sf10: 3 interleaved (invalidate->cold, warm) "
        "pairs, medians reported; probe_in_cold_s times the live probe "
        "stage alone inside each cold run (the job the registry "
        "saves), warm_probe_calls must be 0; probe_s is the same scan "
        "timed standalone"
    )}
    docs = load(spark, SF10, "documents")
    t0 = _t.perf_counter()
    n_rows, cp = clone_mass(docs, "text")
    section["probe_s"] = round(_t.perf_counter() - t0, 3)
    section["clone_mass"] = {"n_rows": n_rows, "clique_pairs": cp}

    # time the probe stage alone inside each run: every live compute
    # the engine registry pays during a query is accumulated here
    probe_t = {"s": 0.0, "n": 0}
    real_scalar = stats.CORPUS_STATS.scalar

    def timed_scalar(source_path, stat, compute):
        def timed_compute():
            t0 = _t.perf_counter()
            try:
                return compute()
            finally:
                probe_t["s"] += _t.perf_counter() - t0
                probe_t["n"] += 1
        return real_scalar(source_path, stat, timed_compute)

    stats.CORPUS_STATS.scalar = timed_scalar
    try:
        for name in (
            "dedup_ngram_jaccard_auto", "dedup_containment_pairs_auto"
        ):
            fn = entry.queries()[name]
            row = {
                "cold_runs_s": [], "warm_runs_s": [],
                "probe_in_cold_s": [], "warm_probe_calls": 0,
            }
            for _rep in range(3):
                stats.CORPUS_STATS.invalidate(f"{SF10}/documents.parquet")
                probe_t["s"], probe_t["n"] = 0.0, 0
                el, to = _run_once(spark, fn, SF10, timeout_s)
                if to:
                    row["timed_out"] = True
                    break
                row["cold_runs_s"].append(round(el, 3))
                row["probe_in_cold_s"].append(round(probe_t["s"], 3))
                probe_t["s"], probe_t["n"] = 0.0, 0
                el, to = _run_once(spark, fn, SF10, timeout_s)
                if to:
                    row["timed_out"] = True
                    break
                row["warm_runs_s"].append(round(el, 3))
                row["warm_probe_calls"] += probe_t["n"]
            if row["cold_runs_s"] and row["warm_runs_s"]:
                row["cold_median_s"] = round(_st.median(row["cold_runs_s"]), 3)
                row["warm_median_s"] = round(_st.median(row["warm_runs_s"]), 3)
                row["probe_in_cold_median_s"] = round(
                    _st.median(row["probe_in_cold_s"]), 3
                )
                row["warm_le_cold"] = (
                    row["warm_median_s"] <= row["cold_median_s"]
                )
            section[name] = row
            print(f"  stats  {name}: {row}", file=sys.stderr)
    finally:
        stats.CORPUS_STATS.scalar = real_scalar

    # r14 (VERDICT r13 Next #3): the filtered-ANN selectivity pair at
    # sf10 — the statistic the registry now owns, timed alone (the job
    # the cached read saves per invocation; pre-r14 this was TWO count
    # scans, the live probe itself is now ONE conditional-sum job) and
    # through both faces of the selective gate row.
    from pyspark.sql import functions as F

    emb10 = load(spark, SF10, "embeddings")
    pred = F.col("label") == 3
    t0 = _t.perf_counter()
    total, matched = stats.StatsRegistry().selectivity(emb10, pred)
    sel_probe = round(_t.perf_counter() - t0, 3)
    t0 = _t.perf_counter()
    two_counts = (emb10.count(), emb10.filter(pred).count())
    section["filtered_ann_selectivity"] = {
        "design": (
            "sf10 embeddings, predicate label==3: selectivity_probe_s "
            "is the ONE conditional-sum job a cold registry pays (and a "
            "warm one skips); two_count_scans_s is the pre-r14 cost it "
            "replaced; cold/warm time the sim_topk_filtered gate row "
            "end-to-end on an empty vs pre-read registry"
        ),
        "total": int(total), "matched": int(matched),
        "selectivity_probe_s": sel_probe,
        "two_count_scans_s": round(_t.perf_counter() - t0, 3),
    }
    assert two_counts == (total, matched)
    fn = entry.queries()["sim_topk_filtered"]
    ann = section["filtered_ann_selectivity"]
    ann["cold_runs_s"], ann["warm_runs_s"] = [], []
    for _rep in range(3):
        stats.CORPUS_STATS.invalidate(f"{SF10}/embeddings.parquet")
        el, to = _run_once(spark, fn, SF10, timeout_s)
        if to:
            ann["timed_out"] = True
            break
        ann["cold_runs_s"].append(round(el, 3))
        el, to = _run_once(spark, fn, SF10, timeout_s)
        if to:
            ann["timed_out"] = True
            break
        ann["warm_runs_s"].append(round(el, 3))
    if ann["cold_runs_s"] and ann["warm_runs_s"]:
        import statistics as _st

        ann["cold_median_s"] = round(_st.median(ann["cold_runs_s"]), 3)
        ann["warm_median_s"] = round(_st.median(ann["warm_runs_s"]), 3)
        ann["warm_le_cold"] = ann["warm_median_s"] <= ann["cold_median_s"]
    print(
        f"  stats  filtered_ann: {section['filtered_ann_selectivity']}",
        file=sys.stderr,
    )
    return section


def measure_geo_density(spark, timeout_s: float) -> dict:
    """Density-preserving scale curve for the grid radius join (VERDICT
    r11 Next #5 — the census exemption made executable). The replica
    corpora can't scale this query honestly: coordinates are keys mod a
    FIXED 1000, so 10× the points means ~100× the TRUE pairs and a
    measurement prices the output. Here the modulus grows with √factor,
    holding pair DENSITY constant, and the curve records what the plan
    argument claims: candidate volume tracks output (both ~linear in
    points), never |points|²."""
    from pyspark.sql import functions as F

    from pubic_multi_platform_to_postgres_spark.queries.lifecycle import (
        _grid_radius_blocked,
        grid_radius_pairs,
    )

    n_base = 15_000  # sf0.1 customer count
    section: dict = {
        "design": "n = 15000*factor points at (k*37 % m, k*91 % m), "
                  "m = 1000*sqrt(factor) — constant density; same "
                  "radius 30 / cell 50 as the registered query",
        "points": {},
    }
    for label, factor in (("geo1", 1), ("geo10", 10), ("geo30", 30)):
        n = n_base * factor
        m = int(1000 * math.sqrt(factor))
        pts = spark.range(1, n + 1).select(
            F.col("id").alias("c_custkey"),
            ((F.col("id") * 37) % m).cast("double").alias("x"),
            ((F.col("id") * 91) % m).cast("double").alias("y"),
        )
        t0 = time.perf_counter()
        out_rows, out_to = _guarded_count(spark, grid_radius_pairs(pts), timeout_s)
        wall = time.perf_counter() - t0
        if out_to:
            section["points"][label] = {
                "n_points": n, "modulus": m,
                "timed_out": True, "timeout_s": timeout_s,
            }
            print(f"  geo    {label}: TIMED OUT", file=sys.stderr)
            break  # larger points would only hang longer
        cand, cand_to = _guarded_count(spark, _grid_radius_blocked(pts), timeout_s)
        if cand_to:
            section["points"][label] = {
                "n_points": n, "modulus": m, "wall_s": round(wall, 3),
                "output_pairs": int(out_rows),
                "candidates_timed_out": True, "timeout_s": timeout_s,
            }
            print(f"  geo    {label}: candidate count TIMED OUT",
                  file=sys.stderr)
            break
        section["points"][label] = {
            "n_points": n,
            "modulus": m,
            "wall_s": round(wall, 3),
            "output_pairs": int(out_rows),
            "candidate_pairs": int(cand),
            "candidates_per_point": round(cand / n, 2),
            "pairs_per_point": round(out_rows / n, 3),
        }
        print(f"  geo    {label}: {section['points'][label]}",
              file=sys.stderr)
    base = section["points"].get("geo1", {}).get("wall_s")
    for label, factor in (("geo10", 10), ("geo30", 30)):
        p = section["points"].get(label)
        if p and "wall_s" in p:
            p["growth_vs_geo1"] = round(p["wall_s"] / base, 2) if base else None
    return section


def _guarded_count(spark, df, timeout_s: float) -> tuple[int, bool]:
    """count() under the same job-group watchdog every other section
    uses — a pathological point records ``timed_out`` instead of
    hanging the bench (ADVICE r12)."""
    group = f"scale-geo-{time.monotonic_ns()}"
    sc = spark.sparkContext
    done = threading.Event()

    def watchdog():
        if not done.wait(timeout_s):
            sc.cancelJobGroup(group)

    t = threading.Thread(target=watchdog, daemon=True)
    sc.setJobGroup(group, "bench_scale_geo", interruptOnCancel=True)
    t.start()
    t0 = time.perf_counter()
    try:
        return int(df.count()), False
    except Exception:  # noqa: BLE001
        if time.perf_counter() - t0 < timeout_s:
            raise  # a REAL error, not the watchdog cancel
        return 0, True
    finally:
        done.set()
        sc.setJobGroup("", "")


def _stages(app_id: str) -> list[dict]:
    url = f"http://localhost:4040/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def _run_once(spark, fn, sf_dir: str, timeout_s: float) -> tuple[float, bool]:
    group = f"scale-{time.monotonic_ns()}"
    sc = spark.sparkContext
    done = threading.Event()

    def watchdog():
        if not done.wait(timeout_s):
            sc.cancelJobGroup(group)

    t = threading.Thread(target=watchdog, daemon=True)
    sc.setJobGroup(group, "bench_scale", interruptOnCancel=True)
    t.start()
    t0 = time.perf_counter()
    try:
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0, False
    except Exception:  # noqa: BLE001
        el = time.perf_counter() - t0
        if el < timeout_s:  # a REAL error, not the watchdog cancel —
            raise           # surface it instead of recording "timeout"
        return el, True
    finally:
        done.set()
        sc.setJobGroup("", "")


def measure(spark, app_id, name, sf_dir, repeats, timeout_s):
    fn = entry.queries()[name]
    before = {s["stageId"] for s in _stages(app_id)}
    runs, timed_out = [], False
    for i in range(repeats):
        el, to = _run_once(spark, fn, sf_dir, timeout_s)
        if to:
            timed_out = True
            break
        runs.append(el)
        if i == 0:
            after = [s for s in _stages(app_id) if s["stageId"] not in before]
            shuffle_write = sum(s.get("shuffleWriteBytes", 0) for s in after)
            max_tasks = max((s.get("numCompleteTasks", 0) for s in after), default=0)
            heaviest = max(
                after, key=lambda s: s.get("shuffleWriteBytes", 0), default=None
            ) if after else None
            metrics = {
                "shuffle_write_bytes": int(shuffle_write),
                "spilled_bytes": int(
                    sum(s.get("memoryBytesSpilled", 0) for s in after)
                ),
                "peak_execution_memory": int(
                    max((s.get("peakExecutionMemory", 0) for s in after), default=0)
                ),
                "n_stages": len(after),
                "widest_stage_tasks": int(max_tasks),
                "heaviest_shuffle_stage_tasks": int(
                    heaviest.get("numCompleteTasks", 0)
                ) if heaviest else 0,
            }
    if timed_out:
        return {"timed_out": True, "timeout_s": timeout_s}
    return {
        "median_s": round(statistics.median(runs), 4),
        "runs": [round(x, 4) for x in runs],
        **metrics,
    }


def summarize(report: dict) -> None:
    """Attach growth ratios + a headline summary to the report dict."""
    for pts in report["queries"].values():
        base = pts.get("sf0.1", {}).get("median_s")
        for label, mult in (("sf1", 10), ("sf3", 30), ("sf10", 100)):
            cur = pts.get(label, {})
            if base and cur.get("median_s") is not None:
                cur["growth_vs_sf0.1"] = round(cur["median_s"] / base, 2)
                # Per-decade growth: ratio over log10(mult) decades, so
                # ratio ** (1/log10(mult)).  (r6 shipped ratio ** (10/mult),
                # which understated sf3/sf10 per-decade growth — ADVICE r6.)
                cur["growth_per_10x"] = round(
                    (cur["median_s"] / base) ** (1 / math.log10(mult)), 2
                )
    g1 = {n: p["sf1"]["growth_vs_sf0.1"] for n, p in report["queries"].items()
          if "growth_vs_sf0.1" in p.get("sf1", {})}
    g3 = {n: p["sf3"]["growth_vs_sf0.1"] for n, p in report["queries"].items()
          if "growth_vs_sf0.1" in p.get("sf3", {})}
    g10 = {n: p["sf10"]["growth_vs_sf0.1"] for n, p in report["queries"].items()
           if "growth_vs_sf0.1" in p.get("sf10", {})}
    report["summary"] = {
        "n_queries": len(report["queries"]),
        "n_timed_out": sum(
            1 for p in report["queries"].values()
            for v in p.values() if v.get("timed_out")
        ),
        "n_spilled": sum(
            1 for p in report["queries"].values()
            for v in p.values() if v.get("spilled_bytes")
        ),
        "sf1_worst_growth": max(g1.items(), key=lambda kv: kv[1]) if g1 else None,
        "sf1_median_growth": round(
            statistics.median(g1.values()), 2) if g1 else None,
        "sf3_pair_family_growth": g3 or None,
        "sf10_worst_growth": max(g10.items(), key=lambda kv: kv[1]) if g10 else None,
        "sf10_median_growth": round(
            statistics.median(g10.values()), 2) if g10 else None,
        "notes": [
            "growth_vs_sf0.1 at sf1 is over 10x the data; at sf10 over 100x"
            " the data - sublinear growth means fixed overhead dominates,"
            " superlinear means the operator pays more than linearly.",
            "sf0.1 fixtures are single parquet files (widest stage = 1 task"
            " for map-side queries), so the sf0.1 base is"
            " parallelism-starved; scaled fixtures are multi-file and run"
            " 10-33 tasks wide, which is why codec-bound multimodal queries"
            " hold near-constant wall-clock at 10x the blobs.",
        ],
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(REPO / "BENCH_SF1_r08.json"))
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--timeout", type=float, default=300.0)
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated query names: measure just these, merge their "
        "rows into an existing --out report (other sections untouched) — "
        "for adding newly-registered operators without re-running the "
        "full multi-SF sweep",
    )
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    for out, factor in ((SF1, 10), (SF3, 30), (SF10, 100)):
        if not Path(out, "documents.parquet").exists():
            build(SF01, factor, out)
        elif not Path(out, "lineitem.parquet").exists():
            # cached doc/embedding fixtures: top up the relational tables
            from make_scaled_sf import build_relational
            build_relational(SF01, factor, out)

    spark = get_session(
        app_name="spark_graft_bench_scale",
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId

    report: dict = {
        "sf_points": {"sf0.1": 1, "sf1": 10, "sf3": 30, "sf10": 100},
        "repeats": {"sf0.1": args.repeats, "sf1": args.repeats, "sf3": 1,
                    "sf10": 1},
        "queries": {},
    }
    if only and Path(args.out).exists():
        report = json.loads(Path(args.out).read_text())
    plan = [
        ("sf0.1", SF01, SF1_QUERIES, args.repeats),
        ("sf1", SF1, SF1_QUERIES, args.repeats),
        ("sf3", SF3, SF3_QUERIES, 1),
        ("sf10", SF10, SF10_QUERIES, 1),
    ]
    for label, sf_dir, names, repeats in plan:
        for name in names:
            if only and name not in only:
                continue
            r = measure(spark, app_id, name, sf_dir, repeats, args.timeout)
            report["queries"].setdefault(name, {})[label] = r
            msg = (
                f"TIMEOUT>{args.timeout}s" if r.get("timed_out")
                else f"{r['median_s']}s"
            )
            print(f"  {label:6s} {name}: {msg}", file=sys.stderr)
            # incremental checkpoint: a late-section failure (the r10
            # full run OOM'd on the final pagerank sf10 point) must
            # never lose the measured rows
            Path(args.out).write_text(json.dumps(report, indent=2) + "\n")

    if only and "geo_grid_radius_join" in only:
        report["geo_density"] = measure_geo_density(spark, args.timeout)
        Path(args.out).write_text(json.dumps(report, indent=2) + "\n")
    if only and "stats_registry" in only:
        report["stats_registry"] = measure_stats_registry(spark, args.timeout)
        Path(args.out).write_text(json.dumps(report, indent=2) + "\n")
    if only:
        # merge mode: the pair/cluster/candidate evidence sections cover
        # fixed query families measured in the full sweep — leave them.
        undisp = emit_census(report)
        if undisp:
            print(f"  census: UNDISPOSITIONED rows: {undisp}", file=sys.stderr)
        summarize(report)
        Path(args.out).write_text(json.dumps(report, indent=2) + "\n")
        print(f"-> {args.out} (merged {sorted(only)})", file=sys.stderr)
        return 0

    # Pair-LISTING queries have output that grows superlinearly in the
    # replica factor by CONSTRUCTION (a doc's replicas are near-dups of
    # each other, so qualifying pairs grow ~quadratically per family).
    # Record output rows per scale point so the wall-clock growth ratios
    # above can be read against the answer size, not just the input size.
    counts: dict = {}
    for name in SF3_QUERIES:
        fn = entry.queries()[name]
        counts[name] = {}
        for label, sf_dir in (("sf0.1", SF01), ("sf1", SF1), ("sf3", SF3)):
            counts[name][label] = fn(spark, sf_dir).count()
        print(f"  rows   {name}: {counts[name]}", file=sys.stderr)
    # the sorted-neighborhood queries also ran (and are output-counted)
    # at 100x — their output is W-bounded, so the count is affordable;
    # r10: same for the PMI collocation table (vocab-pair bounded) and
    # the source-overlap matrix (|sources|² rows), so their 100× growth
    # ratios read against answer size like the rest of the pair family
    for name in (
        "dedup_levenshtein_prefix", "dedup_levenshtein_snm2",
        "corpus_pmi_collocations", "corpus_source_overlap",
    ):
        counts[name]["sf10"] = entry.queries()[name](spark, SF10).count()
    report["pair_output_rows"] = counts
    Path(args.out).write_text(json.dumps(report, indent=2) + "\n")

    # r7 (VERDICT r6 #5): end-to-end curve for the cluster-collapse
    # consumer of the re-planned candidate generator — wall-clock,
    # local-contraction (union-find) rounds, node and cluster counts.
    from pyspark.sql import functions as F

    from pubic_multi_platform_to_postgres_spark.operators.dedup import (
        connected_components,
        ngram_jaccard_candidates,
        ngram_jaccard_pairs,
    )
    from pubic_multi_platform_to_postgres_spark.queries.registry import (
        load as load_table,
    )

    def _blocked_docs(sf_dir):
        return load_table(spark, sf_dir, "documents").withColumn(
            "len_bucket", F.floor(F.col("n_chars") / 50)
        )

    # r8 (VERDICT r7 #7): the curve now runs THROUGH sf10/100× — one
    # run, curve check not pin — closing the last family-level
    # extrapolation gap (candidate volume at 100× was already measured
    # at 59×; this adds the verify join + union-find on top).
    cstats: dict = {}
    for label, sf_dir in (
        ("sf0.1", SF01), ("sf1", SF1), ("sf3", SF3), ("sf10", SF10),
    ):
        pairs = ngram_jaccard_pairs(
            _blocked_docs(sf_dir), "text", "doc_id",
            block_cols=["lang", "len_bucket"], threshold=0.5, ngram=1,
        )
        st: dict = {}
        t0 = time.perf_counter()
        agg = (
            connected_components(pairs, stats=st)
            .agg(
                F.count(F.lit(1)).alias("nodes"),
                F.count_distinct("label").alias("clusters"),
            )
            .first()
        )
        cstats[label] = {
            "wall_s": round(time.perf_counter() - t0, 3),
            "uf_rounds": st.get("rounds"),
            "nodes": int(agg["nodes"]),
            "clusters": int(agg["clusters"]),
        }
        print(f"  cc     {label}: {cstats[label]}", file=sys.stderr)
    report["cluster_stats"] = cstats
    Path(args.out).write_text(json.dumps(report, indent=2) + "\n")

    # r7 (VERDICT r6 #6): jaccard CANDIDATE counts through 100x — the
    # prefix filter's probe volume, measured without the verify join's
    # output-sized shuffle (the quantity that must stay linear for the
    # plan to survive; output pairs grow superlinearly by replica
    # construction and are normalized separately above).
    jstats: dict = {}
    for label, sf_dir in (
        ("sf0.1", SF01), ("sf1", SF1), ("sf3", SF3), ("sf10", SF10),
    ):
        t0 = time.perf_counter()
        n_cand = ngram_jaccard_candidates(
            _blocked_docs(sf_dir), "text", "doc_id",
            block_cols=["lang", "len_bucket"], threshold=0.5, ngram=1,
        ).count()
        jstats[label] = {
            "wall_s": round(time.perf_counter() - t0, 3),
            "candidate_pairs": int(n_cand),
        }
        print(f"  jcand  {label}: {jstats[label]}", file=sys.stderr)
    report["jaccard_candidate_counts"] = jstats
    Path(args.out).write_text(json.dumps(report, indent=2) + "\n")

    # r10: the containment generator's candidate face through 100× —
    # same candidate-policy as jaccard (the verify join is output-sized;
    # the quantity that must stay linear is the prefix×posting-list
    # probe volume)
    from pubic_multi_platform_to_postgres_spark.operators.dedup import (
        containment_candidates,
    )

    ctstats: dict = {}
    for label, sf_dir in (
        ("sf0.1", SF01), ("sf1", SF1), ("sf3", SF3), ("sf10", SF10),
    ):
        t0 = time.perf_counter()
        n_cand = containment_candidates(
            load_table(spark, sf_dir, "documents"), "text", "doc_id",
            ["lang"], threshold=0.5, ngram=3,
        ).count()
        ctstats[label] = {
            "wall_s": round(time.perf_counter() - t0, 3),
            "candidate_pairs": int(n_cand),
        }
        print(f"  ctcand {label}: {ctstats[label]}", file=sys.stderr)
    report["containment_candidate_counts"] = ctstats
    Path(args.out).write_text(json.dumps(report, indent=2) + "\n")

    # r10 (VERDICT r9 Next #7): convergence early-exit for the PageRank
    # loop. The gate query keeps 10 fixed rounds (oracle contract); this
    # measures what the optional tol_q exit buys on a LONG run: fixed 30
    # rounds vs tol-exited, with the executed round count recorded. The
    # tolerance is 10% of total initial mass moved across a 5-round
    # check window (tol_q = |nodes|·SCALE/10, ~2%/round average) — the
    # measured window delta decays ×0.44 per check (0.85⁵, the damping
    # geometry: 1.16 → 0.52 → 0.23 → 0.10 → 0.045 of n·SCALE at rounds
    # 5..25 on the sf0.1 graph), so this tolerance exits at round ~20 of
    # 30: a genuine mid-run exit, not either degenerate endpoint. The
    # saving is whole join+agg rounds minus the sparse check overhead
    # (an eager checkpoint every 5 rounds).
    from pubic_multi_platform_to_postgres_spark.operators.graph import (
        SCALE as PR_SCALE,
    )
    from pubic_multi_platform_to_postgres_spark.operators.graph import (
        weighted_pagerank,
        weighted_pagerank_converged,
    )
    from pubic_multi_platform_to_postgres_spark.queries.analytics import (
        purchase_graph,
    )

    # the 30-round sf10 graph (240M directed edge rows, eager serialized
    # checkpoints every 5 rounds on the early path) needs a session NOT
    # carrying the whole sweep's accumulated block-manager state — the
    # r10 full run OOM'd exactly here; a fresh session fits comfortably
    spark.stop()
    spark = get_session(app_name="spark_graft_bench_scale_pr")
    spark.sparkContext.setLogLevel("ERROR")
    prstats: dict = {}
    for label, sf_dir in (("sf0.1", SF01), ("sf1", SF1), ("sf10", SF10)):
        try:
            nodes, edges = purchase_graph(spark, sf_dir)
            n_nodes = nodes.count()
            tol_q = n_nodes * PR_SCALE // 10
            t0 = time.perf_counter()
            weighted_pagerank(nodes, edges, iters=30).write.format(
                "noop"
            ).mode("overwrite").save()
            t_fixed = time.perf_counter() - t0
            t0 = time.perf_counter()
            early, rounds = weighted_pagerank_converged(
                nodes, edges, iters=30, tol_q=tol_q, check_every=5
            )
            early.write.format("noop").mode("overwrite").save()
            t_early = time.perf_counter() - t0
            prstats[label] = {
                "n_nodes": int(n_nodes),
                "tol_q": int(tol_q),
                "t_fixed_30_s": round(t_fixed, 3),
                "t_early_exit_s": round(t_early, 3),
                "rounds_executed": int(rounds),
                "saving_pct": round(100 * (1 - t_early / t_fixed), 1),
            }
        except Exception as exc:  # noqa: BLE001 — record, keep the rest
            prstats[label] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
        print(f"  pr     {label}: {prstats[label]}", file=sys.stderr)
        report["pagerank_early_exit"] = prstats
        Path(args.out).write_text(json.dumps(report, indent=2) + "\n")

    report["geo_density"] = measure_geo_density(spark, args.timeout)
    Path(args.out).write_text(json.dumps(report, indent=2) + "\n")

    report["stats_registry"] = measure_stats_registry(spark, args.timeout)
    Path(args.out).write_text(json.dumps(report, indent=2) + "\n")

    undisp = emit_census(report)
    if undisp:
        print(f"  census: UNDISPOSITIONED rows: {undisp}", file=sys.stderr)
    summarize(report)
    Path(args.out).write_text(json.dumps(report, indent=2) + "\n")
    print(f"-> {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
