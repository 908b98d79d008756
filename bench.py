"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line with per-query seconds.

Each query is forced to full execution with a noop-format write (all compute,
no sink cost).  A warmup pass on sf-independent metadata initializes the JVM
so timings reflect query execution, not session startup.

Besides the ONE-line stdout JSON the driver parses (and tail-truncates to
2,000 chars, losing most per-query times), the full result — including both
raw repetitions per query, so cold-JIT outliers are visible instead of
polluting the record — is written to ``BENCH_full_r{N}.json`` next to this
file, where N is one past the highest driver-recorded ``BENCH_r{N}.json``
(override with $SPARK_GRAFT_ROUND).  Commit that file each round for
round-over-round per-query comparability.
"""

from __future__ import annotations

import gc
import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from pr2_transformation_spark.session import build_session

BENCH_QUERIES = [
    "q01_pricing_summary",
    "q02_projection_rename_coalesce",
    "q06_merge_versions",
    "q10_star_join_revenue",
    "q11_window_topk",
    "q13_events_tumbling",
    "q14_sessionize",
    "q15_json_extract",
    "q16_dedup_exact",
    "q17_text_stats",
    "q19_fingerprint",
    "q20_ann_bruteforce",
    "q21_ngram_jaccard",
    "q22_minhash_lsh",
    "q23_simhash",
    "q24_ann_lsh",
    "q26_clean_columns_pipeline",
    "q27_clean_rows_pipeline",
    "q28_merge_three_versions",
    "q31_sliding_window",
    "q32_session_window_native",
    "q33_multimodal_features",
    "q39_asof_join",
    "q48_zscore",
    "q55_rolling_avg",
    "q58_array_functions",
    "q62_quality_filter",
    "q63_connected_components",
    "q67_embedding_centroid",
    "q69_hash_split",
    "q70_sequence_packing",
    "q73_snapshot_diff",
    "q75_tfidf",
    "q76_bigrams",
    "q86_shipping_priority",
    "q87_local_supplier_volume",
    "q88_late_shipment_priority",
    "q90_concurrent_sessions",
    "q92_markov_transitions",
    "q93_heavy_hitters",
    "q94_near_dup_canonicalize",
    "q95_topk_per_group",
    "q96_gap_islands",
    "q98_weighted_sample",
    "q99_nation_pair_volume",
    "q101_product_profit",
    "q102_large_orders",
    "q103_sole_late_supplier",
    "q105_cheapest_supplier",
    "q106_important_parts",
    "q107_repetition_ratio",
    "q108_decontamination",
    "q109_cohort_retention",
    "q110_mixture_epochs",
    "q112_token_budget_trim",
    "q113_forecast_revenue",
    "q114_returned_items",
    "q116_order_count_distribution",
    "q118_small_quantity_revenue",
    "q119_disjunctive_predicate_join",
    "q120_segment_dedup_fraction",
    "q121_winnowing_fingerprints",
    "q122_semantic_dedup",
    "q123_bigram_perplexity",
    "q124_supplier_part_classes",
    "q125_dominant_suppliers",
    "q126_ann_bruteforce_vectorized",
    "q127_salted_skew_join",
    "q129_corpus_prep",
    "q130_segment_dedup_rewrite",
    "q131_chunk_documents",
    "q134_jpeg_roundtrip_checksums",
    "q135_bm25_scores",
    "q136_vocab_oov_coverage",
    "q137_incremental_dedup",
    "q142_triangle_count",
    "q143_ppmi_bigrams",
    "q145_pagerank",
    "q153_bpe_tokenizer",
    "q159_containment_pairs",
    "q160_html_text_extraction",
    "q161_warc_roundtrip_checksums",
    "q164_funnel_conversion",
    "q167_xml_roundtrip",
    "q168_basket_lift",
    "q171_jaro_winkler_linkage",
    "q172_attribution",
    "q174_haversine_nearest",
    "q176_scd2_interval_join",
    "q180_hll_rolling_distinct",
    "q183_url_canonicalize",
    "q184_centroid_similarity_matrix",
    "q185_hierarchy_rollup",
    "q187_resample_ffill",
    "q188_kaplan_meier",
    "q196_dsir_importance",
    "q197_count_min_heavy_keys",
    "q198_weighted_sample",
    "q199_ann_pq",
    "q200_entity_resolution",
    "q201_psi_drift",
    "q202_kcenter_coreset",
    "q203_unicode_normalize",
    "q204_burst_detection",
    "q205_langid_confusion",
    "q206_portable_hll",
    "q207_data_contract",
    "q208_functional_dependencies",
    "q209_table_checksum",
    "q210_incremental_agg",
    "q211_temperature_sampling",
    "q212_readability",
    "q213_cross_source_overlap",
    "q214_decayed_engagement",
    "q215_string_length_profile",
    "q216_wow_regression",
    "q217_pii_density",
    "q218_split_leakage_audit",
    "q219_minhash_source_overlap",
    "q220_rfm_segmentation",
    "q221_degree_tail_estimate",
    "q222_asof_join_forward",
    "q223_zorder_layout_audit",
    "q224_weighted_median",
    "q225_conversion_latency",
    "q226_prefix_similarity_join",
    "q227_rare_label_collapse",
    "q228_cumulative_distinct_users",
    "q229_luhn_validation",
    "q230_referential_integrity",
    "q231_streaming_counts_graded",
    "q232_embedding_decontamination",
    "q233_ks_test",
    "q234_mann_whitney",
    "q235_hhi_concentration",
    "q236_dow_seasonality",
    "q237_partition_checksums",
    "q238_cohort_ltv",
    "q239_fifo_allocation",
    "q240_attribution_models",
    "q241_asof_cogrouped",
    "q242_portable_bloom",
    "q243_portable_hll_rolling",
    "q244_msvideo1_interframe",
    "q245_flac_roundtrip",
    "q246_duplicate_spans",
    "q247_span_excision",
    "q248_alaw_roundtrip",
    "q249_avro_roundtrip",
    "q250_training_shards",
    "q251_repetition_profile",
    "q252_repetition_filter",
    "q253_contamination_stats",
    "q254_decontaminated_rewrite",
    "q255_quality_classifier_train",
    "q256_quality_classifier_score",
    "q257_image_perceptual_dedup",
    "q258_audio_perceptual_dedup",
    "q259_image_hamming_pairs",
    "q260_video_perceptual_dedup",
    "q261_embedding_simhash_pairs",
    "q262_pdf_extraction",
    "q263_webdataset_roundtrip",
    "q264_perceptual_dedup_clusters",
    "q265_conversation_render",
    "q266_waterfill_budget",
    "q267_leakage_free_split",
    "q268_embedding_int8_quant",
    "q269_preference_pairs",
    "q270_curriculum_order",
    "q271_power_iteration_pca",
    "q272_jl_projection_distortion",
    "q273_annotator_agreement",
    "q274_k_anonymity",
    "q275_textrank_keywords",
    "q276_json_schema_inference",
    "q277_kmeans_clusters",
    "q278_classifier_eval",
    "q279_fellegi_sunter",
    "q280_merkle_antientropy",
    "q281_heaps_law",
    "q282_rrf_hybrid_retrieval",
    "q283_gdpr_erasure_cascade",
    "q284_mmr_rerank",
    "q285_source_js_divergence",
    "q286_label_propagation",
    "q287_streaming_watermark_append",
    "q288_negative_sampling_table",
    "q289_embedding_dim_profile",
    "q290_streaming_static_join_graded",
    "q291_streaming_dedup_graded",
    "q292_cdc_apply",
    "q293_cluster_labeling",
    "q294_exponential_smoothing",
    "q295_mojibake_repair",
    "q296_ndcg_quantization",
    "q297_audio_upsample",
    "q298_rank_ensemble",
    "q299_chi_square",
    "q300_markov_eval",
    "q301_wasserstein_length_drift",
    "q302_largest_remainder",
    "q303_burstiness",
    "q304_kcore_peeling",
    "q305_degree_assortativity",
    "q306_l_diversity",
    "q307_blocklist_contexts",
    "q308_novelty_fraction",
    "q309_soft_dedup_weights",
    "q310_encoding_advisor",
    "q311_salt_planner",
    "q312_neyman_allocation",
    "q313_tiff_roundtrip",
    "q314_cidr_match",
    "q315_point_in_polygon",
    "q316_bh_fdr",
    "q317_personalized_pagerank",
    "q318_protobuf_roundtrip",
    "q319_mime_parse",
    "q320_ulid_ordering",
    "q321_geohash_rollup",
    "q322_mod97_check",
    "q323_sprt",
    "q324_leadlag_xcorr",
    "q325_entropy_rate",
    "q326_cc_in_text",
    "q327_phrase_search",
    "q328_churn_labels",
    "q329_hist_equalization",
    "q330_kendall_tau",
    "q331_forecast_metrics",
    "q332_bayesian_average",
    "q333_dedup_threshold_curve",
    "q334_bbit_minhash",
    "q335_good_turing",
    "q336_power_analysis",
    "q337_fellegi_sunter_em",
    "q338_vp8_roundtrip_checksums",
    "q339_delta_log_time_travel",
    "q340_robots_txt_decisions",
    "q341_ridge_regression",
    "q342_parquet_footer_pruning",
    "q343_privacy_budget_composition",
    "q344_tokenizer_fertility",
    "q345_streaming_delta_sink",
    "q346_bitext_margin_mining",
    "q347_seasonal_decomposition",
    "q348_deletion_neighborhood_join",
    "q349_mann_kendall_theil_sen",
    "q350_local_outlier_factor",
    "q351_conformal_intervals",
    "q352_source_influence",
    "q353_difference_in_differences",
    "q354_poisson_bootstrap",
    "q355_simpsons_paradox_audit",
    "q356_iceberg_time_travel",
    "q357_chinchilla_feasibility",
    "q358_webp_animation_composite",
    "q359_parquet_data_plane",
    "q360_metadata_only_rollup",
    "q361_parquet_list_assembly",
    "q362_bucketed_colocated_join",
    "q363_streaming_hll_graded",
    "q364_cusum_changepoint",
    "q365_unigram_tokenizer",
    "q366_soundex_blocking",
    "q367_bloom_prefiltered_join",
    "q368_hilbert_layout_audit",
    "q369_dawid_skene",
    "q370_delta_checkpoint",
    "q371_event_trigram_mining",
    "q372_oneway_anova",
    "q373_ordered_target_encoding",
    "q374_chi2_token_selection",
    "q375_markov_text_synthesis",
    "q376_t_closeness",
    "q377_streaming_stream_join_graded",
    "q378_iceberg_positional_deletes",
    "q379_warc_gz_random_access",
    "q380_iceberg_equality_deletes",
    "q381_quantile_normalization",
    "q382_rank_biased_overlap",
    "q383_cube_grouping_sets",
    "q384_set_algebra",
    "q385_streaming_epoch_replay_graded",
    "q386_delta_data_skipping",
    "q387_ann_ivfpq",
    "q388_parquet_writer_roundtrip",
    "q389_zstd_encoder_roundtrip",
    "q390_orc_data_plane",
    "q391_orc_writer_roundtrip",
    "q392_arrow_ipc_data_plane",
    "q393_arrow_writer_roundtrip",
    "q394_sqlite_data_plane",
    "q395_zip_corpus_ingest",
    "q396_format_triangle_consistency",
    "q397_iceberg_data_skipping",
    "q398_avro_logical_types",
    "q399_sqlite_wal_index",
    "q400_parquet_page_index",
    "q401_parquet_bloom_skipping",
    "q402_delta_deletion_vectors",
    "q403_iceberg_hidden_partitioning",
    "q404_zip_writer_roundtrip",
    "q405_fastcdc_dedup",
    "q406_lake_maintenance",
    "q407_parquet_modern_file",
    "q408_parquet_delta_strings",
    "q409_orc_prune_plane",
    "q410_lake_schema_evolution",
    "q411_ann_hnsw",
    "q412_delta_cdf",
    "q413_iceberg_incremental",
    "q414_delta_optimize_zorder",
    "q415_iceberg_partition_evolution",
    "q416_delta_merge",
    "q417_iceberg_merge",
    "q418_avro_schema_resolution",
    "q419_cdf_incremental_apply",
    "q420_lake_restore_refs",
    "q421_orc_bloom_lookup",
    "q422_parquet_decimal",
]


def _load_prior_record(repo_dir: str) -> dict[str, float]:
    """Per-query comparison base for the solo re-time pass.

    Round-7 VERDICT item 3: comparing only against the NEWEST
    BENCH_full_r*.json lets a regression escape — a mid-round run
    writes the current round's record, and later runs then compare
    against that (already-regressed) number instead of the previous
    round's published record (q369 escaped round 7 exactly this way).
    The base is therefore the per-query MINIMUM across the newest TWO
    full records, which always covers both the previous round's
    published record and any mid-round re-run of the current round."""
    recs = sorted(
        (int(m.group(1)), p)
        for p in glob.glob(os.path.join(repo_dir, "BENCH_full_r*.json"))
        if (m := re.match(r"BENCH_full_r(\d+)\.json$", os.path.basename(p)))
    )
    base: dict[str, float] = {}
    for _, path in recs[-2:]:
        try:
            with open(path) as f:
                for k, v in json.load(f).get("queries", {}).items():
                    v = float(v)
                    if k not in base or v < base[k]:
                        base[k] = v
        except (OSError, ValueError):
            continue
    return base


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    spark = build_session(
        "pr2-transformation-spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus), 8),
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    # JVM/codegen warmup on the smallest table (best-effort: a missing table
    # must not kill the run before a single timing is emitted).
    try:
        spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    except Exception as exc:  # noqa: BLE001
        print(f"bench: warmup failed: {exc}", file=sys.stderr)

    # Two timed executions per query, keep the min: steady-state throughput,
    # not first-touch JIT/codegen-compile noise (q22's persist timing was
    # observed varying 2.6-11s run-to-run under concurrent stage scheduling).
    timings: dict[str, float] = {}
    reps: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    for name in BENCH_QUERIES:
        try:
            fn = qs[name]
            runs = []
            for _ in range(2):
                start = time.perf_counter()
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                runs.append(round(time.perf_counter() - start, 3))
            # Heavyweight warmup hygiene (round-9 VERDICT item 8): for
            # queries still over 5 s after two reps, JIT/codegen-compile
            # spread has needed fresh-process adjudication two rounds
            # running (q129) — give them a third rep so the recorded min
            # is a steady-state number.  Additive: both raw reps of the
            # old methodology are still first in `reps`.
            if min(runs) > 5.0:
                start = time.perf_counter()
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                runs.append(round(time.perf_counter() - start, 3))
            reps[name] = runs
            timings[name] = min(runs)
        except Exception as exc:  # noqa: BLE001 — one broken query must not zero the run
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"bench: {name} FAILED: {errors[name]}", file=sys.stderr)
        # Drop the dropped-frame references NOW so the ContextCleaner frees
        # localCheckpoint blocks between queries instead of letting block-
        # manager memory pile up and tax later queries' GC.
        gc.collect()

    # SOLO RE-TIME pass (round-6 VERDICT item 5): a 284-query contended
    # session shows phantom 2-3x "regressions" (q257/q134/q318/q213 in the
    # r06 record) that vanish when the query runs alone.  Any query whose
    # best-of-2 exceeds 2x the PRIOR round's full record is re-timed here,
    # in an isolated tail pass after every other query has finished, and
    # BOTH numbers are recorded so a reader of the JSON can adjudicate
    # contention vs. a real plan regression without a manual re-run.
    retimed: dict[str, dict[str, float]] = {}
    noise_floor: dict[str, dict[str, float]] = {}
    prior = _load_prior_record(os.path.dirname(os.path.abspath(__file__)))
    for name, cur in list(timings.items()):
        ref = prior.get(name)
        if ref is None:
            continue
        # the `ref + 0.5 s` floor exempts sub-second queries from the
        # solo re-time (their 2x movers are scheduler noise, verified by
        # hand each round it fired) — but record WHO it exempted so the
        # record shows them adjudicated-as-noise, not silently skipped
        # (round-8 verdict item 9).  Queries over 1.5 s audit at 1.5x
        # instead of 2x (round-9 verdict item 5: q251's 1.56x JIT-warmup
        # "regression" escaped the 2x gate and needed a manual
        # root-cause two rounds running).
        factor = 1.5 if ref >= 1.5 else 2.0
        if cur <= max(factor * ref, ref + 0.5):
            if cur > factor * ref:
                noise_floor[name] = {"prior": ref, "contended": cur}
            continue
        try:
            solo_runs = []
            for _ in range(3):
                gc.collect()
                start = time.perf_counter()
                qs[name](spark, sf_dir).write.mode(
                    "overwrite").format("noop").save()
                solo_runs.append(round(time.perf_counter() - start, 3))
            solo = min(solo_runs)
            retimed[name] = {"prior": ref, "contended": cur, "solo": solo}
            timings[name] = min(cur, solo)
            print(f"bench: retimed {name}: prior={ref} contended={cur} "
                  f"solo={solo}", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001
            print(f"bench: retime {name} failed: {exc}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "errors": errors,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "retimed": retimed,
        "noise_floor": noise_floor,
    }
    print(json.dumps(payload))

    # Full, untruncated record (round-4 VERDICT item 2): per-query best AND
    # both raw repetitions, committed per round for offline delta analysis.
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    round_no = os.environ.get("SPARK_GRAFT_ROUND")
    if not round_no:
        recorded = [
            int(m.group(1))
            for p in glob.glob(os.path.join(repo_dir, "BENCH_r*.json"))
            if (m := re.match(r"BENCH_r(\d+)\.json$", os.path.basename(p)))
        ]
        round_no = f"{(max(recorded) + 1) if recorded else 1:02d}"
    full_path = os.path.join(repo_dir, f"BENCH_full_r{round_no}.json")
    try:
        with open(full_path, "w") as f:
            json.dump({**payload, "reps": reps, "cpus": int(cpus)}, f, indent=1)
        print(f"bench: full record -> {full_path}", file=sys.stderr)
    except OSError as exc:
        print(f"bench: could not write {full_path}: {exc}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
