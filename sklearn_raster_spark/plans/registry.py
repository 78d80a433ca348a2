"""Query registry: the declared operator surface of the engine.

Every implemented operator from SURVEY.md §2 registers here with
(a) a Spark plan builder ``(spark, sf_dir) -> DataFrame`` and
(b) where SQL-expressible, an equivalent DuckDB oracle SQL string.
``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over
this registry; the driver's t2 gate compares the two per query.

Determinism contract (so order-insensitive value hashes match):
- float aggregates go through DECIMAL sums (order-independent) and are
  cast to DOUBLE at the end, or are rounded identically on both sides;
- every top-k / limit has a unique-key tie-break;
- column names are aliased identically on both sides.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: SparkQuery
    oracle: str | None  # DuckDB SQL, or None => driver does rows-only check
    doc: str = ""
    # REQUIRED for every query that scans media bytes via binaryFile
    # (enforced by tests/test_registry_contract.py): "strict" for
    # engine-written assets (corruption there is an engine bug — fail
    # loudly), "quarantine" for foreign/crawled bytes (decode error ->
    # NULL features + error column, the row survives). None for
    # queries that never scan media bytes.
    media_error_mode: str | None = None


REGISTRY: dict[str, QuerySpec] = {}

# Modules that register queries on import. Kept explicit (not a package
# walk) so the declared surface is reviewable in one place.
_QUERY_MODULES = (
    "sklearn_raster_spark.operators.relational",
    "sklearn_raster_spark.operators.functions_suite",
    "sklearn_raster_spark.operators.events",
    "sklearn_raster_spark.operators.asof",
    "sklearn_raster_spark.operators.dedup",
    "sklearn_raster_spark.operators.similarity",
    "sklearn_raster_spark.operators.text",
    "sklearn_raster_spark.operators.inference",
    "sklearn_raster_spark.operators.mllib_inference",
    "sklearn_raster_spark.operators.multimodal",
    "sklearn_raster_spark.operators.io_formats",
    "sklearn_raster_spark.operators.reshape",
    "sklearn_raster_spark.operators.stateful",
    "sklearn_raster_spark.operators.pipeline",
    "sklearn_raster_spark.operators.extras",
    "sklearn_raster_spark.operators.graph",
    "sklearn_raster_spark.operators.analytics",
    "sklearn_raster_spark.operators.skew",
    "sklearn_raster_spark.operators.corpus",
    "sklearn_raster_spark.operators.retrieval",
    "sklearn_raster_spark.operators.composition",
    "sklearn_raster_spark.operators.grouped_fit",
)


def query(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    media_error_mode: str | None = None,
):
    """Decorator registering a Spark query builder under ``name``."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        if media_error_mode not in (None, "strict", "quarantine"):
            raise ValueError(
                f"{name}: media_error_mode must be strict|quarantine, "
                f"got {media_error_mode!r}"
            )
        REGISTRY[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=oracle,
            doc=doc or (fn.__doc__ or ""),
            media_error_mode=media_error_mode,
        )
        return fn

    return deco


# The driver's correctness gate evaluates the FIRST 50 registered
# queries per round, so declaration order decides what gets graded.
# This explicit order rotates coverage across rounds:
#   round 1 graded the first 50 in module-import order;
#   round 2 front-loaded the round-1-ungraded backlog;
#   round 3 leads with EVERYTHING that has never had a driver row —
#   so no query is ever newer than its first grade again; later
#   rounds rotate the oldest-graded cohort forward.
# Names listed but not (yet) registered are skipped; registered names
# not listed append at the end in registration order, so nothing is
# ever silently dropped.
_WINDOW_ORDER = (
    # Round-13 policy (VERDICT r12 next #2): a FIXED 10-query SENTINEL
    # set leads EVERY window from now on, so the driver's round-over-
    # round per-query comparison always has a common subset (r12's
    # fully-rotated window shared only 4 names with r11's and the
    # per-query PERF block came back empty). The sentinels span the
    # engine's cost classes: relational agg (q01), PPJoin + CC + the
    # end-to-end dedup composition (q51/q84/q104/q122), counting
    # (q118), the pipeline composition (q149), the kernelized ANN/PQ
    # paths (q155/q160), and the ALS fit (q175). DO NOT rotate these
    # out; rotate only the post-sentinel slots.
    "q01_pricing_summary",
    "q51_jaccard_pairs",
    "q84_copurchase_components",
    "q104_dedup_corpus",
    "q118_frequent_itemsets",
    "q122_incremental_dedup",
    "q149_pipeline_composition",
    "q155_ann_signlsh_portable",
    "q160_pq_adc_portable",
    "q175_als_ann_recommendations",
    # r12-overlap regrade block: 12 names from round 12's graded
    # window, so THIS round's window already intersects r12's in >= 10
    # queries (sentinels contribute only q122/q175) and PERF_r13's
    # per-query map is non-empty. Mix chosen hash-graded-first with
    # the rows-only iterative/LSH anchors the optimization rounds
    # keep touching.
    "q176_kneighbors_portable",
    "q157_ann_ivf_portable",
    "q55_knn_cosine_bruteforce",
    "q21_string_funcs",
    "q31_asof_join",
    "q117_stream_interval_join",
    "q76_grouped_agg_pandas_udaf",
    "q98_bitwise_aggregates",
    "q99_checksum_source",
    "q120_pagerank",
    "q53_simhash_neardup",
    "q54_kneighbors_lsh",
    # Stale rotation: the 28 remaining slots take the oldest-graded
    # cohort in the prior tail order (last driver row r08; the r12
    # tail was already sorted oldest-first). Everything stays
    # value-checked every suite run by the registry-wide oracle sweep
    # (tests/test_oracle_sweep.py) regardless of window position.
    "q100_bounded_neardup",
    "q113_scd2_intervals",
    "q121_boilerplate_passages",
    "q123_cms_heavy_hitters",
    "q124_khop_reachability",
    "q126_grouped_split",
    "q129_rolling_anomaly",
    "q130_stream_tumbling_window",
    "q132_bm25_retrieval",
    "q133_skyline_parts",
    "q134_data_quality_checks",
    "q137_stream_sliding_window",
    "q138_bag_set_ops",
    "q140_cumulative_distinct_users",
    "q141_cohort_retention",
    "q143_incremental_aggregate",
    "q147_walk_forward_split",
    "q148_rolling_median_jvm",
    "q151_simhash_portable",
    "q152_binaryfile_source",
    "q156_grouped_model_fit",
    "q158_grouped_model_score",
    "q57_embedding_neardup",
    "q59_stateful_running_agg",
    "q78_udtf_lateral_trigrams",
    "q146_negative_sampling",
    "q150_minhash_portable",
    "q153_stream_semi_join",
    # ---- 50-query driver window closes here ----
    # Tail: oldest-first among the rest (the r12-graded block that is
    # NOT in the overlap set ages from here; it is the freshest).
    "q38_interval_join",
    "q101_contamination_check",
    "q102_sequence_packing",
    "q105_fixed_size_sample",
    "q110_outlier_flags",
    "q112_embedding_quantize",
    "q115_audio_window_energy",
    "q125_triangle_count",
    "q127_fuzzy_name_join",
    "q128_maxsim_late_interaction",
    "q131_inverted_index",
    "q135_product_quantization",
    "q139_mode_aggregate",
    "q142_rolling_median_udwf",
    "q144_stream_session_window",
    "q145_entity_resolution",
    "q154_stream_outer_join",
    "q161_image_decode_features",
    "q162_audio_decode_features",
    "q163_jpeg_decode_fidelity",
    "q164_gif_decode_features",
    "q165_video_decode_fidelity",
    "q166_media_quarantine",
    "q167_stream_media_quarantine",
    "q168_variant_shred",
    "q22_date_funcs",
    "q23_math_funcs",
    "q24_array_funcs",
    "q25_json_funcs",
    "q26_tumbling_window",
    "q27_sliding_window",
    "q28_session_window",
    "q29_dedup_keep_first",
    "q30_event_pivot",
    "q33_explode_ordinality",
    "q60_text_stats",
    "q61_language_id",
    "q62_fingerprint",
    "q63_regex_tokens",
    "q64_quality_filter",
    "q67_inverse_transform_roundtrip",
    "q68_raster_stack_source",
    "q70_multimodal_features",
    "q71_merge_upsert",
    "q72_hash_split",
    "q73_stratified_sample",
    "q81_multimodal_frame_sample",
    "q82_multimodal_resize",
    "q106_contamination_bloom",
    "q107_stream_dedup",
    "q116_stream_inference",
    "q159_pagerank_portable",
    "q171_nb_classify_portable",
    "q172_nb_proba_portable",
    "q173_pca_transform_portable",
    "q20_price_band_join",
    "q32_approx_count_distinct",
    "q36_sort_merge_join",
    "q40_linear_inference_nodata",
    "q41_nb_classify_embeddings",
    "q42_nb_proba_embeddings",
    "q43_pca_transform_embeddings",
    "q44_kneighbors_embeddings",
    "q45_mllib_linear_regression",
    "q46_mllib_kmeans",
    "q47_mllib_logistic_proba",
    "q48_compiled_linear_inference",
    "q49_csv_source",
    "q50_exact_dedup",
    "q52_minhash_lsh_pairs",
    "q58_json_source",
    "q66_wide_long_reshape",
    "q74_orc_source",
    "q75_partitioned_sink_prune",
    "q77_range_interval_window",
    "q79_zorder_layout",
    "q83_full_outer_join",
    "q85_argmax_aggregates",
    "q86_exact_percentiles",
    "q87_price_histogram",
    "q88_order_gaps_islands",
    "q89_conditional_aggregates",
    "q90_null_safe_join",
    "q91_ordered_string_agg",
    "q92_approx_percentiles",
    "q93_salted_agg",
    "q94_gap_fill_ffill",
    "q95_event_funnel",
    "q96_tfidf_top_terms",
    "q97_regression_aggregates",
    # The r12-graded cohort not re-used above is the FRESHEST — it
    # ages from the very end of the tail.
    "q169_python_datasource",
    "q170_stream_python_datasource",
    "q174_pyds_permissive_scan",
    "q69_ann_ivf",
    "q02_filter_project",
    "q03_top_revenue_orders",
    "q04_order_priority",
    "q05_local_supplier_volume",
    "q06_forecast_revenue",
    "q07_customers_per_region",
    "q08_customers_with_orders",
    "q09_customers_without_orders",
    "q103_chi_square_contingency",
    "q108_priority_sample",
    "q109_repetition_signals",
    "q10_returned_item_revenue",
    "q111_quantile_binning",
    "q114_training_mix",
    "q11_distinct_segments_per_nation",
    "q12_rollup_order_status",
    "q13_cube_returnflag_status",
    "q14_grouping_sets",
    "q15_top3_orders_per_customer",
    "q16_running_totals",
    "q17_topk_orders",
    "q18_set_ops",
    "q19_orders_above_customer_avg",
    "q34_map_funcs",
    "q35_union_type_promotion",
    "q37_ranking_functions",
    "q39_stat_aggregates",
    "q65_bigram_counts",
    "q80_dynamic_session_window",
    "q56_ann_lsh",
    "q119_als_recommendations",
    "q136_pq_ann_search",
)


def load_all_queries() -> dict[str, QuerySpec]:
    """Import every operator module (idempotent) and return the registry
    in the explicit ``_WINDOW_ORDER`` (see comment above)."""
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # suppress ONLY "module not built yet" (incremental rounds);
            # a missing dependency INSIDE an operator module must raise,
            # or that module's queries silently vanish from the grading
            # window and the oracle sweep
            if e.name != mod:
                raise
    ordered: dict[str, QuerySpec] = {}
    for name in _WINDOW_ORDER:
        if name in REGISTRY:
            ordered[name] = REGISTRY[name]
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered
