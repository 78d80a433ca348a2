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
#   the fixed q72, q85-q91 (registered past the boundary last round),
#   the round-3 queries q92-q99, and the two never-graded rows-only
#   queries q54/q69 — so no query is ever newer than its first grade
#   again; the remaining slots re-grade a broad cross-section of the
#   green surface (relational core, scalar functions, temporal,
#   LLM-pipeline anchors) as regression coverage.
# Names listed but not (yet) registered are skipped; registered names
# not listed append at the end in registration order, so nothing is
# ever silently dropped.
_WINDOW_ORDER = (
    # Round-12 policy (VERDICT r11 next #1 — the staleness protocol,
    # three rounds running): (1) new/changed queries lead — q176 is
    # the NEW kneighbors portable twin (FixedKNeighbors through the
    # broadcast fit-set Arrow brute-force path, squared-distance
    # dyadic oracle; the last inference family without a hash-graded
    # twin), q169/q170/q174 re-grade because the connector changed
    # again (range-aware type validation + from_pydict safety net,
    # watermark+frontier stream offsets, manifest-based overwrite),
    # q69 re-grades with its hash-ordered quantizer fit sample (the
    # r11 weak flag) and q175 with the empty-cell probe mask — both
    # also pick up KMeansNP's k-means++ seeding. (2) Then the ENTIRE
    # 32-query r07-stale cohort — the q02-q19 relational block,
    # q34/q35/q37/q39, q65/q80/q98/q99, and q103/q108/q109/q111/q114/
    # q122 — computed from CORRECTNESS_r01..r11 as max driver round
    # per query, exactly as r11 did. (3) The 12 remaining slots take
    # the r08 cohort's
    # cross-section nearest this round's changes: the ANN family
    # (q54/q55/q56/q157/q136 — quantizer/neighbor queries adjacent to
    # the q69 fix), q119 (shares the ALS model with q175), and broad
    # anchors (q21/q31/q53/q117/q120/q76). (4) The tail orders
    # strictly oldest-driver-row first so future rotations keep
    # shrinking staleness. After this round no query's newest driver
    # row is older than r08. Everything stays value-checked every
    # suite run by the registry-wide oracle sweep
    # (tests/test_oracle_sweep.py) regardless of window position.
    "q176_kneighbors_portable",
    "q169_python_datasource",
    "q170_stream_python_datasource",
    "q174_pyds_permissive_scan",
    "q69_ann_ivf",
    "q175_als_ann_recommendations",
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
    "q122_incremental_dedup",
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
    "q98_bitwise_aggregates",
    "q99_checksum_source",
    "q54_kneighbors_lsh",
    "q55_knn_cosine_bruteforce",
    "q56_ann_lsh",
    "q157_ann_ivf_portable",
    "q136_pq_ann_search",
    "q119_als_recommendations",
    "q21_string_funcs",
    "q31_asof_join",
    "q53_simhash_neardup",
    "q117_stream_interval_join",
    "q120_pagerank",
    "q76_grouped_agg_pandas_udaf",
    # ---- 50-query driver window closes here ----
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
    "q155_ann_signlsh_portable",
    "q156_grouped_model_fit",
    "q158_grouped_model_score",
    "q160_pq_adc_portable",
    "q57_embedding_neardup",
    "q59_stateful_running_agg",
    "q78_udtf_lateral_trigrams",
    "q146_negative_sampling",
    "q149_pipeline_composition",
    "q150_minhash_portable",
    "q153_stream_semi_join",
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
    "q84_copurchase_components",
    "q01_pricing_summary",
    "q104_dedup_corpus",
    "q106_contamination_bloom",
    "q107_stream_dedup",
    "q116_stream_inference",
    "q118_frequent_itemsets",
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
    "q51_jaccard_pairs",
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
