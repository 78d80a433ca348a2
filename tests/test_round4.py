"""Round-4 operators: streaming dedup (q107), weighted priority
sampling (q108), repetition quality signals (q109), z-score outlier
flags (q110), exact-quantile binning (q111), int8 embedding
quantization (q112). Each gets the full value-level oracle comparison
plus the semantic law the oracle alone can't express."""

import pytest

from sklearn_raster_spark.plans.registry import load_all_queries

from tests.oracle_utils import compare_query

NEW_ORACLE_QUERIES = [
    "q107_stream_dedup",
    "q108_priority_sample",
    "q109_repetition_signals",
    "q110_outlier_flags",
    "q111_quantile_binning",
    "q112_embedding_quantize",
]


@pytest.mark.parametrize("name", NEW_ORACLE_QUERIES)
def test_oracle_value_match(spark, sf_dir, name):
    assert compare_query(spark, sf_dir, name) > 0


def test_priority_sample_is_weight_biased(spark, sf_dir):
    """Priority sampling must over-represent heavy rows: the mean
    weight of the sample exceeds the population mean (w/u ranking
    favors large w for any fixed u distribution)."""
    from sklearn_raster_spark.operators.pipeline import PRIORITY_SAMPLE_K
    from sklearn_raster_spark.sources import read_table

    sample = load_all_queries()["q108_priority_sample"].fn(spark, sf_dir).toPandas()
    assert len(sample) == PRIORITY_SAMPLE_K
    pop_mean = (
        read_table(spark, sf_dir, "orders").agg({"o_totalprice": "avg"}).first()[0]
    )
    assert sample.o_totalprice.mean() > pop_mean
    # priorities really are w/u with u <= 1: priority >= weight
    assert (sample.priority >= sample.o_totalprice - 1e-9).all()


def test_repetition_signals_laws(spark, sf_dir):
    df = load_all_queries()["q109_repetition_signals"].fn(spark, sf_dir).toPandas()
    assert (df.dup_word_frac >= 0).all() and (df.dup_word_frac < 1).all()
    assert (df.top_word_frac > 0).all() and (df.top_word_frac <= 1).all()
    # flag definition holds row-wise
    expect = (df.dup_word_frac > 0.5) | (df.top_word_frac > 0.2)
    assert (df.repetitive == expect).all()


def test_outlier_zscores_standardized(spark, sf_dir):
    """Within each event_type the z-scores must have ~0 mean and ~1
    std (population std, exact moments) — the definition of the
    transform, checked independently of the oracle."""
    pdf = load_all_queries()["q110_outlier_flags"].fn(spark, sf_dir).toPandas()
    for _, g in pdf.groupby("event_type"):
        z = g.zscore.dropna()
        if len(z) > 1:
            assert abs(z.mean()) < 1e-9
            assert abs(z.std(ddof=0) - 1.0) < 1e-9
    assert (pdf.is_outlier == (pdf.zscore.abs() > 3.0)).all()


def test_quantile_bins_partition_the_table(spark, sf_dir):
    from sklearn_raster_spark.sources import read_table

    pdf = (
        load_all_queries()["q111_quantile_binning"].fn(spark, sf_dir)
        .toPandas()
        .sort_values("bin")
        .reset_index(drop=True)
    )
    total = read_table(spark, sf_dir, "lineitem").count()
    assert pdf.n_items.sum() == total  # bins partition, no row lost
    assert set(pdf.bin) == {0, 1, 2, 3}
    # bins are ordered and non-overlapping on the binned value
    assert (pdf.max_qty.values[:-1] <= pdf.min_qty.values[1:]).all()
    # quartile binning is roughly balanced on integral data
    assert pdf.n_items.min() > 0.1 * total


def test_quantize_saturates_at_dim_max(spark, sf_dir):
    """Each dimension's max-|x| element quantizes to exactly +/-127,
    so the corpus has at least one saturated component per dimension
    and no |qv| beyond 127 (checked via the l1/checksum invariants)."""
    pdf = load_all_queries()["q112_embedding_quantize"].fn(spark, sf_dir).toPandas()
    assert pdf.n_saturated.sum() >= 64  # >= one per dimension
    # l1 norm bounds: 64 components, each |qv| <= 127
    assert (pdf.l1_norm <= 64 * 127).all()
    assert (pdf.n_saturated <= 64).all()


def test_stream_dedup_matches_batch_distinct(spark, sf_dir):
    from pyspark.sql import functions as F

    from sklearn_raster_spark.sources import read_table

    got = load_all_queries()["q107_stream_dedup"].fn(spark, sf_dir)
    batch = read_table(spark, sf_dir, "events").select("user_id", "event_type").distinct()
    assert got.count() == batch.count()
    assert got.exceptAll(batch).count() == 0


def test_scd2_oracle(spark, sf_dir):
    assert compare_query(spark, sf_dir, "q113_scd2_intervals") > 0


def test_training_mix_oracle(spark, sf_dir):
    assert compare_query(spark, sf_dir, "q114_training_mix") > 0


def test_scd2_interval_laws(spark, sf_dir):
    """Intervals per user must chain (valid_to == next valid_from),
    have exactly one open interval, and cover every event."""
    from sklearn_raster_spark.sources import read_table

    pdf = (
        load_all_queries()["q113_scd2_intervals"].fn(spark, sf_dir)
        .toPandas()
        .sort_values(["user_id", "version"])
    )
    total_events = read_table(spark, sf_dir, "events").count()
    assert pdf.n_events.sum() == total_events
    for _, g in pdf.groupby("user_id"):
        assert g.is_current.sum() == 1  # exactly one open interval
        assert g.is_current.iloc[-1]  # and it is the last version
        # intervals chain: valid_to of row i == valid_from of row i+1
        assert (
            g.valid_to.iloc[:-1].values == g.valid_from.iloc[1:].values
        ).all()


def test_training_mix_respects_weights(spark, sf_dir):
    """Heavier sources appear proportionally more often in the batch:
    weight-4 sources contribute ~4x the docs of weight-1 sources."""
    from sklearn_raster_spark.operators.pipeline import MIX_BATCH

    pdf = load_all_queries()["q114_training_mix"].fn(spark, sf_dir).toPandas()
    assert len(pdf) == MIX_BATCH
    by_w = pdf.source.map(
        lambda s: 4 if s in {"src0", "src1", "src2", "src3", "src4"}
        else (2 if s in {"src5", "src6", "src7", "src8", "src9"} else 1)
    )
    counts = pdf.groupby(by_w).size()
    # per-source shares: weight-4 sources each get ~2x a weight-2 source
    per_source = {w: counts.get(w, 0) / (5 if w in (4, 2) else 10) for w in (4, 2, 1)}
    assert per_source[4] > per_source[2] > per_source[1] > 0


def test_audio_windows_oracle(spark, sf_dir):
    assert compare_query(spark, sf_dir, "q115_audio_window_energy") > 0


def test_audio_window_geometry(spark, sf_dir):
    """Window fan-out laws: contiguous win_idx per doc, hop spacing,
    full windows except possibly the tail, energy bounded by
    n_samples * 255^2."""
    from sklearn_raster_spark.operators.multimodal import AUDIO_HOP, AUDIO_WIN

    pdf = (
        load_all_queries()["q115_audio_window_energy"].fn(spark, sf_dir)
        .toPandas()
        .sort_values(["doc_id", "win_idx"])
    )
    assert (pdf.start == pdf.win_idx * AUDIO_HOP).all()
    assert (pdf.n_samples <= AUDIO_WIN).all() and (pdf.n_samples > 0).all()
    for _, g in pdf.groupby("doc_id"):
        assert (g.win_idx.values == range(len(g))).all()
        assert (g.n_samples.values[:-2] == AUDIO_WIN).all()  # only tail may be short
    assert (pdf.energy <= pdf.n_samples * 255 * 255).all()
    assert (pdf.peak <= 255).all() and (pdf.peak >= 0).all()


def test_stream_inference_oracle(spark, sf_dir):
    assert compare_query(spark, sf_dir, "q116_stream_inference") > 0


def test_stream_interval_join_oracle(spark, sf_dir):
    assert compare_query(spark, sf_dir, "q117_stream_interval_join") > 0


def test_frequent_itemsets_oracle(spark, sf_dir):
    assert compare_query(spark, sf_dir, "q118_frequent_itemsets") > 0


def test_frequent_itemsets_downward_closure(spark, sf_dir):
    """Apriori property over the FULL FPGrowth output (not just the
    oracle-graded size<=2 slice): every subset of a frequent itemset
    is frequent with at least the superset's support."""
    from pyspark.ml.fpm import FPGrowth
    from pyspark.sql import functions as F

    from sklearn_raster_spark.operators.mllib_inference import ITEMSET_MIN_ORDERS
    from sklearn_raster_spark.sources import read_table

    li = read_table(spark, sf_dir, "lineitem")
    baskets = li.groupBy("l_orderkey").agg(
        F.array_distinct(F.collect_list("l_partkey")).alias("items")
    )
    n = baskets.count()
    model = FPGrowth(
        itemsCol="items", minSupport=ITEMSET_MIN_ORDERS / n, minConfidence=0.5
    ).fit(baskets)
    sets = model.freqItemsets.collect()
    freq = {tuple(sorted(r["items"])): r["freq"] for r in sets}
    assert freq, "no frequent itemsets at this support"
    for items, f in freq.items():
        assert f >= ITEMSET_MIN_ORDERS
        if len(items) > 1:
            for drop in range(len(items)):
                sub = items[:drop] + items[drop + 1 :]
                assert freq.get(sub, 0) >= f, (items, sub)


def test_als_recommendation_laws(spark, sf_dir):
    from sklearn_raster_spark.sources import read_table

    pdf = load_all_queries()["q119_als_recommendations"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0 and pdf.score.notna().all()
    # exactly ranks 1..3 per customer
    for _, g in pdf.groupby("custkey"):
        assert sorted(g.rec_rank) == [1, 2, 3]
        # scores ordered by rank
        s = g.sort_values("rec_rank").score.values
        assert (s[:-1] >= s[1:] - 1e-9).all()
    # recommended parts come from the real item vocabulary
    parts = set(
        r[0] for r in read_table(spark, sf_dir, "lineitem").select("l_partkey").distinct().collect()
    )
    assert set(pdf.partkey).issubset(parts)


def test_pagerank_laws(spark, sf_dir):
    import numpy as np

    from sklearn_raster_spark.operators.graph import PAGERANK_DAMPING  # noqa: F401

    pdf = load_all_queries()["q120_pagerank"].fn(spark, sf_dir).toPandas()
    # probability mass conserved (teleport + no dangling nodes)
    assert abs(pdf["rank"].sum() - 1.0) < 1e-6
    assert (pdf["rank"] > 0).all()
    # degree bias: the max-rank node has above-median rank spread
    assert pdf["rank"].max() > pdf["rank"].median()
