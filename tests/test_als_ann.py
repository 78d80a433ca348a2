"""q175: ALS recommendations through IVF-ANN scoring (the measured
q119 scale fix). Laws: identical output contract to the exhaustive
recommender, and recall@3 against it above a pinned floor — the same
pinned-recall discipline as q56/q69/q136."""

from sklearn_raster_spark.plans.registry import load_all_queries


def test_als_ann_matches_exhaustive_contract_and_recall(spark, sf_dir):
    from sklearn_raster_spark.sources import read_table

    reg = load_all_queries()
    exact = reg["q119_als_recommendations"].fn(spark, sf_dir).toPandas()
    ann = reg["q175_als_ann_recommendations"].fn(spark, sf_dir).toPandas()

    # same output contract as q119
    assert list(ann.columns) == ["custkey", "rec_rank", "partkey", "score"]
    assert len(ann) > 0 and ann.score.notna().all()
    for _, g in ann.groupby("custkey"):
        assert sorted(g.rec_rank) == list(range(1, len(g) + 1))[:3]
        s = g.sort_values("rec_rank").score.values
        assert (s[:-1] >= s[1:] - 1e-9).all()
    parts = set(
        r[0]
        for r in read_table(spark, sf_dir, "lineitem")
        .select("l_partkey")
        .distinct()
        .collect()
    )
    assert set(ann.partkey).issubset(parts)

    # every scored user is served (ANN may only drop users ALS dropped)
    e = exact.groupby("custkey")["partkey"].apply(set)
    a = ann.groupby("custkey")["partkey"].apply(set)
    assert set(a.index) == set(e.index)

    # pinned recall floor vs the exhaustive top-3 (measured 0.90 at
    # sf0.001; the floor leaves room for ALS convergence jitter)
    common = e.index.intersection(a.index)
    recall = sum(len(e[c] & a[c]) for c in common) / (3 * len(common))
    assert recall >= 0.70, f"ANN recall@3 {recall:.3f} below floor"
