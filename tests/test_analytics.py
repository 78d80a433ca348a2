"""Analytic aggregate operators (operators/analytics.py): oracle
parity plus the determinism properties each query's hash-match relies
on (tie-free argmax keys, exactly-representable interpolation, scalar
double binning).
"""

import pytest
from pyspark.sql import functions as F

from tests.oracle_utils import compare_query


@pytest.mark.parametrize(
    "name",
    [
        "q85_argmax_aggregates",
        "q86_exact_percentiles",
        "q87_price_histogram",
        "q88_order_gaps_islands",
        "q89_conditional_aggregates",
        "q90_null_safe_join",
        "q91_ordered_string_agg",
    ],
)
def test_analytics_oracle_parity(spark, sf_dir, name):
    assert compare_query(spark, sf_dir, name) > 0


def test_argmax_key_is_unique(spark, sf_dir):
    # q85's determinism rests on o_orderkey being tie-free.
    from sklearn_raster_spark.sources import read_table

    orders = read_table(spark, sf_dir, "orders")
    total, distinct = orders.agg(
        F.count(F.lit(1)), F.countDistinct("o_orderkey")
    ).first()
    assert total == distinct


def test_percentile_results_on_quarter_grid(spark, sf_dir):
    # The hash-match claim rests on quartiles of integral values lying
    # on the .25 grid, where linear interpolation is exact in binary FP
    # regardless of which of the two textbook formulas an engine uses.
    from sklearn_raster_spark.plans.registry import load_all_queries

    rows = load_all_queries()["q86_exact_percentiles"].fn(spark, sf_dir).collect()
    assert len(rows) >= 3
    for r in rows:
        assert r.qty_p25 <= r.qty_p50 <= r.qty_p75
        for v in (r.qty_p25, r.qty_p50, r.qty_p75):
            assert (v * 4) == int(v * 4)


def test_islands_are_maximal_disjoint_runs(spark, sf_dir):
    # Each island spans exactly its month count (no holes) and islands
    # of one customer never touch (else the run was not maximal).
    from sklearn_raster_spark.plans.registry import load_all_queries

    rows = load_all_queries()["q88_order_gaps_islands"].fn(spark, sf_dir).collect()
    assert rows
    by_cust = {}
    for r in rows:
        assert r.n_months == r.end_month - r.start_month + 1
        by_cust.setdefault(r.o_custkey, []).append((r.start_month, r.end_month))
    for spans in by_cust.values():
        spans.sort()
        for (_, e1), (s2, _) in zip(spans, spans[1:]):
            assert s2 > e1 + 1


def test_null_safe_join_matches_null_keys(spark, sf_dir):
    # The point of q90: NULL status keys must MATCH (not drop) across
    # the join, so NULL-key rows exist and at least one carries a
    # joined n_high > 0 — a plain equality join would leave them all 0.
    from sklearn_raster_spark.plans.registry import load_all_queries

    rows = load_all_queries()["q90_null_safe_join"].fn(spark, sf_dir).collect()
    null_rows = [r for r in rows if r.status_key is None]
    assert null_rows
    assert any(r.n_high > 0 for r in null_rows)
    for r in rows:
        assert 0 <= r.n_high <= r.n_all


def test_histogram_buckets_partition_rows(spark, sf_dir):
    # Bucket counts must sum to the table row count (every row binned
    # exactly once) and bucket bounds must respect the bin width.
    from sklearn_raster_spark.plans.registry import load_all_queries
    from sklearn_raster_spark.sources import read_table

    rows = load_all_queries()["q87_price_histogram"].fn(spark, sf_dir).collect()
    n_orders = read_table(spark, sf_dir, "orders").count()
    assert sum(r.n_orders for r in rows) == n_orders
    for r in rows:
        assert r.bucket_min >= r.price_bucket * 50000.0
        assert r.bucket_max < (r.price_bucket + 1) * 50000.0
