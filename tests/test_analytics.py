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


def test_round3_analytics_oracle_parity(spark, sf_dir):
    for name in (
        "q93_salted_agg",
        "q97_regression_aggregates",
        "q98_bitwise_aggregates",
        "q103_chi_square_contingency",
    ):
        assert compare_query(spark, sf_dir, name) > 0


def test_approx_percentile_within_sketch_bound(spark, sf_dir):
    """q92's sketch contract vs the exact anchor (q86): the value
    approx_percentile returns must have rank within n/accuracy of the
    target rank in the group's sorted values — the documented
    Greenwald-Khanna style guarantee that makes it the bounded-memory
    scale dual of exact `percentile`."""
    from sklearn_raster_spark.operators.analytics import APPROX_ACCURACY
    from sklearn_raster_spark.plans.registry import load_all_queries
    from sklearn_raster_spark.sources import read_table

    reg = load_all_queries()
    approx = {
        r["l_returnflag"]: r
        for r in reg["q92_approx_percentiles"].fn(spark, sf_dir).collect()
    }
    li = read_table(spark, sf_dir, "lineitem")
    vals = {
        flag: sorted(
            x.l_quantity for x in li.filter(F.col("l_returnflag") == flag)
            .select("l_quantity").collect()
        )
        for flag in approx
    }
    assert len(approx) == 3
    for flag, row in approx.items():
        xs = vals[flag]
        n = len(xs)
        tol = max(1.0, n / APPROX_ACCURACY)
        for p, col in ((0.25, "qty_p25"), (0.5, "qty_p50"), (0.75, "qty_p75")):
            got = row[col]
            # rank range occupied by the returned value in the sorted data
            import bisect

            lo = bisect.bisect_left(xs, got)
            hi = bisect.bisect_right(xs, got) - 1
            target = p * (n - 1)
            assert lo - tol <= target <= hi + tol, (
                f"{flag} p{int(p * 100)}: value {got} occupies ranks "
                f"[{lo},{hi}], target {target:.1f}, tol {tol}"
            )


def test_regression_aggregates_match_numpy(spark, sf_dir):
    """q97's closed-form moment arithmetic agrees with numpy's
    polyfit/corrcoef to float tolerance (the cross-check that the
    DECIMAL-sums formulation computes the statistic it claims)."""
    import numpy as np

    from sklearn_raster_spark.plans.registry import load_all_queries
    from sklearn_raster_spark.sources import read_table

    reg = load_all_queries()
    got = {r.l_returnflag: r for r in reg["q97_regression_aggregates"].fn(spark, sf_dir).collect()}
    li = read_table(spark, sf_dir, "lineitem")
    for flag, row in got.items():
        pdf = (
            li.filter(F.col("l_returnflag") == flag)
            .select("l_quantity", "l_extendedprice")
            .toPandas()
        )
        x, y = pdf["l_quantity"].to_numpy(), pdf["l_extendedprice"].to_numpy()
        slope, intercept = np.polyfit(x, y, 1)
        corr = np.corrcoef(x, y)[0, 1]
        assert abs(row.slope - slope) < 1e-3 * max(1.0, abs(slope))
        assert abs(row.intercept - intercept) < 1e-3 * max(1.0, abs(intercept))
        assert abs(row.corr - corr) < 1e-6
