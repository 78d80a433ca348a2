"""Bucketing: the 100-TB fact-fact join strategy — co-located joins
with NO shuffle. Writes orders/lineitem bucketed by orderkey, joins
them, and asserts the plan contains no Exchange."""

import pytest
from pyspark.sql import functions as F

from sklearn_raster_spark.sources import read_table


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    warehouse = str(tmp_path)
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    (o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", f"{warehouse}/orders_b").mode("overwrite")
        .saveAsTable("orders_b"))
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", f"{warehouse}/lineitem_b").mode("overwrite")
        .saveAsTable("lineitem_b"))
    try:
        ob = spark.table("orders_b")
        lb = spark.table("lineitem_b")
        joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey).groupBy("o_orderstatus").count()
        plan = spark._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        # the join itself must not shuffle either side (bucket co-location);
        # only the final single-key aggregate may exchange
        join_section = plan.split("HashAggregate")[0]
        assert "Exchange" not in join_section, join_section
        # and results are right
        total = joined.agg(F.sum("count")).collect()[0][0]
        assert total == li.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
