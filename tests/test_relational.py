"""Differential tests vs DuckDB for the relational surface — the local
mirror of the driver's t2 gate (at sf0.001 for speed; driver uses sf0.01).
"""

import pytest

from sklearn_raster_spark.plans.registry import load_all_queries
from tests.oracle_utils import compare_query

ALL_QUERIES = sorted(load_all_queries())


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_matches_oracle(spark, sf_dir, name):
    compare_query(spark, sf_dir, name)


def test_entry_smoke(spark, sf_dir):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0


def test_registry_oracle_coverage():
    reg = load_all_queries()
    assert len(reg) >= 20
    with_oracle = [n for n, s in reg.items() if s.oracle]
    assert len(with_oracle) >= 15
