"""Full-registry oracle VALUE sweep — the definitive CI gate.

Every oracle-backed query is value-compared against its DuckDB oracle
(collect + order-insensitive comparison + dtype audit — the driver's
grading semantics via tests/oracle_utils.compare_query) on every suite
run. The per-round driver window refreshes 50 hard rows per round;
this sweep guarantees that no change can break ANY oracle-backed
query's VALUES and still pass CI — the stale-grade class (65 queries
between driver rows after round 5) dies at the source.

Rows-only queries (no oracle) are execution-smoked by the bare-session
driver-parity sweep (tests/test_driver_parity.py) and their semantic
laws pinned in per-module tests.
"""

import pytest

from sklearn_raster_spark.plans.registry import load_all_queries

from tests.oracle_utils import compare_query

ORACLE_QUERIES = sorted(
    name for name, spec in load_all_queries().items() if spec.oracle is not None
)


def test_sweep_is_registry_wide():
    # the sweep must track the registry: if this drifts, a new
    # oracle-backed query was registered without joining the gate
    assert len(ORACLE_QUERIES) >= 139


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_value_sweep(spark, sf_dir, name):
    assert compare_query(spark, sf_dir, name) >= 0
