"""Registry-level contract checks: every declared oracle must be valid
DuckDB SQL against the real views (EXPLAIN — no execution), names must
be unique and well-formed, and the driver-facing dicts must agree."""

from __future__ import annotations

import re

import pytest

from sklearn_raster_spark.plans.registry import _WINDOW_ORDER, load_all_queries


def test_all_oracles_explain_in_duckdb(sf_dir):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from oracle_utils import duckdb_conn

    con = duckdb_conn(sf_dir)
    qs = load_all_queries()
    broken = {}
    for name, spec in qs.items():
        if spec.oracle is None:
            continue
        try:
            con.execute(f"EXPLAIN {spec.oracle}")
        except Exception as ex:  # noqa: BLE001
            broken[name] = str(ex)[:120]
    assert not broken, broken


def test_registry_names_and_window():
    qs = load_all_queries()
    assert all(re.fullmatch(r"q\d+_[a-z0-9_]+", n) for n in qs)
    # window order lists every registered query exactly once
    listed = [n for n in _WINDOW_ORDER if n in qs]
    assert len(listed) == len(set(listed))
    assert set(listed) == set(qs)


def test_driver_contract_views():
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    reg = load_all_queries()
    assert set(qs) == set(reg)
    assert set(oracles) == {n for n, s in reg.items() if s.oracle is not None}
    assert all(callable(f) for f in qs.values())


def test_every_query_has_doc():
    qs = load_all_queries()
    undocumented = [n for n, s in qs.items() if len((s.doc or "").strip()) < 30]
    assert not undocumented, undocumented


# The registry-wide scalar-output-schema contract (no array/map/struct
# column in any registered query's output — the driver's canonicalizer
# dies on unhashable cells) is asserted inside
# tests/test_plan_sweep.py::test_no_cartesian_products_or_nested_outputs_anywhere,
# sharing that test's single (expensive) all-builders pass.
