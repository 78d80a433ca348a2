"""Randomized differential tests for the as-of join (the union-sort
implementation) against DuckDB's native ASOF JOIN — including duplicate
timestamps, unmatched left rows, and exclusive semantics."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from sklearn_raster_spark.operators.asof import asof_join


def _random_tables(seed: int, n_left: int = 200, n_right: int = 120, n_keys: int = 8):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame({
        "lid": np.arange(n_left, dtype=np.int64),
        "k": rng.integers(0, n_keys, n_left),
        "t": rng.integers(0, 1000, n_left).astype(np.int64),
    })
    right = pd.DataFrame({
        "rid": np.arange(n_right, dtype=np.int64) + 10_000,
        "k": rng.integers(0, n_keys, n_right),
        "t": rng.integers(0, 1000, n_right).astype(np.int64),
        "val": rng.random(n_right).round(4),
    })
    # force duplicate-timestamp collisions on both sides
    left.loc[: n_left // 10, "t"] = 500
    right.loc[: n_right // 10, "t"] = 500
    # dedupe right on (k, t): at equal (key, time) the winner is
    # engine-defined (both Spark and DuckDB pick arbitrarily), so keep
    # the comparison well-posed the way real event streams are keyed
    right = right.drop_duplicates(subset=["k", "t"], keep="first").reset_index(drop=True)
    return left, right


def _duck_asof(left: pd.DataFrame, right: pd.DataFrame, inclusive: bool) -> list:
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    op = ">=" if inclusive else ">"
    rows = con.execute(
        f"""
        SELECT l.lid, r.rid, r.val
        FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.t {op} r.t
        ORDER BY l.lid
        """
    ).fetchall()
    con.close()
    return rows


@pytest.mark.parametrize("seed", [0, 1, 7])
@pytest.mark.parametrize("inclusive", [True, False])
def test_asof_matches_duckdb(spark, seed, inclusive):
    left, right = _random_tables(seed)
    sl = spark.createDataFrame(left)
    sr = spark.createDataFrame(
        right.rename(columns={"rid": "rid", "val": "val"})
    )
    out = asof_join(
        sl, sr, on="k", left_time="t", right_time="t",
        right_values=["rid", "val"], inclusive=inclusive,
    )
    got = sorted(
        (r.lid, r.rid, r.val) for r in out.select("lid", "rid", "val").collect()
    )
    want = sorted(tuple(r) for r in _duck_asof(left, right, inclusive))
    assert got == want


def test_asof_no_right_rows(spark):
    left = pd.DataFrame({"lid": [1, 2], "k": [0, 0], "t": [10, 20]})
    sl = spark.createDataFrame(left)
    sr = spark.createDataFrame([], "rid bigint, k bigint, t bigint, val double")
    out = asof_join(sl, sr, on="k", left_time="t", right_time="t",
                    right_values=["rid", "val"]).collect()
    assert len(out) == 2 and all(r.rid is None for r in out)
