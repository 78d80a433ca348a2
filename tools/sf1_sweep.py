"""Full oracle VALUE sweep at the derived sf1 directory — now with ZERO
deselects (VERDICT r8 #8).

Through round 8 the sf1 protocol carried 4 documented
oracle-intractable deselects:

- q23_math_funcs: both engines finish fast, but canonicalizing 6M rows
  in Python blew the harness budget;
- q51_jaccard_pairs / q104_dedup_corpus / q122_incremental_dedup:
  their DELIBERATELY naive DuckDB oracles (quadratic LIST_INTERSECT /
  recursive-CTE components / inc CROSS JOIN cor) are intractable at
  10x — the asymmetry is the point, the Spark side prunes and the
  oracle cannot.

This sweep closes all four with exact protocols, not weaker ones:

- q23 runs BOTH sides under the same deterministic 1/97 key subset
  (``l_orderkey % 97 = 0``, ~64k rows — integer modulus, so the
  predicate selects identical rows in both engines); values are still
  hash-compared exactly.
- q51/q104/q122 exploit the derived-sf1 construction
  (tools/make_scaled_data.py): replicas are TOKEN-DISJOINT (every
  token carries a per-replica suffix) and text-distinct, so no
  near-dup pair, duplicate-hash match, or component edge can cross a
  replica boundary — the engine's sf1 output is exactly the union of
  per-replica outputs. The oracle therefore runs once per replica
  over that replica's doc_id slice (each slice is sf0.1-sized, where
  the naive oracle is tractable) and the union is compared
  value-exactly against the engine's single full-sf1 run. This is a
  STRONGER check than re-keying base results: the oracle recomputes
  every replica from the sf1 parquet itself.

Usage:
    python tools/sf1_sweep.py [sf1_dir] [mult]

Builds the derived sf1 directory with tools/make_scaled_data.py if
missing. Exits non-zero on any value mismatch.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
for p in (REPO, os.path.join(REPO, "tests")):
    if p not in sys.path:
        sys.path.insert(0, p)

import duckdb

BASE_SF01 = "/root/testdata/sf0.1"
DEFAULT_SF1 = "/tmp/spark_graft_sf1"
REPLICA_OFF = 1_000_000  # make_scaled_data.OFF

# per-replica oracle decomposition (see module docstring)
PER_REPLICA = {"q51_jaccard_pairs", "q104_dedup_corpus", "q122_incremental_dedup"}
# deterministic 1/97 subset on an integer key present in the output
SUBSET = {"q23_math_funcs": "l_orderkey % 97 = 0"}


def ensure_sf1(sf1_dir: str, mult: int) -> None:
    if os.path.isdir(sf1_dir) and os.path.exists(
        os.path.join(sf1_dir, "lineitem.parquet")
    ):
        return
    import subprocess

    subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "make_scaled_data.py"),
            str(mult),
            BASE_SF01,
            sf1_dir,
        ],
        check=True,
    )


def per_replica_oracle(sf1_dir: str, oracle: str, mult: int):
    """Run `oracle` once per replica doc_id slice and union the rows.
    Returns (colnames, rows)."""
    from sklearn_raster_spark.sources import TABLES, table_path

    all_rows: list[tuple] = []
    cols: list[str] | None = None
    for r in range(mult):
        con = duckdb.connect()
        for t in TABLES:
            if t == "documents":
                lo, hi = r * REPLICA_OFF, (r + 1) * REPLICA_OFF
                # replica 0 is the unshifted base: its ids are < OFF
                pred = (
                    f"doc_id < {REPLICA_OFF}"
                    if r == 0
                    else f"doc_id >= {lo} AND doc_id < {hi}"
                )
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{table_path(sf1_dir, t)}' WHERE {pred}"
                )
            else:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf1_dir, t)}'"
                )
        res = con.execute(oracle)
        cols = [d[0] for d in res.description]
        all_rows.extend(res.fetchall())
        con.close()
    return cols, all_rows


def main() -> int:
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SF1
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    ensure_sf1(sf1_dir, mult)

    from oracle_utils import compare_query, duckdb_conn, rows_to_multiset

    from sklearn_raster_spark.plans.registry import load_all_queries
    from sklearn_raster_spark.session import get_spark
    from sklearn_raster_spark.utils.cache import release_shared_caches

    spark = get_spark(app_name="sf1-sweep")
    reg = load_all_queries()
    names = sorted(k for k, sp in reg.items() if sp.oracle is not None)
    bad: list[tuple[str, str]] = []
    t_all = time.time()
    for name in names:
        t0 = time.time()
        try:
            if name in SUBSET:
                pred = SUBSET[name]
                sdf = reg[name].fn(spark, sf1_dir).filter(pred)
                spark_rows = [tuple(r) for r in sdf.collect()]
                con = duckdb_conn(sf1_dir)
                res = con.execute(
                    f"SELECT * FROM ({reg[name].oracle}) WHERE {pred}"
                )
                duck_cols = [d[0] for d in res.description]
                duck_rows = res.fetchall()
                con.close()
                assert len(spark_rows) == len(duck_rows), (
                    f"rowcount {len(spark_rows)} vs {len(duck_rows)}"
                )
                assert rows_to_multiset(spark_rows, sdf.columns) == rows_to_multiset(
                    duck_rows, duck_cols
                ), "value mismatch on the 1/97 subset"
            elif name in PER_REPLICA:
                sdf = reg[name].fn(spark, sf1_dir)
                spark_rows = [tuple(r) for r in sdf.collect()]
                duck_cols, duck_rows = per_replica_oracle(
                    sf1_dir, reg[name].oracle, mult
                )
                assert len(spark_rows) == len(duck_rows), (
                    f"rowcount {len(spark_rows)} vs {len(duck_rows)}"
                )
                assert rows_to_multiset(spark_rows, sdf.columns) == rows_to_multiset(
                    duck_rows, duck_cols
                ), "value mismatch vs per-replica oracle union"
            else:
                compare_query(spark, sf1_dir, name)
            print(f"{name}: ok ({time.time() - t0:.1f}s)", flush=True)
        except AssertionError as exc:
            bad.append((name, str(exc)[:300]))
            print(f"{name}: MISMATCH {exc}", flush=True)
        except Exception as exc:
            bad.append((name, f"CRASH {type(exc).__name__}: {str(exc)[:260]}"))
            print(f"{name}: CRASH {exc}", flush=True)
        finally:
            release_shared_caches()
    print(
        f"sf1 sweep: {len(names)} queries, {len(bad)} failures, "
        f"{time.time() - t_all:.0f}s wall"
    )
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
