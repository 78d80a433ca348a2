"""Derive a larger scale factor from the provided sf0.1 testdata for
SCALING MEASUREMENT ONLY (SCALE.md curve; never used for correctness
grading — oracles always run on the driver-provided directories).

Replication scheme: ``mult`` key-shifted replicas of every table, with
referential integrity preserved per replica (every key column in a
replica shifts by the same offset, so joins land exactly as in the
base copy and per-replica results are the base results re-keyed).
Replicas are kept *semantically disjoint* where cross-replica
interaction would manufacture superlinear output:

- documents: every token gets a per-replica suffix, so replica corpora
  share zero tokens and near-dup pair output scales linearly (the
  degenerate alternative — verbatim copies — would make every doc a
  10-way duplicate and measure output explosion, not engine scaling);
- embeddings: labels shift per replica, so label-blocked pair ops stay
  replica-local; vectors themselves are unchanged.

Usage: python tools/make_scaled_data.py [mult] [src_dir] [out_dir]
"""

from __future__ import annotations

import sys

import duckdb

KEYS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
OFF = 1_000_000  # > every base key; int32-safe at mult <= ~1000


def replica_select(table: str, cols: list[tuple[str, str]], r: int) -> str:
    parts = []
    for name, dtype in cols:
        if name in KEYS[table] and r > 0:
            parts.append(f"CAST({name} + {r * OFF} AS {dtype}) AS {name}")
        elif table == "documents" and name == "text" and r > 0:
            parts.append(f"REGEXP_REPLACE(text, '([a-z0-9]+)', '\\1x{r}', 'g') AS text")
        elif table == "documents" and name == "n_chars" and r > 0:
            # keep the length column faithful to the suffixed text
            parts.append(
                f"CAST(LENGTH(REGEXP_REPLACE(text, '([a-z0-9]+)', '\\1x{r}', 'g')) AS BIGINT) AS n_chars"
            )
        elif table == "embeddings" and name == "label" and r > 0:
            parts.append(f"CAST(label + {r * 100} AS INTEGER) AS label")
        else:
            parts.append(name)
    return "SELECT " + ", ".join(parts)


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/spark_graft_scale/sf1"
    import os

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for table in KEYS:
        cols = [
            (c[0], c[1])
            for c in con.execute(
                f"DESCRIBE SELECT * FROM '{src}/{table}.parquet'"
            ).fetchall()
        ]
        union = "\nUNION ALL\n".join(
            f"{replica_select(table, cols, r)} FROM '{src}/{table}.parquet'"
            for r in range(mult)
        )
        con.execute(f"COPY ({union}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT COUNT(*) FROM '{out}/{table}.parquet'").fetchone()[0]
        print(table, n)


if __name__ == "__main__":
    main()
