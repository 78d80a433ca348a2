"""Random-instance differential fuzz: generate a randomized full table
set (same schemas and categorical domains as the driver fixtures,
different sizes / distributions / boundary cases), then re-run EVERY
oracle-backed registry query's value comparison on it.

The shipped testdata is one fixed distribution; a query can agree with
its oracle there while disagreeing on ties, empty groups, short
documents, exact session-gap boundaries, or duplicate keys (the
round-7 q65/q80/q52 class). Each seed here is a fresh instance that
deliberately contains those cases:

- events on whole-minute timestamps (exact gap boundaries, duplicate
  (user, ts) pairs), Zipf-skewed user distribution (round 9: a
  geometric rank law so the hottest key carries ~half the stream —
  the hot-key join/agg shape AQE skew handling must survive);
- documents with empty / 1-2-word / exact-duplicate texts, a random
  vocabulary size, and (round 9) MULTIBYTE words — accented latin,
  CJK, emoji — mixed into the vocabulary, so every byte-vs-char
  assumption in tokenizers, frame slicers, and payload oracles is
  exercised (LENGTH counts chars, utf-8 payloads count bytes);
- embeddings of the fixture dimension (64) with random values, ~2.5%
  NULL vectors, and (round 9) rare NaN / +-Inf ELEMENTS inside
  otherwise-valid vectors — failed embedding jobs emit those too, and
  non-finite scores order differently across engines;
- TPC-H tables derived from sf0.001 by hash-seeded row sampling and
  value jitter, referential integrity preserved (children filtered to
  surviving parents).

All randomness is hash(column, seed)-based, so an instance is fully
reproducible from its seed.

Usage:
    python tools/random_instance_fuzz.py [n_seeds] [first_seed]

Exits non-zero on any value mismatch. Round-8 run: seeds 0-4 clean
(see ROUND8_NOTES.md).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
from pathlib import Path

import duckdb

REPO = str(Path(__file__).resolve().parent.parent)
for p in (REPO, os.path.join(REPO, "tests")):
    if p not in sys.path:
        sys.path.insert(0, p)

BASE = "/root/testdata/sf0.001"

# u01(expr, salt): deterministic uniform [0, 1) per row
def _u01(expr: str, salt: int) -> str:
    return (
        f"((hash(CAST({expr} AS HUGEINT) * 1315423911 + {salt}) % 100000)"
        " / 100000.0)"
    )


def make_instance(seed: int, out_dir: str) -> None:
    """Write one randomized table set under out_dir (parquet per table)."""
    con = duckdb.connect()
    s = seed * 7919 + 17

    def copy(sql: str, table: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{os.path.join(out_dir, table + '.parquet')}' (FORMAT PARQUET)"
        )

    # tiny dims verbatim (their cardinality IS the contract)
    for t in ("region", "nation"):
        copy(f"SELECT * FROM '{BASE}/{t}.parquet'", t)

    # sampled + jittered dims, FK-closed downstream
    keep_c = _u01("c_custkey", s) + " < 0.8"
    copy(
        f"""
        SELECT c_custkey, c_name, c_nationkey,
               ROUND(c_acctbal * (0.2 + 1.8 * {_u01('c_custkey', s + 1)}) - 500.0, 2) AS c_acctbal,
               c_mktsegment
        FROM '{BASE}/customer.parquet' WHERE {keep_c}
        """,
        "customer",
    )
    keep_s = _u01("s_suppkey", s + 2) + " < 0.85"
    copy(
        f"""
        SELECT s_suppkey, s_name, s_nationkey,
               ROUND(s_acctbal * (0.2 + 1.8 * {_u01('s_suppkey', s + 3)}) - 200.0, 2) AS s_acctbal
        FROM '{BASE}/supplier.parquet' WHERE {keep_s}
        """,
        "supplier",
    )
    keep_p = _u01("p_partkey", s + 4) + " < 0.85"
    copy(
        f"""
        SELECT p_partkey, p_name, p_brand, p_type,
               1 + CAST(hash(p_partkey + {s + 5}) % 50 AS INTEGER) AS p_size,
               ROUND(850.0 + 300.0 * {_u01('p_partkey', s + 6)}, 2) AS p_retailprice
        FROM '{BASE}/part.parquet' WHERE {keep_p}
        """,
        "part",
    )
    copy(
        f"""
        SELECT o.o_orderkey, o.o_custkey,
               ['F', 'P', 'O'][1 + CAST(hash(o.o_orderkey + {s + 7}) % 3 AS INTEGER)] AS o_orderstatus,
               ROUND(o.o_totalprice * (0.3 + 1.4 * {_u01('o.o_orderkey', s + 8)}), 2) AS o_totalprice,
               o.o_orderdate + INTERVAL (CAST(hash(o.o_orderkey + {s + 9}) % 721 AS INTEGER) - 360) DAY AS o_orderdate,
               ['1-URGENT', '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW']
                   [1 + CAST(hash(o.o_orderkey + {s + 10}) % 5 AS INTEGER)] AS o_orderpriority
        FROM '{BASE}/orders.parquet' o
        JOIN read_parquet('{out_dir}/customer.parquet') c ON o.o_custkey = c.c_custkey
        WHERE {_u01('o.o_orderkey', s + 11)} < 0.75
        """,
        "orders",
    )
    copy(
        f"""
        SELECT l.l_orderkey, l.l_partkey, l.l_suppkey, l.l_linenumber,
               CAST(1 + hash(l.l_orderkey * 8 + l.l_linenumber + {s + 12}) % 50 AS DOUBLE) AS l_quantity,
               ROUND(l.l_extendedprice * (0.3 + 1.4 * {_u01('l.l_orderkey * 8 + l.l_linenumber', s + 13)}), 2) AS l_extendedprice,
               ROUND(CAST(hash(l.l_orderkey * 8 + l.l_linenumber + {s + 14}) % 11 AS DOUBLE) / 100.0, 2) AS l_discount,
               ROUND(CAST(hash(l.l_orderkey * 8 + l.l_linenumber + {s + 15}) % 9 AS DOUBLE) / 100.0, 2) AS l_tax,
               ['N', 'A', 'R'][1 + CAST(hash(l.l_orderkey * 8 + l.l_linenumber + {s + 16}) % 3 AS INTEGER)] AS l_returnflag,
               ['O', 'F'][1 + CAST(hash(l.l_orderkey * 8 + l.l_linenumber + {s + 17}) % 2 AS INTEGER)] AS l_linestatus,
               l.l_shipdate + INTERVAL (CAST(hash(l.l_orderkey * 8 + l.l_linenumber + {s + 18}) % 721 AS INTEGER) - 360) DAY AS l_shipdate
        FROM '{BASE}/lineitem.parquet' l
        JOIN read_parquet('{out_dir}/orders.parquet') o ON l.l_orderkey = o.o_orderkey
        JOIN read_parquet('{out_dir}/part.parquet') p ON l.l_partkey = p.p_partkey
        JOIN read_parquet('{out_dir}/supplier.parquet') sp ON l.l_suppkey = sp.s_suppkey
        """,
        "lineitem",
    )

    # events: whole-minute timestamps force exact session-gap
    # boundaries and duplicate (user, ts) pairs; skewed users
    n_events = 900 + seed % 400
    copy(
        f"""
        SELECT
            CAST(x AS BIGINT) AS event_id,
            TIMESTAMP '2024-01-01 00:00:00'
                + INTERVAL (CAST(hash(x + {s + 20}) % 40000 AS INTEGER)) MINUTE AS ts,
            -- ~4% NULL user_id / event_type: unattributed or
            -- malformed events are routine in a real stream
            -- Zipf-ish rank law: user k appears with weight ~2^-k, so
            -- user 0 owns about half the stream (hot-key joins/aggs)
            CASE WHEN hash(x + {s + 29}) % 25 = 0 THEN NULL
                 ELSE CAST(FLOOR(LOG2(8192.0 / (1 + CAST(hash(x + {s + 22}) % 8191 AS DOUBLE)))) AS BIGINT)
            END AS user_id,
            CASE WHEN hash(x + {s + 37}) % 25 = 0 THEN NULL
                 ELSE ['view', 'click', 'purchase', 'signup', 'error']
                     [1 + CAST(hash(x + {s + 24}) % 5 AS INTEGER)]
            END AS event_type,
            -- ~5% NULL value / props: malformed or dropped event
            -- payloads are routine in a real stream
            CASE WHEN hash(x + {s + 27}) % 20 = 0 THEN NULL
                 ELSE ROUND(CAST(hash(x + {s + 25}) % 10000 AS DOUBLE) / 100.0, 2)
            END AS value,
            CASE WHEN hash(x + {s + 28}) % 20 = 0 THEN NULL
                 ELSE '{{"k": ' || CAST(hash(x + {s + 26}) % 100 AS VARCHAR) || '}}'
            END AS props
        FROM range({n_events}) t(x)
        """,
        "events",
    )

    # documents: empty / short / exact-duplicate texts, random vocab
    n_docs = 120 + seed % 80
    vocab = 6 + (seed * 31) % 30
    copy(
        f"""
        WITH ids AS (
            SELECT CAST(x AS BIGINT) AS doc_id,
                   -- ~1/4 of docs share a text-seed with neighbours ->
                   -- exact duplicate clusters for the dedup family
                   CASE WHEN hash(x + {s + 30}) % 4 = 0
                        THEN CAST((x // 3) * 3 AS BIGINT) ELSE CAST(x AS BIGINT) END AS text_seed
            FROM range({n_docs}) t(x)
        ),
        txt AS (
            SELECT doc_id, text_seed,
                   -- boundary classes on purpose: ~1/12 NULL text,
                   -- ~1/12 empty string, remainder 1..25 random words
                   -- (array_to_string of an empty list is DuckDB NULL,
                   -- giving a second NULL source for 0-length draws)
                   CASE
                       WHEN hash(text_seed + {s + 35}) % 12 = 0 THEN NULL
                       WHEN hash(text_seed + {s + 36}) % 12 = 0 THEN ''
                       ELSE array_to_string(
                           list_transform(
                               range(CAST(hash(text_seed + {s + 31}) % 26 AS INTEGER)),
                               -- ~1 word in 6 is multibyte (accented
                               -- latin / CJK / emoji): every byte-vs-
                               -- char law in tokenizers and payload
                               -- kernels gets exercised
                               i -> CASE WHEN hash(text_seed * 17 + i + {s + 38}) % 6 = 0
                                         THEN ['café', 'straße', '中文词', 'доклад', 'ño🦜']
                                              [1 + CAST(hash(text_seed * 131 + i + {s + 39}) % 5 AS INTEGER)]
                                         ELSE 'w' || CAST(hash(text_seed * 131 + i + {s + 32}) % {vocab} AS VARCHAR)
                                    END
                           ), ' ')
                   END AS text
            FROM ids
        )
        SELECT doc_id,
               text,
               ['en', 'de', 'zh', 'fr', 'es'][1 + CAST(hash(doc_id + {s + 33}) % 5 AS INTEGER)] AS lang,
               'src' || CAST(hash(text_seed + {s + 34}) % 20 AS VARCHAR) AS source,
               CAST(length(text) AS BIGINT) AS n_chars
        FROM txt
        """,
        "documents",
    )

    # embeddings: fixture dimension (64), contiguous ids, labels 0-9
    n_vecs = 150 + (seed * 53) % 200
    copy(
        f"""
        SELECT CAST(x AS BIGINT) AS vec_id,
               -- ~4% NULL embedding: failed embedding jobs leave holes
               CASE WHEN hash(x + {s + 42}) % 25 = 0 THEN NULL
                    ELSE list_transform(
                        range(64),
                        -- ~1 vector in 30 carries one non-finite
                        -- element (NaN / +-Inf): overflowed or failed
                        -- embedding jobs emit those alongside NULLs
                        i -> CASE WHEN hash(x + {s + 44}) % 30 = 0
                                   AND i = CAST(hash(x + {s + 45}) % 64 AS INTEGER)
                                  THEN ['NaN', 'Infinity', '-Infinity']
                                       [1 + CAST(hash(x + {s + 46}) % 3 AS INTEGER)]::FLOAT
                                  ELSE CAST(ROUND(CAST(hash(x * 67 + i + {s + 40}) % 2000 AS DOUBLE) / 1000.0 - 1.0, 3) AS FLOAT)
                             END
                    )
               END AS embedding,
               CASE WHEN hash(x + {s + 43}) % 25 = 0 THEN NULL
                    ELSE CAST(hash(x + {s + 41}) % 10 AS INTEGER)
               END AS label
        FROM range({n_vecs}) t(x)
        """,
        "embeddings",
    )
    con.close()


def main() -> int:
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    first = int(sys.argv[2]) if len(sys.argv) > 2 else 0

    from sklearn_raster_spark.plans.registry import load_all_queries
    from sklearn_raster_spark.session import get_spark
    from sklearn_raster_spark.utils.cache import release_shared_caches

    from oracle_utils import compare_query

    spark = get_spark(app_name="random-instance-fuzz")
    reg = load_all_queries()
    names = sorted(k for k, sp in reg.items() if sp.oracle is not None)
    bad: list[tuple[int, str, str]] = []
    root = tempfile.mkdtemp(prefix="spark_graft_fuzz_")
    try:
        for seed in range(first, first + n_seeds):
            inst = os.path.join(root, f"fuzz_seed{seed}")
            os.makedirs(inst, exist_ok=True)
            make_instance(seed, inst)
            n_ok = 0
            for name in names:
                try:
                    compare_query(spark, inst, name)
                    n_ok += 1
                except AssertionError as exc:
                    bad.append((seed, name, str(exc)[:300]))
                except Exception as exc:  # crash = a finding too
                    bad.append((seed, name, f"CRASH {type(exc).__name__}: {str(exc)[:260]}"))
                finally:
                    release_shared_caches()
            print(f"seed {seed}: {n_ok}/{len(names)} value-match", flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    for seed, name, err in bad:
        print(f"MISMATCH seed={seed} {name}: {err}")
    print(f"random-instance fuzz: {n_seeds} seeds x {len(names)} queries, {len(bad)} failures")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
