"""Measure what bucketing buys the q36 fact-fact join at scale.

The sf1→sf10 decade (SCALE.md round-12 extension) read q36's 4.5×
growth as "an explicit SMJ over two 10×-ed sides pays the full sort
on both, and the 100 TB answer is bucketing". This tool turns that
sentence into a measurement: it writes orders and lineitem from a
given sf directory as BUCKETED tables (``bucketBy(N, orderkey)`` +
``sortBy`` — Spark's at-rest co-location, the open-source analog of a
clustered/Z-ordered lake layout), runs the SAME join+agg twice —
plain parquet vs bucketed — and asserts the bucketed plan contains NO
Exchange on either join input (the shuffle is gone at plan level, not
just faster by luck).

tests/test_bucketing.py pins the no-Exchange property at unit scale;
this tool measures the wall-clock consequence at decade scale. One
warm-up pass per variant is discarded (scan caches, codegen), then
``--runs`` timed passes report the median.

Usage:
    python tools/bucketed_join_bench.py [sf_dir] [out_json] [--runs N]

Writes {"sf_dir", "plain_sec", "bucketed_sec", "speedup",
        "bucketed_plan_has_exchange": false, "n_buckets": N}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

N_BUCKETS = 32


def join_agg(o, li, F):
    return (
        o.hint("merge")
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


def timed(build, runs: int) -> float:
    """build() must return a FRESH DataFrame each call: re-collecting
    one lineage lets Spark skip its already-materialized shuffle map
    stages (stage reuse), which times the final reduce only — a fresh
    plan per run re-pays the whole join."""
    build().collect()  # warm-up discarded (scan cache, codegen)
    times = []
    for _ in range(runs):
        df = build()
        t0 = time.monotonic()
        df.collect()
        times.append(time.monotonic() - t0)
    return round(statistics.median(times), 2)


def main() -> int:
    import pyspark.sql.functions as F

    from sklearn_raster_spark.session import get_spark
    from sklearn_raster_spark.sources import read_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale/sf10"
    out_json = sys.argv[2] if len(sys.argv) > 2 else "/tmp/bucketed_join_bench.json"
    runs = int(sys.argv[sys.argv.index("--runs") + 1]) if "--runs" in sys.argv else 3

    spark = get_spark(app_name="bucketed-join-bench")
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")

    # one-time bucketed write (saveAsTable — bucket metadata lives in
    # the session catalog/warehouse); sortBy makes each bucket
    # merge-ready so the join needs neither shuffle NOR sort
    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    to, tl = f"bj_orders_{tag}", f"bj_lineitem_{tag}"
    # EXTERNAL tables with explicit paths: the in-memory catalog does
    # not survive sessions, so a managed-table rerun would trip over
    # its leftover location; overwrite of an external path is clean
    bdir = os.path.join(os.path.dirname(os.path.normpath(sf_dir)), f"bucketed_{tag}")
    for tbl, df, key in ((to, o, "o_orderkey"), (tl, li, "l_orderkey")):
        if not spark.catalog.tableExists(tbl):
            (
                df.repartition(N_BUCKETS, key)
                .write.bucketBy(N_BUCKETS, key)
                .sortBy(key)
                .option("path", os.path.join(bdir, tbl))
                .mode("overwrite")
                .saveAsTable(tbl)
            )

    def build_plain():
        po = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
        pl = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
        return join_agg(po, pl, F)

    def build_bucketed():
        return join_agg(spark.table(to), spark.table(tl), F)

    plain_sec = timed(build_plain, runs)
    plan = spark._jvm.PythonSQLUtils.explainString(
        build_bucketed()._jdf.queryExecution(), "formatted"
    )
    # the JOIN inputs must not shuffle (bucket co-location); the final
    # 3-key aggregate legitimately exchanges — same split as
    # tests/test_bucketing.py
    join_section = plan.split("HashAggregate")[0]
    has_exchange = "Exchange" in join_section
    bucketed_sec = timed(build_bucketed, runs)

    payload = {
        "sf_dir": sf_dir,
        "n_buckets": N_BUCKETS,
        "runs": runs,
        "plain_sec": plain_sec,
        "bucketed_sec": bucketed_sec,
        "speedup": round(plain_sec / max(bucketed_sec, 1e-9), 2),
        "bucketed_plan_has_exchange": has_exchange,
    }
    with open(out_json, "w") as f:
        f.write(json.dumps(payload) + "\n")
    print(json.dumps(payload))
    spark.stop()
    return 1 if has_exchange else 0


if __name__ == "__main__":
    sys.exit(main())
