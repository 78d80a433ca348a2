"""Warm in-session timing of specific queries (the ROUND10_NOTES A/B
protocol): one Spark session, N timed runs per query through the
bench's exact methodology (build + noop-sink materialization inside
the timed closure, shared caches released between runs), reporting
all runs plus the median.

Usage: python tools/query_timer.py q52,q104 [n_runs]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> int:
    prefixes = sys.argv[1].split(",")
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from sklearn_raster_spark.plans.registry import load_all_queries
    from sklearn_raster_spark.session import get_spark
    from sklearn_raster_spark.utils.cache import release_shared_caches

    spark = get_spark(app_name="query_timer")
    registry = load_all_queries()
    names = [
        n for n in sorted(registry) if any(n.startswith(p) for p in prefixes)
    ]
    # warm like bench.py: JVM, Python workers, parquet footers
    spark.range(1000).selectExpr("sum(id)").collect()
    from pyspark.sql import functions as F

    warm_udf = F.pandas_udf(lambda s: s, "long")
    spark.range(32 * 1000).repartition(32).select(warm_udf("id")).collect()
    from sklearn_raster_spark.sources import TABLES, read_table

    for t in TABLES:
        try:
            read_table(spark, sf_dir, t).limit(1).collect()
        except Exception:
            pass

    out = {}
    for name in names:
        spec = registry[name]
        runs = []
        for _ in range(n_runs):
            spark.sparkContext.setJobDescription(f"timer-{name}")
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 4))
            release_shared_caches()
            spark.catalog.clearCache()
            gc.collect()
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
            spark.range(16).repartition(4).count()
        out[name] = {"runs": runs, "median": round(statistics.median(runs), 4)}
        print(f"{name}: median={out[name]['median']} runs={runs}", flush=True)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
