"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints the full line with the per-query dict first, then the COMPACT
summary JSON line {"metric", "value", "unit", "sf", "n_queries"} LAST —
the driver records the stdout TAIL, so the final line is the one that
survives truncation. Also writes the full result next to this file:
``--median N`` runs to BENCH_LOCAL.json (the committed idle-median
anchor), single-pass runs (the driver's mode) to BENCH_LASTRUN.json so
a driver pass can never clobber the median artifact.

Timing covers plan BUILD + materialization together: some builders
eagerly persist shared lineages (q51 token table, q100 band keys, q101
shingles), so timing only the sink would bench those queries cache-warm
(round-3 ADVICE.md).

``--median N`` (or SPARK_GRAFT_BENCH_MEDIAN=N) runs the full query loop
N times in one session and reports the per-query MEDIAN — the committed
idle artifact uses N=3 so driver-vs-idle comparisons are decidable
without a re-measure round-trip (the q93/q119 episodes, VERDICT r6 #6).
The driver's own per-round run stays single-pass (default N=1).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.removeprefix("sf")) if Path(sf_dir).name.startswith("sf") else -1.0

    from sklearn_raster_spark.session import get_spark
    from sklearn_raster_spark.plans.registry import load_all_queries

    spark = get_spark(app_name="bench")
    registry = load_all_queries()

    # Warm the JVM, Python-worker pool, and parquet footers once so
    # per-query times measure the plan, not process startup.
    spark.range(1000).selectExpr("sum(id)").collect()
    from pyspark.sql import functions as F

    # fork the Python UDF workers + Arrow serialization path once
    warm_udf = F.pandas_udf(lambda s: s, "long")
    spark.range(32 * 1000).repartition(32).select(warm_udf("id")).collect()
    # Warm the MLlib estimators the registry uses (ALS, FPGrowth,
    # LinearRegression, KMeans, LogisticRegression): the FIRST fit of
    # each in a JVM pays a one-time class-load + JIT cost that is
    # process startup, not plan time — measured +7-13 s on q119 ALS
    # alone (idle-box first run 12.7 s vs 4.7-5.7 s every run after;
    # SCALE.md round-7 note). Tiny synthetic fits, untimed.
    def _warm_mllib() -> None:
        from pyspark.ml.classification import LogisticRegression
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.fpm import FPGrowth
        from pyspark.ml.linalg import Vectors
        from pyspark.ml.recommendation import ALS
        from pyspark.ml.regression import LinearRegression

        toy = spark.createDataFrame(
            [(i % 4, i % 3, float(i % 5 + 1)) for i in range(24)],
            "user int, item int, rating float",
        )
        vecs = spark.createDataFrame(
            [(float(i % 3), Vectors.dense([float(i), float(i % 7)])) for i in range(24)],
            ["label", "features"],
        )
        # one try per fit: a single estimator failing must not skip the
        # others' warmups (that would silently reintroduce the first-fit
        # JIT cost this exists to remove)
        for label, fit in (
            ("ALS", lambda: ALS(rank=2, maxIter=1, seed=1, userCol="user",
                                itemCol="item", ratingCol="rating",
                                implicitPrefs=True).fit(toy)),
            ("LinearRegression", lambda: LinearRegression(maxIter=1).fit(vecs)),
            ("KMeans", lambda: KMeans(k=2, maxIter=1, seed=1).fit(vecs)),
            ("LogisticRegression", lambda: LogisticRegression(maxIter=1).fit(
                vecs.selectExpr("CAST(label >= 1 AS DOUBLE) AS label", "features"))),
            ("FPGrowth", lambda: FPGrowth(minSupport=0.5, minConfidence=0.5).fit(
                spark.createDataFrame([([1, 2],), ([1, 3],), ([1, 2],)], ["items"]))),
        ):
            try:
                fit()
            except Exception as exc:
                print(f"# mllib warmup skipped ({label}): {exc}", file=sys.stderr)

    try:
        _warm_mllib()
    except Exception as exc:  # import failure: warm nothing, bench anyway
        print(f"# mllib warmup skipped: {exc}", file=sys.stderr)
    from sklearn_raster_spark.sources import TABLES, read_table

    for t in TABLES:
        try:
            read_table(spark, sf_dir, t).limit(1).collect()
        except Exception:
            pass

    per_query_timeout = float(os.environ.get("SPARK_GRAFT_BENCH_TIMEOUT", "120"))

    def run_with_watchdog(name: str, fn) -> float:
        """Run one query under a job-group watchdog so a runaway plan
        can't eat the whole bench budget."""
        import threading

        sc = spark.sparkContext
        group = f"bench-{name}"
        sc.setJobGroup(group, name, interruptOnCancel=True)
        done = threading.Event()

        def cancel_if_slow():
            if not done.wait(per_query_timeout):
                sc.cancelJobGroup(group)

        watchdog = threading.Thread(target=cancel_if_slow, daemon=True)
        watchdog.start()
        start = time.perf_counter()
        try:
            fn()
            return round(time.perf_counter() - start, 4)
        finally:
            done.set()
            sc.setLocalProperty("spark.jobGroup.id", None)

    import gc

    from sklearn_raster_spark.utils.cache import release_shared_caches

    def run_pass() -> dict[str, float]:
        timings: dict[str, float] = {}
        for qi, (name, spec) in enumerate(sorted(registry.items())):
            try:
                # Build + materialize INSIDE the timed closure: builders
                # that eagerly persist shared lineage do real work at build
                # time, and timing the sink alone would read warm cache.
                # noop sink materializes every output column (a bare
                # .count() would let Catalyst prune the projections we're
                # measuring).
                timings[name] = run_with_watchdog(
                    name,
                    lambda: spec.fn(spark, sf_dir)
                    .write.format("noop")
                    .mode("overwrite")
                    .save(),
                )
            except Exception as exc:  # keep benching; a broken query shows as -1
                timings[name] = -1.0
                print(f"# bench error {name}: {exc}", file=sys.stderr)
            finally:
                # Session hygiene between queries: round 2 measured a 1.5x
                # whole-suite slowdown from one JVM accumulating per-query
                # persists and broadcasts across ~100 queries. Drop cached
                # plans eagerly and let ContextCleaner reap broadcasts whose
                # Python references just died (it only acts on GC).
                release_shared_caches()
                spark.catalog.clearCache()
                gc.collect()
                # JVM full GC (lets ContextCleaner reap dead broadcasts,
                # shuffle files and localCheckpoint blocks) is itself a
                # multi-hundred-ms pause whose tail can bleed into the NEXT
                # query's timing — amortize it over batches of 10 for cheap
                # queries, but force it after any heavy query: at sf >= 1 a
                # single dedup/graph query strands GBs of checkpoint blocks
                # and shuffle files that the cleaner cannot reap until a GC
                # proves the references dead, and that pressure inflated
                # every later query 5-7x in the first sf1 run.
                if qi % 10 == 9 or timings.get(name, 0.0) > 2.0:
                    try:
                        spark.sparkContext._jvm.System.gc()
                    except Exception:
                        pass
                # settle: absorb GC pauses / scheduler tails from the
                # PREVIOUS query outside any timed window (round-3 saw
                # sub-2s queries regress 1.5-2.8x purely by bench position)
                spark.range(16).repartition(4).count()
        return timings

    def _int_or(v: str | None, default: int) -> int:
        try:
            return int(v)  # type: ignore[arg-type]
        except (TypeError, ValueError):
            return default

    n_runs = _int_or(os.environ.get("SPARK_GRAFT_BENCH_MEDIAN"), 1)
    if "--median" in sys.argv:
        i = sys.argv.index("--median")
        # a missing or non-numeric value falls back to the documented
        # default of 3 rather than killing the run with a traceback
        n_runs = _int_or(sys.argv[i + 1] if i + 1 < len(sys.argv) else None, 3)
    n_runs = max(1, n_runs)
    passes = []
    for p in range(n_runs):
        if n_runs > 1:
            print(f"# bench pass {p + 1}/{n_runs}", file=sys.stderr)
        passes.append(run_pass())

    # Per-query median over the runs that SUCCEEDED; -1 only if every
    # run of that query errored (an intermittent failure still reports
    # a time, with the error visible in `runs`).
    timings = {}
    for name in passes[0]:
        good = [t[name] for t in passes if t[name] >= 0]
        timings[name] = round(statistics.median(good), 4) if good else -1.0

    ok = {k: v for k, v in timings.items() if v >= 0}
    summary = {
        "metric": "total_query_wall_sec",
        "value": round(sum(ok.values()), 4),
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "n_errors": len(timings) - len(ok),
        "n_runs": n_runs,
    }
    result = {**summary, "queries": timings}
    if n_runs > 1:  # keep raw per-pass times for auditability
        result["runs"] = {name: [t[name] for t in passes] for name in timings}
    # Persist the artifact BEFORE printing: a consumer that closes our
    # stdout early (e.g. `bench.py | head -1`) delivers SIGPIPE on the
    # second print, and the run's only record must not die with it.
    # Single-pass runs (the driver's per-round invocation) land in
    # BENCH_LASTRUN.json so they cannot clobber the committed 3-run
    # idle-median anchor in BENCH_LOCAL.json (round-7 VERDICT: the r7
    # driver pass overwrote the median artifact, destroying the
    # driver-vs-idle comparison baseline).
    artifact = "BENCH_LOCAL.json" if n_runs > 1 else "BENCH_LASTRUN.json"
    try:
        with open(os.path.join(REPO, artifact), "w") as f:
            json.dump(result, f, indent=1, sort_keys=True)
    except OSError:
        pass
    # compact headline LAST: the driver records the stdout TAIL, so the
    # final line is the one guaranteed to survive truncation (round 3
    # lost the number to the dict; round 4 lost it by printing first).
    print(json.dumps(result), flush=True)
    print(json.dumps(summary), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
