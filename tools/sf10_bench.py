"""Single-pass timing of the top-cost queries at a derived sf10
(VERDICT r10 next #5): one more measured decade past sf1, answering
the open questions the sf1 curve left — do the banded-LSH self-joins
(q52/q53/q150/q151) stay near-linear, does PPJoin+CC (q104) hold, and
how does MLlib's blocked ALS (q119) grow when ratings x100?

Derivation: tools/make_scaled_data.py with mult=100 over the driver's
sf0.1 (token-disjoint replicas, per-replica referential integrity) —
SCALING MEASUREMENT ONLY, correctness always grades on the driver's
own directories. Single pass per query (the decade signal is 10x; the
+-30% host noise documented in ROUND10_NOTES does not change the
shape read).

Usage: python tools/sf10_bench.py [sf10_dir] [out_json]
Writes {"sf": 10, "queries": {name: sec}, "total_sec": N}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# the top-10 sf1-cost queries (BENCH_SF1.json, round 10), plus — round
# 12 (VERDICT r11 next #6) — the relational/window heads and q175, so
# the decade table covers every operator family, not just the LLM
# pipeline: q01 (wide agg), q03 (join+agg+topk), q36 (sort-merge
# join), q88 (gaps-and-islands windows), q175 (the measured ALS-ANN
# fix, re-timed per round so its 6.3x claim tracks the living code)
TOP = [
    "q119_als_recommendations",
    "q52_minhash_lsh_pairs",
    "q57_embedding_neardup",
    "q118_frequent_itemsets",
    "q151_simhash_portable",
    "q53_simhash_neardup",
    "q106_contamination_bloom",
    "q104_dedup_corpus",
    "q150_minhash_portable",
    "q128_maxsim_late_interaction",
    "q01_pricing_summary",
    "q03_top_revenue_orders",
    "q36_sort_merge_join",
    "q88_order_gaps_islands",
    "q175_als_ann_recommendations",
]


def main() -> int:
    sf10 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale/sf10"
    out_json = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "BENCH_SF10.json")
    # optional explicit query subset (resume after a capped outlier)
    queries = sys.argv[3].split(",") if len(sys.argv) > 3 else TOP
    if not os.path.exists(os.path.join(sf10, "embeddings.parquet")):
        print(f"deriving sf10 at {sf10} (mult=100 over sf0.1)...", flush=True)
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "make_scaled_data.py"),
             "100", "/root/testdata/sf0.1", sf10],
            check=True,
        )

    from sklearn_raster_spark.plans.registry import load_all_queries
    from sklearn_raster_spark.session import get_spark

    spark = get_spark(
        app_name="sf10_bench",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
    )
    registry = load_all_queries()
    timings: dict[str, float] = {}
    for name in queries:
        spec = registry[name]
        t0 = time.monotonic()
        df = spec.fn(spark, sf10)
        n = df.count()
        dt = time.monotonic() - t0
        timings[name] = round(dt, 2)
        print(f"{name}: {dt:.1f}s ({n} rows)", flush=True)
    payload = {
        "sf": 10,
        "sf_dir": sf10,
        "queries": timings,
        "total_sec": round(sum(timings.values()), 2),
    }
    with open(out_json, "w") as f:
        f.write(json.dumps(payload) + "\n")
    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    sys.exit(main())
