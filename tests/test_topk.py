"""Two-phase top-k equivalence vs the ranking-window formulation."""

import numpy as np
import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sklearn_raster_spark.operators.topk import topk_per_key


def test_topk_matches_window(spark):
    rng = np.random.default_rng(11)
    pdf = pd.DataFrame({
        "g": rng.integers(0, 20, 5000),
        "id": np.arange(5000, dtype=np.int64),
        "score": rng.integers(0, 10_000, 5000).astype(np.int64),
    })
    df = spark.createDataFrame(pdf).repartition(8)

    w = Window.partitionBy("g").orderBy(F.col("score").desc(), F.col("id"))
    want = (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("g", "id", "score", "rn")
    )
    got = topk_per_key(df, ["g"], "score", k=3, tiebreak_col="id").select("g", "id", "score", "rn")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_topk_ascending_and_small_groups(spark):
    pdf = pd.DataFrame({"g": [1, 1, 2], "id": [1, 2, 3], "score": [5, 3, 9]})
    df = spark.createDataFrame(pdf)
    got = topk_per_key(df, ["g"], "score", k=5, ascending=True, tiebreak_col="id").collect()
    by_g = {}
    for r in got:
        by_g.setdefault(r.g, []).append((r.rn, r.score))
    assert by_g[1] == [(1, 3), (2, 5)]  # ascending, fewer rows than k is fine
    assert by_g[2] == [(1, 9)]
