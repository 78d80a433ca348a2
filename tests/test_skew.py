"""Salted join / aggregate correctness vs the plain equivalents on a
synthetically skewed key distribution (90% of rows share one key)."""

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from sklearn_raster_spark.operators.skew import salted_aggregate, salted_join


def _skewed(spark, n=20_000, seed=3):
    rng = np.random.default_rng(seed)
    keys = np.where(rng.random(n) < 0.9, 7, rng.integers(0, 100, n))
    pdf = pd.DataFrame({"k": keys.astype(np.int64), "v": rng.integers(0, 1000, n).astype(np.int64)})
    return spark.createDataFrame(pdf).repartition(8)


def test_salted_join_matches_plain(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        pd.DataFrame({"sk": np.arange(100, dtype=np.int64), "name": [f"n{i}" for i in range(100)]})
    )
    plain = big.join(small, big.k == small.sk).groupBy("name").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    salted = salted_join(big, small, "k", "sk", n_salts=8).groupBy("name").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_keeps_unmatched(spark):
    big = _skewed(spark, n=1000)
    small = spark.createDataFrame(
        pd.DataFrame({"sk": np.arange(0, 50, dtype=np.int64), "name": [f"n{i}" for i in range(50)]})
    )
    out = salted_join(big, small, "k", "sk", n_salts=4, how="left")
    assert out.count() == 1000
    assert out.filter(F.col("name").isNull()).count() == big.filter(F.col("k") >= 50).count()


def test_salted_aggregate_matches_plain(spark):
    df = _skewed(spark)
    plain = df.groupBy("k").agg(
        F.sum("v").alias("sum_v"),
        F.count("v").alias("count_v"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    )
    salted = salted_aggregate(
        df, ["k"], {"v": "sum"}, n_salts=8
    ).withColumnRenamed("sum_v", "sum_v")
    got = {r.k: r.sum_v for r in salted.collect()}
    want = {r.k: r.sum_v for r in plain.collect()}
    assert got == want
