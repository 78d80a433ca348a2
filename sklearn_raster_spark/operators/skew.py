"""Skew-mitigation utilities.

AQE's skew-join splitting (on by default, session.py) handles most
skew at runtime. Salting is the manual fallback for the cases AQE
can't fix — e.g. a single hot key that dominates a partition even
after splitting, or aggregations (AQE skew handling only covers
joins). Classic technique: SALT the big side's key with a random
suffix, REPLICATE the small side once per salt value, join on the
salted key, then drop the salt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join a skewed big side to a small side by salting.

    The big side gets a per-ROW salt in [0, n_salts) from
    monotonically_increasing_id — NOT a content hash: a hot key whose
    rows are identical (dedup counts, flag columns) would collide onto
    one salt under any content-derived scheme and not spread at all.
    The small side is exploded once per salt. Each hot key's rows
    spread over n_salts partitions instead of one. The salt value only
    affects distribution, never results, so id-assignment variance
    across retries is harmless.

    Only ``inner`` and ``left`` joins are supported: replicate-and-salt
    duplicates every unmatched small-side row once per salt under
    ``right``/``full``, which would emit it n_salts times.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only (got {how!r}): "
            "right/full outer would replicate unmatched small-side rows "
            "once per salt"
        )
    salt = (F.monotonically_increasing_id() % n_salts).cast("int").alias("_salt")
    big_salted = big.withColumn("_salt", salt)
    small_rep = small.withColumn(
        "_salt", F.explode(F.array([F.lit(i) for i in range(n_salts)]))
    )
    out = big_salted.join(
        small_rep,
        (big_salted[big_key] == small_rep[small_key]) & (big_salted["_salt"] == small_rep["_salt"]),
        how,
    )
    return out.drop("_salt")


def salted_aggregate(
    df: DataFrame,
    group_cols: list[str],
    agg_exprs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: aggregate on
    (key, salt) first — spreading a hot key over n_salts reducers —
    then re-aggregate on the key. Only algebraic aggregates (sum,
    count, min, max) compose this way; avg must be derived as
    sum/count by the caller.

    agg_exprs: {column: fn} with fn in {"sum", "count", "min", "max"}.
    """
    _RECOMBINE = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for fn in agg_exprs.values():
        if fn not in _RECOMBINE:
            raise ValueError(f"{fn!r} is not algebraic; use sum/count/min/max")
    salt = (F.monotonically_increasing_id() % n_salts).cast("int").alias("_salt")
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*group_cols, "_salt")
        .agg(*[getattr(F, fn)(c).alias(f"_p_{c}") for c, fn in agg_exprs.items()])
    )
    phase2 = phase1.groupBy(*group_cols).agg(
        *[
            getattr(F, _RECOMBINE[fn])(f"_p_{c}").alias(f"{fn}_{c}")
            for c, fn in agg_exprs.items()
        ]
    )
    return phase2


def _register() -> None:
    """Register the salted-aggregation query (kept in a function so the
    module stays importable without the registry for unit tests)."""
    from pyspark.sql import DataFrame, SparkSession

    from sklearn_raster_spark.plans.registry import query
    from sklearn_raster_spark.sources import read_table

    @query(
        "q93_salted_agg",
        oracle="""
        SELECT l_returnflag,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
               MAX(l_orderkey) AS max_key,
               COUNT(l_quantity) AS n_items
        FROM lineitem
        GROUP BY l_returnflag
        """,
        doc="Two-phase SALTED aggregation on a genuinely hot key space "
            "(3 return-flag groups — at 100 TB each group is billions "
            "of rows landing on 3 reducers if aggregated directly): "
            "phase 1 aggregates on (key, salt) spreading each hot key "
            "over 16 reducers, phase 2 recombines the algebraic "
            "partials (sum-of-sums, max-of-maxes, sum-of-counts). "
            "Results are EXACTLY the plain aggregate's — the oracle IS "
            "the unsalted form — because the sums go through DECIMAL "
            "(associative) and the salt only affects distribution. "
            "Manual fallback for the one skew case AQE cannot fix "
            "(AQE skew handling covers joins, not aggregations).",
    )
    def q93_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = read_table(spark, sf_dir, "lineitem").select(
            "l_returnflag",
            F.col("l_quantity").cast("decimal(18,2)").alias("qty_dec"),
            F.col("l_extendedprice").cast("decimal(18,2)").alias("price_dec"),
            "l_orderkey",
            "l_quantity",
        )
        out = salted_aggregate(
            li,
            ["l_returnflag"],
            {
                "qty_dec": "sum",
                "price_dec": "sum",
                "l_orderkey": "max",
                "l_quantity": "count",
            },
            n_salts=16,
        )
        return out.select(
            "l_returnflag",
            F.col("sum_qty_dec").cast("double").alias("sum_qty"),
            F.col("sum_price_dec").cast("double").alias("sum_price"),
            F.col("max_l_orderkey").alias("max_key"),
            F.col("count_l_quantity").alias("n_items"),
        )


_register()
