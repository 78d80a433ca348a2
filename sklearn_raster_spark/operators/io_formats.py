"""Non-parquet source formats (CSV / JSON) through the single
``read_table`` choke point.

Reference S1/S2 ingest multiple container formats (GeoTIFF stacks,
ndarray/DataArray/Dataset/DataFrame — datasets/_base.py:71-104,
features.py:184-202). The Spark dual: one catalog entry point that can
scan parquet, CSV, or JSON with the SAME explicit schema, so the rest
of the plan never cares about the container. The queries materialize a
CSV/JSON copy of a parquet table once (to /tmp), read it back through
the non-parquet reader, and run a plan whose oracle executes against
the ORIGINAL parquet view — a full-fidelity round-trip check of the
format path, not just a smoke test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sklearn_raster_spark.plans.registry import query
from sklearn_raster_spark.sources import read_table


@query(
    "q49_csv_source",
    oracle="""
    SELECT
        n.n_nationkey,
        n.n_name,
        r.r_name AS region_name
    FROM nation n
    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    doc="CSV source path: nation and region are round-tripped through "
        "CSV (quoted text fields with commas included) and joined with "
        "a broadcast hash join; the oracle runs on the parquet "
        "originals, so a hash match proves byte-exact CSV fidelity.",
)
def q49_csv_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = read_table(spark, sf_dir, "nation", fmt="csv")
    region = read_table(spark, sf_dir, "region", fmt="csv")
    return (
        nation.join(
            F.broadcast(region),
            nation["n_regionkey"] == region["r_regionkey"],
        )
        .select(
            "n_nationkey",
            "n_name",
            F.col("r_name").alias("region_name"),
        )
    )


@query(
    "q58_json_source",
    oracle="""
    SELECT
        o_orderstatus,
        COUNT(*) AS n_orders,
        MIN(o_orderdate) AS first_date,
        MAX(o_orderdate) AS last_date
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="JSON source path: orders round-tripped through JSON Lines "
        "(dates serialized ISO, parsed back by the explicit schema) "
        "then hash-aggregated; oracle runs on the parquet original, so "
        "a hash match proves JSON date/int fidelity.",
)
def q58_json_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders", fmt="json")
    return orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_orderdate").alias("first_date"),
        F.max("o_orderdate").alias("last_date"),
    )


@query(
    "q68_raster_stack_source",
    oracle="""
    WITH g AS (
        SELECT embedding,
               ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS rn,
               COUNT(*) OVER () AS total
        FROM embeddings
    ), cells AS (
        SELECT rn, embedding FROM g WHERE rn < (total // 50) * 50
    )
    SELECT band,
           COUNT(*) AS n_cells,
           CAST(MIN(embedding[band + 1]) AS DOUBLE) AS vmin,
           CAST(MAX(embedding[band + 1]) AS DOUBLE) AS vmax,
           CAST(ARG_MIN(embedding, rn)[band + 1] AS DOUBLE) AS corner
    FROM cells, generate_series(0, 7) AS t(band)
    GROUP BY band
    """,
    doc="Distributed raster-stack ingest (reference S1/S2, "
        "datasets/_base.py:71-104): 8 per-band .npy grids cut from the "
        "embeddings table are decoded BY EXECUTORS via a file-list "
        "DataFrame -> mapInPandas numpy reader, then aggregated per "
        "band (count / min / max / corner cell via min_by on (y,x)). "
        "The oracle recomputes every statistic from the embeddings "
        "view with zero float arithmetic, so a hash match proves "
        "byte-exact file round-trip AND correct (y,x) cell layout.",
)
def q68_raster_stack_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sklearn_raster_spark.session import ensure_workers_can_import
    from sklearn_raster_spark.sources.raster import (
        materialize_raster_stack,
        read_raster_stack,
    )

    ensure_workers_can_import(spark)
    files = materialize_raster_stack(spark, sf_dir)
    long_df = read_raster_stack(spark, files)
    return long_df.groupBy(F.col("band").cast("bigint").alias("band")).agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
        F.min_by("value", F.struct("y", "x")).alias("corner"),
    )
