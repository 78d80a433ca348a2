"""Table catalog over the driver-provided parquet testdata.

Reference analog: datasets/_base.py loads per-band GeoTIFFs into one
Dataset (SURVEY.md S1-S3). Here every source is a native parquet scan —
column pruning and predicate pushdown reach the footer/row-group level
for free, which is the 100-TB-critical property (a scan that reads all
columns for a 2-column projection is wrong).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor (TPC-H
# semantics: region=5, nation=25 rows always; supplier/part/customer grow
# with sf but stay broadcastable into the 10s-of-GB range via AQE).
BROADCASTABLE = {"region", "nation", "supplier", "part", "customer"}


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Keep this the ONLY entry point for reads so that
    format/bucketing/source swaps are one-line changes."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS), which Spark's parquet
        # reader rejects; read nanos as long and truncate to microsecond
        # timestamps (same truncation DuckDB applies).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def read_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: read_table(spark, sf_dir, name) for name in TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every table as a temp view for spark.sql() surfaces."""
    for name in TABLES:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)


def write_table(df: DataFrame, path: str, mode: str = "overwrite", partition_by=None) -> None:
    """Parquet sink (reference has no writer — SURVEY.md S6)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
