"""Wide <-> long reshape duals (reference Dataset<->DataArray
conversion, features.py:338-389; SURVEY.md §1.4 "stack/unpivot").

The engine's FeatureFrame is wide (one column per feature). The
reference freely converts between features-as-variables (Dataset) and
features-as-a-dimension (DataArray); the Spark duals are:

- wide -> long: ``DataFrame.unpivot`` — a narrow map-side transform
  (no shuffle): each row expands to n_features rows carrying a
  (feature, value) pair. This is ``to_dataarray``.
- long -> wide: groupBy(id).pivot(feature, values).agg(first) — one
  shuffle on the id key; explicit pivot values keep the plan static
  (no driver-side distinct scan) which is the 100 TB-safe form.

Round-trip identity is asserted in tests; q66 runs the long form
through a per-feature aggregate with a DuckDB UNION-ALL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sklearn_raster_spark.plans.registry import query
from sklearn_raster_spark.sources import read_table


def wide_to_long(
    df: DataFrame,
    id_cols: list[str],
    feature_cols: list[str],
    var_name: str = "feature",
    value_name: str = "value",
) -> DataFrame:
    """Unpivot feature columns into (feature, value) rows. Values are
    cast to double (the reference promotes mixed dtypes to a common
    dtype on Dataset->DataArray conversion,
    docs/pages/guide/raster_formats.md:101)."""
    casted = df.select(
        *id_cols, *[F.col(c).cast("double").alias(c) for c in feature_cols]
    )
    return casted.unpivot(id_cols, feature_cols, var_name, value_name)


def long_to_wide(
    df: DataFrame,
    id_cols: list[str],
    var_col: str,
    value_col: str,
    feature_values: list[str],
) -> DataFrame:
    """Pivot (feature, value) rows back to one column per feature.
    ``feature_values`` is explicit so the plan needs no eager distinct
    pass over the long table (pivot without values collects the key
    set to the driver — wrong at scale)."""
    return (
        df.groupBy(*id_cols)
        .pivot(var_col, feature_values)
        .agg(F.first(value_col))
    )


@query(
    "q66_wide_long_reshape",
    oracle="""
    SELECT 'l_quantity' AS feature,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total,
           CAST(MIN(l_quantity) AS DOUBLE) AS vmin,
           CAST(MAX(l_quantity) AS DOUBLE) AS vmax
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', COUNT(*),
           CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE),
           CAST(MIN(l_discount) AS DOUBLE), CAST(MAX(l_discount) AS DOUBLE)
    FROM lineitem
    UNION ALL
    SELECT 'l_tax', COUNT(*),
           CAST(SUM(CAST(l_tax AS DECIMAL(18,4))) AS DOUBLE),
           CAST(MIN(l_tax) AS DOUBLE), CAST(MAX(l_tax) AS DOUBLE)
    FROM lineitem
    """,
    doc="Wide->long reshape (unpivot, the Dataset->DataArray dual) "
        "followed by a per-feature aggregate: count / decimal-exact "
        "sum / min / max per unpivoted feature. The narrow unpivot "
        "never shuffles; the aggregate shuffles 3 keys.",
)
def q66_wide_long_reshape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax"
    )
    long = wide_to_long(
        li,
        id_cols=["l_orderkey", "l_linenumber"],
        feature_cols=["l_quantity", "l_discount", "l_tax"],
    )
    return long.groupBy("feature").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
