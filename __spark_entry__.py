"""Driver contract for the spark-graft builder (PySpark target).

Thin view over ``sklearn_raster_spark.plans.registry`` — every operator
module registers its (spark_fn, oracle_sql) pair there; see SURVEY.md §2
for the inventory and the per-query docstrings for reference citations.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# Executor Python workers inherit PYTHONPATH from the JVM's environment;
# exporting it here (before the driver builds its SparkSession) lets the
# broadcast-model kernels unpickle classes from this package regardless
# of the driver's working directory. ufunc.py additionally ships the
# package via addPyFile for sessions created before this import.
import os  # noqa: E402

os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from sklearn_raster_spark.plans.registry import load_all_queries  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    q01 pricing summary: scan → filter → exact-decimal hash aggregation,
    the Spark dual of the reference's masked-reduction dataflow.
    """
    from sklearn_raster_spark.operators.relational import q01_pricing_summary

    return q01_pricing_summary(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in load_all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; omitted => rows-only check."""
    return {
        name: spec.oracle
        for name, spec in load_all_queries().items()
        if spec.oracle is not None
    }
