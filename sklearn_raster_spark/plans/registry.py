"""Query registry: the declared operator surface of the engine.

Every implemented operator from SURVEY.md §2 registers here with
(a) a Spark plan builder ``(spark, sf_dir) -> DataFrame`` and
(b) where SQL-expressible, an equivalent DuckDB oracle SQL string.
``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over
this registry; the driver's t2 gate compares the two per query.

Determinism contract (so order-insensitive value hashes match):
- float aggregates go through DECIMAL sums (order-independent) and are
  cast to DOUBLE at the end, or are rounded identically on both sides;
- every top-k / limit has a unique-key tie-break;
- column names are aliased identically on both sides.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: SparkQuery
    oracle: str | None  # DuckDB SQL, or None => driver does rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}

# Modules that register queries on import. Kept explicit (not a package
# walk) so the declared surface is reviewable in one place.
_QUERY_MODULES = (
    "sklearn_raster_spark.operators.relational",
    "sklearn_raster_spark.operators.functions_suite",
    "sklearn_raster_spark.operators.events",
    "sklearn_raster_spark.operators.asof",
    "sklearn_raster_spark.operators.dedup",
    "sklearn_raster_spark.operators.similarity",
    "sklearn_raster_spark.operators.text",
    "sklearn_raster_spark.operators.inference",
    "sklearn_raster_spark.operators.mllib_inference",
    "sklearn_raster_spark.operators.multimodal",
)


def query(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator registering a Spark query builder under ``name``."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def load_all_queries() -> dict[str, QuerySpec]:
    """Import every operator module (idempotent) and return the registry."""
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError:
            pass  # module not built yet (incremental rounds)
    return REGISTRY
