"""Z-order (Morton) clustering for multi-dimensional locality.

The engine's data model is long-form (y, x, features...) rows
(SURVEY §1.4); at 100 TB the table's PHYSICAL layout decides whether a
spatial window query (`y BETWEEN ... AND x BETWEEN ...`) touches a few
files or all of them. Z-ordering interleaves the bits of the
coordinates into one scalar whose range-partitions are spatially
contiguous blocks — after `repartitionByRange(z)` + a sorted write,
min/max file statistics prune most files for any 2-D window (the same
technique table formats expose as `OPTIMIZE ZORDER BY`).

Everything is JVM bit arithmetic (shiftleft/or folds built
expression-by-expression) — no UDF, fully codegen-able, and exactly
reproducible in the DuckDB oracle from the same generated formula.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 16  # supports coordinates up to 2^16-1 per dimension


def zvalue(y: Column, x: Column, bits: int = ZBITS) -> Column:
    """Morton code: bit b of x lands at position 2b, bit b of y at
    2b+1. Built as an OR-fold of 2*bits shift expressions — constant
    folded by Catalyst into one codegen block."""
    z = F.lit(0).cast("long")
    for b in range(bits):
        xb = F.shiftleft(F.shiftright(x.cast("long"), b).bitwiseAND(F.lit(1)), 2 * b)
        yb = F.shiftleft(F.shiftright(y.cast("long"), b).bitwiseAND(F.lit(1)), 2 * b + 1)
        z = z.bitwiseOR(xb).bitwiseOR(yb)
    return z


def zvalue_sql(y: str, x: str, bits: int = ZBITS) -> str:
    """The SAME Morton formula as ANSI SQL text (for oracles and for
    engines that take SQL strings)."""
    terms = []
    for b in range(bits):
        terms.append(f"((({x} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({y} >> {b}) & 1) << {2 * b + 1})")
    return " | ".join(terms)


def zorder_by(df: DataFrame, y: str, x: str, num_partitions: int, bits: int = ZBITS) -> DataFrame:
    """Cluster a coordinate-keyed frame by Morton code: range-partition
    on z so each output partition holds one contiguous Z-curve segment
    (a compact spatial block), then sort within partitions so parquet
    row-group stats are tight. The write after this is what makes
    spatial predicates prune at scan time."""
    return (
        df.withColumn("_z", zvalue(F.col(y), F.col(x), bits))
        .repartitionByRange(num_partitions, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
