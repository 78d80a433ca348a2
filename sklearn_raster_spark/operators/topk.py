"""Two-phase distributed top-k per key.

The ranking-window formulation (q15/q55) shuffles EVERY row to its
key's reducer before discarding all but k. For large fan-in (REPOSE /
top-k similarity-join literature; PAPERS.md), the scalable shape is
two-phase: each partition keeps only its local top-k per key (a
partial "heap" via array_sort+slice — map-side, no shuffle), so at
most partitions*k rows per key shuffle for the final merge. Same
result set as the window formulation, asserted in tests.

Ordering uses an explicit array_sort comparator (not numeric negation),
so descending works for any orderable type — strings, timestamps,
bigint extremes — and matches Window.orderBy semantics exactly:
NaN sorts greater than every non-NaN value, NULLs first for
ascending / last for descending (asc_nulls_first / desc_nulls_last,
the Spark defaults).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cmp_field(lf: Column, rf: Column, ascending: bool) -> Column:
    """Three-way comparison of one key field, mirroring Window.orderBy:
    asc => nulls first, desc => nulls last; Spark's </> already treat
    NaN as greater than any other value and equal to itself."""
    if ascending:
        null_l, null_r, lt, gt = -1, 1, -1, 1
    else:
        null_l, null_r, lt, gt = 1, -1, 1, -1
    return (
        F.when(lf.isNull() & rf.isNull(), F.lit(0))
        .when(lf.isNull(), F.lit(null_l))
        .when(rf.isNull(), F.lit(null_r))
        .when(lf < rf, F.lit(lt))
        .when(lf > rf, F.lit(gt))
        .otherwise(F.lit(0))
    )


def topk_per_key(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    k: int,
    ascending: bool = False,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Top-k rows per key by ``order_col`` (desc by default), with a
    deterministic tie-break (always ascending, like the window
    formulation's secondary orderBy). Output schema = input schema +
    ``rn``."""
    payload_cols = [c for c in df.columns if c not in key_cols]
    sort_key = F.struct(
        F.col(order_col).alias("o"),
        *([F.col(tiebreak_col).alias("t")] if tiebreak_col else []),
        F.struct(*[F.col(c) for c in payload_cols]).alias("row"),
    )

    def comparator(l: Column, r: Column) -> Column:
        c = _cmp_field(l["o"], r["o"], ascending)
        if tiebreak_col:
            t = _cmp_field(l["t"], r["t"], True)
            c = F.when(c != 0, c).otherwise(t)
        # final fallback on the full payload struct keeps the result
        # deterministic under exact key ties without a tiebreak column
        rowc = (
            F.when(l["row"] < r["row"], F.lit(-1))
            .when(l["row"] > r["row"], F.lit(1))
            .otherwise(F.lit(0))
        )
        return F.when(c != 0, c).otherwise(rowc)

    def local_topk(arr: Column) -> Column:
        return F.slice(F.array_sort(arr, comparator), 1, k)

    # phase 1: map-side top-k per (key, partition) — bounded state
    phase1 = (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy(*key_cols, "_pid")
        .agg(local_topk(F.collect_list(sort_key)).alias("_top"))
        .drop("_pid")
    )
    # phase 2: merge the partials per key, final top-k
    merged = (
        phase1.groupBy(*key_cols)
        .agg(local_topk(F.flatten(F.collect_list("_top"))).alias("_top"))
        .select(*key_cols, F.posexplode("_top").alias("_rn0", "_e"))
        .select(
            *key_cols,
            F.col("_e.row.*"),
            (F.col("_rn0") + 1).cast("int").alias("rn"),
        )
    )
    return merged
