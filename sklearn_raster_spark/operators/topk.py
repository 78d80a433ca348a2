"""Two-phase distributed top-k per key.

The ranking-window formulation (q15/q55) shuffles EVERY row to its
key's reducer before discarding all but k. For large fan-in (REPOSE /
top-k similarity-join literature; PAPERS.md), the scalable shape is
two-phase: each partition keeps only its local top-k per key (a
partial "heap" via sort_array+slice — map-side, no shuffle), so at
most partitions*k rows per key shuffle for the final merge. Same
result set as the window formulation, asserted in tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def topk_per_key(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    k: int,
    ascending: bool = False,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Top-k rows per key by ``order_col`` (desc by default), with a
    deterministic tie-break. Output schema = input schema + ``rn``."""
    payload_cols = [c for c in df.columns if c not in key_cols]
    sort_key = F.struct(
        (F.col(order_col) if ascending else -F.col(order_col)).alias("o"),
        *( [F.col(tiebreak_col).alias("t")] if tiebreak_col else [] ),
        F.struct(*[F.col(c) for c in payload_cols]).alias("row"),
    )

    def partial_topk(grouped):
        return F.slice(F.array_sort(F.collect_list(sort_key)), 1, k)

    # phase 1: map-side top-k per (key, partition) — bounded state
    phase1 = (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy(*key_cols, "_pid")
        .agg(partial_topk(None).alias("_top"))
        .drop("_pid")
    )
    # phase 2: merge the partials per key, final top-k
    merged = (
        phase1.groupBy(*key_cols)
        .agg(F.slice(F.array_sort(F.flatten(F.collect_list("_top"))), 1, k).alias("_top"))
        .select(*key_cols, F.posexplode("_top").alias("_rn0", "_e"))
        .select(
            *key_cols,
            F.col("_e.row.*"),
            (F.col("_rn0") + 1).cast("int").alias("rn"),
        )
    )
    return merged
