"""Bounded pool of persisted "shared lineage" DataFrames.

Several query builders persist an intermediate whose lineage feeds two
or more downstream consumers (self-join sides, a verify pass): without
the persist the expensive scan+transform recomputes per consumer (the
round-2 persist-before-self-join finding, ROUND2_NOTES.md). But a bare
``df.persist()`` inside a builder leaks: Spark's CacheManager keys the
entry on the logical plan, so every fresh invocation of the builder
(pytest loops, the driver's 50-query correctness gate, q104 re-invoking
q51) adds another session-lifetime cached copy (round-3 ADVICE.md).

``shared_lineage`` keeps the perf win while bounding the leak: persisted
frames enter a small FIFO pool and registering past the bound evicts and
unpersists the oldest. Queries run sequentially (bench, driver, pytest),
so a builder's own caches are never evicted while its action is in
flight; even if an eviction ever raced an action, unpersist only drops
blocks — the consumer recomputes from lineage, correctness unaffected.
"""

from __future__ import annotations

from collections import deque

from pyspark.sql import DataFrame

_POOL: deque[DataFrame] = deque()
_MAX_TRACKED = 4


def shared_lineage(df: DataFrame, eager: bool = True) -> DataFrame:
    """Persist ``df`` for multi-consumer reuse, tracked for bounded
    eviction. ``eager=True`` materializes immediately (count) so a
    following self-join reads a fully-built cache instead of racing
    per-partition block writes."""
    df.persist()
    if eager:
        df.count()
    _POOL.append(df)
    while len(_POOL) > _MAX_TRACKED:
        old = _POOL.popleft()
        try:
            old.unpersist()
        except Exception:
            pass
    return df


def release_shared_caches() -> None:
    """Unpersist every tracked frame (bench/test hygiene hook)."""
    while _POOL:
        df = _POOL.pop()
        try:
            df.unpersist()
        except Exception:
            pass
