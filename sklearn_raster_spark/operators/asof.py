"""As-of (most-recent-prior) join — the classic event-time enrichment
operator Spark lacks natively (SURVEY.md §2.4 "Joins").

Implementation is the scalable union-sort trick, NOT a join:
tag left/right rows, union them, and carry the latest right-side value
forward with ``last(..., ignorenulls=True)`` over a window ordered by
(ts, is_left). One shuffle on the partition key, zero join explosion,
no per-left-row probing — this survives 100 TB because it is a single
sort-within-partitions of |L|+|R| rows (vs. a range-join's quadratic
worst case). Skew on the partition key is handled by AQE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sklearn_raster_spark.plans.registry import query
from sklearn_raster_spark.sources import read_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_values: list[str],
    inclusive: bool = True,
    time_bucket: str | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_time`` <= ``left_time`` (strict < when inclusive=False),
    matching on ``on``. Right columns come back NULL when no prior row
    exists (left-join semantics).

    ``time_bucket`` (e.g. ``"1 hour"``): opt-in skew mitigation. The
    plain path windows on the raw key, so ONE hot key serializes its
    entire sort into one task (AQE splits skewed joins, not window
    sorts). With a bucket, the carry becomes a two-phase parallel
    prefix scan: phase 1 computes the running carry WITHIN each
    (key, time-bucket) partition — a hot key now spreads across as
    many tasks as it has buckets — and phase 2 computes each bucket's
    carry-in over the per-(key, bucket) summary table, which has one
    row per bucket regardless of how many events the bucket holds.
    Results are identical to the plain path (asserted in
    tests/test_round2.py on a 95%-one-key fixture)."""
    # Tag and union. At equal timestamps the right row must sort before
    # the left row for inclusive semantics (after it for exclusive).
    # All right_values travel as ONE struct carried by a single
    # last(ignorenulls=True): the struct is non-null for every right
    # row even when individual value columns are NULL, so the attached
    # values always come from the SAME (latest) right row — per-column
    # carries would backfill a NULL field from an older row.
    r_struct = F.struct(*[F.col(c).alias(c) for c in right_values])
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_lrow"),
        F.lit(None).cast(
            right.select(r_struct.alias("_rv")).schema["_rv"].dataType
        ).alias("_rv"),
    )
    # Right rows with a NULL key or NULL time can never match under
    # SQL semantics (equality and <= both reject NULL), but the
    # union-sort would group NULL keys into their own partition and
    # Spark's NULLS FIRST ordering would carry a NULL-time right row
    # into EVERY later left row (random-instance fuzz, NULL user_id
    # axis — DuckDB's native ASOF JOIN excludes both). Left rows keep
    # left-join semantics: a NULL-key left row's partition then holds
    # no right rows, so its carry is NULL.
    right = right.filter(F.col(on).isNotNull() & F.col(right_time).isNotNull())
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        (F.lit(0) if inclusive else F.lit(2)).alias("_is_left"),
        F.lit(None).cast(l.schema["_lrow"].dataType).alias("_lrow"),
        r_struct.alias("_rv"),
    )
    u = l.unionByName(r)
    if time_bucket is None:
        w = (
            Window.partitionBy("_k")
            .orderBy("_t", "_is_left")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = u.select("*", F.last("_rv", ignorenulls=True).over(w).alias("_carry"))
    else:
        # Phase 1: running carry within (key, bucket) — window sorts are
        # bounded by the bucket's row count, not the key's.
        u = u.withColumn("_b", F.window("_t", time_bucket)["start"])
        wb = (
            Window.partitionBy("_k", "_b")
            .orderBy("_t", "_is_left")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        phase1 = u.select(
            "*", F.last("_rv", ignorenulls=True).over(wb).alias("_bcarry")
        )
        # Phase 2: per-(key, bucket) summary — ONE row per bucket — so
        # the strictly-prior-buckets carry-in window is tiny even for a
        # key with millions of events per bucket.
        summary = phase1.groupBy("_k", "_b").agg(
            F.max_by("_bcarry", F.struct("_t", "_is_left")).alias("_bfinal")
        )
        w_in = (
            Window.partitionBy("_k")
            .orderBy("_b")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry_in = summary.select(
            "_k", "_b", F.last("_bfinal", ignorenulls=True).over(w_in).alias("_cin")
        )
        carried = phase1.join(carry_in, ["_k", "_b"], "left").select(
            phase1["*"], F.coalesce("_bcarry", "_cin").alias("_carry")
        )
    out = (
        carried.filter(F.col("_is_left") == 1)
        .select(
            F.col("_lrow.*"),
            *[F.col(f"_carry.{c}").alias(c) for c in right_values],
        )
    )
    return out


@query(
    "q38_interval_join",
    oracle="""
    SELECT
        c.event_id AS click_id,
        p.event_id AS purchase_id,
        c.user_id,
        CAST(DATEDIFF('second', p.ts, c.ts) AS BIGINT) AS gap_seconds
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts <= c.ts
     AND p.ts > c.ts - INTERVAL 1 HOUR
    """,
    doc="Event-time interval join: every (click, purchase-by-same-user-"
        "within-preceding-hour) pair. This exact shape runs as a "
        "Structured Streaming stream-stream join with watermarks "
        "(streaming.interval_join_stream); the batch oracle checks the "
        "join semantics.",
)
def q38_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return (
        clicks.join(
            purchases,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("purchase_ts") <= F.col("click_ts"))
            & (F.col("purchase_ts") > F.col("click_ts") - F.expr("INTERVAL 1 HOUR")),
        )
        .select(
            "click_id",
            "purchase_id",
            "user_id",
            (F.unix_timestamp("click_ts") - F.unix_timestamp("purchase_ts")).alias("gap_seconds"),
        )
    )


@query(
    "q31_asof_join",
    oracle="""
    SELECT
        l.event_id,
        l.user_id,
        l.ts,
        r.event_id AS purchase_event_id,
        r.ts AS purchase_ts,
        r.value AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
        ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    doc="As-of join: for every click, the user's most recent prior "
        "purchase. Union-sort implementation (one shuffle, no range "
        "probe); DuckDB's native ASOF JOIN is the oracle.",
)
def q31_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "ts",
            F.col("event_id").alias("purchase_event_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    return asof_join(
        clicks,
        purchases,
        on="user_id",
        left_time="ts",
        right_time="ts",
        right_values=["purchase_event_id", "purchase_ts", "purchase_value"],
    )
