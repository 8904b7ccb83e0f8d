"""Window functions (SURVEY.md §2.5). Absent from the reference — its
nearest analogs are the first-match break at chStats.py:60 and the
precomputed `*_oldest_time` columns (chStats.py:99-103) — so this module
supplies the standard battery the extended engine needs, all built-in
``pyspark.sql.Window``.

Scale: each window here partitions by a high-cardinality key (user_id),
so state per partition is small and the sort inside each partition is
bounded; one shuffle on the partition key, no global sort anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import table


@register(
    "window_topn_per_group",
    oracle="""
    SELECT event_id, user_id, value, rn
    FROM (
      SELECT event_id, user_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id ASC) AS rn
      FROM events
    ) WHERE rn <= 3
    """,
    tags=("W", "O2"),
)
def window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 events per user. row_number with a unique tiebreak
    (event_id) keeps the result deterministic under parallel execution."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.select("event_id", "user_id", "value", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_first_match",
    oracle="""
    SELECT user_id, event_id AS first_event_id, event_type AS first_type
    FROM (
      SELECT user_id, event_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts ASC, event_id ASC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    tags=("W", "J2"),
)
def window_first_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First row per key — the deterministic form of the reference's
    first-match break (chStats.py:58-60)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return (
        ev.select(
            "user_id",
            F.col("event_id").alias("first_event_id"),
            F.col("event_type").alias("first_type"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "window_lag_delta",
    oracle="""
    SELECT event_id, user_id,
           round(value - lag(value) OVER (PARTITION BY user_id
                                          ORDER BY ts ASC, event_id ASC), 2)
             AS value_delta
    FROM events
    """,
    tags=("W",),
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag(): per-user delta between consecutive events (NULL for the
    first event of each user)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 2).alias("value_delta"),
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id
                                  ORDER BY ts ASC, event_id ASC
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW), 2) AS running_value
    FROM events
    """,
    tags=("W",),
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum with an explicit ROWS frame. ROWS (not the default
    RANGE) so ties cannot merge frames — deterministic and cheaper (no
    peer-group scan)."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("running_value"),
    )


@register(
    "window_rank_dense",
    oracle="""
    SELECT event_id, event_type, value,
           rank()       OVER (PARTITION BY event_type ORDER BY value DESC) AS r,
           dense_rank() OVER (PARTITION BY event_type ORDER BY value DESC) AS dr
    FROM events
    """,
    tags=("W",),
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank over a non-unique ordering — values tie, but both
    functions are order-insensitive within peer groups so the rowset is
    deterministic."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("value"))
    return ev.select(
        "event_id",
        "event_type",
        "value",
        F.rank().over(w).alias("r"),
        F.dense_rank().over(w).alias("dr"),
    )


@register(
    "window_minmax_derive",
    oracle="""
    SELECT event_id, user_id,
           min(ts) OVER (PARTITION BY user_id) AS first_seen,
           max(ts) OVER (PARTITION BY user_id) AS last_seen
    FROM events
    """,
    tags=("W",),
)
def window_minmax_derive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max over an unordered partition — deriving
    `queue_oldest_time`-style columns instead of reading them precomputed
    (SURVEY §2.5)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    return ev.select(
        "event_id",
        "user_id",
        F.min("ts").over(w).alias("first_seen"),
        F.max("ts").over(w).alias("last_seen"),
    )


# ---------------------------------------------------------------------------
# Cumulative distinct users (growth accounting without running distinct)
# ---------------------------------------------------------------------------


@register(
    "window_cumulative_distinct_users",
    oracle="""
    WITH daily AS (
      SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_active_users
      FROM events GROUP BY 1
    ),
    firsts AS (
      SELECT user_id, min(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS day
      FROM events GROUP BY user_id
    ),
    news AS (
      SELECT day, CAST(count(*) AS BIGINT) AS n_new_users
      FROM firsts GROUP BY day
    )
    SELECT d.day, d.n_events, d.n_active_users,
           coalesce(n.n_new_users, 0) AS n_new_users,
           CAST(sum(coalesce(n.n_new_users, 0)) OVER (ORDER BY d.day
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
    FROM daily d LEFT JOIN news n ON n.day = d.day
    """,
    tags=("W", "MONITOR"),
)
def window_cumulative_distinct_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Daily growth accounting: events, active users, NEW users (first
    ever seen that day), and the cumulative distinct-user count — the
    growth chart every monitoring consumer draws.

    The key move for scale: cumulative COUNT(DISTINCT) is NOT computed
    as a running distinct over an ever-growing window (state linear in
    history); it's the running SUM of per-day first-seen counts, since
    a user increments the cumulative curve exactly once — at their min
    day.  That reduces the query to two user/day-keyed aggregates plus
    a running sum over the #days-sized daily frame (aggregate-sized,
    safely single-partition) — same decomposition as
    sketch_monthly_users_from_daily's exact twin."""
    ev = table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    daily = ev.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_active_users"),
    )
    news = (
        ev.groupBy("user_id")
        .agg(F.min("day").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_new_users"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily.join(news, "day", "left")
        .withColumn("n_new_users", F.coalesce("n_new_users", F.lit(0)))
        .select(
            "day",
            "n_events",
            "n_active_users",
            "n_new_users",
            F.sum("n_new_users").over(w).cast("long").alias("cum_users"),
        )
    )
