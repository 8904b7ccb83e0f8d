"""Event-time windowed operators (SURVEY.md §2.10 extension): tumbling,
sliding, and session windows + watermarked streaming dedup.

Each operator is ONE set of column expressions used two ways:
- batch: registered as an oracle-checked query (DuckDB twin uses
  time_bucket / gaps-and-islands SQL) — this is the correctness gate;
- streaming: the same expressions over a readStream frame with
  `withWatermark`, exercised by tests/test_streaming.py through the
  memory sink.

State-at-scale notes: windowed aggregations keep one state row per
(key, window); the watermark bounds state size and late data. Session
windows merge state; dropDuplicates keeps one key per event inside the
watermark horizon — all built-in Structured Streaming state stores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import table

_DUCK_TS = "CAST(ts AS TIMESTAMP)"


def tumbling_counts(ev: DataFrame) -> DataFrame:
    w = F.window("ts", "10 minutes")
    return (
        ev.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


@register(
    "stream_tumbling_counts",
    oracle=f"""
    SELECT time_bucket(INTERVAL '10 minutes', {_DUCK_TS}) AS window_start,
           time_bucket(INTERVAL '10 minutes', {_DUCK_TS})
             + INTERVAL '10 minutes' AS window_end,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
    tags=("T", "W"),
)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute event-time windows (batch form of the
    streaming aggregation; identical expressions run under a watermark
    in streaming_tumbling_query)."""
    return tumbling_counts(table(spark, sf_dir, "events"))


def sliding_counts(ev: DataFrame) -> DataFrame:
    w = F.window("ts", "10 minutes", "5 minutes")
    return (
        ev.groupBy(w.alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n",
        )
    )


@register(
    "stream_sliding_counts",
    oracle=f"""
    WITH assigned AS (
      SELECT time_bucket(INTERVAL '5 minutes', {_DUCK_TS}) AS window_start
      FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '5 minutes', {_DUCK_TS})
             - INTERVAL '5 minutes' AS window_start
      FROM events
    )
    SELECT window_start,
           window_start + INTERVAL '10 minutes' AS window_end,
           count(*) AS n
    FROM assigned
    GROUP BY 1, 2
    """,
    tags=("T", "W"),
)
def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (10 min length, 5 min slide): every event lands in
    exactly two windows; the oracle materializes that assignment with a
    two-branch union on 5-minute buckets."""
    return sliding_counts(table(spark, sf_dir, "events"))


#: matches operators/slo.py's _SLO_BUDGET_PCT (1% error budget); kept
#: literal here so the streaming module has no operator-package import.
_BURN_BUDGET_PCT = 1


def burn_rate_windows(ev: DataFrame) -> DataFrame:
    """Sliding error-budget burn (1 h window, 10 min slide): the
    streaming twin of slo_burn_rate_multiwindow's SHORT window — each
    emitted window carries its error fraction as a multiple of the
    {_BURN_BUDGET_PCT}% budget and an exact integer-cross-multiplied
    ``burning`` flag.  On a stream this is the continuously-evaluated
    form of the batch alert: one state row per open window, watermark-
    bounded."""
    w = F.window("ts", "1 hour", "10 minutes")
    errors = F.sum(
        F.when(F.col("event_type") == "error", 1).otherwise(0)
    ).cast("long")
    return (
        ev.groupBy(w.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("total"),
            errors.alias("errors"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "errors",
            "total",
            F.round(
                F.col("errors") * 100.0 / F.col("total") / _BURN_BUDGET_PCT,
                4,
            ).alias("burn"),
            (F.col("errors") * 100 > F.col("total") * _BURN_BUDGET_PCT).alias(
                "burning"
            ),
        )
    )


@register(
    "stream_burn_rate_windows",
    oracle=f"""
    WITH assigned AS (
      SELECT event_type,
             time_bucket(INTERVAL '10 minutes', {_DUCK_TS})
               - t.k * INTERVAL '10 minutes' AS window_start
      FROM events, range(0, 6) t(k)
    )
    SELECT window_start,
           window_start + INTERVAL '1 hour' AS window_end,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                AS BIGINT) AS errors,
           CAST(count(*) AS BIGINT) AS total,
           round(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                 * 100.0 / count(*) / {_BURN_BUDGET_PCT}, 4) AS burn,
           sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) * 100
             > count(*) * {_BURN_BUDGET_PCT} AS burning
    FROM assigned GROUP BY 1, 2
    """,
    tags=("T", "W", "SLO"),
)
def stream_burn_rate_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the sliding burn-rate monitor (1 h / 10 min slide:
    every event lands in exactly six windows — the oracle materializes
    that assignment with a range(0,6) bucket shift, the same trick as
    stream_sliding_counts)."""
    return burn_rate_windows(table(spark, sf_dir, "events"))


def streaming_burn_query(
    stream: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    return burn_rate_windows(stream.withWatermark("ts", watermark))


def session_windows(ev: DataFrame, gap: str = "30 minutes") -> DataFrame:
    w = F.session_window("ts", gap)
    return (
        ev.groupBy(w.alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


@register(
    "stream_session_windows",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, {_DUCK_TS} AS ts,
             CASE WHEN {_DUCK_TS} - lag({_DUCK_TS}) OVER
                    (PARTITION BY user_id ORDER BY {_DUCK_TS}, event_id)
                  > INTERVAL '30 minutes' OR
                  lag({_DUCK_TS}) OVER
                    (PARTITION BY user_id ORDER BY {_DUCK_TS}, event_id)
                  IS NULL
             THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM ordered
    )
    SELECT min(ts) AS session_start,
           max(ts) + INTERVAL '30 minutes' AS session_end,
           user_id,
           count(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    """,
    tags=("T", "W"),
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute inactivity gap. The oracle is the
    classic gaps-and-islands formulation; Spark's session_window merges
    the same islands (end = last event + gap) natively — and in
    streaming, with mergeable state under a watermark."""
    return session_windows(table(spark, sf_dir, "events"))


def attribution_pairs(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """Interval join: each purchase paired with every click by the same
    user in the preceding 30 minutes (strictly earlier).  Lag is exact
    integer microseconds so the oracle comparison is precision-safe."""
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES"))
    )
    return c.join(p, cond).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("lag_us"),
    )


@register(
    "stream_attribution_pairs",
    oracle=f"""
    SELECT c.user_id AS user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(c.ts AS TIMESTAMP))
             AS lag_us
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND {_DUCK_TS.replace('ts', 'p.ts')} > {_DUCK_TS.replace('ts', 'c.ts')}
     AND {_DUCK_TS.replace('ts', 'p.ts')} <=
         {_DUCK_TS.replace('ts', 'c.ts')} + INTERVAL '30 minutes'
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
    tags=("T", "J-ext"),
)
def stream_attribution_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream interval join: purchases
    attributed to same-user clicks within the prior 30 minutes.  Both
    sides come from one scan (the filters split it), the equi-key makes
    this a hash join on user_id with the time bounds as residual
    conditions — the same shape Structured Streaming uses for its
    symmetric-hash stream-stream join, where the 30-minute bound plus
    watermark gives provably bounded state."""
    ev = table(spark, sf_dir, "events")
    return attribution_pairs(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )


def streaming_attribution_join(
    clicks: DataFrame, purchases: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Stream-stream inner join with watermarks on BOTH sides: the join
    condition's 30-minute bound + the watermark let the state store
    evict clicks older than (watermark + interval) and purchases older
    than the watermark — without them the symmetric hash state grows
    forever."""
    return attribution_pairs(
        clicks.withWatermark("ts", watermark),
        purchases.withWatermark("ts", watermark),
    )


# ---------------------------------------------------------------------------
# Streaming-only forms (used by tests/test_streaming.py)
# ---------------------------------------------------------------------------


def streaming_tumbling_query(stream: DataFrame, watermark: str = "10 minutes"):
    """Watermarked streaming twin of stream_tumbling_counts; append mode
    requires the watermark so windows can finalize."""
    return tumbling_counts(stream.withWatermark("ts", watermark))


def streaming_dedup(stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup on event_id within the watermark horizon —
    bounded state (SURVEY §2.10: `dropDuplicates` + watermark)."""
    return stream.withWatermark("ts", watermark).dropDuplicates(["event_id"])


# ---------------------------------------------------------------------------
# Left-outer attribution: every click, matched or provably unmatched
# ---------------------------------------------------------------------------


def attribution_outcomes(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """LEFT-OUTER interval join: every click with each same-user
    purchase in the following 30 minutes, or ONE null-purchase row when
    no purchase follows — the conversion/no-conversion outcome feed
    (the inner join above cannot distinguish 'not converted' from 'not
    yet joined')."""
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES"))
    )
    return c.join(p, cond, "left_outer").select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("lag_us"),
    )


@register(
    "stream_click_attribution_outcomes",
    oracle=f"""
    SELECT c.user_id AS user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(c.ts AS TIMESTAMP))
             AS lag_us
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND {_DUCK_TS.replace('ts', 'p.ts')} > {_DUCK_TS.replace('ts', 'c.ts')}
     AND {_DUCK_TS.replace('ts', 'p.ts')} <=
         {_DUCK_TS.replace('ts', 'c.ts')} + INTERVAL '30 minutes'
    """,
    tags=("T", "J-ext"),
)
def stream_click_attribution_outcomes(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Batch twin of the stream-stream LEFT-OUTER interval join: every
    click paired with its following-30-min same-user purchases, plus a
    null-purchase row for clicks that never converted.  The outer side
    is what makes this a STREAMING-hard operator: an unmatched click is
    only provably unmatched once the purchase-side watermark passes
    (click_ts + 30 min), at which point Structured Streaming emits the
    null row and evicts the state — the batch twin states the target
    those delayed emissions must converge to, and the differential
    test (tests/test_streaming.py) replays this exact equivalence.

    Plan shape (batch): one scan split by two filters, hash join on
    user_id with the time bounds residual — identical to the inner
    form; the outer-ness adds only null-padding, no extra exchange."""
    ev = table(spark, sf_dir, "events")
    return attribution_outcomes(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )


def streaming_attribution_outcomes(
    clicks: DataFrame, purchases: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Stream-stream LEFT-OUTER join with watermarks on both sides.
    The event-time bound in the condition is REQUIRED for outer
    stream-stream joins (Spark rejects the plan without it): it is
    what lets the engine prove a click unmatched at
    watermark > click_ts + 30 min and emit the null row with bounded
    state."""
    return attribution_outcomes(
        clicks.withWatermark("ts", watermark),
        purchases.withWatermark("ts", watermark),
    )


# ---------------------------------------------------------------------------
# Windowed top-k: rank event types within each closed tumbling window
# ---------------------------------------------------------------------------

_TOPK_PER_WINDOW = 2


def rank_topk(counts: DataFrame, k: int = _TOPK_PER_WINDOW) -> DataFrame:
    """Top-k event types per window from a (window, type, n) counts
    frame — the POST-PASS half of streaming windowed top-k.  Ranking
    is not an incremental-state operator: once the watermark closes a
    window its counts are final, so the rank is a per-window batch
    computation over the (tiny) closed-window aggregate, never over
    events.  In streaming this runs on the sink side (foreachBatch or
    the downstream table); in batch it composes directly."""
    from pyspark.sql import Window

    w = Window.partitionBy("window_start").orderBy(
        F.desc("n"), F.asc("event_type")
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select(
            "window_start", "window_end", "event_type", "n", "rnk"
        )
    )


@register(
    "stream_windowed_topk",
    oracle=f"""
    WITH counts AS (
      SELECT time_bucket(INTERVAL '10 minutes', {_DUCK_TS}) AS window_start,
             time_bucket(INTERVAL '10 minutes', {_DUCK_TS})
               + INTERVAL '10 minutes' AS window_end,
             event_type, count(*) AS n
      FROM events GROUP BY 1, 2, 3
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY window_start
                                   ORDER BY n DESC, event_type) AS rnk
      FROM counts
    )
    SELECT window_start, window_end, event_type, n,
           CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= {_TOPK_PER_WINDOW}
    """,
    tags=("T", "W"),
)
def stream_windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_TOPK_PER_WINDOW} event types per tumbling 10-minute
    window — the trending-now panel.  Batch form of the two-stage
    streaming shape: the STATEFUL stage is exactly
    stream_tumbling_counts' windowed aggregation (one state row per
    (window, type), watermark-bounded); the RANKING stage is
    rank_topk over closed windows, state-free by construction.  The
    exchange for the rank is on window_start over the aggregate frame
    — types x windows rows, metadata-sized next to the fact table at
    any scale."""
    counts = tumbling_counts(table(spark, sf_dir, "events")).select(
        "window_start", "window_end", "event_type", "n"
    )
    return rank_topk(counts)


# ---------------------------------------------------------------------------
# Streaming HLL: daily distinct-user registers as a streaming aggregation
# ---------------------------------------------------------------------------


def streaming_hll_daily_registers(stream: DataFrame) -> DataFrame:
    """Daily HyperLogLog registers as a STREAMING aggregation: the
    bucket-wise max is an algebraic aggregate, so the state store
    holds exactly the register table (days x 512 rows x one int) —
    the streaming form of the batch sketch family
    (sketch_monthly_users_from_daily and friends share the register
    spec, functions/hll.py).  Run in complete/update mode: a register
    only ever ratchets upward, so updates are monotone and the final
    state after replay equals the batch registers row-for-row (the
    differential test's claim).  This is THE scale pattern for
    streaming distinct counts: state is O(m) per day regardless of
    user cardinality, and the same registers downstream-merge into
    weekly/monthly estimates without touching events again."""
    from ..functions import hll

    h = hll.hash_col(F.col("user_id"))
    return (
        stream.select(F.to_date("ts").alias("day"), h.alias("h"))
        .select("day", hll.bucket_of(F.col("h")), hll.rho_of(F.col("h")))
        .groupBy("day", "bucket")
        .agg(F.max("rho").alias("m_rho"))
    )


# ---------------------------------------------------------------------------
# Streaming daily OHLC candles (min_by / max_by state)
# ---------------------------------------------------------------------------


def daily_ohlc_candles(ev: DataFrame) -> DataFrame:
    """Daily OHLC per event type as a WINDOWED AGGREGATION: open/close
    are min_by/max_by over the total (ts, event_id) order — declarative
    aggregates, so on a stream the state per open candle is exactly
    five numbers and an ordering key (no row buffer, no sort), and on
    a batch frame the same expression is one hash aggregate.  This is
    the downsampling shape every metrics pipeline runs continuously;
    the batch twin timeseries_daily_ohlc computes the identical candle
    via row-number windows — two plans, one definition."""
    w = F.window("ts", "1 day")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "open",
            "high",
            "low",
            "close",
        )
    )


@register(
    "stream_daily_ohlc",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 day', {_DUCK_TS}) AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           arg_min(value, epoch_us({_DUCK_TS})::HUGEINT * 1000000000000
                          + event_id) AS open,
           max(value) AS high,
           min(value) AS low,
           arg_max(value, epoch_us({_DUCK_TS})::HUGEINT * 1000000000000
                          + event_id) AS close
    FROM events GROUP BY 1, 2
    """,
    tags=("T", "TS"),
)
def stream_daily_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming OHLC candles.  The oracle's argmin
    key is epoch_us * 1e12 + event_id — order-equivalent to the
    struct (ts, event_id) key (event ids are far below 1e12), because
    DuckDB's arg_min takes scalar keys only."""
    return daily_ohlc_candles(table(spark, sf_dir, "events"))


def streaming_ohlc_query(
    stream: DataFrame, watermark: str = "1 day"
) -> DataFrame:
    return daily_ohlc_candles(stream.withWatermark("ts", watermark))


# ---------------------------------------------------------------------------
# Streaming daily value totals (SMA-crossover feeder)
# ---------------------------------------------------------------------------


def daily_value_totals(ev: DataFrame) -> DataFrame:
    """Daily micro-unit value totals as a WINDOWED streaming
    aggregation: state per open day is exactly one BIGINT (the running
    sum of fixed-point values), the cheapest possible feeder for the
    SMA-crossover post-pass
    (operators/behavior.py:sma_crossover_from_daily, shared with the
    batch query trend_sma_crossover_signals — two plans, one signal
    definition, same discipline as the OHLC candles above).  The
    crossover itself needs cross-day ordering, so it runs as a batch
    post-pass over the closed |days|-row window frame each trigger —
    the streaming stage only maintains the rollup that makes that
    post-pass fact-free."""
    w = F.window("ts", "1 day")
    return (
        ev.groupBy(w.alias("w"))
        .agg(
            F.sum(F.round(F.col("value") * 1000000).cast("long"))
            .cast("long")
            .alias("v_micro")
        )
        .select(F.col("w.start").cast("date").alias("day"), "v_micro")
    )


def streaming_daily_value_query(
    stream: DataFrame, watermark: str = "1 day"
) -> DataFrame:
    return daily_value_totals(stream.withWatermark("ts", watermark))
