"""Structured Streaming tests (SURVEY.md §5 strategy #5): memory-sink
micro-batches for the T1-T5 job shape and the watermark/window/dedup
extended operators. Each query processes the events parquet as a
1-file-per-trigger stream and is compared against its batch twin.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMALL
from fortisiem_clickhouse_monitor_spark.sources.tables import table
from fortisiem_clickhouse_monitor_spark.streaming import jobs, windowed

@pytest.fixture(scope="session")
def events_dir(spark, tmp_path_factory):
    """File-stream source directory: the events table re-written as
    normal (micros) parquet files — the file source needs a directory,
    and the driver fixture is a single nanos-timestamped file."""
    import os
    import time as _time

    out = str(tmp_path_factory.mktemp("events_stream"))
    # Range-partitioned by ts so files CAN arrive in event-time order
    # (the realistic stream); with shuffled arrival the watermark would
    # rightly drop late rows and the batch comparison would not hold.
    (
        table(spark, SF_SMALL, "events")
        .repartitionByRange(4, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(out)
    )
    # The file source orders arrivals by modification time, and the
    # parallel write finishes parts in arbitrary order — which
    # intermittently delivered the LATEST range first, ratcheting the
    # watermark past everything else (observed: batches 2-3 dropping
    # ~100 rows each as late, empty join results). Stamp ascending
    # mtimes in range order (part index == ts range) to make arrival
    # order deterministic.
    parts = sorted(
        f for f in os.listdir(out) if f.startswith("part-") and f.endswith(".parquet")
    )
    base = _time.time() - len(parts) * 10
    for i, f in enumerate(parts):
        os.utime(os.path.join(out, f), (base + i * 10, base + i * 10))
    return out


def _run_stream_to_memory(spark, stream_df, name, mode="append"):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    # processAllAvailable is a deterministic barrier: it blocks until
    # every available input is processed, regardless of machine load —
    # a bare awaitTermination(timeout) returned early under full-suite
    # load and compared a PARTIAL result (flaky).
    q.processAllAvailable()
    q.awaitTermination(120)
    assert not q.isActive
    return spark.sql(f"SELECT * FROM {name}")


@pytest.fixture()
def events_stream(spark, events_dir):
    return jobs.events_stream(spark, events_dir)


def test_streaming_tumbling_matches_batch(spark, events_stream, events_dir):
    # Complete mode: the final window state after replaying the whole
    # stream must equal the batch result exactly (ordered arrival ->
    # nothing is dropped as late).
    got = _run_stream_to_memory(
        spark,
        windowed.streaming_tumbling_query(events_stream),
        "t_tumbling_complete",
        mode="complete",
    )
    batch = windowed.tumbling_counts(table(spark, SF_SMALL, "events"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))

    # Append mode: whatever is emitted must be a FINAL window value
    # (subset of the batch result, never a partial aggregate) — the
    # exactly-once contract; how many trailing windows flush is engine
    # timing, not semantics.
    got_append = _run_stream_to_memory(
        spark,
        windowed.streaming_tumbling_query(jobs.events_stream(spark, events_dir)),
        "t_tumbling_append",
        mode="append",
    )
    append_rows = set(map(tuple, got_append.collect()))
    assert append_rows
    assert append_rows <= set(map(tuple, batch.collect()))


def test_streaming_dedup_bounded(spark, tmp_path_factory):
    """Planted duplicates (every event twice) collapse to one row per
    event_id. Single micro-batch so no row is watermark-late — the test
    isolates dedup state behaviour from arrival timing."""
    ev = table(spark, SF_SMALL, "events")
    dup_dir = str(tmp_path_factory.mktemp("events_dup"))
    ev.unionByName(ev).repartitionByRange(4, "ts").write.mode("overwrite").parquet(
        dup_dir
    )
    stream = jobs.events_stream(spark, dup_dir, max_files_per_trigger=8)
    out = _run_stream_to_memory(
        spark, windowed.streaming_dedup(stream), "t_dedup"
    )
    assert out.count() == ev.select("event_id").distinct().count()


def test_monitoring_job_leader_gate_and_frames(spark, events_dir):
    """T1/T2/T3/T5: frames arrive once per trigger, only when leader."""
    collected: list[str] = []
    leader = {"v": True}
    # Reference ticks are stateless snapshots (chStats.py:544): project +
    # frame + fan out, no streaming state.
    snapshot = jobs.events_stream(spark, events_dir).select(
        "event_id", "event_type", "value"
    )

    def run_once() -> None:
        q = jobs.monitoring_job(
            snapshot,
            "EVENT_SNAPSHOT",
            collected.extend,
            is_leader=lambda: leader["v"],
            interval_seconds=1,  # reference cadence is 180s; 1s for test
        )
        # monitoring_job uses a processingTime trigger (T1); for the test
        # we wait for the first tick then stop.
        deadline = time.time() + 120
        while not q.recentProgress and time.time() < deadline:
            time.sleep(0.5)
        q.processAllAvailable()
        q.stop()

    run_once()
    assert collected, "leader tick should emit frames"
    assert all(f.startswith("PH_SYSTEM_EVENT_SNAPSHOT={") for f in collected)

    collected.clear()
    leader["v"] = False
    run_once()
    assert collected == [], "non-leader tick must emit nothing"


def test_refreshing_config_caches_and_expires():
    now = {"t": 0.0}
    loads = {"n": 0}

    def loader():
        loads["n"] += 1
        return f"dim-v{loads['n']}"

    cfg = jobs.RefreshingConfig(loader, period_seconds=1800, clock=lambda: now["t"])
    assert cfg.current() == "dim-v1"
    now["t"] = 600.0
    assert cfg.current() == "dim-v1"  # inside period: cached
    now["t"] = 1900.0
    assert cfg.current() == "dim-v2"  # expired: re-read
    cfg.force_refresh()               # SIGHUP analog
    assert cfg.current() == "dim-v3"
    assert loads["n"] == 3


def test_session_window_batch_properties(spark):
    out = windowed.session_windows(table(spark, SF_SMALL, "events")).collect()
    assert out
    for r in out:
        assert r["session_end"] > r["session_start"]
        assert r["n_events"] >= 1


def test_streaming_attribution_join_matches_batch(spark, events_dir):
    """Stream-stream interval join: replaying the whole (event-time
    ordered) stream must reproduce the batch interval join exactly —
    inner-join results are emitted as soon as both sides match, and
    ordered arrival means no click/purchase is watermark-late."""
    clicks = jobs.events_stream(spark, events_dir).filter(
        F.col("event_type") == "click"
    )
    purchases = jobs.events_stream(spark, events_dir).filter(
        F.col("event_type") == "purchase"
    )
    got = _run_stream_to_memory(
        spark,
        windowed.streaming_attribution_join(clicks, purchases),
        "t_attrib",
    )
    ev = table(spark, SF_SMALL, "events")
    batch = windowed.attribution_pairs(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))


def test_upsert_sink_idempotent_and_last_writer_wins(spark, tmp_path_factory):
    """Keyed upsert: re-delivering a batch must not duplicate state, and
    a later batch's row replaces the earlier row with the same key."""
    import os

    target = str(tmp_path_factory.mktemp("upsert"))
    sink = jobs.upsert_sink(spark, target, ["user_id"])

    b0 = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "user_id LONG, tag STRING, v DOUBLE"
    )
    b1 = spark.createDataFrame(
        [(2, "b2", 20.0), (3, "c", 3.0)], "user_id LONG, tag STRING, v DOUBLE"
    )
    sink(b0, 0)
    sink(b1, 1)
    sink(b1, 1)  # replay after simulated recovery

    got = {
        r["user_id"]: (r["tag"], r["v"])
        for r in spark.read.parquet(os.path.join(target, "data")).collect()
    }
    assert got == {1: ("a", 1.0), 2: ("b2", 20.0), 3: ("c", 3.0)}


def test_upsert_sink_from_streaming_query(spark, events_dir, tmp_path_factory):
    """Wired into a real StreamingQuery: per-user latest event value via
    foreachBatch upsert equals the batch groupBy-argmax."""
    target = str(tmp_path_factory.mktemp("upsert_stream"))
    stream = jobs.events_stream(spark, events_dir)
    latest = stream.select("user_id", "ts", "value")
    q = (
        latest.writeStream.foreachBatch(
            lambda df, bid: jobs.upsert_sink(spark, target, ["user_id"])(
                df.orderBy("ts")
                .groupBy("user_id")
                .agg(F.last("value").alias("value")),
                bid,
            )
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", target + "/_chk")
        .start()
    )
    q.awaitTermination(120)
    import os

    got = spark.read.parquet(os.path.join(target, "data"))
    assert got.count() == got.select("user_id").distinct().count()
    assert got.count() > 0


@pytest.mark.perf
def test_concurrent_daemon_cadence_headroom(spark):
    """VERDICT r3 #6 / BASELINE streaming bar: all five reference-
    cadence jobs running CONCURRENTLY against sf0.1 must finish each
    tick far inside the tightest reference trigger interval (180 s,
    chStats.py:667-673).  Each job's per-tick latency is measured as
    the foreachBatch wall time of recomputing + framing its mode's
    snapshot (exactly what run_daemon does per tick); asserted at
    <= 10% of the 180 s cadence budget with all five ticking at once."""
    from fortisiem_clickhouse_monitor_spark.__main__ import MODES
    from fortisiem_clickhouse_monitor_spark import registry

    sf01 = "/root/testdata/sf0.1"
    tick_secs: dict[str, list[float]] = {m: [] for m in MODES}
    queries = []
    try:
        for mode, (qname, ptype) in MODES.items():
            snapshot = registry.queries()[qname](spark, sf01)
            beat = (
                spark.readStream.format("rate")
                .option("rowsPerSecond", 1)
                .load()
            )

            def emit(batch_df, batch_id, _df=snapshot, _pt=ptype, _m=mode):
                t0 = time.time()
                rows = jobs.frame_syslog(_df, _pt).collect()
                assert rows and all(
                    r["frame"].startswith(f"PH_SYSTEM_{_pt}=") for r in rows
                )
                tick_secs[_m].append(time.time() - t0)

            q = (
                beat.writeStream.outputMode("append")
                .foreachBatch(emit)
                .trigger(processingTime="2 seconds")
                .queryName(f"cadence_{mode}")
                .start()
            )
            queries.append(q)

        deadline = time.time() + 240
        while time.time() < deadline and not all(
            len(v) >= 2 for v in tick_secs.values()
        ):
            time.sleep(0.5)
    finally:
        for q in queries:
            q.stop()

    budget = jobs.JOB_INTERVALS["data_health"]  # 180 s, the tightest
    assert all(len(v) >= 2 for v in tick_secs.values()), tick_secs
    if os.environ.get("SPARK_GRAFT_SKIP_PERF"):
        pytest.skip("SPARK_GRAFT_SKIP_PERF set: latency bound not asserted "
                    "(functional frame checks above already ran)")
    worst = {m: max(v) for m, v in tick_secs.items()}
    print(f"concurrent per-tick latencies (s): "
          f"{ {m: [round(x, 2) for x in v] for m, v in tick_secs.items()} }")
    for mode, w in worst.items():
        assert w <= budget * 0.10, (
            f"{mode}: worst tick {w:.2f}s exceeds 10% of the {budget}s "
            f"reference cadence while running concurrently"
        )


def test_streaming_burn_rate_matches_batch(spark, events_stream, events_dir):
    """Complete-mode replay of the sliding burn-rate monitor equals the
    batch twin exactly; append-mode emissions are final window values
    (subset, never partial)."""
    got = _run_stream_to_memory(
        spark,
        windowed.streaming_burn_query(events_stream),
        "t_burn_complete",
        mode="complete",
    )
    batch = windowed.burn_rate_windows(table(spark, SF_SMALL, "events"))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, batch.collect())
    )

    got_append = _run_stream_to_memory(
        spark,
        windowed.streaming_burn_query(jobs.events_stream(spark, events_dir)),
        "t_burn_append",
        mode="append",
    )
    append_rows = set(map(tuple, got_append.collect()))
    assert append_rows
    assert append_rows <= set(map(tuple, batch.collect()))


def test_streaming_left_outer_attribution_matches_batch(
    spark, tmp_path_factory
):
    """Stream-stream LEFT-OUTER interval join differential: matched
    rows emit on match; an unmatched click's null-purchase row emits
    only once the watermark proves no purchase can follow
    (wm > click_ts + 30 min).  Far-future sentinel click+purchase
    waves (user_id = -1, excluded from comparison) advance the
    watermark past every real click's horizon and give the state store
    batches in which to evict — after which the replay must equal the
    batch twin row-for-row, nulls included."""
    import datetime as dtm

    # ONE ts-sorted file for the real data (copying events_dir's parts
    # loses their mtime ordering — shutil.copy stamps "now" on all of
    # them, so arrival order goes arbitrary and the watermark can
    # outrun unread earlier files under load): a single file means one
    # data batch, then the sentinel files advance the watermark.
    out = str(tmp_path_factory.mktemp("outer_attrib_events"))
    ev = table(spark, SF_SMALL, "events")
    ev.coalesce(1).sortWithinPartitions("ts").write.mode(
        "overwrite"
    ).parquet(out)
    mx = ev.agg(F.max("ts")).collect()[0][0]
    for i, days in enumerate((2, 4)):
        wave = spark.createDataFrame(
            [
                (-7000 - 2 * i, mx + dtm.timedelta(days=days), -1,
                 "click", 0.0, "{}"),
                (-7001 - 2 * i, mx + dtm.timedelta(days=days), -1,
                 "purchase", 0.0, "{}"),
            ],
            schema=jobs.EVENTS_SCHEMA,
        )
        time.sleep(1.1)  # distinct mtime: sentinels arrive LAST, in order
        wave.coalesce(1).write.mode("append").parquet(out)

    clicks = jobs.events_stream(spark, out).filter(
        F.col("event_type") == "click"
    )
    purchases = jobs.events_stream(spark, out).filter(
        F.col("event_type") == "purchase"
    )
    got = _run_stream_to_memory(
        spark,
        windowed.streaming_attribution_outcomes(clicks, purchases),
        "t_attrib_outer",
    )
    got_rows = sorted(
        map(tuple, got.filter(F.col("user_id") >= 0).collect())
    )
    batch = windowed.attribution_outcomes(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )
    batch_rows = sorted(map(tuple, batch.collect()))
    assert got_rows == batch_rows
    # the outer-ness must be exercised: real unmatched clicks exist
    assert any(r[2] is None for r in batch_rows)


def test_streaming_windowed_topk_matches_batch(spark, events_stream):
    """Two-stage streaming top-k: the stateful windowed counts replay
    in complete mode, then rank_topk (the state-free post-pass) must
    reproduce the batch stream_windowed_topk exactly — including rank
    ties broken by event_type."""
    counts = _run_stream_to_memory(
        spark,
        windowed.streaming_tumbling_query(events_stream),
        "t_topk_counts",
        mode="complete",
    )
    got = windowed.rank_topk(
        counts.select("window_start", "window_end", "event_type", "n")
    )
    batch = windowed.rank_topk(
        windowed.tumbling_counts(table(spark, SF_SMALL, "events")).select(
            "window_start", "window_end", "event_type", "n"
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_streaming_hll_registers_match_batch(spark, events_stream):
    """Replaying the whole stream through the streaming HLL register
    aggregation (complete mode) must yield EXACTLY the batch register
    table — max-merge is order-insensitive, so arrival order cannot
    perturb a single register."""
    from fortisiem_clickhouse_monitor_spark.functions import hll

    got = _run_stream_to_memory(
        spark,
        windowed.streaming_hll_daily_registers(events_stream),
        "t_hll_regs",
        mode="complete",
    )
    ev = table(spark, SF_SMALL, "events")
    h = hll.hash_col(F.col("user_id"))
    batch = (
        ev.select(F.to_date("ts").alias("day"), h.alias("h"))
        .select("day", hll.bucket_of(F.col("h")), hll.rho_of(F.col("h")))
        .groupBy("day", "bucket")
        .agg(F.max("rho").alias("m_rho"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_streaming_ohlc_matches_batch(spark, events_stream):
    """Complete-mode replay of the min_by/max_by OHLC candles equals
    the batch twin exactly — including open/close, which exercise
    ordered-argmin STATE rather than plain monotone max; and the
    candle definition equals timeseries_daily_ohlc's row-number form
    (two plans, one definition)."""
    got = _run_stream_to_memory(
        spark,
        windowed.streaming_ohlc_query(events_stream),
        "t_ohlc_complete",
        mode="complete",
    )
    batch = windowed.daily_ohlc_candles(table(spark, SF_SMALL, "events"))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, batch.collect())
    )

    from fortisiem_clickhouse_monitor_spark.operators import advanced as adv

    rn_form = {
        (r["event_type"], r["day_num"]): (
            r["n"], r["open"], r["high"], r["low"], r["close"]
        )
        for r in adv.timeseries_daily_ohlc(spark, SF_SMALL).collect()
    }
    window_form = {
        (
            r["event_type"],
            int(r["window_start"].timestamp()) // 86400,
        ): (r["n"], r["open"], r["high"], r["low"], r["close"])
        for r in batch.collect()
    }
    assert rn_form == window_form


def test_streaming_daily_values_feed_sma_crossover(spark, events_stream, events_dir):
    """The daily value totals computed as a streaming windowed
    aggregation equal the batch daily rollup row-for-row, and feeding
    them through the shared crossover post-pass reproduces the
    registered trend_sma_crossover_signals output exactly — two plans,
    one signal definition."""
    from fortisiem_clickhouse_monitor_spark.operators import behavior as bh
    from pyspark.sql import functions as F

    got = _run_stream_to_memory(
        spark,
        windowed.streaming_daily_value_query(events_stream),
        "daily_values_sma",
        mode="complete",
    )
    batch_ev = spark.read.parquet(events_dir)
    batch_daily = batch_ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.round(F.col("value") * 1000000).cast("long"))
        .cast("long")
        .alias("v_micro")
    )
    s_rows = sorted((str(r["day"]), r["v_micro"]) for r in got.collect())
    b_rows = sorted((str(r["day"]), r["v_micro"]) for r in batch_daily.collect())
    assert s_rows == b_rows
    post = bh.sma_crossover_from_daily(got.select("day", "v_micro"))
    want = bh.sma_crossover_from_daily(batch_daily)
    key = lambda r: str(r["day"])  # noqa: E731
    assert sorted(map(tuple, post.collect()), key=lambda t: str(t[0])) == sorted(
        map(tuple, want.collect()), key=lambda t: str(t[0])
    )
