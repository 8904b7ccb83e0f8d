"""Differential test for the applyInPandasWithState sessionizer: its
closed sessions must equal the built-in session_window batch
aggregation over the same data.

Watermark mechanics: two sentinel events (user_id = -1) far in the
future are appended as separate files; replaying file-per-trigger, the
first sentinel batch advances the watermark past every real session's
(last + gap) timeout, and the second gives the state store a batch in
which to fire those timeouts. Sentinel rows are excluded from the
comparison (their own session never closes).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMALL
from fortisiem_clickhouse_monitor_spark.sources.tables import table
from fortisiem_clickhouse_monitor_spark.streaming import jobs, stateful


@pytest.fixture(scope="module")
def sessions_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("stateful_stream"))
    ev = table(spark, SF_SMALL, "events")
    # ONE file for the real data: multi-file writes share a modification
    # time, so the file source's arrival order (mod-time) is arbitrary
    # and the watermark could outrun not-yet-read earlier files.
    ev.coalesce(1).sortWithinPartitions("ts").write.mode("overwrite").parquet(out)
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    for i, days in enumerate((1, 2)):
        sentinel = spark.createDataFrame(
            [
                (
                    -1000 - i,
                    max_ts + dt.timedelta(days=days),
                    -1,
                    "sentinel",
                    0.0,
                    "{}",
                )
            ],
            schema=jobs.EVENTS_SCHEMA,
        )
        sentinel.coalesce(1).write.mode("append").parquet(out)
    return out


def test_stateful_sessionizer_matches_batch_session_window(spark, sessions_dir):
    stream = jobs.events_stream(spark, sessions_dir, max_files_per_trigger=1)
    q = (
        stateful.sessionize(stream)
        .writeStream.format("memory")
        .queryName("t_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["session_start"], r["session_end"]): (
            r["n_events"],
            round(r["total_value"], 6),
        )
        for r in spark.sql("SELECT * FROM t_sessions").collect()
        if r["user_id"] >= 0
    }

    ev = table(spark, SF_SMALL, "events")
    w = F.session_window("ts", f"{stateful.SESSION_GAP_SECONDS} seconds")
    expected = {
        (r["user_id"], r["session_start"], r["session_end"]): (
            r["n_events"],
            round(r["total_value"], 6),
        )
        for r in (
            ev.groupBy(w.alias("w"), "user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("value").alias("total_value"),
            )
            .select(
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "user_id",
                "n_events",
                "total_value",
            )
        ).collect()
    }
    assert got == expected
    assert len(got) > 0


@pytest.fixture(scope="module")
def ewma_dir(spark, tmp_path_factory):
    """Events split into three ts-ordered files with distinct mod times
    so file-per-trigger replays them as three state-carrying batches."""
    import time as _time

    out = str(tmp_path_factory.mktemp("ewma_stream"))
    ev = table(spark, SF_SMALL, "events").orderBy("ts", "event_id")
    n = ev.count()
    rows = ev.collect()
    cuts = [0, n // 3, 2 * n // 3, n]
    for i in range(3):
        chunk = spark.createDataFrame(rows[cuts[i]:cuts[i + 1]], ev.schema)
        chunk.coalesce(1).write.mode("append").parquet(out)
        _time.sleep(1.1)  # distinct mtimes -> deterministic file order
    return out


def test_stateful_ewma_matches_batch_fold(spark, ewma_dir):
    import fortisiem_clickhouse_monitor_spark.operators.behavior as bh

    stream = jobs.events_stream(spark, ewma_dir, max_files_per_trigger=1)
    q = (
        stateful.ewma(stream)
        .writeStream.format("memory")
        .queryName("t_ewma")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    emitted = spark.sql("SELECT * FROM t_ewma").collect()
    # final state per user = the emission with the highest n_events
    final = {}
    for r in emitted:
        if r["user_id"] not in final or r["n_events"] > final[r["user_id"]]["n_events"]:
            final[r["user_id"]] = r
    batch = {
        r["user_id"]: r for r in bh.ewma_user_value(spark, SF_SMALL).collect()
    }
    assert set(final) == set(batch)
    for uid, b in batch.items():
        s = final[uid]
        assert s["n_events"] == b["n_events"], uid
        assert s["ewma_scaled"] == b["ewma_scaled"], uid


def test_stateful_throttle_matches_python_reference(spark, sessions_dir):
    from pyspark.sql import functions as F  # noqa: F811 (local clarity)

    stream = jobs.events_stream(spark, sessions_dir, max_files_per_trigger=1)
    q = (
        # keep the sentinel rows: they advance the watermark that closes
        # each user's final open window (excluded from comparison below)
        stateful.throttle(
            stream.filter(F.col("event_type").isin("error", "sentinel"))
        )
        .writeStream.format("memory")
        .queryName("t_throttle")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["alert_event_id"]): (
            r["page_ts"],
            r["window_end"],
            r["n_suppressed"],
        )
        for r in spark.sql("SELECT * FROM t_throttle").collect()
        if r["user_id"] >= 0
    }

    # Python reference: fixed-window-from-first-page per user.
    import datetime as dtm

    win = dtm.timedelta(seconds=stateful.THROTTLE_WINDOW_SECONDS)
    rows = (
        table(spark, SF_SMALL, "events")
        .filter(F.col("event_type") == "error")
        .select("user_id", "event_id", "ts")
        .collect()
    )
    expected = {}
    by_user: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        by_user.setdefault(r["user_id"], []).append(r)
    for uid, evs in by_user.items():
        cur = None  # [start_ts, eid, n_suppressed]
        for r in evs:
            if cur is None or r["ts"] - cur[0] > win:
                if cur is not None:
                    expected[(uid, cur[1])] = (cur[0], cur[0] + win, cur[2])
                cur = [r["ts"], r["event_id"], 0]
            else:
                cur[2] += 1
        expected[(uid, cur[1])] = (cur[0], cur[0] + win, cur[2])

    assert got == expected


def test_stateful_throttle_planted_storm(spark, tmp_path):
    """sf0.001 errors are too sparse to collide inside one window, so
    the suppression branch is pinned with a planted storm: three
    errors inside one 600 s window (two suppressed), a fourth past it
    opening the next window — and the fixed-window-vs-lag-gap
    distinction: the third error is 450 s after the SECOND but 550 s
    after the window START, so a lag-gap island would still suppress a
    750 s-offset event while this operator correctly re-pages."""
    import datetime as dtm

    t0 = dtm.datetime(2024, 1, 1, 0, 0, 0)
    s = lambda n: t0 + dtm.timedelta(seconds=n)
    rows = [
        (1, s(0), 7, "error", 0.0, "{}"),
        (2, s(100), 7, "error", 0.0, "{}"),
        (3, s(550), 7, "error", 0.0, "{}"),   # 450s after prev, inside window
        (4, s(750), 7, "error", 0.0, "{}"),   # past start+600 -> new page
    ]
    out = str(tmp_path / "storm")
    spark.createDataFrame(rows, schema=jobs.EVENTS_SCHEMA).coalesce(
        1
    ).sortWithinPartitions("ts").write.mode("overwrite").parquet(out)
    for i, days in enumerate((1, 2)):
        spark.createDataFrame(
            [(-1000 - i, t0 + dtm.timedelta(days=days), -1, "error", 0.0, "{}")],
            schema=jobs.EVENTS_SCHEMA,
        ).coalesce(1).write.mode("append").parquet(out)

    stream = jobs.events_stream(spark, out, max_files_per_trigger=1)
    q = (
        stateful.throttle(stream)
        .writeStream.format("memory")
        .queryName("t_throttle_storm")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["alert_event_id"]: r["n_suppressed"]
        for r in spark.sql("SELECT * FROM t_throttle_storm").collect()
        if r["user_id"] >= 0
    }
    assert got == {1: 2, 4: 0}


def test_stateful_throttle_late_cross_batch(spark, tmp_path):
    """Late-event contract (ADVICE r4): an out-of-order error arriving
    in a LATER micro-batch with ts before the open window's start —
    within the watermark — is attributed to the open window's
    suppression count (negative gap <= W), never re-anchors it, and
    never emits its own page.  Files are written one per micro-batch
    (max_files_per_trigger=1) so the t=100 event genuinely arrives
    after the t=500 event was processed."""
    import datetime as dtm

    t0 = dtm.datetime(2024, 1, 1, 0, 0, 0)
    s = lambda n: t0 + dtm.timedelta(seconds=n)
    out = str(tmp_path / "late")
    batches = [
        # batch 1: window anchored at t=200 (eid 1); eid 2 suppressed
        [(1, s(200), 7, "error", 0.0, "{}"), (2, s(500), 7, "error", 0.0, "{}")],
        # batch 2: LATE straggler, ts sorts before the window start
        [(3, s(100), 7, "error", 0.0, "{}")],
        # batch 3: past start+600 -> closes window 1, opens window 2
        [(4, s(900), 7, "error", 0.0, "{}")],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema=jobs.EVENTS_SCHEMA).coalesce(
            1
        ).sortWithinPartitions("ts").write.mode(
            "overwrite" if i == 0 else "append"
        ).parquet(out)
    for i, days in enumerate((1, 2)):
        spark.createDataFrame(
            [(-1000 - i, t0 + dtm.timedelta(days=days), -1, "error", 0.0, "{}")],
            schema=jobs.EVENTS_SCHEMA,
        ).coalesce(1).write.mode("append").parquet(out)

    stream = jobs.events_stream(spark, out, max_files_per_trigger=1)
    q = (
        stateful.throttle(stream)
        .writeStream.format("memory")
        .queryName("t_throttle_late")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["alert_event_id"]: r["n_suppressed"]
        for r in spark.sql("SELECT * FROM t_throttle_late").collect()
        if r["user_id"] >= 0
    }
    # eid 1's window absorbs BOTH the in-order eid 2 and the late eid 3;
    # the straggler emits no page of its own and does not move page_ts.
    assert got == {1: 2, 4: 0}


def test_stateful_cusum_matches_batch(spark, tmp_path):
    """Streaming CUSUM differential: with the per-type med2 targets
    taken from the batch medians (the prior-window-state production
    shape), replaying sf0.001 events through the stateful fold must
    reproduce changepoint_cusum_daily row-for-row — closed days emitted
    on day-roll, the final open day flushed by event-time timeout once
    the sentinel advances the watermark."""
    import datetime as dtm

    from pyspark.sql import functions as F
    import fortisiem_clickhouse_monitor_spark.operators.slo as slo

    batch = {
        (r["event_type"], r["day"]): (r["n"], r["cusum2"], r["is_shift"])
        for r in slo.changepoint_cusum_daily(spark, SF_SMALL).collect()
    }
    # per-type med2 exactly as the batch query derives it
    ev = table(spark, SF_SMALL, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    targets = {
        r["event_type"]: int(r["med2"])
        for r in daily.groupBy("event_type")
        .agg((2 * F.median("n")).cast("long").alias("med2"))
        .collect()
    }

    # ts-ordered replay + far-future sentinels to flush open days
    out = str(tmp_path / "cusum_events")
    ev.orderBy("ts", "event_id").coalesce(1).write.mode("overwrite").parquet(
        out
    )
    mx = ev.agg(F.max("ts")).collect()[0][0]
    for i, days in enumerate((2, 4)):
        spark.createDataFrame(
            [
                (
                    -9000 - i,
                    mx + dtm.timedelta(days=days),
                    -1,
                    "sentinel",
                    0.0,
                    "{}",
                )
            ],
            schema=jobs.EVENTS_SCHEMA,
        ).coalesce(1).write.mode("append").parquet(out)

    stream = jobs.events_stream(spark, out, max_files_per_trigger=1)
    q = (
        stateful.cusum(stream, targets)
        .writeStream.format("memory")
        .queryName("t_cusum")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.awaitTermination(180)
    got = {
        (r["event_type"], r["day"]): (r["n"], r["cusum2"], r["is_shift"])
        for r in spark.sql("SELECT * FROM t_cusum").collect()
        if r["event_type"] != "sentinel"
    }
    assert got == batch


def test_stateful_cusum_timeout_carry(spark, tmp_path):
    """A quiet event_type whose open day is closed by the GLOBAL
    watermark (advanced by OTHER types) must keep its (p2, minp2)
    carry and resume the CUSUM recursion when events return — the
    state.remove() regression restarted the detector at p2=0 and
    diverged from the batch twin (ADVICE r5, medium).

    Scenario: type 'a' is active on days 0/3/4 with counts 9/2/3
    (med2=6, so day 0 leaves p2=+12 — a positive carry the no-carry
    bug erases: day 3 cusum2 is 10 with the carry, 0 without); type
    'b' fires every day and drags the watermark across a's quiet days
    so a's day-0 state times out MID-STREAM (phase 1), not at the
    end-of-stream sentinel.  Phase 2 restarts from the checkpoint and
    the union of both phases must equal changepoint_cusum_daily."""
    import time as _time

    import fortisiem_clickhouse_monitor_spark.operators.slo as slo

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    plan = {
        0: [("a", 9), ("b", 2)],
        1: [("b", 2)],
        2: [("b", 2)],
        3: [("a", 2), ("b", 2)],
        4: [("a", 3), ("b", 2)],
    }
    eid = 0
    day_rows: dict[int, list] = {}
    for day, specs in plan.items():
        rows = []
        for etype, n in specs:
            for i in range(n):
                rows.append(
                    (
                        eid,
                        base + dt.timedelta(days=day, minutes=i),
                        1,
                        etype,
                        0.0,
                        "{}",
                    )
                )
                eid += 1
        day_rows[day] = rows

    # batch twin inputs: the same events as an sf_dir-shaped table
    batch_dir = tmp_path / "cusum_carry_sf"
    batch_dir.mkdir()
    all_rows = [r for d in sorted(day_rows) for r in day_rows[d]]
    ev = spark.createDataFrame(all_rows, schema=jobs.EVENTS_SCHEMA)
    ev.coalesce(1).write.parquet(str(batch_dir / "events.parquet"))
    batch = {
        (r["event_type"], r["day"]): (r["n"], r["cusum2"], r["is_shift"])
        for r in slo.changepoint_cusum_daily(
            spark, str(batch_dir)
        ).collect()
    }
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    targets = {
        r["event_type"]: int(r["med2"])
        for r in daily.groupBy("event_type")
        .agg((2 * F.median("n")).cast("long").alias("med2"))
        .collect()
    }

    stream_dir = str(tmp_path / "cusum_carry_events")
    ckpt = str(tmp_path / "cusum_carry_ckpt")
    sink_dir = str(tmp_path / "cusum_carry_out")

    def append_file(rows):
        spark.createDataFrame(rows, schema=jobs.EVENTS_SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(stream_dir)
        _time.sleep(1.1)  # distinct mtimes -> deterministic file order

    def run_phase():
        # file sink, not memory: the memory sink cannot recover from a
        # checkpoint, and the restart IS what this test exercises.
        stream = jobs.events_stream(
            spark, stream_dir, max_files_per_trigger=1
        )
        q = (
            stateful.cusum(stream, targets)
            .writeStream.format("parquet")
            .option("path", sink_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.awaitTermination(180)
        return {
            (r["event_type"], r["day"]): (
                r["n"],
                r["cusum2"],
                r["is_shift"],
            )
            for r in spark.read.parquet(sink_dir).collect()
            if r["event_type"] != "sentinel"
        }

    # phase 1: days 0..2 — b advances the watermark past end-of-day-0
    # while a is quiet, so a's day 0 closes by TIMEOUT mid-stream.
    for day in (0, 1, 2):
        append_file(day_rows[day])
    got1 = run_phase()
    a_day0 = ("a", base.date())
    assert a_day0 in got1, "a's day 0 was not closed by the timeout"
    assert got1[a_day0] == batch[a_day0]

    # phase 2: a returns (days 3/4) + two sentinels to flush open days;
    # restart from the checkpoint resumes the carried (p2, minp2).
    for day in (3, 4):
        append_file(day_rows[day])
    for i, days in enumerate((6, 8)):
        append_file(
            [
                (
                    -9000 - i,
                    base + dt.timedelta(days=days),
                    -1,
                    "sentinel",
                    0.0,
                    "{}",
                )
            ]
        )
    got = run_phase()  # file sink accumulates: phase 1 + phase 2 rows
    assert got == batch


def test_stateful_heavy_hitters_guarantees(spark, tmp_path):
    """Streaming Misra-Gries differential: replay sf0.001 events in
    multiple micro-batches, take each shard's FINAL snapshot, merge the
    shard sketches with the same mergeable-summaries rule, and check
    the MG guarantees against exact per-user counts: (1) every estimate
    undercounts, (2) the total undercount per shard is <= n_shard/(k+1),
    (3) every user with true count above its shard's error bound is
    retained."""
    ev = table(spark, SF_SMALL, "events")
    truth = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    out = str(tmp_path / "hh_events")
    ev.orderBy("ts", "event_id").coalesce(4).write.mode(
        "overwrite"
    ).parquet(out)
    stream = jobs.events_stream(spark, out, max_files_per_trigger=1)
    q = (
        stateful.heavy_hitters(stream)
        .writeStream.format("memory")
        .queryName("t_hh")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM t_hh").collect()
    latest: dict[int, tuple[int, dict[int, int]]] = {}
    for r in rows:
        proc, sketch = latest.get(r["shard"], (-1, {}))
        if r["processed"] > proc:
            latest[r["shard"]] = (r["processed"], {})
    for r in rows:
        proc, sketch = latest[r["shard"]]
        if r["processed"] == proc:
            sketch[r["user_id"]] = r["est_count"]
    assert latest  # non-vacuous
    for shard, (proc, sketch) in latest.items():
        n_shard = sum(
            c for u, c in truth.items() if u % stateful.MG_SHARDS == shard
        )
        assert proc == n_shard  # every event of the shard was folded
        bound = n_shard / (stateful.MG_K + 1)
        for u, est in sketch.items():
            assert est <= truth[u]          # MG never overcounts
            assert truth[u] - est <= bound  # per-item undercount bound
        for u, c in truth.items():
            if u % stateful.MG_SHARDS == shard and c > bound:
                assert u in sketch          # frequent items retained


def test_stateful_first_seen_matches_batch(spark, tmp_path):
    """Streaming first-seen differential: replaying sf0.001 events in
    ts order must emit each user EXACTLY once with their true first
    day — i.e. the per-day new-user counts reproduce the batch
    window_cumulative_distinct_users n_new_users column."""
    import fortisiem_clickhouse_monitor_spark.operators.windows as win

    batch = {
        r["day"]: r["n_new_users"]
        for r in win.window_cumulative_distinct_users(
            spark, SF_SMALL
        ).collect()
    }
    ev = table(spark, SF_SMALL, "events")
    out = str(tmp_path / "fs_events")
    ev.orderBy("ts", "event_id").coalesce(4).write.mode(
        "overwrite"
    ).parquet(out)
    stream = jobs.events_stream(spark, out, max_files_per_trigger=1)
    q = (
        stateful.first_seen(stream)
        .writeStream.format("memory")
        .queryName("t_first_seen")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM t_first_seen").collect()
    users = [r["user_id"] for r in rows]
    assert len(users) == len(set(users))  # exactly-once per user
    got: dict = {}
    for r in rows:
        got[r["first_day"]] = got.get(r["first_day"], 0) + 1
    assert got == {d: n for d, n in batch.items() if n > 0}


def test_stateful_funnel_matches_batch(spark, tmp_path):
    """Streaming funnel differential: replaying sf0.001 events in ts
    order, the per-stage user counts must equal the batch
    funnel_signup_click_purchase row exactly, and no user may skip a
    stage (stage k emitted only after stage k-1)."""
    import fortisiem_clickhouse_monitor_spark.operators.behavior as bh

    b = bh.funnel_signup_click_purchase(spark, SF_SMALL).collect()[0]
    ev = table(spark, SF_SMALL, "events")
    out = str(tmp_path / "funnel_events")
    ev.orderBy("ts", "event_id").coalesce(4).write.mode(
        "overwrite"
    ).parquet(out)
    stream = jobs.events_stream(spark, out, max_files_per_trigger=1)
    q = (
        stateful.funnel(stream)
        .writeStream.format("memory")
        .queryName("t_funnel")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM t_funnel").collect()
    per_stage: dict = {1: set(), 2: set(), 3: set()}
    for r in rows:
        per_stage[r["stage"]].add(r["user_id"])
    assert len(per_stage[1]) == b["n_signup"]
    assert len(per_stage[2]) == b["n_click_after_signup"]
    assert len(per_stage[3]) == b["n_purchase_after_click"]
    assert per_stage[3] <= per_stage[2] <= per_stage[1]


# ---------------------------------------------------------------------------
# Timeout-resume differentials (VERDICT r6 #7): the CUSUM carry bug
# existed because only sentinel flushes were tested — each
# timeout-bearing stateful op gets the same adversarial shape: state
# closed by a MID-STREAM watermark timeout in phase 1, checkpoint
# restart, new events for the same key in phase 2, union compared to
# the batch/reference twin.
# ---------------------------------------------------------------------------


def _mk_events(rows):
    """rows: (event_id, ts, user_id, event_type, value) -> schema rows."""
    return [(eid, ts, uid, etype, val, "{}") for eid, ts, uid, etype, val in rows]


def _phased_runner(spark, tmp_path, name, transform):
    """(append_file, run_phase) pair over a file source + file sink +
    shared checkpoint — the memory sink cannot recover from a
    checkpoint, and the restart IS what these tests exercise."""
    import time as _time

    stream_dir = str(tmp_path / f"{name}_events")
    ckpt = str(tmp_path / f"{name}_ckpt")
    sink_dir = str(tmp_path / f"{name}_out")

    def append_file(rows):
        spark.createDataFrame(
            _mk_events(rows), schema=jobs.EVENTS_SCHEMA
        ).coalesce(1).write.mode("append").parquet(stream_dir)
        _time.sleep(1.1)  # distinct mtimes -> deterministic file order

    def run_phase():
        stream = jobs.events_stream(spark, stream_dir, max_files_per_trigger=1)
        q = (
            transform(stream)
            .writeStream.format("parquet")
            .option("path", sink_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.awaitTermination(180)
        return spark.read.parquet(sink_dir).collect()

    return append_file, run_phase


def test_stateful_sessionizer_timeout_resume(spark, tmp_path):
    """User 1's first session is closed by the GLOBAL watermark
    (advanced by user 2's events) MID-STREAM in phase 1; phase 2
    restarts from the checkpoint, user 1 opens a new session, and the
    union of both phases must equal the batch session_window twin."""
    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    f1 = [
        (1, t0, 1, "click", 1.0),
        (2, t0 + 5 * m, 1, "click", 2.0),
        (3, t0 + 6 * m, 2, "click", 3.0),
    ]
    # u1's session times out at last+gap = t0+35m; u2's t0+50m event
    # pushes the 10-minute watermark to t0+40m, and the next file's
    # batch gives the state store a batch in which to fire it.
    f2 = [(4, t0 + 50 * m, 2, "click", 4.0)]
    f3 = [(5, t0 + 55 * m, 2, "click", 5.0)]
    f4 = [
        (6, t0 + 120 * m, 1, "click", 6.0),
        (7, t0 + 121 * m, 2, "click", 7.0),
    ]
    sent1 = [(-1, t0 + dt.timedelta(days=1), -1, "sentinel", 0.0)]
    sent2 = [(-2, t0 + dt.timedelta(days=2), -1, "sentinel", 0.0)]
    real = f1 + f2 + f3 + f4

    append_file, run_phase = _phased_runner(
        spark, tmp_path, "sess_resume", stateful.sessionize
    )
    for f in (f1, f2, f3):
        append_file(f)
    got1 = [r for r in run_phase() if r["user_id"] == 1]
    # the mid-stream timeout, not an end-of-stream flush, closed S1
    assert len(got1) == 1 and got1[0]["n_events"] == 2

    for f in (f4, sent1, sent2):
        append_file(f)
    got = {
        (r["user_id"], r["session_start"], r["session_end"]): (
            r["n_events"],
            round(r["total_value"], 6),
        )
        for r in run_phase()
        if r["user_id"] >= 0
    }
    ev = spark.createDataFrame(_mk_events(real), schema=jobs.EVENTS_SCHEMA)
    w = F.session_window("ts", f"{stateful.SESSION_GAP_SECONDS} seconds")
    expected = {
        (r["user_id"], r["session_start"], r["session_end"]): (
            r["n_events"],
            round(r["total_value"], 6),
        )
        for r in ev.groupBy(w.alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
        .collect()
    }
    assert got == expected
    # u1: {t0, t0+5m} and {t0+120m}; u2: {t0+6m}, {t0+50m, t0+55m}
    # (44-min gap splits), {t0+121m}
    assert len(got) == 5


def test_stateful_throttle_timeout_resume(spark, tmp_path):
    """User 1's open throttle window is proven over by the watermark
    (advanced by user 2) MID-STREAM in phase 1 and its page row emits
    then; phase 2 restarts from the checkpoint and a fresh window
    anchors.  Final pages per user must equal the reference fold over
    the full event list."""
    t0 = dt.datetime(2024, 3, 2, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    f1 = [
        (1, t0, 1, "error", 0.0),
        (2, t0 + 2 * m, 1, "error", 0.0),
        (3, t0 + 5 * m, 1, "error", 0.0),
        (4, t0 + 1 * m, 2, "error", 0.0),
    ]
    # u1's window ends t0+10m; u2's t0+25m event pushes the watermark
    # to t0+15m, the next batch fires the timeout.
    f2 = [(5, t0 + 25 * m, 2, "error", 0.0)]
    f3 = [(6, t0 + 26 * m, 2, "error", 0.0)]
    f4 = [
        (7, t0 + 30 * m, 1, "error", 0.0),
        (8, t0 + 31 * m, 1, "error", 0.0),
    ]
    sent1 = [(-1, t0 + dt.timedelta(days=1), -1, "sentinel", 0.0)]
    sent2 = [(-2, t0 + dt.timedelta(days=2), -1, "sentinel", 0.0)]
    real = f1 + f2 + f3 + f4

    append_file, run_phase = _phased_runner(
        spark, tmp_path, "thr_resume", stateful.throttle
    )
    for f in (f1, f2, f3):
        append_file(f)
    got1 = [r for r in run_phase() if r["user_id"] == 1]
    assert len(got1) == 1 and got1[0]["n_suppressed"] == 2

    for f in (f4, sent1, sent2):
        append_file(f)
    rows = [r for r in run_phase() if r["user_id"] >= 0]
    got = {}
    for r in rows:
        got.setdefault(r["user_id"], []).append(
            (r["page_ts"], r["alert_event_id"], r["n_suppressed"])
        )
    for u in got:
        got[u].sort()

    win_us = stateful.THROTTLE_WINDOW_SECONDS * 1_000_000
    expected = {}
    per_user: dict = {}
    for eid, ts, uid, _t, _v in sorted(real, key=lambda x: (x[1], x[0])):
        per_user.setdefault(uid, []).append(
            (int(ts.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000), eid)
        )
    for uid, evs in per_user.items():
        cur, pages = None, []
        for t, eid in evs:
            if cur is None:
                cur = [t, eid, 0]
            elif t - cur[0] <= win_us:
                cur[2] += 1
            else:
                pages.append(tuple(cur))
                cur = [t, eid, 0]
        pages.append(tuple(cur))
        expected[uid] = sorted(
            (dt.datetime.fromtimestamp(t / 1e6, dt.timezone.utc).replace(tzinfo=None), eid, n)
            for t, eid, n in pages
        )
    assert got == expected


def test_stateful_funnel_restart_resume(spark, tmp_path):
    """Funnel state (stage, last_us) must survive a checkpoint restart:
    user 1 completes signup+click in phase 1 and purchase in phase 2 —
    stage 3 must emit exactly once in phase 2, never re-emitting
    stages 1-2 (the batch twin's exactly-once-per-stage contract)."""
    t0 = dt.datetime(2024, 3, 3, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    f1 = [
        (1, t0, 1, "signup", 0.0),
        (2, t0 + m, 1, "click", 0.0),
        (3, t0, 2, "signup", 0.0),
        (4, t0 + m, 2, "click", 0.0),
        (5, t0 + 2 * m, 2, "purchase", 0.0),
    ]
    f2 = [
        (6, t0 + 10 * m, 1, "purchase", 0.0),
        (7, t0 + 11 * m, 1, "purchase", 0.0),  # must NOT advance again
    ]

    append_file, run_phase = _phased_runner(
        spark, tmp_path, "fun_resume", stateful.funnel
    )
    append_file(f1)
    got1 = sorted((r["user_id"], r["stage"]) for r in run_phase())
    assert got1 == [(1, 1), (1, 2), (2, 1), (2, 2), (2, 3)]

    append_file(f2)
    got = sorted((r["user_id"], r["stage"]) for r in run_phase())
    assert got == [(1, 1), (1, 2), (1, 3), (2, 1), (2, 2), (2, 3)]


def test_stateful_conversion_latency_restart_and_batch_match(
    spark, tmp_path
):
    """Streaming conversion latency: (a) the click anchor survives a
    checkpoint restart (click in phase 1, purchase in phase 2 -> one
    row, correct lag); (b) replaying sf0.001 events file-per-trigger,
    the hour histogram over the emitted rows equals the batch
    behavior_conversion_latency table exactly."""
    import fortisiem_clickhouse_monitor_spark.operators.behavior as bh

    t0 = dt.datetime(2024, 3, 4, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    f1 = [
        (1, t0, 1, "click", 0.0),
        (2, t0 + m, 2, "click", 0.0),
        (3, t0 + 2 * m, 2, "purchase", 0.0),
        (4, t0 + 3 * m, 2, "purchase", 0.0),  # second purchase ignored
    ]
    f2 = [(5, t0 + 90 * m, 1, "purchase", 0.0)]  # phase-2 conversion

    append_file, run_phase = _phased_runner(
        spark, tmp_path, "conv_resume", stateful.conversion_latency
    )
    append_file(f1)
    got1 = {(r["user_id"], r["latency_s"]) for r in run_phase()}
    assert got1 == {(2, 60)}

    append_file(f2)
    got = {(r["user_id"], r["latency_s"]) for r in run_phase()}
    assert got == {(2, 60), (1, 5400)}  # u1 converts across the restart

    # (b) full-corpus differential vs the batch histogram
    ev = table(spark, SF_SMALL, "events")
    out = str(tmp_path / "conv_events")
    ev.orderBy("ts", "event_id").coalesce(4).write.mode(
        "overwrite"
    ).parquet(out)
    stream = jobs.events_stream(spark, out, max_files_per_trigger=1)
    q = (
        stateful.conversion_latency(stream)
        .writeStream.format("memory")
        .queryName("t_conv")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM t_conv").collect()
    hist: dict = {}
    for r in rows:
        hist[r["latency_s"] // 3600] = hist.get(r["latency_s"] // 3600, 0) + 1
    batch = {
        r["hour_bucket"]: r["n_users"]
        for r in bh.behavior_conversion_latency(spark, SF_SMALL).collect()
    }
    assert hist == batch
    assert len(batch) > 0


def test_stateful_log_compaction_matches_batch(spark, tmp_path):
    """Streaming compaction differential: replaying sf0.001 events in
    (ts, event_id) order, each key's FINAL changelog emission must
    equal the batch cdc_log_compaction row — same last event, value,
    and total version count — and keys whose latest record is a
    tombstone must be flagged here and absent from the batch output."""
    import fortisiem_clickhouse_monitor_spark.operators.behavior as bh

    batch = {
        r["user_id"]: r
        for r in bh.cdc_log_compaction(spark, SF_SMALL).collect()
    }
    ev = table(spark, SF_SMALL, "events")
    out = str(tmp_path / "lc_events")
    ev.orderBy("ts", "event_id").coalesce(4).write.mode(
        "overwrite"
    ).parquet(out)
    stream = jobs.events_stream(spark, out, max_files_per_trigger=1)
    q = (
        stateful.compact(stream)
        .writeStream.format("memory")
        .queryName("t_compact")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM t_compact").collect()
    final: dict = {}
    for r in rows:
        # versions grow monotonically, so max n_versions = last emission
        if (
            r["user_id"] not in final
            or r["n_versions"] > final[r["user_id"]]["n_versions"]
        ):
            final[r["user_id"]] = r
    n_events = ev.count()
    assert sum(r["n_versions"] for r in final.values()) == n_events
    for uid, r in final.items():
        if r["is_tombstone"]:
            assert uid not in batch
        else:
            b = batch[uid]
            assert r["last_event_id"] == b["last_event_id"]
            assert r["last_type"] == b["last_type"]
            assert r["last_value_cents"] == b["last_value_cents"]
            assert r["n_versions"] == b["n_versions"]
    live = {u for u, r in final.items() if not r["is_tombstone"]}
    assert live == set(batch)


def test_stateful_log_compaction_order_independent(spark, tmp_path):
    """Adversarial replay: feeding the log in REVERSE (ts, event_id)
    order must converge to the same final compacted state — last-write
    -wins is a max over (ts, event_id), which no arrival order can
    change.  (Emission ORDER differs; the terminal state must not.)"""
    import fortisiem_clickhouse_monitor_spark.operators.behavior as bh

    batch = {
        r["user_id"]: r
        for r in bh.cdc_log_compaction(spark, SF_SMALL).collect()
    }
    ev = table(spark, SF_SMALL, "events")
    out = str(tmp_path / "lc_rev")
    ev.orderBy(F.desc("ts"), F.desc("event_id")).coalesce(4).write.mode(
        "overwrite"
    ).parquet(out)
    stream = jobs.events_stream(spark, out, max_files_per_trigger=1)
    q = (
        stateful.compact(stream)
        .writeStream.format("memory")
        .queryName("t_compact_rev")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM t_compact_rev").collect()
    final: dict = {}
    for r in rows:
        if (
            r["user_id"] not in final
            or r["n_versions"] > final[r["user_id"]]["n_versions"]
        ):
            final[r["user_id"]] = r
    assert sum(r["n_versions"] for r in final.values()) == ev.count()
    live = {u for u, r in final.items() if not r["is_tombstone"]}
    assert live == set(batch)
    for uid in live:
        r, b = final[uid], batch[uid]
        assert r["last_event_id"] == b["last_event_id"]
        assert r["last_value_cents"] == b["last_value_cents"]
        assert r["n_versions"] == b["n_versions"]


def test_stateful_heavy_hitters_restart_resume(spark, tmp_path):
    """Misra-Gries shard state must survive a checkpoint restart
    (VERDICT r7 #7): phase 1 folds two micro-batches into shard 0's
    counters, phase 2 restarts from the checkpoint and folds one more.
    The final snapshot must equal the Python _mg_merge fold over ALL
    three batches — a lost state would reset `processed` and drop the
    phase-1 counts.  (NoTimeout op, so the adversarial shape is the
    restart itself, not a watermark timeout.)"""
    t0 = dt.datetime(2024, 3, 6, 12, 0, 0)
    s = dt.timedelta(seconds=1)
    # all users ~ 0 (mod MG_SHARDS) -> one shard carries every counter
    f1 = [(i, t0 + i * s, [8, 8, 8, 16, 16][i - 1], "click", 0.0)
          for i in range(1, 6)]
    f2 = [(i, t0 + i * s, [24, 24, 8][i - 6], "click", 0.0)
          for i in range(6, 9)]
    f3 = [(i, t0 + i * s, [16, 32, 32, 8][i - 9], "click", 0.0)
          for i in range(9, 13)]

    append_file, run_phase = _phased_runner(
        spark, tmp_path, "hh_resume", stateful.heavy_hitters
    )
    for f in (f1, f2):
        append_file(f)
    rows1 = run_phase()
    latest1 = max(r["processed"] for r in rows1)
    assert latest1 == len(f1) + len(f2)

    append_file(f3)
    rows = run_phase()
    proc_final = max(r["processed"] for r in rows)
    assert proc_final == len(f1) + len(f2) + len(f3)  # state resumed
    got = {
        r["user_id"]: r["est_count"]
        for r in rows
        if r["processed"] == proc_final
    }
    expected: dict = {}
    for batch in (f1, f2, f3):
        counts: dict = {}
        for _eid, _ts, uid, _t, _v in batch:
            counts[uid] = counts.get(uid, 0) + 1
        expected = stateful._mg_merge(expected, counts, stateful.MG_K)
    assert got == expected


def test_stateful_compact_restart_resume(spark, tmp_path):
    """Log-compaction state must survive a checkpoint restart
    (VERDICT r7 #7): phase 1 compacts two batches (user 1 updated
    twice, user 2 once), phase 2 restarts and delivers a newer record
    for user 1, an OLDER (late) record for user 1 that must NOT win,
    and a tombstone for user 2.  Final per-key emissions must carry
    phase-1-inclusive version counts and last-write-wins fields equal
    to the Python fold over the full log."""
    t0 = dt.datetime(2024, 3, 7, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    f1 = [
        (1, t0, 1, "click", 1.00),
        (2, t0 + m, 1, "view", 2.50),
    ]
    f2 = [(3, t0 + 2 * m, 2, "click", 7.25)]
    f3 = [
        (4, t0 + 10 * m, 1, "purchase", 9.75),
        (5, t0 + 5 * m, 1, "view", 0.10),  # late: loses to event 4
        (6, t0 + 11 * m, 2, stateful.COMPACT_TOMBSTONE, 0.0),
    ]

    append_file, run_phase = _phased_runner(
        spark, tmp_path, "cpt_resume", stateful.compact
    )
    for f in (f1, f2):
        append_file(f)
    rows1 = run_phase()
    u1_phase1 = max(
        (r for r in rows1 if r["user_id"] == 1),
        key=lambda r: r["n_versions"],
    )
    assert u1_phase1["n_versions"] == 2 and u1_phase1["last_event_id"] == 2

    append_file(f3)
    rows = run_phase()
    final: dict = {}
    for r in rows:
        if (
            r["user_id"] not in final
            or r["n_versions"] > final[r["user_id"]]["n_versions"]
        ):
            final[r["user_id"]] = r
    u1, u2 = final[1], final[2]
    assert u1["n_versions"] == 4  # 2 from phase 1 + 2 from phase 2
    assert u1["last_event_id"] == 4 and u1["last_type"] == "purchase"
    assert u1["last_value_cents"] == 975 and not u1["is_tombstone"]
    assert u2["n_versions"] == 2 and u2["is_tombstone"]
    assert u2["last_event_id"] == 6
