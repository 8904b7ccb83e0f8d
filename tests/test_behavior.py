"""Unit tests for operators/behavior.py — sequence-order edge cases the
sf-scale oracle diff can't isolate: funnel stage strictness (events
BEFORE the prior stage must not count), cohort week-offset arithmetic,
and the transition matrix's timestamp tiebreak.
"""

from __future__ import annotations

import datetime as dt
import tempfile

from fortisiem_clickhouse_monitor_spark import registry

EVENTS_COLS = (
    "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
    "value DOUBLE, props STRING"
)


def _ts(minute: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(minutes=minute)


def _run_on(spark, name, rows):
    df = spark.createDataFrame(rows, schema=EVENTS_COLS)
    d = tempfile.mkdtemp(prefix="behav_")
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    return registry.queries()[name](spark, d)


class TestFunnel:
    def test_strict_ordering(self, spark):
        rows = [
            # user 1: full ordered funnel
            (1, _ts(0), 1, "signup", 0.0, "{}"),
            (2, _ts(1), 1, "click", 0.0, "{}"),
            (3, _ts(2), 1, "purchase", 0.0, "{}"),
            # user 2: click BEFORE signup, purchase after -> stalls at signup
            (4, _ts(0), 2, "click", 0.0, "{}"),
            (5, _ts(1), 2, "signup", 0.0, "{}"),
            (6, _ts(2), 2, "purchase", 0.0, "{}"),
            # user 3: purchase before click -> reaches click stage only
            (7, _ts(0), 3, "signup", 0.0, "{}"),
            (8, _ts(1), 3, "purchase", 0.0, "{}"),
            (9, _ts(2), 3, "click", 0.0, "{}"),
            # user 4: never signs up
            (10, _ts(0), 4, "click", 0.0, "{}"),
        ]
        out = _run_on(spark, "funnel_signup_click_purchase", rows).collect()[0]
        assert out["n_signup"] == 3
        assert out["n_click_after_signup"] == 2  # users 1 and 3
        assert out["n_purchase_after_click"] == 1  # user 1 only

    def test_equal_timestamp_not_counted(self, spark):
        # click at EXACTLY the signup instant is not "after" (strict >)
        rows = [
            (1, _ts(0), 1, "signup", 0.0, "{}"),
            (2, _ts(0), 1, "click", 0.0, "{}"),
        ]
        out = _run_on(spark, "funnel_signup_click_purchase", rows).collect()[0]
        assert out["n_signup"] == 1
        assert out["n_click_after_signup"] == 0


class TestRetention:
    def test_week_offsets(self, spark):
        day = 24 * 60.0
        rows = [
            # user 1 first event Mon Jan 1 (week 0), active weeks 0, 1, 3
            (1, _ts(0), 1, "view", 0.0, "{}"),
            (2, _ts(2 * day), 1, "view", 0.0, "{}"),  # same week
            (3, _ts(8 * day), 1, "view", 0.0, "{}"),  # week 1
            (4, _ts(22 * day), 1, "view", 0.0, "{}"),  # week 3
            # user 2 first event in week 1, active week 1 only
            (5, _ts(9 * day), 2, "view", 0.0, "{}"),
        ]
        out = {
            (r["cohort_week"].date(), r["week_offset"]): r["n_users"]
            for r in _run_on(spark, "retention_weekly_cohorts", rows).collect()
        }
        jan1 = dt.date(2024, 1, 1)  # a Monday: week-truncation fixed point
        jan8 = dt.date(2024, 1, 8)
        assert out == {
            (jan1, 0): 1,
            (jan1, 1): 1,
            (jan1, 3): 1,
            (jan8, 0): 1,
        }


class TestTransitions:
    def test_counts_and_tiebreak(self, spark):
        rows = [
            # user 1: view -> click -> purchase
            (1, _ts(0), 1, "view", 0.0, "{}"),
            (2, _ts(1), 1, "click", 0.0, "{}"),
            (3, _ts(2), 1, "purchase", 0.0, "{}"),
            # user 2: two events at the SAME ts -> event_id breaks the tie
            (10, _ts(0), 2, "view", 0.0, "{}"),
            (11, _ts(0), 2, "click", 0.0, "{}"),
        ]
        out = {
            (r["event_type"], r["next_type"]): r["n"]
            for r in _run_on(spark, "path_transition_matrix", rows).collect()
        }
        assert out == {
            ("view", "click"): 2,
            ("click", "purchase"): 1,
        }


def test_forward_fill_carries_last_good_value(spark, monkeypatch):
    import datetime as dt
    import fortisiem_clickhouse_monitor_spark.operators.behavior as bh

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    rows = [
        (1, t(0), 7, "error", 9.9),   # before any good value -> NULL
        (2, t(1), 7, "view", 1.0),
        (3, t(2), 7, "error", 9.9),
        (4, t(3), 7, "view", 2.0),
        (5, t(4), 7, "error", 9.9),
        (6, t(5), 7, "error", 9.9),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    monkeypatch.setattr(bh, "table", lambda s, d, n: ev)
    out = {r["event_id"]: r for r in bh.timeseries_forward_fill(spark, "x").collect()}
    assert out[1]["filled_value"] is None and out[1]["raw_value"] is None
    assert [out[i]["filled_value"] for i in (2, 3, 4, 5, 6)] == [1.0, 1.0, 2.0, 2.0, 2.0]


def test_point_in_time_join_picks_current_version(spark, monkeypatch):
    import datetime as dt
    import fortisiem_clickhouse_monitor_spark.operators.behavior as bh

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    rows = [
        (10, t(0), 7, "purchase", 5.0),  # before first signup -> dropped
        (11, t(1), 7, "signup", 1.0),    # version A [t1, t3)
        (12, t(2), 7, "purchase", 5.0),  # -> A
        (13, t(3), 7, "signup", 2.0),    # version B [t3, inf)
        (14, t(4), 7, "purchase", 5.0),  # -> B
        (15, t(3), 7, "purchase", 5.0),  # exactly at t3 -> B (>= valid_from)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    monkeypatch.setattr(bh, "table", lambda s, d, n: ev)
    out = {r["event_id"]: r for r in bh.join_point_in_time_scd2(spark, "x").collect()}
    assert set(out) == {12, 14, 15}
    assert out[12]["state_value"] == 1.0
    assert out[14]["state_value"] == 2.0
    assert out[15]["state_value"] == 2.0
    assert out[14]["us_since_state"] == 1_000_000


def test_attribution_last_touch_planted(spark, monkeypatch):
    import datetime as dt
    import fortisiem_clickhouse_monitor_spark.operators.behavior as bh

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    rows = [
        (1, t(0), 7, "purchase", 1.0),   # opens history -> NULL touch
        (2, t(1), 7, "view", 1.0),
        (3, t(2), 7, "click", 1.0),
        (4, t(3), 7, "purchase", 5.0),   # -> click at t(2)
        (5, t(4), 7, "purchase", 5.0),   # consecutive purchase -> still click
        (6, t(5), 8, "signup", 1.0),
        (7, t(5), 8, "purchase", 2.0),   # equal-ts tie: event_id orders signup first
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    monkeypatch.setattr(bh, "table", lambda s, d, n: ev)
    out = {r["event_id"]: r for r in
           bh.behavior_attribution_last_touch(spark, "x").collect()}
    assert set(out) == {1, 4, 5, 7}
    assert out[1]["touch_type"] is None and out[1]["touch_gap_us"] is None
    assert out[4]["touch_type"] == "click" and out[4]["touch_ts"] == t(2)
    assert out[5]["touch_type"] == "click"        # purchases never self-credit
    assert out[7]["touch_type"] == "signup" and out[7]["touch_gap_us"] == 0


def test_linear_interpolate_planted_gap(spark, monkeypatch):
    import datetime as dt
    import fortisiem_clickhouse_monitor_spark.operators.behavior as bh

    d = lambda day, h=0: dt.datetime(2024, 1, day, h)
    rows = [  # user 7: observed days 1 (sum 1.00) and 4 (sum 4.00); gap 2,3
        (1, d(1), 7, "view", 1.0),
        (2, d(4, 1), 7, "view", 1.5),
        (3, d(4, 2), 7, "view", 2.5),
        (4, d(2), 8, "view", 9.0),   # single-day user: spine is 1 row
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    monkeypatch.setattr(bh, "table", lambda s, d_, n: ev)
    out = {(r["user_id"], r["day"].day): (r["observed"], r["value_interp"])
           for r in bh.timeseries_linear_interpolate(spark, "x").collect()}
    assert out[(7, 1)] == (True, 1.0)
    assert out[(7, 2)] == (False, 2.0)   # 1 + (4-1)*1/3
    assert out[(7, 3)] == (False, 3.0)
    assert out[(7, 4)] == (True, 4.0)
    assert out[(8, 2)] == (True, 9.0) and len(out) == 5


def test_rfm_quartiles_planted(spark, monkeypatch):
    import datetime as dt
    import fortisiem_clickhouse_monitor_spark.operators.behavior as bh

    # 8 customers: recency/frequency/monetary each strictly ordered by
    # custkey, so every quartile assignment is forced (2 per bucket).
    rows = []
    for c in range(1, 9):
        for k in range(9 - c):  # frequency: cust 1 -> 8 orders ... cust 8 -> 1
            rows.append(
                (c * 100 + k, c, "O",
                 float(1000 * (9 - c)),                    # monetary desc in c
                 dt.datetime(2024, 1, 31 - c), "p")        # recency desc in c
            )
    o = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, "
              "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
    )
    monkeypatch.setattr(bh, "table", lambda s, d, n: o)
    out = {r["custkey"]: r for r in bh.behavior_rfm_segments(spark, "x").collect()}
    for c in range(1, 9):
        q = (c + 1) // 2  # custkeys 1,2 -> quartile 1 ... 7,8 -> quartile 4
        assert (out[c]["r_score"], out[c]["f_score"], out[c]["m_score"]) == (q, q, q)
    assert out[1]["rfm_cell"] == 111 and out[8]["rfm_cell"] == 444
    assert out[1]["n_orders"] == 8 and out[1]["monetary_cents"] == 8 * 800000


def test_mad_outlier_resists_masking(spark, monkeypatch):
    import datetime as dt
    import fortisiem_clickhouse_monitor_spark.operators.behavior as bh

    # 12 quiet days of ~10 events + one 300-event day: the mean/std
    # screen would be dragged by the spike; median/MAD flags it.
    rows, eid = [], 0
    for day in range(1, 13):
        for _ in range(10 + (day % 2)):  # 10 or 11 events
            eid += 1
            rows.append((eid, dt.datetime(2024, 1, day), 7, "view", 1.0, "{}"))
    for _ in range(300):
        eid += 1
        rows.append((eid, dt.datetime(2024, 1, 13), 7, "view", 1.0, "{}"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string"
    )
    monkeypatch.setattr(bh, "table", lambda s, d, n: ev)
    out = bh.outlier_daily_mad(spark, "x").collect()
    assert len(out) == 1
    r = out[0]
    assert r["day"].day == 13 and r["n"] == 300 and r["robust_z"] > 100


def test_alert_suppression_islands_planted(spark, monkeypatch):
    import datetime as dt
    import fortisiem_clickhouse_monitor_spark.operators.behavior as bh

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(seconds=s)
    rows = [
        (1, t(0), 7, "error", 0.0, "{}"),
        (2, t(300), 7, "error", 0.0, "{}"),    # gap 300 <= 600: same storm
        (3, t(800), 7, "error", 0.0, "{}"),    # gap 500: STILL same storm
        (4, t(1500), 7, "error", 0.0, "{}"),   # gap 700 > 600: new storm
        (5, t(100), 8, "view", 0.0, "{}"),     # non-error: ignored
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string"
    )
    monkeypatch.setattr(bh, "table", lambda s, d, n: ev)
    out = {r["alert_event_id"]: r["n_suppressed"]
           for r in bh.alert_suppression_window(spark, "x").collect()}
    # lag-gap semantics: event 3 extends the storm (vs the streaming
    # fixed-window twin, which would re-page it — see test_stateful)
    assert out == {1: 2, 4: 0}
