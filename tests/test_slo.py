"""Planted-fixture tests for the SLO / alert-engineering pack
(operators/slo.py).  Each test pins the semantics on data constructed
to exercise the decision boundary; the sf0.01 oracle gate covers the
hash-exact cross-engine contract."""

from __future__ import annotations

import datetime as dt

import fortisiem_clickhouse_monitor_spark.operators.slo as slo

_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, "
    "event_type string, value double, props string"
)


def _events(spark, rows):
    return spark.createDataFrame(rows, _EV_SCHEMA)


def test_burn_rate_short_only_does_not_page(spark, monkeypatch):
    """A fast blip: the 1 h window burns (50% errors vs 1% budget) but
    the 6 h window is healthy -> no page; when the long window burns
    too, page fires.  Boundary is the integer cross-multiply."""
    t0 = dt.datetime(2024, 1, 10, 12, 0, 0)
    m = lambda mins: t0 - dt.timedelta(minutes=mins)
    rows, eid = [], 0
    # last hour: 2 errors / 4 events (short burn = 50x budget)
    for mins, et in ((5, "error"), (15, "error"), (25, "view"), (35, "view")):
        eid += 1
        rows.append((eid, m(mins), 7, et, 0.0, "{}"))
    # hours 1..6: 396 clean events -> long window 2/400 = 0.5% < 1%
    for k in range(396):
        eid += 1
        rows.append((eid, m(70 + k % 280), 7, "view", 0.0, "{}"))
    ev = _events(spark, rows)
    monkeypatch.setattr(slo, "table", lambda s, d, n: ev)
    r = slo.slo_burn_rate_multiwindow(spark, "x").collect()[0]
    assert (r["short_errors"], r["short_total"]) == (2, 4)
    assert (r["long_errors"], r["long_total"]) == (2, 400)
    assert r["short_burn"] == 50.0 and r["long_burn"] == 0.5
    assert r["page"] is False

    # make the long window burn too: 3 more errors -> 5/403 > 1%
    for mins in (90, 120, 150):
        eid += 1
        rows.append((eid, m(mins), 7, "error", 0.0, "{}"))
    ev2 = _events(spark, rows)
    monkeypatch.setattr(slo, "table", lambda s, d, n: ev2)
    r2 = slo.slo_burn_rate_multiwindow(spark, "x").collect()[0]
    assert r2["page"] is True


def test_cusum_closed_form_matches_recursion(spark, monkeypatch):
    """The prefix-sum closed form must equal the textbook recursion
    S_i = max(0, S_{i-1} + (2*n_i - med2)) on a series with a level
    shift; the shift day's flag fires once the excess accumulates."""
    # 10 days at ~20, then 6 days at 32: a +60% sustained shift no
    # single day of which is a 2.5-MAD outlier on its own.
    counts = [20, 21, 19, 20, 22, 18, 20, 21, 19, 20, 32, 31, 33, 32, 31, 33]
    rows, eid = [], 0
    for day, n in enumerate(counts, start=1):
        for _ in range(n):
            eid += 1
            rows.append((eid, dt.datetime(2024, 3, day), 7, "view", 0.0, "{}"))
    ev = _events(spark, rows)
    monkeypatch.setattr(slo, "table", lambda s, d, n: ev)
    out = sorted(
        slo.changepoint_cusum_daily(spark, "x").collect(),
        key=lambda r: r["day"],
    )
    assert [r["n"] for r in out] == counts

    # Python recursion with the same doubled-integer arithmetic.
    med = sorted(counts)[len(counts) // 2 - 1 : len(counts) // 2 + 1]
    med2 = med[0] + med[1]  # 2 * median of an even-length list
    s, expect = 0, []
    for n in counts:
        s = max(0, s + (2 * n - med2))
        expect.append(s)
    assert [r["cusum2"] for r in out] == expect
    # Quiet days never flag; the sustained shift does (excess >= med2).
    flags = [r["is_shift"] for r in out]
    assert not any(flags[:10])
    assert any(flags[10:])


def test_seasonal_dow_baseline_unmasks_weekday_rhythm(spark, monkeypatch):
    """Quiet Sundays (5/day vs 20 weekdays) are NORMAL against their
    own day-of-week baseline; one planted 3x Monday is the only
    anomaly.  A flat-baseline screen would flag every Sunday."""
    rows, eid = [], 0
    # Jan 2024: the 1st is a Monday. Four full weeks.
    for day in range(1, 29):
        d = dt.datetime(2024, 1, day)
        n = 5 if d.weekday() == 6 else 20
        if day == 15:  # a Monday: planted 3x burst
            n = 60
        for _ in range(n):
            eid += 1
            rows.append((eid, d, 7, "view", 0.0, "{}"))
    ev = _events(spark, rows)
    monkeypatch.setattr(slo, "table", lambda s, d, n: ev)
    out = {r["day"]: r for r in slo.seasonal_dow_residuals(spark, "x").collect()}
    anomalous = sorted(day for day, r in out.items() if r["is_anomaly"])
    assert anomalous == [dt.date(2024, 1, 15)]
    # Sundays sit exactly on their own baseline: residual 0.
    assert out[dt.date(2024, 1, 7)]["residual2"] == 0
    assert out[dt.date(2024, 1, 7)]["baseline2"] == 10  # 2 * median(5)


def test_availability_counts_silent_minutes(spark, monkeypatch):
    """10-minute span (inclusive); 'view' beats in 6 of them -> 60%;
    'error' appears once -> 10%."""
    t0 = dt.datetime(2024, 2, 1, 8, 0, 0)
    m = lambda k, s=0: t0 + dt.timedelta(minutes=k, seconds=s)
    rows = [(k + 1, m(k), 7, "view", 0.0, "{}") for k in (0, 1, 2, 5, 7, 9)]
    rows.append((100, m(0, 30), 8, "view", 0.0, "{}"))  # same minute: no-op
    rows.append((101, m(4), 9, "error", 0.0, "{}"))
    ev = _events(spark, rows)
    monkeypatch.setattr(slo, "table", lambda s, d, n: ev)
    out = {
        r["event_type"]: r
        for r in slo.availability_active_minutes(spark, "x").collect()
    }
    assert out["view"]["span_minutes"] == 10
    assert out["view"]["active_minutes"] == 6
    assert out["view"]["active_pct"] == 60.0
    assert out["error"]["active_minutes"] == 1
    assert out["error"]["active_pct"] == 10.0
