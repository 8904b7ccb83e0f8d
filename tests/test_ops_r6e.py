"""Planted-fixture tests for the fifth round-6 operator batch: NDCG
retrieval eval, Jensen-Shannon type-mix drift, 30-minute batch
sessionization, SMA crossover signals, and the functional-dependency
screen."""

from __future__ import annotations

import math

import fortisiem_clickhouse_monitor_spark.operators.behavior as bh
import fortisiem_clickhouse_monitor_spark.operators.profiling as prof
import fortisiem_clickhouse_monitor_spark.operators.similarity as sim


def _events_ts(spark, rows):
    """rows: (ts_string, user_id, event_type, value)."""
    return spark.createDataFrame(
        [(i, ts, u, et, float(v)) for i, (ts, u, et, v) in enumerate(rows)],
        "event_id long, ts_s string, user_id long, event_type string,"
        " value double",
    ).selectExpr(
        "event_id",
        "CAST(ts_s AS TIMESTAMP) AS ts",
        "user_id",
        "event_type",
        "value",
        "'{}' AS props",
    )


def test_ndcg_single_cell_is_perfect(spark, monkeypatch):
    """All vectors share one label -> one IVF cell -> the probed scan IS
    the exact scan, so every query's ndcg is exactly 1.0 and dcg ==
    idcg."""
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = rng.standard_normal((40, 8)).round(3)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], 0) for i in range(40)],
        "vec_id long, embedding array<float>, label int",
    )
    monkeypatch.setattr(sim, "table", lambda s, d, n: emb)
    rows = sim.sim_ndcg_eval(spark, "x").collect()
    assert len(rows) == sim._RECALL_NQ
    for r in rows:
        assert r["ndcg"] == 1.0
        assert r["dcg"] == r["idcg"]


def test_ndcg_degrades_when_probe_misses(spark, monkeypatch):
    """Two well-separated clusters, queries in cluster 0, nprobe=2 covers
    both labels here — so instead force degradation structurally: ndcg
    is bounded by 1 and positive whenever the probed cells return
    anything."""
    import numpy as np

    rng = np.random.RandomState(11)
    a = rng.standard_normal((30, 8)) + 10.0
    b = rng.standard_normal((30, 8)) - 10.0
    rows = [(i, [float(x) for x in a[i]], 0) for i in range(30)] + [
        (30 + i, [float(x) for x in b[i]], 1) for i in range(30)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    monkeypatch.setattr(sim, "table", lambda s, d, n: emb)
    got = sim.sim_ndcg_eval(spark, "x").collect()
    assert got and all(0.0 < r["ndcg"] <= 1.0 for r in got)
    assert all(r["dcg"] <= r["idcg"] + 1e-9 for r in got)


def test_js_divergence_identical_halves_zero(spark, monkeypatch):
    """Same type mix in both halves -> every contribution rounds to 0."""
    rows = []
    # early half: days 1-2; late half: days 3-4, identical mixes
    for d, base in ((1, 0), (3, 100)):
        rows += [(f"2024-01-0{d} 00:00:00", base + i, "a", 1) for i in range(6)]
        rows += [(f"2024-01-0{d} 00:00:00", base + i, "b", 1) for i in range(3)]
    ev = _events_ts(spark, rows)
    monkeypatch.setattr(prof, "table", lambda s, d, n: ev)
    got = prof.drift_js_divergence_type_mix(spark, "x").collect()
    assert {r["event_type"] for r in got} == {"a", "b"}
    assert all(abs(r["jsd_contrib"]) < 1e-6 for r in got)


def test_js_divergence_disjoint_types_bounded_by_ln2(spark, monkeypatch):
    """Type 'a' only early, 'b' only late: strong positive contributions,
    total <= ln 2 (the JS bound, which PSI does not have)."""
    rows = [("2024-01-01 00:00:00", i, "a", 1) for i in range(50)]
    rows += [("2024-01-09 00:00:00", i, "b", 1) for i in range(50)]
    ev = _events_ts(spark, rows)
    monkeypatch.setattr(prof, "table", lambda s, d, n: ev)
    got = {r["event_type"]: r for r in
           prof.drift_js_divergence_type_mix(spark, "x").collect()}
    assert got["a"]["n_early"] == 50 and got["a"]["n_late"] == 0
    total = sum(r["jsd_contrib"] for r in got.values())
    assert 0.3 < total <= math.log(2) + 1e-9


def test_sessions_gap30_hand_planted(spark, monkeypatch):
    """User 1: events at 0s, 10s, 20s (one session, 20s active), then
    2000s later two more 5s apart (second session).  User 2: one event
    -> one zero-length session."""
    rows = [
        ("2024-01-01 00:00:00", 1, "a", 1),
        ("2024-01-01 00:00:10", 1, "a", 1),
        ("2024-01-01 00:00:20", 1, "a", 1),
        ("2024-01-01 00:33:41", 1, "a", 1),  # gap 2001s > 1800
        ("2024-01-01 00:33:46", 1, "a", 1),
        ("2024-01-01 00:00:00", 2, "a", 1),
    ]
    ev = _events_ts(spark, rows)
    monkeypatch.setattr(bh, "table", lambda s, d, n: ev)
    got = {r["user_id"]: r for r in
           bh.behavior_sessions_gap30(spark, "x").collect()}
    assert got[1]["n_sessions"] == 2
    assert got[1]["n_events"] == 5
    assert got[1]["active_seconds"] == 25
    assert got[1]["max_session_events"] == 3
    assert got[2]["n_sessions"] == 1 and got[2]["active_seconds"] == 0


def test_sessions_gap_exactly_at_cutoff_continues(spark, monkeypatch):
    """A gap of exactly 1800s does NOT start a new session (strict >)."""
    rows = [
        ("2024-01-01 00:00:00", 1, "a", 1),
        ("2024-01-01 00:30:00", 1, "a", 1),
    ]
    ev = _events_ts(spark, rows)
    monkeypatch.setattr(bh, "table", lambda s, d, n: ev)
    row = bh.behavior_sessions_gap30(spark, "x").collect()[0]
    assert row["n_sessions"] == 1 and row["active_seconds"] == 1800


def test_sma_crossover_step_change(spark, monkeypatch):
    """Daily value 1.0 for days 1-40, 2.0 from day 41: the first emitted
    day is day 28; equality on day 40 keeps fast_above false (strict >,
    cross-multiplied integers), day 41 flips it — exactly one crossed
    day."""
    rows = []
    for d in range(1, 57):
        ts = f"2024-{1 + (d - 1) // 28:02d}-{(d - 1) % 28 + 1:02d} 12:00:00"
        rows.append((ts, d, "t", 1.0 if d <= 40 else 2.0))
    ev = _events_ts(spark, rows)
    monkeypatch.setattr(bh, "table", lambda s, d, n: ev)
    got = sorted(
        bh.trend_sma_crossover_signals(spark, "x").collect(),
        key=lambda r: r["day"],
    )
    assert len(got) == 56 - 28 + 1
    crossed = [r for r in got if r["crossed"]]
    assert len(crossed) == 1
    assert str(crossed[0]["day"]) == "2024-02-13"  # day 41
    assert crossed[0]["fast_above"] is True
    # constant prefix: never above (ties lose under strict >)
    assert all(r["fast_above"] is False for r in got
               if str(r["day"]) < "2024-02-13")


def test_fd_screen_planted_violations(spark, monkeypatch):
    """event_id is unique -> its FD holds with zero violations; user 1
    emits two types -> the user FD has exactly one violating group and
    fan-out 2."""
    rows = [
        ("2024-01-01 00:00:00", 1, "a", 1),
        ("2024-01-01 01:00:00", 1, "b", 1),
        ("2024-01-01 02:00:00", 2, "a", 1),
        ("2024-01-02 00:00:00", 3, "a", 1),
    ]
    ev = _events_ts(spark, rows)
    monkeypatch.setattr(prof, "table", lambda s, d, n: ev)
    got = {r["fd"]: r for r in prof.profile_fd_screen(spark, "x").collect()}
    assert got["event_id->event_type"]["n_violating"] == 0
    assert got["event_id->event_type"]["n_groups"] == 4
    assert got["user_id->event_type"]["n_violating"] == 1
    assert got["user_id->event_type"]["max_dep_values"] == 2
    assert got["day->event_type"]["n_groups"] == 2
    assert got["day->event_type"]["n_violating"] == 1
