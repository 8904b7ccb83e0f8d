"""Planted-fixture tests for the round-7 operators: purchaser
lifecycle growth accounting, audience overlap, survivorship by source,
and the embedding range-search degree histogram."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

import fortisiem_clickhouse_monitor_spark.operators.behavior as beh
import fortisiem_clickhouse_monitor_spark.operators.dedup as dd
import fortisiem_clickhouse_monitor_spark.operators.similarity as sim

_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def _ev(rows, spark):
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, d, 12, 0, 0), u, t, 0.0, "{}")
            for i, (d, u, t) in enumerate(rows)
        ],
        _EV_SCHEMA,
    )


def test_purchaser_lifecycle_planted(spark, monkeypatch):
    """u1 purchases days 1,2,4; u2 day 2 only.  Accounting identity:
    day1 new=1; day2 retained=1(u1) new=1(u2); day3 churned=2 (both
    quiet after day 2); day4 resurrected=1 (u1 returns after a gap);
    day5 churned=1 (u1's last day books churn the day after)."""
    ev = _ev(
        [(1, 1, "purchase"), (2, 1, "purchase"), (4, 1, "purchase"),
         (2, 2, "purchase"), (3, 2, "view")],  # non-purchase is ignored
        spark,
    )
    monkeypatch.setattr(beh, "table", lambda s, d, n: ev)
    got = {
        str(r["day"]): (
            r["n_new"], r["n_retained"], r["n_resurrected"], r["n_churned"]
        )
        for r in beh.behavior_purchaser_lifecycle_daily(spark, "x").collect()
    }
    assert got == {
        "2024-01-01": (1, 0, 0, 0),
        "2024-01-02": (1, 1, 0, 0),
        "2024-01-03": (0, 0, 0, 2),
        "2024-01-04": (0, 0, 1, 0),
        "2024-01-05": (0, 0, 0, 1),
    }
    # identity: actives(d) = actives(d-1) - churned(d) + new(d) + res(d)
    a2 = sum(got["2024-01-02"][:3])
    a4 = sum(got["2024-01-04"][:3])
    assert a2 == 2 and a4 == 1


def test_audience_overlap_planted(spark, monkeypatch):
    """Users {1,2,3} do A, {2,3} do B, {4} does C: (A,B) Jaccard 2/3;
    zero-intersection pairs are absent (inner-join contract)."""
    ev = _ev(
        [(1, 1, "A"), (2, 2, "A"), (3, 3, "A"), (4, 2, "A"),  # dup event
         (5, 2, "B"), (6, 3, "B"), (7, 4, "C")],
        spark,
    )
    monkeypatch.setattr(beh, "table", lambda s, d, n: ev)
    rows = beh.behavior_audience_overlap(spark, "x").collect()
    got = {(r["type_a"], r["type_b"]): r for r in rows}
    assert set(got) == {("A", "B")}
    r = got[("A", "B")]
    assert (r["n_a"], r["n_b"], r["n_both"]) == (3, 2, 2)
    assert abs(r["jaccard"] - round(2 / 3, 4)) < 1e-9


def test_survivorship_by_source_planted(spark, monkeypatch):
    """Component {1,2,3} keeps root 1; singleton 4 keeps itself.
    Sources: 1,3 -> s1 (keep 1, drop 1); 2,4 -> s2 (keep 4, drop 2)."""
    stars = spark.createDataFrame([(1, 2), (1, 3)], "u long, v long")
    docs = spark.createDataFrame(
        [(1, "s1"), (2, "s2"), (3, "s1"), (4, "s2")],
        "doc_id long, source string",
    )
    monkeypatch.setattr(dd, "shared_star_forest", lambda s, d: stars)
    monkeypatch.setattr(dd, "table", lambda s, d, n: docs)
    got = {
        r["source"]: (r["n_docs"], r["n_kept"], r["n_dropped"], r["drop_ppm"])
        for r in dd.dedup_survivorship_by_source(spark, "x").collect()
    }
    assert got == {"s1": (2, 1, 1, 500000), "s2": (2, 1, 1, 500000)}


def test_range_degree_histogram_planted(spark, tmp_path):
    """v0==v1 (cos 1.0, degree 1 each), v2 orthogonal (0), v3 = -v0
    (cos -1, 0): histogram {1: 2, 0: 2}."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    sf_dir = str(tmp_path / "sf_planted")
    os.makedirs(sf_dir)
    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [2.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),
    ]
    pq.write_table(
        pa.table(
            {
                "vec_id": [v[0] for v in vecs],
                "embedding": pa.array(
                    [v[1] for v in vecs], type=pa.list_(pa.float32())
                ),
                "label": [0] * len(vecs),
            }
        ),
        f"{sf_dir}/embeddings.parquet",
    )
    got = {
        r["degree"]: r["n_vectors"]
        for r in sim.sim_range_degree_histogram(spark, sf_dir).collect()
    }
    assert got == {0: 2, 1: 2}


def test_conversion_latency_planted(spark, monkeypatch):
    """u1: click day1 noon, purchase day1 13:30 -> bucket 1; u2: click
    day1, purchase 30 min later -> bucket 0; u3 purchase BEFORE any
    click -> excluded; u4 click only -> excluded."""
    rows = [
        (0, dt.datetime(2024, 1, 1, 12, 0), 1, "click"),
        (1, dt.datetime(2024, 1, 1, 13, 30), 1, "purchase"),
        (2, dt.datetime(2024, 1, 1, 12, 0), 2, "click"),
        (3, dt.datetime(2024, 1, 1, 12, 30), 2, "purchase"),
        (4, dt.datetime(2024, 1, 1, 11, 0), 3, "purchase"),
        (5, dt.datetime(2024, 1, 1, 12, 0), 3, "click"),
        (6, dt.datetime(2024, 1, 1, 12, 0), 4, "click"),
    ]
    ev = spark.createDataFrame(
        [(i, ts, u, t, 0.0, "{}") for i, ts, u, t in rows], _EV_SCHEMA
    )
    monkeypatch.setattr(beh, "table", lambda s, d, n: ev)
    got = {
        r["hour_bucket"]: (r["n_users"], r["cum_users"])
        for r in beh.behavior_conversion_latency(spark, "x").collect()
    }
    assert got == {0: (1, 1), 1: (1, 2)}


def test_purchaser_lifecycle_random_differential(spark, monkeypatch):
    """Seeded pseudo-random purchase calendar for 40 users x 12 days:
    the operator must equal a pure-Python growth-accounting recompute
    on every day, and the accounting identity actives(d) =
    actives(d-1) - churned(d) + new(d) + resurrected(d) must hold on
    every day in the span (the property that makes the decomposition
    trustworthy, asserted beyond the hand-planted case)."""
    import random

    rng = random.Random(20260816)
    cal = {
        u: sorted(rng.sample(range(1, 13), rng.randint(1, 6)))
        for u in range(1, 41)
    }
    rows, eid = [], 0
    for u, days in cal.items():
        for d in days:
            rows.append((d, u, "purchase"))
    ev = _ev(rows, spark)
    monkeypatch.setattr(beh, "table", lambda s, d, n: ev)
    got = {
        r["day"].day: (
            r["n_new"], r["n_retained"], r["n_resurrected"], r["n_churned"]
        )
        for r in beh.behavior_purchaser_lifecycle_daily(spark, "x").collect()
    }

    # pure-python recompute
    exp: dict = {}
    for u, days in cal.items():
        ds = set(days)
        for d in days:
            state = (
                "new" if d == days[0]
                else "retained" if d - 1 in ds
                else "resurrected"
            )
            row = exp.setdefault(d, [0, 0, 0, 0])
            row[{"new": 0, "retained": 1, "resurrected": 2}[state]] += 1
            if d + 1 not in ds:
                exp.setdefault(d + 1, [0, 0, 0, 0])[3] += 1
    assert got == {d: tuple(v) for d, v in exp.items()}

    # accounting identity over the full span
    span = range(min(got), max(got) + 1)
    act = {d: sum(got.get(d, (0, 0, 0, 0))[:3]) for d in span}
    for d in span:
        if d == min(got):
            continue
        n, _r, res, ch = got.get(d, (0, 0, 0, 0))
        assert act[d] == act.get(d - 1, 0) - ch + n + res, d
