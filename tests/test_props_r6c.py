"""Property-based checks for the third round-6 batch: the Pareto
frontier equals the quadratic dominance filter on random point sets,
the sequenceCount ballot identity equals the greedy counter machine on
random symbol strings, Mann-Whitney is translation-invariant, and the
Wasserstein distance of a pure shift IS the shift."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import fortisiem_clickhouse_monitor_spark.operators.advanced as adv
import fortisiem_clickhouse_monitor_spark.operators.behavior as bh
import fortisiem_clickhouse_monitor_spark.operators.profiling as prof

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _events_df(spark, rows):
    """rows: (event_id, user_id, event_type, second, value)."""
    return spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, sec int,"
        " value double",
    ).selectExpr(
        "event_id",
        "CAST(timestampadd(SECOND, sec, TIMESTAMP '2024-01-01')"
        " AS TIMESTAMP) AS ts",
        "user_id",
        "event_type",
        "value",
        "'{}' AS props",
    )


# ---------------------------------------------------------------------------
# Pareto frontier == quadratic dominance filter
# ---------------------------------------------------------------------------

_points = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=8),
        st.integers(min_value=0, max_value=8),
    ),
    min_size=1,
    max_size=20,
)


@settings(**_SETTINGS)
@given(pts=_points)
def test_pareto_frontier_equals_bruteforce(spark, monkeypatch, pts):
    rows = [
        (i, float(p * 37), s)  # spread prices across carry buckets
        for i, (p, s) in enumerate(pts)
    ]
    part = spark.createDataFrame(
        rows, "p_partkey long, p_retailprice double, p_size int"
    )
    monkeypatch.setattr(adv, "table", lambda s, d, n: part)
    got = {
        r["p_partkey"]
        for r in adv.rank_pareto_frontier_parts(spark, "x").collect()
    }
    want = {
        i
        for i, (p, s) in enumerate(pts)
        if not any(
            (q <= p and t <= s) and (q < p or t < s) for q, t in pts
        )
    }
    assert got == want


# ---------------------------------------------------------------------------
# sequenceCount ballot identity == greedy counter machine
# ---------------------------------------------------------------------------

_seq = st.lists(
    st.sampled_from(["click", "purchase", "view"]), min_size=1, max_size=25
)


@settings(**_SETTINGS)
@given(seq=_seq)
def test_sequence_count_equals_greedy(spark, monkeypatch, seq):
    ev = _events_df(
        spark,
        [(i, 1, et, i, 1.0) for i, et in enumerate(seq)],
    )
    monkeypatch.setattr(bh, "table", lambda s, d, n: ev)
    rows = bh.pattern_sequence_count_ab(spark, "x").collect()
    avail = matches = 0
    for s in seq:
        if s == "click":
            avail += 1
        elif s == "purchase" and avail > 0:
            avail -= 1
            matches += 1
    if not any(s in ("click", "purchase") for s in seq):
        assert rows == []
    else:
        assert [(r["n_matches"], r["n_users"]) for r in rows] == [
            (matches, 1)
        ]


# ---------------------------------------------------------------------------
# Mann-Whitney translation invariance; Wasserstein shift identity
# ---------------------------------------------------------------------------

_vals = st.lists(
    st.integers(min_value=0, max_value=20), min_size=2, max_size=10
)


@settings(**_SETTINGS)
@given(early=_vals, late=_vals, shift=st.integers(min_value=1, max_value=50))
def test_mannwhitney_translation_invariant(
    spark, monkeypatch, early, late, shift
):
    def build(offset):
        rows = [
            (i, 1, "x", 0, float(v + offset)) for i, v in enumerate(early)
        ] + [
            (100 + i, 1, "x", 100, float(v + offset))
            for i, v in enumerate(late)
        ]
        return _events_df(spark, rows)

    out = []
    for off in (0, shift):
        monkeypatch.setattr(prof, "table", lambda s, d, n, _e=build(off): _e)
        (r,) = prof.drift_mannwhitney_values(spark, "x").collect()
        out.append((r["u_early"], r["z"]))
    assert out[0] == out[1]


@settings(**_SETTINGS)
@given(early=_vals, shift=st.integers(min_value=0, max_value=9))
def test_wasserstein_of_pure_shift_is_the_shift(
    spark, monkeypatch, early, shift
):
    rows = [
        (i, 1, "x", 0, float(v)) for i, v in enumerate(early)
    ] + [
        (100 + i, 1, "x", 100, float(v + shift))
        for i, v in enumerate(early)
    ]
    ev = _events_df(spark, rows)
    monkeypatch.setattr(prof, "table", lambda s, d, n: ev)
    out = prof.drift_wasserstein_values(spark, "x").collect()
    if shift == 0 and len(set(early)) == 1:
        # single pooled value -> no segments at all
        assert out == [] or out[0]["w1"] == 0.0
    else:
        (r,) = out
        assert r["w1"] == float(shift)


# ---------------------------------------------------------------------------
# Kaplan-Meier structural invariants on random lifetime layouts
# ---------------------------------------------------------------------------

_users = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),    # first day
        st.integers(min_value=0, max_value=25),   # lifetime days
    ),
    min_size=2,
    max_size=12,
)


@settings(**_SETTINGS)
@given(users=_users)
def test_kaplan_meier_invariants(spark, monkeypatch, users):
    rows, eid = [], 0
    for uid, (first, life) in enumerate(users):
        rows.append((eid, uid, "view", first * 86400, 1.0))
        eid += 1
        if life:
            rows.append((eid, uid, "view", (first + life) * 86400, 1.0))
            eid += 1
    ev = _events_df(spark, rows)
    monkeypatch.setattr(bh, "table", lambda s, d, n: ev)
    out = sorted(
        bh.behavior_kaplan_meier_retention(spark, "x").collect(),
        key=lambda r: r["t_days"],
    )
    # risk sets partition the population; survival is a non-increasing
    # probability starting at <= 1
    n_total = len(users)
    assert out[0]["n_at_risk"] == n_total
    prev = 1.0
    for r in out:
        assert 0.0 <= r["survival"] <= prev + 1e-9
        assert r["n_deaths"] + r["n_censored"] <= r["n_at_risk"]
        prev = r["survival"]
    assert sum(r["n_deaths"] + r["n_censored"] for r in out) == n_total


_wp_items = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=999),   # price cents/100
        st.integers(min_value=1, max_value=50),    # integral quantity
    ),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(items=_wp_items)
def test_weighted_percentiles_match_expansion(spark, monkeypatch, items):
    """percentiles_weighted_exact on arbitrary (price, weight) rows
    must equal the UNweighted percentile_disc over the fully expanded
    multiset (each value repeated weight times) — the defining
    property of a weighted quantile — and be monotone p50<=p90<=p99."""
    import datetime as dt

    li = spark.createDataFrame(
        [
            (i, 1, 1, 1, float(w), float(c), 0.0, 0.0, "N", "O",
             dt.datetime(2024, 1, 2))
            for i, (c, w) in enumerate(items)
        ],
        "l_orderkey long, l_partkey long, l_suppkey long,"
        " l_linenumber long, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    )
    monkeypatch.setattr(adv, "table", lambda s, d, n: li)
    r = adv.percentiles_weighted_exact(spark, "x").collect()[0]

    expanded = sorted(
        c * 100 for c, w in items for _ in range(w)
    )
    n = len(expanded)

    def disc(q_num, q_den):
        # smallest value whose cumulative count reaches q * n
        import math as _m

        k = _m.ceil(q_num * n / q_den)
        return expanded[k - 1]

    assert r["total_weight"] == n
    assert r["p50_cents"] == disc(1, 2)
    assert r["p90_cents"] == disc(9, 10)
    assert r["p99_cents"] == disc(99, 100)
    assert r["p50_cents"] <= r["p90_cents"] <= r["p99_cents"]
