"""Planted-fixture tests for the round-7b operators: Poisson
bootstrap CI, per-group mode, theta-sketch set difference."""

from __future__ import annotations

import datetime as dt
import hashlib
import math

import fortisiem_clickhouse_monitor_spark.operators.advanced as adv

_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def _ev(rows, spark):
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, d, 12, 0, 0), u, t, v, "{}")
            for i, (d, u, t, v) in enumerate(rows)
        ],
        _EV_SCHEMA,
    )


def _poisson_mult(eid: int, b: int) -> int:
    """Reference multiplicity: same grouped-digest inverse-CDF as the
    op — replicate b reads 6-hex slice b%5 of md5(f"{eid}:{b//5}")."""
    g, j = divmod(b, 5)
    digest = hashlib.md5(f"{eid}:{g}".encode()).hexdigest()
    h = int(digest[6 * j : 6 * j + 6], 16)
    for k, t in enumerate(adv._BOOT_T):
        if h < t:
            return k
    return 8


def test_bootstrap_mean_ci_planted(spark, monkeypatch):
    """Pure-Python recompute of every replicate mean from the same
    hash spec: the op's CI bounds must be exactly the 2nd and 63rd of
    the 64 sorted replicate milli-cent means."""
    rows = [(1 + (i % 28), 1, "view", float(i)) for i in range(40)]
    ev = _ev(rows, spark)
    monkeypatch.setattr(adv, "table", lambda s, d, n: ev)
    out = adv.stats_bootstrap_mean_ci(spark, "x").collect()[0]
    cents = {i: math.floor(float(i) * 100) for i in range(40)}
    means = []
    for b in range(adv._BOOT_B):
        ms = mn = 0
        for eid, c in cents.items():
            m = _poisson_mult(eid, b)
            ms += m * c
            mn += m
        if mn > 0:
            means.append((1000 * ms) // mn)
    means.sort()
    assert out["n_events"] == 40
    assert out["n_replicates"] == adv._BOOT_B
    assert out["ci_lo"] == round(means[adv._BOOT_LO_RN - 1] / 100000.0, 6)
    assert out["ci_hi"] == round(means[adv._BOOT_HI_RN - 1] / 100000.0, 6)
    assert out["ci_lo"] <= out["mean_value"] <= out["ci_hi"]


def test_mode_event_type_planted(spark, monkeypatch):
    """u1: 2 views / 1 click -> view.  u2: 1-1 tie between click and
    view -> lexicographically smaller 'click' wins deterministically."""
    ev = _ev(
        [(1, 1, "view", 0.0), (2, 1, "view", 0.0), (3, 1, "click", 0.0),
         (1, 2, "view", 0.0), (2, 2, "click", 0.0)],
        spark,
    )
    monkeypatch.setattr(adv, "table", lambda s, d, n: ev)
    got = {
        r["user_id"]: (r["mode_type"], r["mode_count"], r["n_total"],
                       r["mode_share"])
        for r in adv.agg_mode_event_type(spark, "x").collect()
    }
    assert got == {
        1: ("view", 2, 3, round(2 / 3, 4)),
        2: ("click", 1, 2, 0.5),
    }


def test_kmv_difference_planted(spark, monkeypatch):
    """Under-k branch: sets smaller than K make theta = M, so the
    estimate must equal the exact difference.  Week-1 clickers {1,2,3},
    final-week clickers {2,3,4} -> |A \\ B| = 1 (user 1)."""
    ev = _ev(
        [(1, 1, "click", 0.0), (2, 2, "click", 0.0), (3, 3, "click", 0.0),
         (22, 2, "click", 0.0), (23, 3, "click", 0.0),
         (24, 4, "click", 0.0),
         (5, 9, "view", 0.0)],  # non-click ignored
        spark,
    )
    monkeypatch.setattr(adv, "table", lambda s, d, n: ev)
    out = adv.sketch_kmv_difference_eval(spark, "x").collect()[0]
    assert out["n_exact"] == 1
    assert out["n_diff"] == 1
    assert out["kmv_estimate"] == 1.0
    assert out["rel_error"] == 0.0


def test_pettitt_planted_shift(spark, monkeypatch):
    """Six days: 10,10,10,50,50,50.  U_t peaks (|U|=9) at the last
    low day (day 3): every (low, high) crossing pair contributes -1,
    3x3 pairs.  Pure-python recompute of U per boundary confirms."""
    import fortisiem_clickhouse_monitor_spark.operators.slo as slo

    rows = []
    eid = 0
    counts = [10, 10, 10, 50, 50, 50]
    for d, c in enumerate(counts, start=1):
        for _ in range(c):
            rows.append((eid, dt.datetime(2024, 1, d), 7, "view", 0.0, "{}"))
            eid += 1
    ev = spark.createDataFrame(rows, _EV_SCHEMA)
    monkeypatch.setattr(slo, "table", lambda s, d, n: ev)
    out = slo.changepoint_pettitt_daily(spark, "x").collect()
    assert len(out) == 1
    r = out[0]

    def sgn(x):
        return (x > 0) - (x < 0)

    us = {}
    for t in range(len(counts) - 1):
        us[t] = sum(
            sgn(counts[i] - counts[j])
            for i in range(t + 1)
            for j in range(t + 1, len(counts))
        )
    k, t_star = max(((abs(u), -t) for t, u in us.items()))
    assert r["k_stat"] == k == 9
    assert str(r["change_day"]) == f"2024-01-0{-t_star + 1}"
    n = 6
    p = round(2 * math.exp(-6.0 * k * k / (n**3 + n**2)), 4)
    assert r["p_approx"] == p


def test_iqr_fences_planted(spark, monkeypatch):
    """n=8 values with one extreme high point.  Quartile ranks are
    ceil(8/4)=2 and ceil(24/4)=6; the planted 1000.0 sits above
    q3 + 1.5*IQR, nothing sits below."""
    import fortisiem_clickhouse_monitor_spark.operators.profiling as pf

    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 1000.0]
    ev = _ev([(1, 1, "view", v) for v in vals], spark)
    monkeypatch.setattr(pf, "table", lambda s, d, n: ev)
    r = pf.quality_iqr_fence_outliers(spark, "x").collect()[0]
    assert r["n"] == 8
    assert r["q1_micro"] == 2_000_000 and r["q3_micro"] == 6_000_000
    assert r["iqr_micro"] == 4_000_000
    # fences: lo = 2 - 6 = -4, hi = 6 + 6 = 12 -> only 1000.0 is out
    assert r["n_low"] == 0 and r["n_high"] == 1
    assert r["outlier_rate"] == round(1 / 8, 4)


def test_inverted_index_planted(spark, monkeypatch):
    """Three docs; 'a' appears in all (df=3, cf=4 with the repeat),
    'b' in two, 'c' in one; postings are ascending doc_ids; ranking
    is df desc then token asc."""
    import fortisiem_clickhouse_monitor_spark.operators.text as tx

    docs = spark.createDataFrame(
        [(10, "a b", "en", "s", 3), (20, "b a a", "en", "s", 5),
         (30, "a c", "en", "s", 3)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    monkeypatch.setattr(tx, "table", lambda s, d, n: docs)
    rows = tx.text_inverted_index_postings(spark, "x").collect()
    assert [r["token"] for r in rows] == ["a", "b", "c"]
    by = {r["token"]: r for r in rows}
    assert (by["a"]["df"], by["a"]["cf"]) == (3, 4)
    assert by["a"]["posting_head"] == [10, 20, 30]
    assert (by["b"]["df"], by["b"]["cf"]) == (2, 2)
    assert by["b"]["posting_head"] == [10, 20]
    assert (by["c"]["df"], by["c"]["cf"]) == (1, 1)
    assert by["c"]["posting_head"] == [30]


def test_asof_tolerance_planted(spark, monkeypatch):
    """u1 clicks 13:00 with purchase at 12:30 (within 1h -> matched,
    value 9.0) and clicks 18:00 with nothing since 12:30 (stale ->
    NULL, matched False).  u2 has no purchase at all -> NULL."""
    import fortisiem_clickhouse_monitor_spark.operators.joins as jn

    rows = [
        (1, dt.datetime(2024, 1, 5, 12, 30), 1, "purchase", 9.0, "{}"),
        (2, dt.datetime(2024, 1, 5, 13, 0), 1, "click", 0.0, "{}"),
        (3, dt.datetime(2024, 1, 5, 18, 0), 1, "click", 0.0, "{}"),
        (4, dt.datetime(2024, 1, 5, 13, 0), 2, "click", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(rows, _EV_SCHEMA)
    monkeypatch.setattr(jn, "table", lambda s, d, n: ev)
    got = {
        r["click_id"]: (r["asof_value"], r["matched"])
        for r in jn.join_asof_tolerance(spark, "x").collect()
    }
    assert got == {2: (9.0, True), 3: (None, False), 4: (None, False)}


def test_lateral_topn_planted(spark, monkeypatch):
    """Customer 1 (nation 0) has 4 orders -> top 3 by price with
    ranks; customer 2 (nation 9) is filtered out by nationkey < 5."""
    import fortisiem_clickhouse_monitor_spark.operators.joins as jn

    cust = spark.createDataFrame(
        [(1, "a", 0, 0.0, "B"), (2, "b", 9, 0.0, "B")],
        "c_custkey long, c_name string, c_nationkey int,"
        " c_acctbal double, c_mktsegment string",
    )
    orders = spark.createDataFrame(
        [(10, 1, "O", 50.0, dt.datetime(2024, 1, 1), "1-URGENT"),
         (11, 1, "O", 70.0, dt.datetime(2024, 1, 1), "1-URGENT"),
         (12, 1, "O", 60.0, dt.datetime(2024, 1, 1), "1-URGENT"),
         (13, 1, "O", 40.0, dt.datetime(2024, 1, 1), "1-URGENT"),
         (20, 2, "O", 99.0, dt.datetime(2024, 1, 1), "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    )
    tabs = {"customer": cust, "orders": orders}
    monkeypatch.setattr(jn, "table", lambda s, d, n: tabs[n])
    rows = jn.join_lateral_topn_orders(spark, "x").collect()
    got = sorted((r["c_custkey"], r["rnk"], r["o_orderkey"],
                  r["price_cents"]) for r in rows)
    assert got == [(1, 1, 11, 7000), (1, 2, 12, 6000), (1, 3, 10, 5000)]


def test_hamming_sign_topk_planted(spark, monkeypatch):
    """Four 64-dim vectors: v2 equals v1's signs (distance 0), v3
    flips one dim (1), v4 flips three (3).  Query set = all four; v1's
    neighbor ranking must be v2, v3, v4."""
    import fortisiem_clickhouse_monitor_spark.operators.similarity as sm

    base = [1.0 if i % 2 == 0 else -1.0 for i in range(64)]
    flip1 = base.copy(); flip1[5] = -flip1[5]
    flip3 = base.copy()
    for i in (7, 8, 9):
        flip3[i] = -flip3[i]
    emb = spark.createDataFrame(
        [(1, base, 0), (2, base.copy(), 0), (3, flip1, 0), (4, flip3, 0)],
        "vec_id long, embedding array<float>, label int",
    )
    monkeypatch.setattr(sm, "table", lambda s, d, n: emb)
    rows = sm.sim_hamming_sign_topk(spark, "x").collect()
    v1 = sorted(
        ((r["rnk"], r["neighbor_id"], r["hamming"])
         for r in rows if r["query_id"] == 1)
    )
    assert v1 == [(1, 2, 0), (2, 3, 1), (3, 4, 3)]


def test_bfs_histogram_planted(spark, monkeypatch):
    """Star + path: supplier 1 supplies parts 1..3 (hub, degree 3);
    part 3 is also supplied by supplier 2, who also supplies part 4.
    Seed = supplier hub; levels: 1 hub, 3 parts at dist 1, 1 supplier
    at dist 2, 1 part at dist 3."""
    import fortisiem_clickhouse_monitor_spark.operators.graph as gr

    li = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (3, 2), (4, 2)],
        "l_partkey long, l_suppkey long",
    )
    monkeypatch.setattr(gr, "table", lambda s, d, n: li)
    got = {
        r["dist"]: r["n_nodes"]
        for r in gr.graph_bfs_distance_histogram(spark, "x").collect()
    }
    assert got == {0: 1, 1: 3, 2: 1, 3: 1}


def test_textrank_planted_hub(spark, monkeypatch):
    """Star vocabulary: 'hub' co-occurs with x/y/z, the leaves only
    with hub.  Pure-python mirror of the integer fixed point (6
    rounds, damping 85/100, (pr*w) DIV strength) must reproduce the
    op's scores exactly; hub must rank first."""
    import fortisiem_clickhouse_monitor_spark.operators.text as tx

    docs = spark.createDataFrame(
        [(1, "hub x hub y", "en", "s", 11), (2, "hub z", "en", "s", 5)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    monkeypatch.setattr(tx, "table", lambda s, d, n: docs)
    rows = tx.text_textrank_keywords(spark, "x").collect()
    got = {r["token"]: r["pr"] for r in rows}

    # adjacency: hub-x, x-hub, hub-y, hub-z -> weights (symmetrized):
    # hub<->x 2, hub<->y 1, hub<->z 1
    edges = {("hub", "x"): 2, ("x", "hub"): 2, ("hub", "y"): 1,
             ("y", "hub"): 1, ("hub", "z"): 1, ("z", "hub"): 1}
    strength = {}
    for (a, _), w in edges.items():
        strength[a] = strength.get(a, 0) + w
    pr = {t: 1_000_000 for t in strength}
    for _ in range(tx._TR_ITERS):
        contrib = {}
        for (a, b), w in edges.items():
            contrib[b] = contrib.get(b, 0) + (pr[a] * w) // strength[a]
        pr = {b: 150000 + (85 * c) // 100 for b, c in contrib.items()}
    assert got == pr
    assert rows[0]["token"] == "hub"


def test_spectral_entropy_planted_period2(spark, monkeypatch):
    """Alternating 10/50 daily counts over 14 days: the periodogram
    peaks at period 2 and the python mirror of the rounded-power
    entropy matches."""
    import fortisiem_clickhouse_monitor_spark.operators.advanced as adv2

    rows = []
    eid = 0
    counts = [10, 50] * 7
    for d, c in enumerate(counts, start=1):
        for _ in range(c):
            rows.append((eid, dt.datetime(2024, 1, d), 3, "view", 0.0, "{}"))
            eid += 1
    ev = spark.createDataFrame(rows, _EV_SCHEMA)
    monkeypatch.setattr(adv2, "table", lambda s, d, n: ev)
    r = adv2.timeseries_spectral_entropy(spark, "x").collect()[0]
    assert r["peak_period"] == 2
    mu = sum(counts) / len(counts)
    powers = []
    for p in range(2, 15):
        re = sum((c - mu) * math.cos(2 * math.pi * d / p)
                 for d, c in enumerate(counts))
        im = sum((c - mu) * math.sin(2 * math.pi * d / p)
                 for d, c in enumerate(counts))
        powers.append(round(re * re + im * im, 4))
    tot = sum(powers)
    ent = -sum((p / tot) * math.log(p / tot) for p in powers if p > 0)
    assert r["spectral_entropy"] == round(ent, 6)
    assert r["entropy_norm"] == round(ent / math.log(13), 6)
    assert r["peak_share"] == round(max(powers) / tot, 6)


def test_log_compaction_planted(spark, monkeypatch):
    """u1: view then purchase -> compacts to the purchase with
    n_versions=2.  u2: purchase then tombstone ('error') latest ->
    key dropped.  u3: single view survives."""
    import fortisiem_clickhouse_monitor_spark.operators.behavior as beh

    rows = [
        (1, dt.datetime(2024, 1, 1), 1, "view", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 2), 1, "purchase", 5.5, "{}"),
        (3, dt.datetime(2024, 1, 1), 2, "purchase", 2.0, "{}"),
        (4, dt.datetime(2024, 1, 3), 2, "error", 0.0, "{}"),
        (5, dt.datetime(2024, 1, 1), 3, "view", 3.25, "{}"),
    ]
    ev = spark.createDataFrame(rows, _EV_SCHEMA)
    monkeypatch.setattr(beh, "table", lambda s, d, n: ev)
    got = {
        r["user_id"]: (r["last_event_id"], r["last_type"],
                       r["last_value_cents"], r["n_versions"])
        for r in beh.cdc_log_compaction(spark, "x").collect()
    }
    assert got == {
        1: (2, "purchase", 550, 2),
        3: (5, "view", 325, 1),
    }


def test_repeat_purchase_gaps_planted(spark, monkeypatch):
    """u1 purchases on days 1, 3, 10 -> gaps 2 and 7; u2 once -> no
    gap.  Calendar-day semantics: 23:50 -> next day 00:10 is 1 day."""
    import fortisiem_clickhouse_monitor_spark.operators.behavior as beh

    rows = [
        (1, dt.datetime(2024, 1, 1, 12), 1, "purchase", 0.0, "{}"),
        (2, dt.datetime(2024, 1, 3, 12), 1, "purchase", 0.0, "{}"),
        (3, dt.datetime(2024, 1, 10, 12), 1, "purchase", 0.0, "{}"),
        (4, dt.datetime(2024, 1, 5, 23, 50), 2, "purchase", 0.0, "{}"),
        (5, dt.datetime(2024, 1, 6, 0, 10), 2, "purchase", 0.0, "{}"),
        (6, dt.datetime(2024, 1, 1), 3, "purchase", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(rows, _EV_SCHEMA)
    monkeypatch.setattr(beh, "table", lambda s, d, n: ev)
    got = {
        r["gap_days"]: r["n_repeats"]
        for r in beh.behavior_repeat_purchase_gaps(spark, "x").collect()
    }
    assert got == {2: 1, 7: 1, 1: 1}


def test_bigram_jm_logprob_planted(spark, monkeypatch):
    """One doc 'a b a b': bigrams ab, ba, ab.  JM score mirrors the
    closed form with lambda=0.7: P(b|a)=1, P(a|b)=1, unigram
    P(a)=P(b)=1/2."""
    import fortisiem_clickhouse_monitor_spark.operators.text as tx

    docs = spark.createDataFrame(
        [(1, "a b a b", "en", "s", 7)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    monkeypatch.setattr(tx, "table", lambda s, d, n: docs)
    r = tx.text_bigram_jm_logprob(spark, "x").collect()[0]
    assert r["n_bigrams"] == 3
    # every bigram: 0.7 * 1.0 + 0.3 * 0.5 = 0.85
    assert r["avg_logprob_jm"] == round(math.log(0.85), 4)


def test_forecast_backtest_planted(spark, monkeypatch):
    """Constant series 10,10,10,10: both models are perfect (MAE 0),
    SES does not beat naive (strict <).  Trending series 10,20,30:
    python mirror of the integer SES fold confirms the MAEs."""
    import fortisiem_clickhouse_monitor_spark.operators.behavior as beh

    rows = []
    eid = 0
    for d in range(1, 5):
        for _ in range(10):
            rows.append((eid, dt.datetime(2024, 1, d), 1, "view", 0.0, "{}"))
            eid += 1
    for d, c in ((1, 10), (2, 20), (3, 30)):
        for _ in range(c):
            rows.append((eid, dt.datetime(2024, 1, d), 1, "click", 0.0, "{}"))
            eid += 1
    ev = spark.createDataFrame(rows, _EV_SCHEMA)
    monkeypatch.setattr(beh, "table", lambda s, d, n: ev)
    got = {
        r["event_type"]: r
        for r in beh.ts_forecast_backtest_mae(spark, "x").collect()
    }
    v = got["view"]
    assert (v["n_scored"], v["mae_naive_fp"], v["mae_ses_fp"]) == (3, 0, 0)
    assert v["ses_wins"] is False

    S, A, D = beh._SES_S, beh._SES_A, beh._SES_D
    series = [10, 20, 30]
    lvl = series[0] * S
    sum_n = sum_s = 0
    for prev, n in zip(series, series[1:]):
        sum_n += abs(n - prev) * S
        sum_s += abs(n * S - lvl)
        lvl = ((D - A) * lvl + A * n * S) // D
    c = got["click"]
    assert c["n_scored"] == 2
    assert c["mae_naive_fp"] == sum_n // 2
    assert c["mae_ses_fp"] == sum_s // 2
    assert c["ses_wins"] == (sum_s < sum_n)


def test_order_reconciliation_planted(spark, monkeypatch):
    """Order 1 reconciles within the 100-cent tolerance, order 2 is
    off by 50.00, order 3 has no lineitems (headless)."""
    import fortisiem_clickhouse_monitor_spark.operators.profiling as pf

    orders = spark.createDataFrame(
        [(1, 1, "O", 100.00, dt.datetime(2024, 1, 1), "x"),
         (2, 1, "O", 100.00, dt.datetime(2024, 1, 1), "x"),
         (3, 1, "F", 100.00, dt.datetime(2024, 1, 1), "x")],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    )
    li = spark.createDataFrame(
        [(1, 1, 1, 1, 1.0, 99.50, 0.0, 0.0, "N", "O",
          dt.datetime(2024, 1, 2)),
         (2, 1, 1, 1, 1.0, 50.00, 0.0, 0.0, "N", "O",
          dt.datetime(2024, 1, 2))],
        "l_orderkey long, l_partkey long, l_suppkey long,"
        " l_linenumber long, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    )
    tabs = {"orders": orders, "lineitem": li}
    monkeypatch.setattr(pf, "table", lambda s, d, n: tabs[n])
    got = {
        r["orderstatus"]: r
        for r in pf.quality_order_total_reconciliation(spark, "x").collect()
    }
    o = got["O"]
    assert (o["n_orders"], o["n_headless"], o["n_consistent"]) == (2, 0, 1)
    assert o["max_abs_diff_cents"] == 5000
    assert o["consistency_rate"] == 0.5
    f = got["F"]
    assert (f["n_orders"], f["n_headless"], f["n_consistent"]) == (1, 1, 0)
    assert f["max_abs_diff_cents"] is None


def test_weighted_percentiles_planted(spark, monkeypatch):
    """Prices 1.00 (weight 9) and 100.00 (weight 1): per-row p50
    would be mid-way; weighted p50 must sit at 1.00 (cum weight 9/10
    crosses 50%), p99 at 100.00 (needs 99%)."""
    import fortisiem_clickhouse_monitor_spark.operators.advanced as adv2

    li = spark.createDataFrame(
        [(1, 1, 1, 1, 9.0, 1.00, 0.0, 0.0, "N", "O",
          dt.datetime(2024, 1, 2)),
         (2, 1, 1, 1, 1.0, 100.00, 0.0, 0.0, "N", "O",
          dt.datetime(2024, 1, 2))],
        "l_orderkey long, l_partkey long, l_suppkey long,"
        " l_linenumber long, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    )
    monkeypatch.setattr(adv2, "table", lambda s, d, n: li)
    r = adv2.percentiles_weighted_exact(spark, "x").collect()[0]
    assert r["total_weight"] == 10
    assert r["p50_cents"] == 100
    assert r["p90_cents"] == 100
    assert r["p99_cents"] == 10000


def test_summap_planted(spark, monkeypatch):
    """Two days; payload is the sorted (type, cents) JSON."""
    import fortisiem_clickhouse_monitor_spark.operators.advanced as adv2

    ev = _ev(
        [(1, 1, "view", 1.25), (1, 2, "click", 2.00), (1, 3, "view", 0.50),
         (2, 1, "view", 3.00)],
        spark,
    )
    monkeypatch.setattr(adv2, "table", lambda s, d, n: ev)
    got = {
        str(r["day"]): (r["n_types"], r["type_values_json"])
        for r in adv2.agg_summap_daily_type_values(spark, "x").collect()
    }
    assert got["2024-01-01"] == (
        2, '[{"k":"click","v":200},{"k":"view","v":175}]'
    )
    assert got["2024-01-02"] == (1, '[{"k":"view","v":300}]')


def test_degree_gini_planted(spark, monkeypatch):
    """Star: supplier 1 supplies parts 1..4 -> degrees [4,1,1,1,1].
    Rank formula over ascending [1,1,1,1,4]: G = 2*(1+2+3+4+20)/(5*8)
    - 6/5 = 0.3."""
    import fortisiem_clickhouse_monitor_spark.operators.graph as gr

    li = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 1)],
        "l_partkey long, l_suppkey long",
    )
    monkeypatch.setattr(gr, "table", lambda s, d, n: li)
    r = gr.graph_degree_gini(spark, "x").collect()[0]
    assert (r["n_nodes"], r["total_degree"], r["max_degree"]) == (5, 8, 4)
    assert r["gini"] == 0.3


def test_norm_screen_planted(spark, monkeypatch):
    """Unit vector -> bucket 10; zero vector -> bucket 0 (collapse);
    3-4-0... vector -> norm 5.0 -> bucket 50."""
    import fortisiem_clickhouse_monitor_spark.operators.similarity as sm

    z = [0.0] * 64
    unit = [1.0] + [0.0] * 63
    v5 = [3.0, 4.0] + [0.0] * 62
    emb = spark.createDataFrame(
        [(1, unit, 0), (2, z, 0), (3, v5, 0)],
        "vec_id long, embedding array<float>, label int",
    )
    monkeypatch.setattr(sm, "table", lambda s, d, n: emb)
    got = {
        r["norm_decibucket"]: (r["n_vectors"], r["min_norm"], r["max_norm"])
        for r in sm.sim_norm_distribution_screen(spark, "x").collect()
    }
    assert got == {10: (1, 1.0, 1.0), 0: (1, 0.0, 0.0), 50: (1, 5.0, 5.0)}


def test_conversion_ztest_planted(spark, monkeypatch):
    """Week1: 10 events, 2 purchases (0.2).  Week4: 10 events, 5
    purchases (0.5).  Closed-form z must match; middle weeks ignored."""
    import fortisiem_clickhouse_monitor_spark.operators.advanced as adv2

    rows = []
    eid = 0
    for d, n_p in ((1, 2), (25, 5)):
        for i in range(10):
            t = "purchase" if i < n_p else "view"
            rows.append((eid, dt.datetime(2024, 1, d), 1, t, 0.0, "{}"))
            eid += 1
    rows.append((eid, dt.datetime(2024, 1, 12), 1, "purchase", 0.0, "{}"))
    ev = spark.createDataFrame(rows, _EV_SCHEMA)
    monkeypatch.setattr(adv2, "table", lambda s, d, n: ev)
    r = adv2.stats_conversion_rate_ztest(spark, "x").collect()[0]
    assert (r["week1_events"], r["week1_purchases"]) == (10, 2)
    assert (r["week4_events"], r["week4_purchases"]) == (10, 5)
    pool = 7 / 20
    z = (0.5 - 0.2) / math.sqrt(pool * (1 - pool) * (0.1 + 0.1))
    assert r["z_score"] == round(z, 4)


def test_balanced_downsample_planted(spark, monkeypatch):
    """Labels 0 (4 vecs) and 1 (2 vecs): both keep exactly 2; label
    1 keeps everything (checksum = full id sum); label 0's kept set
    matches the md5-order python mirror."""
    import fortisiem_clickhouse_monitor_spark.operators.corpus as cp

    emb = spark.createDataFrame(
        [(i, [0.0] * 64, 0) for i in (1, 2, 3, 4)]
        + [(i, [0.0] * 64, 1) for i in (10, 11)],
        "vec_id long, embedding array<float>, label int",
    )
    monkeypatch.setattr(cp, "table", lambda s, d, n: emb)
    got = {
        r["label"]: r
        for r in cp.sample_balanced_label_downsample(spark, "x").collect()
    }
    assert got[1]["n_before"] == 2 and got[1]["n_kept"] == 2
    assert got[1]["kept_id_sum"] == 21
    assert got[0]["n_before"] == 4 and got[0]["n_kept"] == 2
    order = sorted(
        (hashlib.md5(str(i).encode()).hexdigest(), i) for i in (1, 2, 3, 4)
    )
    assert got[0]["kept_id_sum"] == order[0][1] + order[1][1]
    assert got[0]["target_per_class"] == 2
