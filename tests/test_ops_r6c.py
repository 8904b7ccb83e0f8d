"""Planted-fixture tests for the third round-6 operator batch:
Mann-Whitney U drift screen, Welch A/B lift, item-item cosine
recommendations, and the 2-D Pareto frontier.  Each pins hand-computed
semantics on constructed data; the sf0.01 oracle gate covers the
hash-exact cross-engine contract."""

from __future__ import annotations

import hashlib
import math

import fortisiem_clickhouse_monitor_spark.operators.advanced as adv
import fortisiem_clickhouse_monitor_spark.operators.behavior as bh
import fortisiem_clickhouse_monitor_spark.operators.profiling as prof


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, f"2024-01-01 00:00:{t:02d}", u, et, float(v))
            for i, (t, u, et, v) in enumerate(rows)
        ],
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


def test_mannwhitney_separated_and_tied_groups(spark, monkeypatch):
    """Type 'x': early {1,2,3} strictly below late {10,20,30} -> U=0,
    z = -4.5/sqrt(5.25).  Type 'y': early {1,1}, late {1,2} -> the
    3-way tie at value 1 gives tie term 24, U=1, var=1, z=-1 exactly
    (hand-computed tie-corrected normal approximation)."""
    # mid = 0 + (51 - 0) div 2 = 25; early is t <= 25
    ev = _events(
        spark,
        [
            (0, 1, "x", 1),
            (1, 1, "x", 2),
            (2, 1, "x", 3),
            (49, 1, "x", 10),
            (50, 1, "x", 20),
            (51, 1, "x", 30),
            (0, 1, "y", 1),
            (1, 1, "y", 1),
            (49, 1, "y", 1),
            (50, 1, "y", 2),
        ],
    )
    monkeypatch.setattr(prof, "table", lambda s, d, n: ev)
    rows = {
        r["event_type"]: r
        for r in prof.drift_mannwhitney_values(spark, "x").collect()
    }
    x = rows["x"]
    assert (x["n_early"], x["n_late"], x["u_early"]) == (3, 3, 0.0)
    assert x["z"] == round(-4.5 / math.sqrt(5.25), 4)
    y = rows["y"]
    assert (y["n_early"], y["n_late"], y["u_early"]) == (2, 2, 1.0)
    assert y["z"] == -1.0


def test_mannwhitney_symmetric_null(spark, monkeypatch):
    """Identical early/late samples -> U at its mean, z = 0."""
    ev = _events(
        spark,
        [(t, 1, "x", v) for t, v in [(0, 1), (1, 2), (50, 1), (51, 2)]],
    )
    monkeypatch.setattr(prof, "table", lambda s, d, n: ev)
    (r,) = prof.drift_mannwhitney_values(spark, "x").collect()
    assert r["z"] == 0.0 and r["u_early"] == 2.0


def _md5_group_a(user_id: int) -> bool:
    return int(hashlib.md5(str(user_id).encode()).hexdigest()[:2], 16) % 2 == 0


def test_welch_lift_hand_computed(spark, monkeypatch):
    """Users are hash-assigned; pick ids so both groups are non-empty,
    then recompute means/t/df in plain Python from the same md5 spec."""
    users = list(range(20))
    ga = [u for u in users if _md5_group_a(u)]
    gb = [u for u in users if not _md5_group_a(u)]
    assert len(ga) >= 2 and len(gb) >= 2
    # one event per user: value = user_id + 100 for group A (planted lift)
    rows = [(u % 50, u, "purchase", u + (100 if _md5_group_a(u) else 0))
            for u in users]
    ev = _events(spark, rows)
    monkeypatch.setattr(bh, "table", lambda s, d, n: ev)
    (r,) = bh.behavior_ab_lift_welch(spark, "x").collect()
    va = [u + 100 for u in ga]
    vb = list(map(float, gb))
    ma, mb = sum(va) / len(va), sum(vb) / len(vb)
    sa = sum((v - ma) ** 2 for v in va) / (len(va) - 1)
    sb = sum((v - mb) ** 2 for v in vb) / (len(vb) - 1)
    se2 = sa / len(va) + sb / len(vb)
    t = (ma - mb) / math.sqrt(se2)
    df = se2**2 / (
        (sa / len(va)) ** 2 / (len(va) - 1)
        + (sb / len(vb)) ** 2 / (len(vb) - 1)
    )
    assert (r["n_a"], r["n_b"]) == (len(ga), len(gb))
    assert r["mean_a"] == round(ma, 4) and r["mean_b"] == round(mb, 4)
    assert r["lift"] == round(ma - mb, 4)
    assert r["t_stat"] == round(t, 4)
    assert r["df"] == round(df, 2)


def test_item_item_cosine_planted_baskets(spark, monkeypatch):
    """Baskets {1,2}, {1,2}, {1,2,3}, {3}: pair (1,2) co-occurs 3x with
    n1=n2=3 -> cosine exactly 1.0; (1,3)/(2,3) co-occur once and fall
    below the support floor."""
    li = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 2), (3, 3), (4, 3)],
        "l_orderkey long, l_partkey long",
    )
    monkeypatch.setattr(bh, "table", lambda s, d, n: li)
    rows = bh.rec_item_item_cosine_topk(spark, "x").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["part_a"], r["part_b"], r["co_orders"]) == (1, 2, 3)
    assert (r["n_a"], r["n_b"], r["cosine"]) == (3, 3, 1.0)


def test_pareto_frontier_planted(spark, monkeypatch):
    """Frontier of {(1,5),(2,3),(3,1),(2.5,4)} is the staircase
    {(1,5),(2,3),(3,1)}; a duplicate (2,3) part keeps BOTH ids; a
    far-bucket point (100,5) is killed by the cross-bucket carry
    ((10,5) dominates it on price at equal size)."""
    part = spark.createDataFrame(
        [
            (1, 1.0, 5),
            (2, 2.0, 3),
            (3, 3.0, 1),
            (4, 2.5, 4),
            (10, 2.0, 3),
            (5, 10.0, 5),
            (6, 100.0, 5),
        ],
        "p_partkey long, p_retailprice double, p_size int",
    )
    monkeypatch.setattr(adv, "table", lambda s, d, n: part)
    got = {
        (r["p_partkey"], r["p_retailprice"], r["p_size"])
        for r in adv.rank_pareto_frontier_parts(spark, "x").collect()
    }
    assert got == {(1, 1.0, 5), (2, 2.0, 3), (10, 2.0, 3), (3, 3.0, 1)}


def test_kmv_exact_below_k(spark, monkeypatch):
    """Fewer distinct users than k: the sketch degenerates to the
    exact count and reports zero error."""
    ev = _events(spark, [(i % 50, i, "x", 1) for i in range(40)])
    monkeypatch.setattr(adv, "table", lambda s, d, n: ev)
    (r,) = adv.sketch_kmv_distinct_users(spark, "x").collect()
    assert (r["n_exact"], r["n_kept"]) == (40, 40)
    assert r["kmv_estimate"] == 40.0 and r["rel_error"] == 0.0


def test_kmv_estimator_matches_spec_above_k(spark, monkeypatch):
    """More distinct users than k: recompute (k-1)*M/h_k in plain
    Python from the same md5 spec and check the relative error is in
    the ~1/sqrt(k) band."""
    n_users = 1000
    rows = [(i % 50, u, "x", 1) for i, u in enumerate(range(n_users))]
    ev = _events(spark, rows)
    monkeypatch.setattr(adv, "table", lambda s, d, n: ev)
    (r,) = adv.sketch_kmv_distinct_users(spark, "x").collect()
    hs = sorted(
        int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)
        for u in range(n_users)
    )
    kth = hs[adv._KMV_K - 1]
    want = (adv._KMV_K - 1) * adv._KMV_M / kth
    assert r["n_exact"] == n_users and r["n_kept"] == adv._KMV_K
    assert r["kmv_estimate"] == round(want, 2)
    assert abs(r["rel_error"]) < 4 / math.sqrt(adv._KMV_K)


def test_rolling_median_range_frame_respects_gaps(spark, monkeypatch):
    """Counts 1,2,3 on days 0-2 then 7 on day 10: the RANGE frame
    never reaches across the gap, so day 10's window is itself alone;
    day 1's even window interpolates 1.5."""
    rows = []
    eid = 0
    for day, cnt in [(0, 1), (1, 2), (2, 3), (10, 7)]:
        for _ in range(cnt):
            rows.append((eid, day))
            eid += 1
    ev = spark.createDataFrame(
        [(i, f"2024-01-{1 + d:02d} 00:00:00") for i, d in rows],
        "event_id long, ts_s string",
    ).selectExpr(
        "event_id",
        "CAST(ts_s AS TIMESTAMP) AS ts",
        "event_id AS user_id",
        "'x' AS event_type",
        "1.0 AS value",
        "'{}' AS props",
    )
    monkeypatch.setattr(adv, "table", lambda s, d, n: ev)
    out = {
        r["day_num"]: (r["n"], r["med7"])
        for r in adv.timeseries_rolling_median_7d(spark, "x").collect()
    }
    days = sorted(out)
    base = days[0]
    assert out[base] == (1, 1.0)
    assert out[base + 1] == (2, 1.5)
    assert out[base + 2] == (3, 2.0)
    assert out[base + 10] == (7, 7.0)


def test_ccnet_buckets_rank_by_fluency(spark, monkeypatch):
    """Six docs in one lang: two made of the corpus-dominant token
    (lowest cross-entropy -> head), two mixed, two of corpus-unique
    tokens (highest -> tail).  Tertiles are 2/2/2 and the bucket ce
    ranges are disjoint and ordered."""
    import fortisiem_clickhouse_monitor_spark.operators.text as tx

    texts = [
        "common common common common",
        "common common common",
        "common mixed1 common mixed2",
        "common mixed3 mixed4 common",
        "rare1 rare2 rare3 rare4",
        "rare5 rare6 rare7 rare8",
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    monkeypatch.setattr(tx, "table", lambda s, d, n: docs)
    rows = {
        r["bucket"]: r
        for r in tx.text_ccnet_perplexity_buckets(spark, "x").collect()
    }
    assert {b: rows[b]["n_docs"] for b in rows} == {
        "head": 2, "middle": 2, "tail": 2
    }
    assert rows["head"]["max_ce"] <= rows["middle"]["min_ce"]
    assert rows["middle"]["max_ce"] <= rows["tail"]["min_ce"]
    assert rows["head"]["min_ce"] <= rows["head"]["avg_ce"] <= rows["head"]["max_ce"]


def test_mmr_prefers_diverse_over_duplicate(spark, monkeypatch):
    """Query (1,1); v1=(1,0), v2=(2,0) (exact duplicate direction of
    v1), v3=(0,1).  Plain cosine top-2 is [v1, v2] (tie broken by id);
    MMR picks the orthogonal v3 second because the duplicate's
    diversity penalty (0.3 * 1.0) exceeds its zero relevance edge."""
    import fortisiem_clickhouse_monitor_spark.operators.similarity as sim

    emb = spark.createDataFrame(
        [
            (0, [1.0, 1.0], 0),
            (1, [1.0, 0.0], 0),
            (2, [2.0, 0.0], 0),
            (3, [0.0, 1.0], 0),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    monkeypatch.setattr(sim, "table", lambda s, d, n: emb)
    rows = sim.sim_mmr_diversified_topk(spark, "x").collect()
    order = [r["vec_id"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert order == [1, 3, 2]
    by_id = {r["vec_id"]: r for r in rows}
    assert by_id[1]["simq"] == by_id[3]["simq"] == 0.707107
    assert by_id[1]["mmr_score"] == by_id[3]["mmr_score"] == 0.494975
    assert by_id[2]["mmr_score"] == 0.194975


def _day_events(spark, rows):
    """rows: (event_id, user_id, day) -> minimal events frame."""
    return spark.createDataFrame(
        [(i, u, d) for i, u, d in rows],
        "event_id long, user_id long, day int",
    ).selectExpr(
        "event_id",
        "CAST(timestampadd(DAY, day, TIMESTAMP '2024-01-01') AS TIMESTAMP)"
        " AS ts",
        "user_id",
        "'x' AS event_type",
        "1.0 AS value",
        "'{}' AS props",
    )


def test_kaplan_meier_hand_computed(spark, monkeypatch):
    """Five users, observation end day 30, horizon 14: deaths at
    lifetimes 0/5/10, censoring at 5 and 20.  S = 0.8, 0.6, 0.3, 0.3
    with risk sets 5/4/2/1 — the censored-at-5 user leaves the risk
    set WITHOUT reducing survival."""
    rows = [
        (1, 1, 0),            # u1: t=0, died
        (2, 2, 0), (3, 2, 5),  # u2: t=5, died
        (4, 3, 0), (5, 3, 20),  # u3: t=20, censored (within horizon)
        (6, 4, 25), (7, 4, 30),  # u4: t=5, censored; defines end=30
        (8, 5, 0), (9, 5, 10),  # u5: t=10, died
    ]
    ev = _day_events(spark, rows)
    monkeypatch.setattr(bh, "table", lambda s, d, n: ev)
    out = {
        r["t_days"]: r
        for r in bh.behavior_kaplan_meier_retention(spark, "x").collect()
    }
    assert set(out) == {0, 5, 10, 20}
    assert (out[0]["n_at_risk"], out[0]["n_deaths"], out[0]["n_censored"],
            out[0]["survival"]) == (5, 1, 0, 0.8)
    assert (out[5]["n_at_risk"], out[5]["n_deaths"], out[5]["n_censored"],
            out[5]["survival"]) == (4, 1, 1, 0.6)
    assert (out[10]["n_at_risk"], out[10]["n_deaths"],
            out[10]["survival"]) == (2, 1, 0.3)
    assert (out[20]["n_at_risk"], out[20]["n_deaths"],
            out[20]["survival"]) == (1, 0, 0.3)


def test_wasserstein_shifted_uniform(spark, monkeypatch):
    """Early {0,1} vs late {2,3}: W1 is exactly the mean shift 2.0;
    an identical pair of halves gives W1 = 0."""
    ev = _events(
        spark,
        [(0, 1, "x", 0), (1, 1, "x", 1), (50, 1, "x", 2), (51, 1, "x", 3)]
        + [(0, 1, "y", 5), (1, 1, "y", 7), (50, 1, "y", 5), (51, 1, "y", 7)],
    )
    monkeypatch.setattr(prof, "table", lambda s, d, n: ev)
    out = {
        r["event_type"]: r
        for r in prof.drift_wasserstein_values(spark, "x").collect()
    }
    assert out["x"]["w1"] == 2.0
    assert (out["x"]["n_early"], out["x"]["n_late"]) == (2, 2)
    assert out["y"]["w1"] == 0.0


def test_temperature_mixture_upsamples_small_lang(spark, monkeypatch):
    """Two langs, 100 vs 10000 chars at tau=0.7: the small lang's
    sample weight exceeds its natural share, the big lang's effective
    epochs drop below 1; weights recomputed in plain Python."""
    import fortisiem_clickhouse_monitor_spark.operators.corpus as cp

    docs = spark.createDataFrame(
        [(1, "t", "small", "s", 100), (2, "t", "big", "s", 10000)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    monkeypatch.setattr(cp, "table", lambda s, d, n: docs)
    out = {
        r["lang"]: r
        for r in cp.corpus_temperature_mixture(spark, "x").collect()
    }
    z = 100**0.7 + 10000**0.7
    total = 10100
    for lang, c in [("small", 100), ("big", 10000)]:
        assert out[lang]["natural_share"] == round(c / total, 6)
        assert out[lang]["sample_weight"] == round(c**0.7 / z, 6)
        assert out[lang]["effective_epochs"] == round(
            c**0.7 / z * total / c, 4
        )
    assert out["small"]["sample_weight"] > out["small"]["natural_share"]
    assert out["big"]["effective_epochs"] < 1.0


def test_kcenter_picks_spread_and_stops_when_exhausted(spark, monkeypatch):
    """Plane vectors seed=(1,0), dup=(1,0), orth=(0,1), opp=(-1,0):
    farthest-point picks the opposite first (sim -1), the orthogonal
    next (max-sim 0), the duplicate last (max-sim 1) — and stops at 4
    rows although k=8."""
    import fortisiem_clickhouse_monitor_spark.operators.similarity as sim

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 0),
            (1, [1.0, 0.0], 0),
            (2, [0.0, 1.0], 0),
            (3, [-1.0, 0.0], 0),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    monkeypatch.setattr(sim, "table", lambda s, d, n: emb)
    rows = sorted(
        sim.sim_kcenter_farthest_points(spark, "x").collect(),
        key=lambda r: r["rank"],
    )
    assert [(r["rank"], r["vec_id"]) for r in rows] == [
        (1, 0), (2, 3), (3, 2), (4, 1)
    ]
    assert rows[0]["max_sim_to_selected"] is None
    assert rows[1]["max_sim_to_selected"] == -1.0
    assert rows[2]["max_sim_to_selected"] == 0.0
    assert rows[3]["max_sim_to_selected"] == 1.0


def test_ams_f2_exact_and_estimator_spec(spark, monkeypatch):
    """Two users with counts 3 and 2: exact F2 = 13; the median AMS
    estimator is recomputed in plain Python from the same md5-parity
    sign spec."""
    rows = [(i, 1, "x", 1) for i in range(3)] + [
        (10 + i, 2, "x", 1) for i in range(2)
    ]
    ev = _events(spark, rows)
    monkeypatch.setattr(adv, "table", lambda s, d, n: ev)
    (r,) = adv.sketch_ams_f2_moment(spark, "x").collect()
    assert r["exact_f2"] == 13

    def sign(j, u):
        h = hashlib.md5(f"{j}:{u}".encode()).hexdigest()
        return 2 * (int(h[0], 16) % 2) - 1

    ests = sorted(
        (sign(j, 1) * 3 + sign(j, 2) * 2) ** 2
        for j in range(1, adv._AMS_D + 1)
    )
    assert r["ams_f2"] == ests[adv._AMS_D // 2]
    assert r["rel_error"] == round((r["ams_f2"] - 13) / 13.0, 4)


def test_daily_ohlc_orders_by_ts_then_event_id(spark, monkeypatch):
    """Values 5,1,9,2 in time order -> open 5, high 9, low 1, close 2;
    two events on the same timestamp break the tie by event_id."""
    ev = _events(
        spark,
        [(0, 1, "x", 5), (1, 1, "x", 1), (2, 1, "x", 9), (3, 1, "x", 2)],
    )
    monkeypatch.setattr(adv, "table", lambda s, d, n: ev)
    (r,) = adv.timeseries_daily_ohlc(spark, "x").collect()
    assert (r["open"], r["high"], r["low"], r["close"], r["n"]) == (
        5.0, 9.0, 1.0, 2.0, 4,
    )
    # same-ts tie: event_id 10 before 11 at t=0, 11 holds the close
    ev2 = _events(spark, [(0, 1, "y", 7), (0, 1, "y", 3)])
    monkeypatch.setattr(adv, "table", lambda s, d, n: ev2)
    (r2,) = adv.timeseries_daily_ohlc(spark, "x").collect()
    assert (r2["open"], r2["close"]) == (7.0, 3.0)


def test_column_entropy_uniform_and_degenerate(spark, monkeypatch):
    """Uniform 2-value lang -> entropy ln(2), norm 1.0; single-value
    source -> entropy 0 with NULL norm (no 0/0)."""
    docs = spark.createDataFrame(
        [(1, "t", "en", "s", 1), (2, "t", "fr", "s", 1)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    ev = _events(spark, [(0, 1, "x", 1)])

    def tbl(s, d, n):
        return docs if n == "documents" else ev

    monkeypatch.setattr(prof, "table", tbl)
    out = {
        r["col_name"]: r
        for r in prof.profile_column_entropy(spark, "x").collect()
    }
    lang = out["documents.lang"]
    assert (lang["n_rows"], lang["n_distinct"]) == (2, 2)
    assert lang["entropy"] == round(math.log(2), 6)
    assert lang["norm_entropy"] == 1.0
    src = out["documents.source"]
    assert (src["entropy"], src["norm_entropy"]) == (0.0, None)
    assert out["events.event_type"]["norm_entropy"] is None


def test_label_balance_chi2_proportional_split_is_zero(spark, monkeypatch):
    """Construct embeddings where every split's label mix equals the
    global mix exactly -> chi2 = 0 for every split.  Assignment is the
    real md5 bucketing, so vec_ids are chosen per split in Python
    first."""
    import fortisiem_clickhouse_monitor_spark.operators.corpus as cp

    def split_of(vid):
        b = int(hashlib.md5(str(vid).encode()).hexdigest()[:2], 16)
        return "train" if b < cp._SPLIT_TRAIN else (
            "val" if b < cp._SPLIT_VAL else "test"
        )

    by_split = {"train": [], "val": [], "test": []}
    vid = 0
    while any(len(v) < 4 for v in by_split.values()):
        s = split_of(vid)
        if len(by_split[s]) < 4:
            by_split[s].append(vid)
        vid += 1
    rows = []
    for ids in by_split.values():
        for i, v in enumerate(ids):
            rows.append((v, [0.0], i % 2))  # labels 0,1 balanced 2/2
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    monkeypatch.setattr(cp, "table", lambda s, d, n: emb)
    out = cp.quality_label_balance_by_split(spark, "x").collect()
    assert {r["split"] for r in out} == {"train", "val", "test"}
    for r in out:
        assert (r["n_vecs"], r["n_labels"], r["chi2"]) == (4, 2, 0.0)


def test_path_trigrams_planted_timeline(spark, monkeypatch):
    """One user with timeline a,b,c,a,b,c yields trigrams abc, bca,
    cab, abc -> (a,b,c) counted twice and ranked first."""
    seq = ["a", "b", "c", "a", "b", "c"]
    ev = _events(spark, [(t, 1, et, 1) for t, et in enumerate(seq)])
    monkeypatch.setattr(bh, "table", lambda s, d, n: ev)
    rows = bh.path_trigram_topk(spark, "x").collect()
    got = {(r["e1"], r["e2"], r["e3"]): r["n"] for r in rows}
    assert got == {
        ("a", "b", "c"): 2,
        ("b", "c", "a"): 1,
        ("c", "a", "b"): 1,
    }
    assert rows[0]["n"] == 2  # ordering: most frequent first


def test_pareto_point_hand_computed(spark, monkeypatch):
    """Counts 8,1,1 over three users (10 events): 80% = 8 events is
    covered by exactly the one heavy user.  Counts 5,5 (10 events):
    target 8 straddles the second bucket -> 2 users."""
    rows = [(t, 1, "x", 1) for t in range(8)] + [
        (8, 2, "x", 1), (9, 3, "x", 1)
    ]
    ev = _events(spark, rows)
    monkeypatch.setattr(bh, "table", lambda s, d, n: ev)
    (r,) = bh.behavior_power_users_pareto(spark, "x").collect()
    assert (r["total_users"], r["total_events"], r["users_needed"]) == (
        3, 10, 1,
    )
    assert r["user_share"] == round(1 / 3, 6)

    rows2 = [(t, 1, "x", 1) for t in range(5)] + [
        (10 + t, 2, "x", 1) for t in range(5)
    ]
    ev2 = _events(spark, rows2)
    monkeypatch.setattr(bh, "table", lambda s, d, n: ev2)
    (r2,) = bh.behavior_power_users_pareto(spark, "x").collect()
    assert (r2["total_users"], r2["users_needed"]) == (2, 2)


def test_error_run_lengths_planted(spark, monkeypatch):
    """Timeline e,e,e,c,e,c,e,e for one user -> runs of 3, 1, 2; a
    second user with a lone error adds one more length-1 run."""
    seq = ["error", "error", "error", "click", "error", "click",
           "error", "error"]
    rows = [(t, 1, et, 1) for t, et in enumerate(seq)]
    rows.append((0, 2, "error", 1))
    ev = _events(spark, rows)
    monkeypatch.setattr(bh, "table", lambda s, d, n: ev)
    got = {
        r["run_len"]: (r["n_runs"], r["n_users"])
        for r in bh.pattern_error_run_lengths(spark, "x").collect()
    }
    assert got == {1: (2, 2), 2: (1, 1), 3: (1, 1)}


def test_pack_attention_stats_hand_computed(spark, monkeypatch):
    """One lang, budget 256: docs of 200 and 100 tokens -> bin 0 holds
    [200, 56-token head of doc2], bin 1 holds the 44-token tail.
    Utilization and fill recomputed by hand."""
    import fortisiem_clickhouse_monitor_spark.operators.corpus as cp

    docs = spark.createDataFrame(
        [
            (1, " ".join(["w"] * 200), "en", "s", 0),
            (2, " ".join(["w"] * 100), "en", "s", 0),
        ],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    monkeypatch.setattr(cp, "table", lambda s, d, n: docs)
    (r,) = cp.pack_attention_mask_stats(spark, "x").collect()
    assert (r["n_bins"], r["n_segments"]) == (2, 3)
    fill0, fill1 = 256, 44
    useful = (
        200 * 201 // 2 + 56 * 57 // 2 + 44 * 45 // 2
    )
    total = fill0 * (fill0 + 1) // 2 + fill1 * (fill1 + 1) // 2
    assert r["fill_ratio"] == round((fill0 + fill1) / (2 * 256), 4)
    assert r["attention_utilization"] == round(useful / total, 6)


def test_window_funnel_levels_planted(spark, monkeypatch):
    """A completes all 3 steps in-window; B's click misses the 7-day
    horizon (level 1); C's purchase misses it (level 2); D has the
    steps in the WRONG order (level 1); E shows greedy-first is exact
    (two clicks, purchase beyond horizon either way -> level 2)."""
    day = 86400
    rows = []
    eid = 0

    def add(u, et, d):
        nonlocal eid
        rows.append((eid, u, et, d))
        eid += 1

    add(1, "signup", 0); add(1, "click", 1); add(1, "purchase", 2)
    add(2, "signup", 0); add(2, "click", 10)
    add(3, "signup", 0); add(3, "click", 1); add(3, "purchase", 9)
    add(4, "purchase", 0); add(4, "click", 1); add(4, "signup", 2)
    add(5, "signup", 0); add(5, "click", 1); add(5, "click", 2)
    add(5, "purchase", 8)
    ev = spark.createDataFrame(
        [(i, u, et, d) for i, u, et, d in rows],
        "event_id long, user_id long, event_type string, day int",
    ).selectExpr(
        "event_id",
        "CAST(timestampadd(SECOND, day * 86400, TIMESTAMP '2024-01-01')"
        " AS TIMESTAMP) AS ts",
        "user_id",
        "event_type",
        "1.0 AS value",
        "'{}' AS props",
    )
    monkeypatch.setattr(bh, "table", lambda s, d, n: ev)
    got = {
        r["level"]: r["n_users"]
        for r in bh.funnel_window_levels(spark, "x").collect()
    }
    assert got == {1: 2, 2: 2, 3: 1}


def test_ngram_entropy_rate_hand_computed(spark, monkeypatch):
    """'a b a b a' is perfectly predictable -> H = 0, perplexity 1;
    'a b a c' has a 50/50 branch after 'a' -> H = (2/3) ln 2."""
    import fortisiem_clickhouse_monitor_spark.operators.text as tx

    docs = spark.createDataFrame(
        [(1, "a b a b a", "det", "s", 9), (2, "a b a c", "mix", "s", 7)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    monkeypatch.setattr(tx, "table", lambda s, d, n: docs)
    out = {
        r["lang"]: r
        for r in tx.text_ngram_entropy_rate(spark, "x").collect()
    }
    det = out["det"]
    assert (det["n_bigrams"], det["vocab_bigrams"]) == (4, 2)
    assert det["entropy_rate"] == 0.0 and det["perplexity"] == 1.0
    mix = out["mix"]
    assert (mix["n_bigrams"], mix["vocab_bigrams"]) == (3, 3)
    assert mix["entropy_rate"] == round(2 / 3 * math.log(2), 6)
    assert mix["perplexity"] == round(math.exp(2 / 3 * math.log(2)), 4)


def test_sequence_count_ballot_identity(spark, monkeypatch):
    """Greedy non-overlapping click->purchase counts, pinned against a
    plain-Python counter machine for several planted timelines
    (the ballot-identity closed form must equal the fold)."""
    timelines = {
        1: ["click", "purchase", "purchase", "click", "purchase"],  # 2
        2: ["purchase", "click"],                                   # 0
        3: ["click", "click", "purchase"],                          # 1
        4: ["purchase", "purchase", "purchase"],                    # 0
        5: ["click", "purchase", "click", "purchase"],              # 2
    }
    rows, eid = [], 0
    for u, seq in timelines.items():
        for t, et in enumerate(seq):
            rows.append((eid, u, et, t))
            eid += 1
    ev = _events(spark, [(t, u, et, 1) for (_, u, et, t) in rows])

    def greedy(seq):
        avail = matches = 0
        for s in seq:
            if s == "click":
                avail += 1
            elif avail > 0:
                avail -= 1
                matches += 1
        return matches

    want = {}
    for u, seq in timelines.items():
        want[greedy(seq)] = want.get(greedy(seq), 0) + 1
    monkeypatch.setattr(bh, "table", lambda s, d, n: ev)
    got = {
        r["n_matches"]: r["n_users"]
        for r in bh.pattern_sequence_count_ab(spark, "x").collect()
    }
    assert got == want == {2: 2, 0: 2, 1: 1}


def test_daily_percentiles_interpolation(spark, monkeypatch):
    """Four values 1,2,3,4 in one (type, day): p50 = 2.5 (linear
    interpolation), p95 = 3.85, p99 = 3.97 — percentile_cont
    semantics, recomputed by hand."""
    ev = _events(
        spark, [(t, 1, "x", v) for t, v in enumerate([1, 2, 3, 4])]
    )
    monkeypatch.setattr(adv, "table", lambda s, d, n: ev)
    (r,) = adv.timeseries_daily_percentiles(spark, "x").collect()

    def pc(vals, q):
        vals = sorted(vals)
        pos = (len(vals) - 1) * q
        lo = int(pos)
        frac = pos - lo
        return vals[lo] + (vals[min(lo + 1, len(vals) - 1)] - vals[lo]) * frac

    vals = [1, 2, 3, 4]
    assert r["n"] == 4
    assert r["p50"] == round(pc(vals, 0.5), 6) == 2.5
    assert r["p95"] == round(pc(vals, 0.95), 6)
    assert r["p99"] == round(pc(vals, 0.99), 6)


def test_retention_conditions_planted(spark, monkeypatch):
    """u1 signup->click->purchase (all flags); u2 signup then nothing
    after; u3 click/purchase BEFORE their signup (r2=r3=0); u4 never
    signed up (excluded from ratios, counted in n_users)."""
    rows = [
        (0, 1, "signup", 1), (1, 1, "click", 1), (2, 1, "purchase", 1),
        (0, 2, "signup", 1),
        (0, 3, "click", 1), (1, 3, "purchase", 1), (2, 3, "signup", 1),
        (0, 4, "view", 1),
    ]
    ev = _events(spark, rows)
    monkeypatch.setattr(bh, "table", lambda s, d, n: ev)
    (r,) = bh.behavior_retention_conditions(spark, "x").collect()
    assert (r["n_users"], r["r1"], r["r2"], r["r3"]) == (4, 3, 1, 1)
    assert r["r2_ratio"] == r["r3_ratio"] == round(1 / 3, 6)


def test_kmv_intersection_under_k_is_exact(spark, monkeypatch):
    """Both sets below k: theta = M, the 'sample' is the whole
    intersection, estimate == exact, rel_error 0.  Users 0-29 click,
    users 20-49 purchase -> overlap exactly 10."""
    rows = [(i % 50, u, "click", 1) for i, u in enumerate(range(30))]
    rows += [(i % 50, u, "purchase", 1) for i, u in enumerate(range(20, 50))]
    ev = _events(spark, rows)
    monkeypatch.setattr(adv, "table", lambda s, d, n: ev)
    (r,) = adv.sketch_kmv_intersection_eval(spark, "x").collect()
    assert (r["n_exact"], r["n_inter"]) == (10, 10)
    assert r["kmv_estimate"] == 10.0 and r["rel_error"] == 0.0


def test_kmv_intersection_estimator_spec_above_k(spark, monkeypatch):
    """Sets larger than k: recompute the theta cut and scaled estimate
    in plain Python from the md5 spec and check the band."""
    n = 600
    rows = [(i % 50, u, "click", 1) for i, u in enumerate(range(n))]
    rows += [
        (i % 50, u, "purchase", 1)
        for i, u in enumerate(range(n // 2, n + n // 2))
    ]
    ev = _events(spark, rows)
    monkeypatch.setattr(adv, "table", lambda s, d, n_: ev)
    (r,) = adv.sketch_kmv_intersection_eval(spark, "x").collect()

    def hs(users):
        return sorted(
            int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)
            for u in users
        )
    a, b = hs(range(n)), hs(range(n // 2, n + n // 2))
    ka, kb = set(a[: adv._KMV_K]), set(b[: adv._KMV_K])
    theta = min(a[adv._KMV_K - 1], b[adv._KMV_K - 1])
    inter = sum(1 for h in ka & kb if h <= theta)
    want = inter * adv._KMV_M / theta
    assert r["n_exact"] == n // 2
    assert r["n_inter"] == inter
    assert r["kmv_estimate"] == round(want, 2)


def test_component_size_histogram_planted(spark, monkeypatch):
    """Components {1,2,3} (chain), {4,5}, singleton 6 -> one component
    of each size 3/2/1 with removable 2/1/0."""
    import fortisiem_clickhouse_monitor_spark.operators.dedup as dd

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "doc_a long, doc_b long"
    )
    docs = spark.createDataFrame(
        [(i,) for i in range(1, 7)], "doc_id long"
    )
    monkeypatch.setattr(dd, "shared_ngram_pairs", lambda s, d: pairs)
    monkeypatch.setattr(dd, "table", lambda s, d, n: docs)
    got = {
        r["size"]: (r["n_components"], r["n_docs"], r["n_removable"])
        for r in dd.dedup_component_size_histogram(spark, "x").collect()
    }
    assert got == {3: (1, 3, 2), 2: (1, 2, 1), 1: (1, 1, 0)}


def test_hysteresis_alert_state_machine(spark, monkeypatch):
    """Rates 0.5, 0.2, 0.1, 0.2, 0.3 across five days: fire on day 0,
    HOLD through the dead band, clear below LO, hold clear through the
    band, re-fire above HI."""
    days = [(0, 1, 2), (1, 1, 5), (2, 1, 10), (3, 1, 5), (4, 3, 10)]
    rows, eid = [], 0
    for day, errs, total in days:
        for i in range(total):
            et = "error" if i < errs else "view"
            rows.append((eid, 1, et, day))
            eid += 1
    ev = spark.createDataFrame(
        [(i, u, et, d) for i, u, et, d in rows],
        "event_id long, user_id long, event_type string, day int",
    ).selectExpr(
        "event_id",
        "CAST(timestampadd(DAY, day, TIMESTAMP '2024-01-01')"
        " AS TIMESTAMP) AS ts",
        "user_id", "event_type", "1.0 AS value", "'{}' AS props",
    )
    monkeypatch.setattr(bh, "table", lambda s, d, n: ev)
    out = {
        r["day_num"] - 19723: (r["rate"], r["alert"])
        for r in bh.alert_hysteresis_error_rate(spark, "x").collect()
    }
    assert [out[d][1] for d in range(5)] == [True, True, False, False, True]
    assert out[0][0] == 0.5 and out[4][0] == 0.3


def test_rich_club_planted_core(spark, monkeypatch):
    """Triangle {1,2,3} with pendants 4,5 on nodes 1,2: phi(1) = 1.0
    over the 3-node club, phi(2) = 1.0 over {1,2}; k=4,8 clubs are
    empty and emit no row."""
    import fortisiem_clickhouse_monitor_spark.operators.dedup as dd
    import fortisiem_clickhouse_monitor_spark.operators.graph as gr

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (1, 4), (2, 5)], "doc_a long, doc_b long"
    )
    monkeypatch.setattr(dd, "shared_ngram_pairs", lambda s, d: pairs)
    monkeypatch.setattr(gr, "shared_ngram_pairs", lambda s, d: pairs,
                        raising=False)
    got = {
        r["k"]: (r["n_nodes"], r["n_edges"], r["phi"])
        for r in gr.graph_rich_club_coefficient(spark, "x").collect()
    }
    assert got == {1: (3, 3, 1.0), 2: (2, 1, 1.0)}


def test_fano_factor_hand_computed(spark, monkeypatch):
    """Daily counts 2,2,2 -> variance 0 -> fano 0; counts 1,5 ->
    mean 3, var 8, fano 8/3 — both recomputed by hand; a type with a
    single day is excluded (variance undefined)."""
    rows, eid = [], 0
    for day, cnt in [(0, 2), (1, 2), (2, 2)]:
        for _ in range(cnt):
            rows.append((eid, 1, "flat", day)); eid += 1
    for day, cnt in [(0, 1), (1, 5)]:
        for _ in range(cnt):
            rows.append((eid, 1, "bursty", day)); eid += 1
    rows.append((eid, 1, "lonely", 0))
    ev = spark.createDataFrame(
        [(i, u, et, d) for i, u, et, d in rows],
        "event_id long, user_id long, event_type string, day int",
    ).selectExpr(
        "event_id",
        "CAST(timestampadd(DAY, day, TIMESTAMP '2024-01-01')"
        " AS TIMESTAMP) AS ts",
        "user_id", "event_type", "1.0 AS value", "'{}' AS props",
    )
    monkeypatch.setattr(adv, "table", lambda s, d, n: ev)
    got = {
        r["event_type"]: (r["n_days"], r["mean_daily"], r["fano"])
        for r in adv.timeseries_burstiness_fano(spark, "x").collect()
    }
    assert got["flat"] == (3, 2.0, 0.0)
    assert got["bursty"] == (2, 3.0, round(8 / 3, 4))
    assert "lonely" not in got
