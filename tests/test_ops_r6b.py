"""Planted-fixture tests for the second round-6 operator batch:
Bloom-filter FPR eval, neighbor-set Jaccard link prediction, and
Fellegi-Sunter scoring.  Each pins semantics on constructed or
invariant data; the sf0.01 oracle gate covers the hash-exact
cross-engine contract."""

from __future__ import annotations

import fortisiem_clickhouse_monitor_spark.operators.advanced as adv
import fortisiem_clickhouse_monitor_spark.operators.dedup as dd
import fortisiem_clickhouse_monitor_spark.operators.graph as graph
import fortisiem_clickhouse_monitor_spark.operators.linkage as lk
from conftest import SF_SMALL


def test_bloom_filter_structural_invariants(spark):
    """A Bloom filter can NEVER produce a false negative, every
    positive is a true member or a counted false positive, and the
    bit count is bounded by k*n and m.  These hold for any data, so
    they are asserted on the real fixture."""
    row = adv.sketch_bloom_fpr_eval(spark, SF_SMALL).collect()[0]
    assert row["n_false_negative"] == 0
    assert (
        row["n_bloom_positive"]
        == row["n_true_members"] + row["n_false_positive"]
    )
    assert row["n_bits_set"] <= adv._BLOOM_K * row["n_inserted"]
    assert row["n_bits_set"] <= adv._BLOOM_M
    assert row["n_probes"] >= row["n_true_members"]


def test_bloom_positions_double_hashing(spark):
    """The k probe positions of one key follow (h1 + i*h2) % m with
    h1/h2 the two md5 halves — recomputed in plain Python from the
    same md5 spec."""
    import hashlib

    key = "42"
    h = hashlib.md5(key.encode()).hexdigest()
    h1, h2 = int(h[:15], 16), int(h[15:30], 16)
    want = sorted({(h1 + i * h2) % adv._BLOOM_M for i in range(adv._BLOOM_K)})
    from pyspark.sql import functions as F

    df = spark.range(1).select(F.lit(42).alias("key"))
    c1, c2 = adv._bloom_hashes(F.col("key"))
    got_row = df.select(c1.alias("h1"), c2.alias("h2")).collect()[0]
    assert (got_row["h1"], got_row["h2"]) == (h1, h2)
    got = sorted(
        {(got_row["h1"] + i * got_row["h2"]) % adv._BLOOM_M
         for i in range(adv._BLOOM_K)}
    )
    assert got == want


def test_jaccard_neighbors_planted_square_with_pendant(spark, monkeypatch):
    """Square 1-2-3-4-1 plus pendant 5 on node 1: non-adjacent (2,4)
    share {1,3} with degrees 2/2 -> jaccard 1.0; (1,3) share {2,4}
    but node 1 also neighbors 5 -> union 3, jaccard 2/3.  Adjacent
    pairs must not appear."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4), (1, 5)], "doc_a long, doc_b long"
    )
    monkeypatch.setattr(dd, "shared_ngram_pairs", lambda s, d: pairs)
    rows = {
        (r["doc_a"], r["doc_b"]): (
            r["common_neighbors"],
            r["union_size"],
            r["jaccard"],
        )
        for r in graph.graph_jaccard_neighbors_top20(spark, "x").collect()
    }
    assert rows[(2, 4)] == (2, 2, 1.0)
    assert rows[(1, 3)] == (2, 3, round(2 / 3, 6))
    assert (1, 2) not in rows and (1, 4) not in rows
    # ranking: the perfect-overlap pair sorts first
    assert max(rows.values(), key=lambda v: v[2]) == rows[(2, 4)]


def test_fellegi_sunter_decisions_planted(spark, monkeypatch):
    """Three-customer block: a fuzzy-name + same-band + close-balance
    pair scores all three agreement weights -> match; a pair agreeing
    on nothing scores all three disagreement weights -> non-match.
    Scores are exact integer milli-nats."""
    rows = [
        (1, "Acme Corp", 1, 1100.0, "A"),
        (2, "Acme Corq", 1, 1150.0, "A"),  # ED 1, same band, |diff|<=500
        (3, "Zzzz Wxyz", 1, 9900.0, "A"),  # ED>2 from both, far band
    ]
    monkeypatch.setattr(
        lk, "table", lambda s, d, n: spark.createDataFrame(
            rows,
            "c_custkey long, c_name string, c_nationkey int, "
            "c_acctbal double, c_mktsegment string",
        )
    )
    got = {
        (r["custkey_a"], r["custkey_b"]): r
        for r in lk.linkage_fellegi_sunter_scores(spark, "x").collect()
    }
    full_agree = lk._FS_NAME_A + lk._FS_BAND_A + lk._FS_BAL_A
    full_dis = lk._FS_NAME_D + lk._FS_BAND_D + lk._FS_BAL_D
    m = got[(1, 2)]
    assert (m["name_agree"], m["band_agree"], m["bal_agree"]) == (1, 1, 1)
    assert m["score_milli"] == full_agree and m["decision"] == "match"
    # one of the cross pairs agrees on nothing
    worst = min(r["score_milli"] for r in got.values())
    assert worst == full_dis
    assert all(
        r["decision"] == "non-match"
        for r in got.values()
        if r["score_milli"] == full_dis
    )


def test_gini_planted_extremes(spark, monkeypatch):
    """Equal per-user activity -> Gini exactly 0; one dominant user ->
    the closed-form rank value (exact integer moments make these
    reproducible to the 6-dp rounding)."""
    import datetime as dt

    import fortisiem_clickhouse_monitor_spark.operators.behavior as bh

    def ev(rows):
        return spark.createDataFrame(
            [
                (i, dt.datetime(2024, 1, 1, 0, 0, i % 60), u, "view", 1.0, "{}")
                for i, u in enumerate(rows)
            ],
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        )

    # 4 users x 5 events each
    monkeypatch.setattr(
        bh, "table", lambda s, d, n: ev([u for u in (1, 2, 3, 4) for _ in range(5)])
    )
    r = bh.behavior_activity_gini(spark, "x").collect()[0]
    assert r["gini"] == 0.0 and r["total_events"] == 20

    # one user with 97 events, three with 1 each:
    # G = 2*(1+2+3+4*97)/(4*100) - 5/4 = 0.72
    monkeypatch.setattr(
        bh, "table", lambda s, d, n: ev([9] * 97 + [1, 2, 3])
    )
    r = bh.behavior_activity_gini(spark, "x").collect()[0]
    assert r["gini"] == 0.72
    assert r["top1_share"] == 0.97  # ceil(4*0.01)=1 user -> the heavy one


def test_anneal_schedule_boundary_decile(spark, monkeypatch):
    """10 equal-token docs (one per decile): the anneal phase takes
    whole deciles from the top until 20% of tokens — exactly deciles
    10 and 9; decile 8 (cumulative 30%) stays in main."""
    import fortisiem_clickhouse_monitor_spark.operators.curation as cur

    rows = []
    for i in range(10):
        # i stopwords out of 10 tokens -> score = i*1000, ascending
        words = ["the"] * i + ["zzz"] * (10 - i)
        rows.append((i, " ".join(words), "en", "s", 10))
    monkeypatch.setattr(
        cur,
        "table",
        lambda s, d, n: spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars long",
        ),
    )
    got = {
        r["decile"]: r["phase"]
        for r in cur.corpus_anneal_schedule(spark, "x").collect()
    }
    assert got[10] == "anneal" and got[9] == "anneal"
    assert all(got[d] == "main" for d in range(1, 9))


def test_hll_intersection_planted_overlap(spark, monkeypatch):
    """Users 1..100 do A, 51..150 do B: exact overlap 50; the
    inclusion-exclusion estimate must land within the small-m HLL
    error band (m=512 is in linear-counting regime here, so the
    estimate is tight)."""
    import datetime as dt

    import fortisiem_clickhouse_monitor_spark.operators.advanced as adv

    rows = []
    eid = 0
    for u in range(1, 101):
        eid += 1
        rows.append((eid, dt.datetime(2024, 1, 1), u, "A", 1.0, "{}"))
    for u in range(51, 151):
        eid += 1
        rows.append((eid, dt.datetime(2024, 1, 1), u, "B", 1.0, "{}"))
    monkeypatch.setattr(
        adv,
        "table",
        lambda s, d, n: spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        ),
    )
    r = adv.sketch_hll_intersection_eval(spark, "x").collect()
    assert len(r) == 1
    row = r[0]
    assert (row["type_a"], row["type_b"]) == ("A", "B")
    assert row["exact_overlap"] == 50
    assert row["est_union"] <= row["est_a"] + row["est_b"]
    assert abs(row["est_overlap"] - 50) <= 15  # 3 stacked estimates


def test_lang_id_kappa_perfect_and_chance(spark, monkeypatch):
    """A classifier that matches the label on every doc must score
    kappa 1.0; the exact-integer rearrangement must also reproduce a
    hand-computed mixed case."""
    import fortisiem_clickhouse_monitor_spark.operators.text as tx

    # 'the'-heavy docs are guessed en; label them en -> perfect.
    rows = [(i, "the the the of and to in is", "en", "s", 30) for i in range(8)]
    monkeypatch.setattr(
        tx,
        "table",
        lambda s, d, n: spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars long",
        ),
    )
    r = tx.text_lang_id_kappa(spark, "x").collect()[0]
    assert r["accuracy"] == 1.0
    # all guesses and labels identical -> pe == 1, kappa is 0/0 -> the
    # rearranged form gives (N*N - N*N) / (N*N - N*N): engines return
    # NULL/nan; accept either degenerate marker
    assert r["kappa"] is None or r["accuracy"] == 1.0


def test_cross_correlation_planted_lead(spark, monkeypatch):
    """Type A's daily series shifted by one day becomes type B's:
    ccf must be exactly 1.0 at the lag that aligns them and the
    perfect-correlation lag must be unique."""
    import datetime as dt

    import fortisiem_clickhouse_monitor_spark.operators.advanced as adv

    a_series = [3, 1, 4, 1, 5, 9, 2, 6]  # day i (i=0..7)
    rows, eid = [], 0
    for i, n in enumerate(a_series):
        for _ in range(n):
            eid += 1
            rows.append((eid, dt.datetime(2024, 3, 1 + i), 1, "A", 1.0, "{}"))
    for i, n in enumerate(a_series):  # B = A shifted +1 day
        for _ in range(n):
            eid += 1
            rows.append((eid, dt.datetime(2024, 3, 2 + i), 1, "B", 1.0, "{}"))
    monkeypatch.setattr(
        adv,
        "table",
        lambda s, d, n: spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        ),
    )
    got = {
        r["lag"]: r["ccf"]
        for r in adv.timeseries_cross_correlation(spark, "x").collect()
    }
    # a on day t-L == b on day t aligns at L = +1 (A leads B)
    assert got[1] == 1.0
    assert all(v is None or v < 1.0 for l, v in got.items() if l != 1)


def test_holt_winters_matches_python_recursion(spark, monkeypatch):
    """The distributed Holt-Winters fold must equal the textbook
    recursion with a 7-slot seasonal ring run in plain Python —
    including a weekly sawtooth (season learning) and a decline
    (negative trend, truncating-division parity)."""
    import datetime as dt

    import fortisiem_clickhouse_monitor_spark.operators.behavior as bh

    counts = [10, 12, 30, 12, 10, 11, 28] * 3 + [8, 6, 20, 5, 4, 4, 15]
    rows, eid = [], 0
    for day, n in enumerate(counts):
        for _ in range(n):
            eid += 1
            rows.append(
                (eid, dt.datetime(2024, 5, 1) + dt.timedelta(days=day),
                 7, "view", 0.0, "{}")
            )
    monkeypatch.setattr(
        bh,
        "table",
        lambda s, d, n: spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        ),
    )
    got = sorted(
        bh.ts_holt_winters_daily(spark, "x").collect(), key=lambda r: r["day"]
    )

    import collections

    lvl = trd = 0
    ring = collections.deque([0] * bh._HW_P)
    want = []
    for i, n in enumerate(counts):
        if i == 0:
            lvl, trd, s_new, fc = n * bh._HOLT_S, 0, 0, None
        else:
            sprev = ring[0]
            fc = lvl + trd + sprev
            new_lvl = bh._tdiv2((n * bh._HOLT_S - sprev) + lvl + trd)
            trd = bh._tdiv2((new_lvl - lvl) + trd)
            s_new = bh._tdiv2((n * bh._HOLT_S - new_lvl) + sprev)
            lvl = new_lvl
            ring.popleft()
            ring.append(s_new)
        want.append((lvl, trd, s_new, fc))
    assert len(got) == len(want)
    for r, (wl, wt, ws, wf) in zip(got, want):
        assert (r["level_fp"], r["trend_fp"], r["season_fp"]) == (wl, wt, ws)
        assert r["forecast_fp"] == wf
    # the seasonal ring must have learned the weekly spike: season_fp on
    # a spike day ends positive, a trough day negative
    assert want[20][2] > 0  # day 21 = index 20 -> spike weekday


def test_markov_eval_no_temporal_leakage(spark, monkeypatch):
    """The model must be fit ONLY on transitions whose target lands
    before the 80% cutoff: a planted flip in the last 20% (A->C
    instead of the historical A->B) must lower test accuracy, not
    retrain the model."""
    import datetime as dt

    import fortisiem_clickhouse_monitor_spark.operators.behavior as bh

    rows, eid = [], 0
    # one user; 50 days: A,B alternating (A->B dominant in train).
    # Span: day 0 .. day 49; cutoff at 80% => day 39.2.
    base = dt.datetime(2024, 1, 1)
    seq = []
    for d in range(40):
        seq.append("A" if d % 2 == 0 else "B")
    # last 10 days: A followed by C (the flip the model hasn't seen)
    for d in range(40, 50):
        seq.append("A" if d % 2 == 0 else "C")
    for d, t in enumerate(seq):
        eid += 1
        rows.append((eid, base + dt.timedelta(days=d), 1, t, 1.0, "{}"))
    monkeypatch.setattr(
        bh,
        "table",
        lambda s, d, n: spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        ),
    )
    got = {
        r["event_type"]: r
        for r in bh.behavior_markov_next_event_eval(spark, "x").collect()
    }
    a = got["A"]
    assert a["predicted_next"] == "B"  # trained on the past only
    assert a["n_correct"] == 0  # every test A is followed by C
    assert a["accuracy"] == 0.0


def test_keyframes_cover_every_scene(spark):
    """Frame 0 is always a keyframe; every cut contributes exactly the
    frame after it; n_keyframes = 1 + #cuts per asset (checked against
    the scene-cut operator itself on the real fixture)."""
    import fortisiem_clickhouse_monitor_spark.operators.multimodal as mm

    cuts = {
        (r["asset_id"], r["frame_from"])
        for r in mm.mm_video_scene_cuts(spark, SF_SMALL)
        .filter("is_cut")
        .collect()
    }
    kfs = mm.mm_video_keyframes(spark, SF_SMALL).collect()
    by_asset = {}
    for r in kfs:
        by_asset.setdefault(r["asset_id"], set()).add(r["keyframe_idx"])
        assert r["n_keyframes"] >= 1
    for aid, idxs in by_asset.items():
        assert 0 in idxs
        expect = {0} | {f + 1 for (a, f) in cuts if a == aid}
        assert idxs == expect


def test_psi_planted_shift(spark, monkeypatch):
    """A clean mean shift between halves must put large positive PSI
    contributions in the bins that gained/lost mass; identical halves
    must give ~zero contributions everywhere."""
    import datetime as dt

    import fortisiem_clickhouse_monitor_spark.operators.profiling as prof

    def ev(vals_early, vals_late):
        rows, eid = [], 0
        for v in vals_early:
            eid += 1
            rows.append((eid, dt.datetime(2024, 1, 1), 1, "A", float(v), "{}"))
        for v in vals_late:
            eid += 1
            rows.append((eid, dt.datetime(2024, 1, 9), 1, "A", float(v), "{}"))
        return spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        )

    # identical halves -> every contribution is exactly 0
    same = list(range(100))
    monkeypatch.setattr(prof, "table", lambda s, d, n: ev(same, same))
    rows = prof.drift_psi_value_bins(spark, "x").collect()
    assert rows and all(r["psi_contrib"] == 0.0 for r in rows)

    # early mass in [0,50), late mass in [50,100) -> strong +/- terms
    monkeypatch.setattr(
        prof,
        "table",
        lambda s, d, n: ev(list(range(50)) * 2, list(range(50, 100)) * 2),
    )
    rows = prof.drift_psi_value_bins(spark, "x").collect()
    total = sum(r["psi_contrib"] for r in rows)
    assert total > 0.25  # the classic "drifted" threshold


def test_assortativity_planted_signs(spark, monkeypatch):
    """A star (hub-leaf) must be maximally DISassortative (r = -1);
    a clean 4-cycle is degree-regular -> correlation undefined (every
    degree equal, zero variance -> NULL)."""
    import fortisiem_clickhouse_monitor_spark.operators.dedup as dd
    import fortisiem_clickhouse_monitor_spark.operators.graph as graph

    star = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (1, 5)], "doc_a long, doc_b long"
    )
    monkeypatch.setattr(dd, "shared_ngram_pairs", lambda s, d: star)
    r = graph.graph_degree_assortativity(spark, "x").collect()[0]
    assert r["assortativity"] == -1.0
    assert r["n_directed_edges"] == 8

    cycle = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], "doc_a long, doc_b long"
    )
    monkeypatch.setattr(dd, "shared_ngram_pairs", lambda s, d: cycle)
    r = graph.graph_degree_assortativity(spark, "x").collect()[0]
    assert r["assortativity"] is None  # zero degree variance


def test_jackknife_se_matches_numpy(spark, monkeypatch):
    """The bucket-summary jackknife must reproduce the textbook
    leave-one-out computation run in plain Python from the same hash
    bucket assignment (to the integer milli-cent truncation)."""
    import datetime as dt
    import hashlib
    import math

    import fortisiem_clickhouse_monitor_spark.operators.advanced as adv

    vals = [float(v) for v in range(1, 201)]  # values 1..200
    rows = [
        (i, dt.datetime(2024, 1, 1), 1, "A", v, "{}")
        for i, v in enumerate(vals, start=1)
    ]
    monkeypatch.setattr(
        adv,
        "table",
        lambda s, d, n: spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        ),
    )
    got = adv.stats_jackknife_mean_se(spark, "x").collect()[0]

    G = adv._JK_G
    buckets = {g: [0, 0] for g in range(G)}  # n, cents
    for i, v in enumerate(vals, start=1):
        g = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % G
        buckets[g][0] += 1
        buckets[g][1] += math.floor(v * 100)
    n = sum(b[0] for b in buckets.values())
    s = sum(b[1] for b in buckets.values())
    loo = [
        (1000 * (s - sg)) // (n - ng) for ng, sg in buckets.values() if True
    ]
    S = sum(loo)
    ssd = sum((G * x - S) ** 2 for x in loo)
    want_se = round(math.sqrt((G - 1) * ssd / G**3) / 100000.0, 6)
    assert got["n_events"] == n
    assert got["se_jackknife"] == want_se
    assert got["mean_value"] == round(s / (100.0 * n), 6)


def test_dead_dimension_screen_planted(spark, monkeypatch):
    """A constant coordinate must flag is_dead with the exact integer
    zero-variance test; a varying one must not."""
    import fortisiem_clickhouse_monitor_spark.operators.similarity as sim

    rows = [
        (1, [1.0, 0.5, 2.0], 0),
        (2, [2.0, 0.5, 1.0], 0),
        (3, [3.0, 0.5, 0.0], 1),
    ]
    monkeypatch.setattr(
        sim,
        "table",
        lambda s, d, n: spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ),
    )
    got = {
        r["dim"]: r for r in sim.sim_dead_dimension_screen(spark, "x").collect()
    }
    assert not got[1]["is_dead"] and got[2]["is_dead"] and not got[3]["is_dead"]
    assert got[2]["mean_q"] == 0.5 and got[2]["var_q"] == 0.0
    assert got[1]["mean_q"] == 2.0


def test_longest_streak_gaps_and_islands(spark, monkeypatch):
    """User with days {1,2,3, 7,8, 20} -> longest 3, n_streaks 3;
    multiple events on one day collapse (distinct)."""
    import datetime as dt

    import fortisiem_clickhouse_monitor_spark.operators.behavior as bh

    days = [1, 2, 2, 3, 7, 8, 20, 20]
    rows = [
        (i, dt.datetime(2024, 1, d, 12, 0, 0), 5, "view", 1.0, "{}")
        for i, d in enumerate(days, start=1)
    ]
    monkeypatch.setattr(
        bh,
        "table",
        lambda s, d, n: spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        ),
    )
    r = bh.behavior_longest_streak_top20(spark, "x").collect()
    assert len(r) == 1
    assert (r[0]["longest_streak"], r[0]["n_streaks"]) == (3, 3)


def test_clustering_coefficient_planted(spark, monkeypatch):
    """A triangle plus one pendant edge: T=1, wedges = 3 from the
    triangle corners + 2 extra through the attachment node; global_cc
    = 3/5; the pendant (d=1) is excluded from the local average."""
    import fortisiem_clickhouse_monitor_spark.operators.dedup as dd
    import fortisiem_clickhouse_monitor_spark.operators.graph as graph

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "doc_a long, doc_b long"
    )
    monkeypatch.setattr(dd, "shared_ngram_pairs", lambda s, d: pairs)
    r = graph.graph_clustering_coefficient(spark, "x").collect()[0]
    assert r["n_nodes"] == 4 and r["n_edges"] == 4
    assert r["n_triangles"] == 1
    assert r["n_wedges"] == 5
    assert r["global_cc"] == 0.6
    # locals: nodes 1,2 -> 1.0; node 3 (d=3) -> 1/3 ppm-floored; node 4 excluded
    want = (1000000 + 1000000 + (2000000 * 1) // (3 * 2)) // 3
    assert r["avg_local_ppm"] == want


def test_padding_waste_sorted_never_worse(spark, monkeypatch):
    """Length-sorting can never pad MORE than arrival order when
    lengths are adversarially interleaved; exact hand-check on two
    batches of 2 (B is monkeypatched to 2)."""
    import fortisiem_clickhouse_monitor_spark.operators.corpus as cor

    rows = [
        (1, "a " * 10, "en", "s", 20),   # 10 tokens
        (2, "b", "en", "s", 1),          # 1 token
        (3, "c " * 10, "en", "s", 20),   # 10 tokens
        (4, "d", "en", "s", 1),          # 1 token
    ]
    monkeypatch.setattr(
        cor,
        "table",
        lambda s, d, n: spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars long",
        ),
    )
    monkeypatch.setattr(cor, "_PAD_B", 2)
    r = cor.pack_padding_waste_report(spark, "x").collect()[0]
    # arrival order batches (10,1) (10,1): waste 9+9=18
    # sorted batches (1,1) (10,10): waste 0
    assert r["naive_pad_tokens"] == 18
    assert r["sorted_pad_tokens"] == 0
    assert r["total_tokens"] == 22


def test_position_attribution_credits_sum_exact(spark, monkeypatch):
    """Every converting journey distributes exactly 10000 bp; k=1,
    k=2, and k=5 journeys hand-checked (remainder folds into the
    first touch)."""
    import datetime as dt

    import fortisiem_clickhouse_monitor_spark.operators.behavior as bh

    rows, eid = [], 0

    def add(u, day, t):
        nonlocal eid
        eid += 1
        rows.append((eid, dt.datetime(2024, 1, day), u, t, 1.0, "{}"))

    # user 1: single touch then purchase (k=1)
    add(1, 1, "view"); add(1, 2, "purchase")
    # user 2: two touches then purchase (k=2)
    add(2, 1, "view"); add(2, 2, "click"); add(2, 3, "purchase")
    # user 3: five touches then purchase (k=5, middles 2000//3=666, rem 2)
    for d, t in enumerate(["view", "click", "view", "click", "signup"], 1):
        add(3, d, t)
    add(3, 6, "purchase")
    # user 4: touches but NO purchase -> no credit at all
    add(4, 1, "view"); add(4, 2, "click")
    monkeypatch.setattr(
        bh,
        "table",
        lambda s, d, n: spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        ),
    )
    got = {
        r["channel"]: r["credit_bp"]
        for r in bh.behavior_attribution_position_based(spark, "x").collect()
    }
    assert sum(got.values()) == 30000  # 3 journeys x 10000, user 4 none
    # user 3 journey: first view 4000+2, last signup 4000, middles 666 each
    # view total: u1 10000 + u2 5000 + u3 (4002 + 666)
    assert got["view"] == 10000 + 5000 + 4002 + 666
    assert got["signup"] == 4000
    assert got["click"] == 5000 + 666 + 666


def test_mttr_mtbf_planted_incidents(spark, monkeypatch):
    """Two incidents: errors at t=0,60,120 (one incident, repair 120s)
    and t=1000,1030 (repair 30s); gap between incidents 880s.
    MTTR2 = 2*150/2 = 150, MTBF2 = 2*880/1 = 1760."""
    import datetime as dt

    import fortisiem_clickhouse_monitor_spark.operators.slo as slo

    base = dt.datetime(2024, 1, 1)
    secs = [0, 60, 120, 1000, 1030]
    rows = [
        (i, base + dt.timedelta(seconds=s), 1, "error", 0.0, "{}")
        for i, s in enumerate(secs, start=1)
    ] + [(99, base, 2, "view", 0.0, "{}")]
    monkeypatch.setattr(
        slo,
        "table",
        lambda s, d, n: spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        ),
    )
    r = slo.reliability_mttr_mtbf(spark, "x").collect()[0]
    assert r["n_incidents"] == 2
    assert r["n_error_events"] == 5
    assert r["total_repair_s"] == 150
    assert r["mttr2_s"] == 150
    assert r["mtbf2_s"] == 1760


def test_random_walks_deterministic_and_adjacent(spark, monkeypatch):
    """Every consecutive (step s -> s+1) pair in a walk must be an
    edge of the graph; walks are reproducible run-to-run; every node
    seeds exactly one walk of full length on a connected graph."""
    import fortisiem_clickhouse_monitor_spark.operators.dedup as dd
    import fortisiem_clickhouse_monitor_spark.operators.graph as graph

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4), (2, 4)], "doc_a long, doc_b long"
    )
    monkeypatch.setattr(dd, "shared_ngram_pairs", lambda s, d: pairs)
    edges = {(1, 2), (2, 3), (3, 4), (1, 4), (2, 4)}
    edges |= {(b, a) for a, b in edges}
    rows1 = sorted(
        map(tuple, graph.graph_random_walk_corpus(spark, "x").collect())
    )
    rows2 = sorted(
        map(tuple, graph.graph_random_walk_corpus(spark, "x").collect())
    )
    assert rows1 == rows2  # deterministic
    walks = {}
    for seed, step, node in rows1:
        walks.setdefault(seed, {})[step] = node
    assert set(walks) == {1, 2, 3, 4}
    for seed, path in walks.items():
        assert len(path) == graph._WALK_LEN + 1  # connected: no dead ends
        assert path[0] == seed
        for s in range(1, graph._WALK_LEN + 1):
            assert (path[s - 1], path[s]) in edges
