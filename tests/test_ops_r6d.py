"""Planted-fixture tests for the fourth round-6 operator batch:
argMin/argMax extremes, daily periodogram, half-life-decayed scores,
quality-classifier calibration bins, and the embedding dimension-
correlation screen.  Each pins hand-computed semantics on constructed
data; the sf0.01 oracle gate covers the hash-exact cross-engine
contract."""

from __future__ import annotations

import fortisiem_clickhouse_monitor_spark.operators.advanced as adv
import fortisiem_clickhouse_monitor_spark.operators.behavior as bh
import fortisiem_clickhouse_monitor_spark.operators.curation as cur
import fortisiem_clickhouse_monitor_spark.operators.similarity as sim


def _events(spark, rows):
    """rows: (day, user_id, event_type, value) with day in Jan 2024."""
    return spark.createDataFrame(
        [
            (i, f"2024-01-{d:02d} 12:00:00", u, et, float(v))
            for i, (d, u, et, v) in enumerate(rows)
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


def test_argminmax_tiebreak_is_deterministic(spark, monkeypatch):
    """Two users tie at the max (users 7 and 3 at value 9): the larger
    user wins the max slot; two tie at the min (users 5 and 8 at 1):
    the smaller wins the min slot."""
    ev = _events(
        spark,
        [
            (1, 7, "x", 9.0),
            (1, 3, "x", 9.0),
            (1, 5, "x", 1.0),
            (1, 8, "x", 1.0),
            (1, 4, "x", 5.0),
            (1, 1, "y", 2.0),
        ],
    )
    monkeypatch.setattr(adv, "table", lambda s, d, n: ev)
    rows = {
        r["event_type"]: r
        for r in adv.agg_argminmax_extremes(spark, "x").collect()
    }
    assert rows["x"]["vmax"] == 9.0 and rows["x"]["user_at_max"] == 7
    assert rows["x"]["vmin"] == 1.0 and rows["x"]["user_at_min"] == 5
    assert rows["y"]["user_at_max"] == 1 and rows["y"]["user_at_min"] == 1


def test_periodogram_finds_planted_period3(spark, monkeypatch):
    """Daily counts 13,10,10 repeating over 12 days: centered signal is
    +2,-1,-1 (period 3).  Over the 4 full cycles the DFT sum at period
    3 is exactly 12 + 0i -> power 144; every other candidate period is
    strictly smaller."""
    rows = []
    for d in range(12):  # days 1..12
        c = 13 if d % 3 == 0 else 10
        rows += [(d + 1, u, "t", 1.0) for u in range(c)]
    ev = _events(spark, rows)
    monkeypatch.setattr(adv, "table", lambda s, d, n: ev)
    got = {
        r["period"]: r["power"]
        for r in adv.timeseries_periodogram_daily(spark, "x").collect()
    }
    assert set(got) == set(range(2, 15))
    assert got[3] == 144.0
    assert all(v < 144.0 for p, v in got.items() if p != 3)


def test_periodogram_constant_series_is_flat_zero(spark, monkeypatch):
    """A constant daily series has zero power everywhere after mean
    centering (the DC term is removed by construction)."""
    rows = [(d + 1, u, "t", 1.0) for d in range(6) for u in range(5)]
    ev = _events(spark, rows)
    monkeypatch.setattr(adv, "table", lambda s, d, n: ev)
    got = [
        r["power"]
        for r in adv.timeseries_periodogram_daily(spark, "x").collect()
    ]
    assert got and all(abs(v) < 1e-6 for v in got)


def test_decayed_scores_halflife_weights(spark, monkeypatch):
    """Events on the anchor day, 7 days before, and 14 days before get
    weights 1, 1/2, 1/4 exactly: 2 + 1*0.5 + 1*0.25 = 2.75 decayed
    count; values 10,10,20,40 -> 10+10 + 20*0.5 + 40*0.25 = 40.0."""
    ev = _events(
        spark,
        [
            (15, 1, "x", 10.0),
            (15, 2, "x", 10.0),
            (8, 3, "x", 20.0),
            (1, 4, "x", 40.0),
        ],
    )
    monkeypatch.setattr(bh, "table", lambda s, d, n: ev)
    row = bh.trend_decayed_event_scores(spark, "x").collect()[0]
    assert row["decayed_count"] == 2.75
    assert row["decayed_value"] == 40.0


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )


def test_calibration_bins_planted_pass_fail(spark, monkeypatch):
    """One 30-token Gopher-passing doc (bin 3, score 30/90) and two
    5-token failing docs (bin 0, score 5/90): bin 3 has pass_rate 1
    and gap 1 - 1/3; bin 0 has pass_rate 0 and gap = its own score."""
    passing = " ".join(
        ["the"] + [a + b + "ord" for a in "abcdef" for b in "abcde"][:29]
    )  # 30 tokens, all alpha-ish lengths 3-6, max freq 1, has stopword
    failing = "tiny doc of few words"  # 5 tokens -> fails ok_len
    docs = _docs(spark, [passing, failing, failing])
    monkeypatch.setattr(cur, "table", lambda s, d, n: docs)
    rows = {
        r["bin_id"]: r
        for r in cur.quality_calibration_bins(spark, "x").collect()
    }
    assert rows[3]["n_docs"] == 1 and rows[3]["pass_rate"] == 1.0
    assert rows[3]["avg_score"] == round(30 / 90, 6)
    assert rows[3]["calibration_gap"] == round(1 - 30 / 90, 6)
    assert rows[0]["n_docs"] == 2 and rows[0]["pass_rate"] == 0.0
    assert rows[0]["calibration_gap"] == rows[0]["avg_score"]


def test_calibration_passing_doc_actually_passes_gopher(spark, monkeypatch):
    """Guard the fixture itself: the planted 'passing' doc must pass the
    full rule battery (otherwise the bin-3 assertions above are
    vacuous)."""
    from pyspark.sql import functions as F

    passing = " ".join(["the"] + [a + b + "ord" for a in "abcdef" for b in "abcde"][:29])
    docs = _docs(spark, [passing])
    monkeypatch.setattr(cur, "table", lambda s, d, n: docs)
    from fortisiem_clickhouse_monitor_spark.functions import textfns
    from fortisiem_clickhouse_monitor_spark.sources.tables import bind

    d = bind(docs, toks=textfns.tokens("text"))
    fl = cur.gopher_flags(F.col("toks"))
    row = d.select(fl["passes"].alias("p")).collect()[0]
    assert row["p"] is True


def _embeddings(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    )


def test_dim_correlation_planted_copies_and_dead_dim(spark, monkeypatch):
    """dim2 = dim1 (corr +1), dim3 = -dim1 (corr -1), dim4 alternating
    (near-zero corr with dim1), dim5 constant (zero variance ->
    excluded entirely).  Top three |corr| pairs are exactly the three
    perfect ones, ordered by (di, dj)."""
    vecs = [
        [1.0, 1.0, -1.0, 1.0, 2.0],
        [2.0, 2.0, -2.0, -1.0, 2.0],
        [3.0, 3.0, -3.0, 1.0, 2.0],
        [4.0, 4.0, -4.0, -1.0, 2.0],
    ]
    emb = _embeddings(spark, vecs)
    monkeypatch.setattr(sim, "table", lambda s, d, n: emb)
    rows = sim.sim_dim_correlation_topk(spark, "x").collect()
    top3 = [(r["di"], r["dj"], r["corr_r"]) for r in rows[:3]]
    assert top3 == [(1, 2, 1.0), (1, 3, -1.0), (2, 3, -1.0)]
    assert all(r["di"] != 5 and r["dj"] != 5 for r in rows)


def test_lttb_keeps_endpoints_and_spike(spark, monkeypatch):
    """30-day series, flat except a big spike on day 15: the decimated
    series has exactly B+2 = 14 points, keeps both endpoints, and the
    spike day must survive (it maximizes its bucket's triangle)."""
    rows = []
    for d in range(1, 31):
        c = 40 if d == 15 else 4
        rows += [(d, 100 + u, "t", 1.0) for u in range(c)]
    ev = _events(spark, rows)
    monkeypatch.setattr(adv, "table", lambda s, d, n: ev)
    got = sorted(
        adv.timeseries_lttb_downsample(spark, "x").collect(),
        key=lambda r: str(r["day"]),
    )
    assert len(got) == 14
    days = [str(r["day"]) for r in got]
    assert days[0] == "2024-01-01" and days[-1] == "2024-01-30"
    assert "2024-01-15" in days
    spike = [r for r in got if str(r["day"]) == "2024-01-15"][0]
    assert spike["y"] == 40
    # buckets are unique and ordered sentinels included
    buckets = sorted(r["bucket"] for r in got)
    assert buckets[0] == -1 and buckets[-1] == 12
    assert len(set(buckets)) == 14


def test_stl_residual_outliers_dow_aware(spark, monkeypatch):
    """The weekly pattern from the STL test plus ONE genuinely anomalous
    Wednesday (+30 events): raw-count screens would flag every Monday
    (4 vs mean 2); the residual screen flags ONLY the planted day."""
    dow_counts = {1: 4, 2: 2, 3: 2, 4: 2, 5: 2, 6: 1, 7: 1}
    rows = []
    for d in range(28):
        day = d + 1
        iso = d % 7 + 1
        c = dow_counts[iso] + (30 if day == 17 else 0)  # Wed 2024-01-17
        for u in range(c):
            rows.append((day, 1000 + u, "t", 1.0))
    ev = _events(spark, rows)
    monkeypatch.setattr(adv, "table", lambda s, d, n: ev)
    got = {str(r["day"]): r for r in
           adv.timeseries_stl_residual_outliers(spark, "x").collect()}
    flagged = [d for d, r in got.items() if r["is_outlier"]]
    assert "2024-01-17" in flagged
    # Mondays (except those near the spike window) must not be flagged
    assert "2024-01-08" not in flagged


def test_lorenz_deciles_concentration(spark, monkeypatch):
    """20 users: 19 with one event, one with 81 -> the top decile holds
    81+1 of 100 events; cumulative shares are monotone, end at 10000
    bps, and sit below the diagonal everywhere else."""
    rows = []
    for u in range(19):
        rows.append((1, u, "t", 1.0))
    rows += [(1 + d % 27, 99, "t", 1.0) for d in range(81)]
    ev = _events(spark, rows)
    monkeypatch.setattr(bh, "table", lambda s, d, n: ev)
    got = sorted(
        bh.behavior_lorenz_deciles(spark, "x").collect(),
        key=lambda r: r["decile"],
    )
    assert len(got) == 10
    assert got[-1]["cum_share_bps"] == 10000
    assert got[-1]["n_events"] == 81 + 1  # top decile: heavy user + one
    shares = [r["cum_share_bps"] for r in got]
    assert shares == sorted(shares)
    assert all(
        r["cum_share_bps"] <= 1000 * r["decile"] for r in got
    )  # Lorenz curve sits on/below the diagonal
