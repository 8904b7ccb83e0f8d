"""Planted-fixture tests for the interval-algebra pack
(operators/intervals.py) and the drift screens (operators/profiling.py
KS / chi-square).  Each test constructs data where the exact answer is
known by hand; the sf0.01 oracle gate covers the hash-exact
cross-engine contract."""

from __future__ import annotations

import datetime as dt

import fortisiem_clickhouse_monitor_spark.operators.intervals as iv
import fortisiem_clickhouse_monitor_spark.operators.profiling as prof

_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, "
    "event_type string, value double, props string"
)

_T0 = dt.datetime(2024, 3, 1, 10, 0, 0)


def _ev(spark, rows):
    """rows: (event_id, offset_s, event_type, value)."""
    return spark.createDataFrame(
        [
            (eid, _T0 + dt.timedelta(seconds=off), 1, et, v, "{}")
            for eid, off, et, v in rows
        ],
        _EV_SCHEMA,
    )


def test_peak_concurrency_planted(spark, monkeypatch):
    """Three staggered spans of one type: spans [0,60+40), [30,90+40),
    [60,120+40) (value 40 => dur 100 s) overlap pairwise; all three are
    live in [60,100) -> peak 3, first reached at t0+60.  A touching
    pair of another type (end == next start) must NOT count as
    concurrent (ends sort before starts)."""
    rows = [
        (1, 0, "a", 40.0),
        (2, 30, "a", 40.0),
        (3, 60, "a", 40.0),
        # type b: [0, 100) then [100, 200): touch, never overlap
        (4, 0, "b", 40.0),
        (5, 100, "b", 40.0),
    ]
    monkeypatch.setattr(iv, "table", lambda s, d, n: _ev(spark, rows))
    out = {
        r["event_type"]: r
        for r in iv.interval_peak_concurrency(spark, "x").collect()
    }
    base = int(_T0.replace(tzinfo=dt.timezone.utc).timestamp())
    assert out["a"]["peak_concurrency"] == 3
    assert out["a"]["n_events"] == 3
    assert out["a"]["peak_t"] == base + 60
    assert out["b"]["peak_concurrency"] == 1
    assert out["b"]["peak_t"] == base


def test_peak_concurrency_two_level_scan_crosses_buckets(
    spark, monkeypatch
):
    """Spans overlapping MIDNIGHT: the peak's sweep state must carry
    from one day-bucket into the next (the two-level scan's carry-in
    term).  Two spans open before midnight and one after; all three
    overlap just after midnight -> peak 3, reached in the second
    bucket."""
    midnight = dt.datetime(2024, 3, 2, 0, 0, 0)
    off0 = int((midnight - _T0).total_seconds())
    rows = [
        (1, off0 - 80, "a", 100.0),  # [m-80, m+80)
        (2, off0 - 40, "a", 100.0),  # [m-40, m+120)
        (3, off0 + 10, "a", 100.0),  # [m+10, m+170)
    ]
    monkeypatch.setattr(iv, "table", lambda s, d, n: _ev(spark, rows))
    r = iv.interval_peak_concurrency(spark, "x").collect()[0]
    base = int(midnight.replace(tzinfo=dt.timezone.utc).timestamp())
    assert r["peak_concurrency"] == 3
    assert r["peak_t"] == base + 10


def test_union_coverage_merges_overlaps(spark, monkeypatch):
    """[0,100) + [50,150) merge into one 150 s island; [300,400) is a
    second island; an abutting span [400,500) coalesces with it (the
    >= boundary).  Sum-of-durations would say 400 s; union says 350."""
    rows = [
        (1, 0, "a", 40.0),  # [0, 100)
        (2, 50, "b", 40.0),  # [50, 150)
        (3, 300, "a", 40.0),  # [300, 400)
        (4, 400, "a", 40.0),  # [400, 500): abuts island 2
    ]
    monkeypatch.setattr(iv, "table", lambda s, d, n: _ev(spark, rows))
    r = iv.interval_union_coverage_daily(spark, "x").collect()
    assert len(r) == 1
    row = r[0]
    assert row["n_islands"] == 2
    assert row["n_events"] == 4
    assert row["covered_s"] == 150 + 200


def test_union_coverage_contained_span(spark, monkeypatch):
    """A span fully CONTAINED in an earlier one must not extend the
    island nor open a new one (running-max-end, not lag(end))."""
    rows = [
        (1, 0, "a", 240.0),  # [0, 300)
        (2, 50, "a", 40.0),  # [50, 150) contained
        (3, 100, "a", 40.0),  # [100, 200) contained
    ]
    monkeypatch.setattr(iv, "table", lambda s, d, n: _ev(spark, rows))
    row = iv.interval_union_coverage_daily(spark, "x").collect()[0]
    assert row["n_islands"] == 1
    assert row["covered_s"] == 300


def test_ks_planted_shift(spark, monkeypatch):
    """Early half: values {1,2}; late half: values {3,4} (disjoint
    supports) -> KS distance exactly 1.  A second type with identical
    halves -> KS 0."""
    rows = []
    eid = 0
    for k in range(10):  # early: t in [0, 1000]
        eid += 1
        rows.append((eid, k * 100, "shift", float(1 + k % 2)))
        eid += 1
        rows.append((eid, k * 100, "same", float(k % 3)))
    for k in range(10):  # late: t in [3000, 4000]
        eid += 1
        rows.append((eid, 3000 + k * 100, "shift", float(3 + k % 2)))
        eid += 1
        rows.append((eid, 3000 + k * 100, "same", float(k % 3)))
    monkeypatch.setattr(prof, "table", lambda s, d, n: _ev(spark, rows))
    out = {
        r["event_type"]: r
        for r in prof.drift_ks_event_values(spark, "x").collect()
    }
    assert out["shift"]["ks"] == 1.0
    assert out["shift"]["n_early"] == 10 and out["shift"]["n_late"] == 10
    assert out["same"]["ks"] == 0.0


def test_chi2_homogeneous_is_zero(spark, monkeypatch):
    """Identical type mix in both halves -> every contribution 0 and
    chi2 0; a planted mix shift yields the hand-computed statistic."""
    rows, eid = [], 0
    for k in range(8):
        for et in ("x", "x", "y"):  # 2:1 mix, both halves
            eid += 1
            rows.append((eid, (0 if k < 4 else 4000) + eid, et, 0.0))
    monkeypatch.setattr(prof, "table", lambda s, d, n: _ev(spark, rows))
    out = prof.drift_chi2_type_mix(spark, "x").collect()
    assert all(r["contrib_micro"] == 0 for r in out)
    assert all(r["chi2_micro"] == 0 for r in out)

    # shift: early 6x/2y, late 2x/6y -> classic 2x2 chi2 = 4.
    rows2, eid = [], 0
    for et, off in (
        [("x", 0)] * 6 + [("y", 0)] * 2 + [("x", 4000)] * 2 + [("y", 4000)] * 6
    ):
        eid += 1
        rows2.append((eid, off + eid, et, 0.0))
    monkeypatch.setattr(prof, "table", lambda s, d, n: _ev(spark, rows2))
    out2 = {r["event_type"]: r for r in
            prof.drift_chi2_type_mix(spark, "x").collect()}
    # E = 4 everywhere; chi2 = sum (o-4)^2/4 = (4+4+4+4)/4 ... per
    # type: x contributes (6-4)^2/4 + (2-4)^2/4 = 2; y likewise 2.
    assert out2["x"]["contrib_micro"] == 2_000_000
    assert out2["y"]["contrib_micro"] == 2_000_000
    assert out2["x"]["chi2_micro"] == 4_000_000


def test_source_overlap_planted(spark, monkeypatch):
    """Two sources sharing exactly one of their shingles, a third with
    no overlap: the pair row carries exact distinct-set sizes, Jaccard
    and containment; disjoint pairs don't appear."""
    import fortisiem_clickhouse_monitor_spark.operators.text as txt

    docs = spark.createDataFrame(
        [
            # srcA: shingles {a b c, b c d} (4 tokens)
            (1, "a b c d", "en", "srcA", 7),
            # srcB: shingles {b c d, c d e}
            (2, "b c d e", "en", "srcB", 7),
            # srcC: disjoint
            (3, "x y z w", "en", "srcC", 7),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    monkeypatch.setattr(txt, "table", lambda s, d, n: docs)
    rows = txt.corpus_source_overlap_matrix(spark, "x").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["src_a"], r["src_b"]) == ("srcA", "srcB")
    assert (r["n_a"], r["n_b"], r["n_common"]) == (2, 2, 1)
    assert r["jaccard"] == round(1 / 3, 6)
    assert r["containment_a"] == 0.5


def test_overlap_join_counts_cross_bucket_pair_once(spark, monkeypatch):
    """An error span and a purchase span that BOTH cross midnight share
    two day-buckets; the bucketed join must count the pair exactly
    once, assigned to the overlap-start day.  A non-overlapping pair
    (touching ends) must not appear."""
    midnight = dt.datetime(2024, 3, 2, 0, 0, 0)
    off0 = int((midnight - _T0).total_seconds())
    rows = [
        # error [m-100, m+60): value 100 -> dur 160
        (1, off0 - 100, "error", 100.0),
        # purchase [m-50, m+110): overlaps error in [m-50, m+60) = 110s
        (2, off0 - 50, "purchase", 100.0),
        # purchase [m+60, m+220): touches error's end exactly -> no pair
        (3, off0 + 60, "purchase", 100.0),
    ]
    monkeypatch.setattr(iv, "table", lambda s, d, n: _ev(spark, rows))
    out = iv.interval_overlap_error_purchase(spark, "x").collect()
    assert len(out) == 1
    base = int(_T0.replace(tzinfo=dt.timezone.utc).timestamp())
    start = base + off0 - 50
    assert out[0]["day_num"] == start // 86400
    assert out[0]["n_pairs"] == 1
    assert out[0]["overlap_s"] == 110
