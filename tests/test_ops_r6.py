"""Planted-fixture tests for the round-6 operators.  Each pins the
semantics on constructed data; the sf0.01 oracle gate covers the
hash-exact cross-engine contract."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMALL

import fortisiem_clickhouse_monitor_spark.operators.behavior as bh
import fortisiem_clickhouse_monitor_spark.operators.graph as graph
import fortisiem_clickhouse_monitor_spark.operators.linkage as linkage
import fortisiem_clickhouse_monitor_spark.operators.multimodal as mm
import fortisiem_clickhouse_monitor_spark.operators.profiling as prof

_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, "
    "event_type string, value double, props string"
)


def _events(spark, rows):
    return spark.createDataFrame(rows, _EV_SCHEMA)


def test_holt_matches_python_recursion(spark, monkeypatch):
    """The distributed fold must equal the textbook Holt recursion
    (alpha=beta=1/2) run in plain Python with the same fixed-point
    truncating arithmetic, including a declining stretch where the
    trend goes NEGATIVE (the DuckDB-`//`-parity case)."""
    counts = [10, 12, 14, 16, 18, 20, 15, 10, 5, 4, 3, 9]
    rows, eid = [], 0
    for day, n in enumerate(counts, start=1):
        for _ in range(n):
            eid += 1
            rows.append((eid, dt.datetime(2024, 5, day), 7, "view", 0.0, "{}"))
    ev = _events(spark, rows)
    monkeypatch.setattr(bh, "table", lambda s, d, n: ev)
    out = sorted(
        bh.ts_holt_smoothing_daily(spark, "x").collect(),
        key=lambda r: r["day"],
    )
    assert [r["n"] for r in out] == counts

    S = bh._HOLT_S
    lvl = trd = 0
    exp_lvl, exp_trd, exp_fc = [], [], []
    for i, n in enumerate(counts):
        if i == 0:
            lvl, trd, fc = n * S, 0, None
        else:
            fc = lvl + trd
            new_lvl = bh._tdiv2(n * S + lvl + trd)
            trd = bh._tdiv2((new_lvl - lvl) + trd)
            lvl = new_lvl
        exp_lvl.append(lvl)
        exp_trd.append(trd)
        exp_fc.append(fc)
    assert [r["level_fp"] for r in out] == exp_lvl
    assert [r["trend_fp"] for r in out] == exp_trd
    assert [r["forecast_fp"] for r in out] == exp_fc
    # the declining stretch must actually exercise negative trend
    assert min(exp_trd) < 0


def test_tdiv2_matches_duckdb_integer_division():
    import duckdb

    for a in range(-9, 10):
        want = duckdb.sql(f"SELECT CAST({a} AS BIGINT) // 2").fetchone()[0]
        assert bh._tdiv2(a) == want, a


def test_trend_momentum_finds_planted_spike(spark, monkeypatch):
    """A type running flat at 10/day that jumps to 40 on day 9 must
    rank first with momentum2 = 2*40 - 2*10; days with fewer than 7
    trailing observations never appear."""
    rows, eid = [], 0
    for day in range(1, 11):
        n = 40 if day == 9 else 10
        for _ in range(n):
            eid += 1
            rows.append((eid, dt.datetime(2024, 6, day), 7, "spiky", 0.0, "{}"))
        for _ in range(20):  # steady companion type
            eid += 1
            rows.append((eid, dt.datetime(2024, 6, day), 8, "flat", 0.0, "{}"))
    ev = _events(spark, rows)
    monkeypatch.setattr(bh, "table", lambda s, d, n: ev)
    out = bh.trend_momentum_daily(spark, "x").collect()
    assert all(r["day"] >= dt.date(2024, 6, 8) for r in out)
    top = out[0]
    assert (top["event_type"], top["n"], top["med2_trail"]) == ("spiky", 40, 20)
    assert top["momentum2"] == 60


def test_neighborhood_function_on_path_graph(spark, monkeypatch):
    """Path A-B-C-D: N(1) = 6 ordered pairs (3 edges x 2), N(2) adds
    (A,C),(C,A),(B,D),(D,B) = 10, N(3) adds (A,D),(D,A) = 12."""
    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0)],
        "doc_a long, doc_b long, jaccard double",
    )
    import fortisiem_clickhouse_monitor_spark.operators.dedup as dedup

    monkeypatch.setattr(dedup, "shared_ngram_pairs", lambda s, d: edges)
    got = {
        r["r"]: r["n_pairs"]
        for r in graph.graph_neighborhood_function(spark, "x").collect()
    }
    assert got == {1: 6, 2: 10, 3: 12}


def test_blocking_quality_invariants(spark):
    r = linkage.linkage_blocking_quality(spark, SF_SMALL).collect()[0]
    assert r["n_candidates"] <= r["n_block_pairs"]
    assert r["n_found"] <= r["n_true"]
    assert 0.0 <= r["reduction_ratio"] <= 1.0
    assert 0.0 < r["pairs_completeness"] <= 1.0
    assert r["n_true"] > 0  # the eval is non-vacuous on the fixture


def test_compaction_plan_invariants(spark):
    rows = prof.layout_compaction_plan(spark, SF_SMALL).collect()
    assert rows
    target = prof._COMPACT_TARGET_CHARS
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    for src, files in by_source.items():
        files.sort(key=lambda r: r["file_idx"])
        # files partition the doc_id order: ranges never interleave
        for a, b in zip(files, files[1:]):
            assert a["last_doc"] < b["first_doc"]
        # a file only exceeds the target via its LAST doc straddling
        # the boundary (greedy never splits a doc); so any file except
        # an oversized single-doc one stays under target + max doc size
        for f in files:
            if f["n_docs"] > 1:
                assert f["total_chars"] < 2 * target


def test_audio_silence_trim_planted_runs(spark, monkeypatch):
    """One track with samples [silent x3, loud x2, silent x1, loud x1,
    silent x2]: lead_trim 3, tail_trim 2, 3 silent runs, longest 3."""
    loud, quiet = 30.0, 1.0  # q = 3000 vs 100 against threshold 2000
    pattern = [quiet] * 3 + [loud] * 2 + [quiet] + [loud] + [quiet] * 2
    rows = [
        (i, dt.datetime(2024, 7, 1, 0, i), 7, "s", v, "{}")
        for i, v in enumerate(pattern)
    ]
    ev = _events(spark, rows)
    monkeypatch.setattr(mm, "table", lambda s, d, n: ev)
    r = mm.mm_audio_silence_trim(spark, "x").collect()[0]
    assert r["n_samples"] == 9
    assert r["n_silent"] == 6
    assert r["n_silent_runs"] == 3
    assert r["longest_silent_run"] == 3
    assert r["lead_trim"] == 3
    assert r["tail_trim"] == 2


def test_privacy_screen_flags_planted_small_group(spark, monkeypatch):
    """A quasi-identifier group with 2 members violates k=5; a group
    where everyone shares one balance band violates l=3."""
    rows = []
    # group (1, 'A'): 2 members -> k violation
    rows += [(1, "x", 1, 500.0, "A"), (2, "y", 1, 2500.0, "A")]
    # group (2, 'B'): 6 members, all in band 0 -> l violation only
    rows += [(10 + i, f"m{i}", 2, 100.0 + i, "B") for i in range(6)]
    # group (3, 'C'): 6 members across 4 bands -> clean
    rows += [(20 + i, f"c{i}", 3, 1000.0 * (i % 4), "C") for i in range(6)]
    c = spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    )
    monkeypatch.setattr(prof, "table", lambda s, d, n: c)
    got = {
        (r["nationkey"], r["mktsegment"]): (r["violates_k"], r["violates_l"])
        for r in prof.privacy_k_anonymity_screen(spark, "x").collect()
    }
    assert got[(1, "A")] == (True, True)  # 2 members, 2 bands
    assert got[(2, "B")] == (False, True)
    assert got[(3, "C")] == (False, False)


def test_zone_map_eval_sorted_column_prunes_more(spark):
    # sf0.01: each source splits into several files (SF_SMALL packs one
    # file per source, which gives zone maps nothing to prune).
    rows = prof.layout_zone_map_prune_eval(
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert len(rows) == prof._ZONE_PROBES
    tot_id = sum(r["files_hit_by_id"] for r in rows)
    tot_ch = sum(r["files_hit_by_chars"] for r in rows)
    n = rows[0]["n_files"]
    assert all(r["n_files"] == n for r in rows)
    # the sort column prunes; the unsorted column barely does
    assert tot_id < tot_ch
    # per SOURCE the id ranges partition the domain, so that source's
    # files hit at most (files_in_source + probes - 1) probe slots;
    # summed over 20 sources: n + 19 * sources is a safe ceiling
    assert tot_id <= n + 19 * 20
    assert all(r["files_hit_by_id"] >= 1 for r in rows)


def test_theil_sen_ignores_planted_outlier_day(spark, monkeypatch):
    """Daily counts 10,12,14,16,99,20,22 (slope +2/day, one garbage
    day): the pairwise-slope median stays 2e6 ppm; an OLS fit would
    be dragged far off by the 99."""
    counts = [10, 12, 14, 16, 99, 20, 22]
    rows, eid = [], 0
    for day, n in enumerate(counts, start=1):
        for _ in range(n):
            eid += 1
            rows.append((eid, dt.datetime(2024, 8, day), 7, "view", 0.0, "{}"))
    ev = _events(spark, rows)
    monkeypatch.setattr(bh, "table", lambda s, d, n: ev)
    r = bh.trend_theil_sen_daily(spark, "x").collect()[0]
    assert r["n_pairs"] == 21
    assert r["med2_slope_ppm"] == 4_000_000  # 2 * 2e6 ppm


def test_doremi_matches_python_fixed_point(spark, monkeypatch):
    """The distributed rounds must equal the same integer fixed-point
    iteration run in plain Python (truncating division), and weight
    must move toward the below-reference (shorter-mean) domain."""
    import fortisiem_clickhouse_monitor_spark.operators.corpus as corpus

    rows = []
    did = 0
    for src, size, k in (("tiny", 40, 30), ("big", 400, 10)):
        for _ in range(k):
            did += 1
            rows.append((did, "x " * (size // 2), "en", src, size))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    monkeypatch.setattr(corpus, "table", lambda s, d, n: docs)
    got = {
        r["source"]: (r["n_docs"], r["mean_chars_milli"], r["weight_ppm"])
        for r in corpus.corpus_doremi_mixture(spark, "x").collect()
    }

    S, DAMP, R = (
        corpus._DOREMI_SCALE,
        corpus._DOREMI_DAMP,
        corpus._DOREMI_ROUNDS,
    )

    def tdiv(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    doms = {"tiny": 40 * 1000, "big": 400 * 1000}
    w = {s: tdiv(S, len(doms)) for s in doms}
    clamp = S // 4
    for _ in range(R):
        ref = tdiv(
            sum(w[s] * doms[s] for s in doms), sum(w.values())
        )
        raw = {
            s: tdiv(
                w[s] * (S + tdiv(max(min(ref - doms[s], clamp), -clamp), DAMP)),
                S,
            )
            for s in doms
        }
        tot = sum(raw.values())
        w = {s: tdiv(raw[s] * S, tot) for s in doms}
    assert got["tiny"] == (30, 40_000, w["tiny"])
    assert got["big"] == (10, 400_000, w["big"])
    assert got["tiny"][2] > got["big"][2]  # weight moved to the short domain
    assert abs(got["tiny"][2] + got["big"][2] - S) <= 2  # renorm holds


def test_hyperball_estimates_close_on_fixture(spark):
    """m=512 registers at fixture ball sizes sit in the linear-counting
    regime, so the HyperBall estimate should land within ~15% of the
    exact 2-hop ball for every reported node."""
    rows = graph.graph_anf_hll_eval(spark, SF_SMALL).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["exact_ball"] >= 2
        rel = r["abs_err"] / r["exact_ball"]
        assert rel <= 0.15, (r["node"], r["exact_ball"], r["est_ball"])
