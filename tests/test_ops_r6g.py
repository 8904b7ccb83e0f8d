"""Planted-fixture tests for the seventh round-6 batch: association
rules and the Gopher filter funnel (the streaming SMA-crossover
differential lives in tests/test_streaming.py beside its peers)."""

from __future__ import annotations

import fortisiem_clickhouse_monitor_spark.operators.behavior as bh
import fortisiem_clickhouse_monitor_spark.operators.curation as cur


def _events(spark, rows):
    """rows: (ts_string, user_id, event_type)."""
    return spark.createDataFrame(
        [(i, ts, u, et, 1.0) for i, (ts, u, et) in enumerate(rows)],
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


def test_association_rules_hand_computed(spark, monkeypatch):
    """3 baskets: {a,b}, {a,b}, {a}.  conf(a->b) = 2/3, conf(b->a) = 1,
    lift both directions = 2*3/(3*2) = 1.0 exactly."""
    rows = [
        ("2024-01-01 00:00:00", 1, "a"),
        ("2024-01-01 00:00:01", 1, "b"),
        ("2024-01-01 10:00:00", 1, "a"),  # >30 min gap -> new basket
        ("2024-01-01 10:00:01", 1, "b"),
        ("2024-01-01 00:00:00", 2, "a"),
    ]
    ev = _events(spark, rows)
    monkeypatch.setattr(bh, "table", lambda s, d, n: ev)
    got = {(r["antecedent"], r["consequent"]): r
           for r in bh.behavior_association_rules(spark, "x").collect()}
    assert got[("a", "b")]["support_ab"] == 2
    assert got[("a", "b")]["confidence"] == round(2 / 3, 6)
    assert got[("b", "a")]["confidence"] == 1.0
    assert got[("a", "b")]["lift"] == 1.0 and got[("b", "a")]["lift"] == 1.0


def test_association_rules_negative_lift(spark, monkeypatch):
    """Types that never share a basket produce no rule row (support 0
    pairs are absent, not zero-filled) — and a rarely-shared pair
    shows lift < 1."""
    rows = []
    # 8 baskets of {a}, 8 of {b}, 1 of {a,b} -> lift(a->b) =
    # 1 * 17 / (9 * 9) < 1
    for i in range(8):
        rows.append((f"2024-01-0{i % 7 + 1} 00:00:00", 10 + i, "a"))
        rows.append((f"2024-01-0{i % 7 + 1} 00:00:00", 30 + i, "b"))
    rows += [("2024-01-01 00:00:00", 99, "a"),
             ("2024-01-01 00:00:05", 99, "b")]
    ev = _events(spark, rows)
    monkeypatch.setattr(bh, "table", lambda s, d, n: ev)
    got = {(r["antecedent"], r["consequent"]): r
           for r in bh.behavior_association_rules(spark, "x").collect()}
    assert got[("a", "b")]["lift"] == round(17 / 81, 6)
    assert got[("a", "b")]["support_ab"] == 1


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )


def test_filter_funnel_monotone_and_attributed(spark, monkeypatch):
    """Funnel counts never increase stage over stage, and each planted
    doc falls at exactly the stage built to catch it."""
    import itertools

    alpha_words = ["".join(p) for p in itertools.product("abcdef", repeat=2)]
    ok = " ".join(["the"] + [w + "ord" for w in alpha_words[:29]])
    too_short = "just five short words here"[:26]  # 5 tokens
    bad_alpha = " ".join(["the"] + [f"w{i}" for i in range(29)])  # digits
    repeated = " ".join(["the"] * 30)  # max_freq 30 > 30/8
    docs = _docs(spark, [ok, too_short, bad_alpha, repeated])
    monkeypatch.setattr(cur, "table", lambda s, d, n: docs)
    got = {r["stage"]: r for r in
           cur.corpus_filter_funnel(spark, "x").collect()}
    assert [got[i]["rule"] for i in range(6)] == [
        "raw", "ok_len", "ok_word_len", "ok_alpha", "ok_repetition",
        "has_stopword",
    ]
    counts = [got[i]["n_docs"] for i in range(6)]
    assert counts[0] == 4
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    assert got[1]["n_docs"] == 3          # too_short dies at ok_len
    assert got[3]["n_docs"] == 2          # bad_alpha dies at ok_alpha
    assert got[4]["n_docs"] == 1          # repeated dies at ok_repetition
    assert got[5]["n_docs"] == 1          # ok survives everything
    # token accounting follows the same attrition
    toks = [got[i]["n_tokens"] for i in range(6)]
    assert all(a >= b for a, b in zip(toks, toks[1:]))
    assert toks[5] == 30


def test_effective_diameter_clique_vs_path(spark, monkeypatch):
    """A 6-clique saturates every ball at r=1 -> eff_diameter <= 1 (the
    statistic reads cluster SHAPE); a 9-path keeps growing through r=2
    -> eff_diameter lands in (1, 2]."""
    import itertools

    import fortisiem_clickhouse_monitor_spark.operators.graph as g

    def planted(edges):
        df = spark.createDataFrame(
            [(a, b) for a, b in edges], "doc_a long, doc_b long"
        )
        monkeypatch.setattr(
            g, "shared_ngram_pairs", lambda s, d: df, raising=False
        )
        import fortisiem_clickhouse_monitor_spark.operators.dedup as dd
        monkeypatch.setattr(dd, "shared_ngram_pairs", lambda s, d: df)
        return {
            k: v
            for k, v in g.graph_effective_diameter(spark, "x")
            .collect()[0]
            .asDict()
            .items()
        }

    clique = planted(list(itertools.combinations(range(1, 7), 2)))
    assert clique["n_nodes"] == 6
    assert clique["eff_diameter"] <= 1.0
    path = planted([(i, i + 1) for i in range(1, 9)])
    assert path["n_nodes"] == 9
    assert path["n1_est"] < path["n2_est"]
    assert 1.0 < path["eff_diameter"] <= 2.0


def test_audio_clipping_runs_hand_planted(spark, monkeypatch):
    """User 1: samples [rail, rail, rail, quiet, rail] -> 4 clipped,
    longest run 3.  User 2: never clips -> run 0.  Rail value: any
    |value*100| >= 32767 quantizes onto a rail."""
    import fortisiem_clickhouse_monitor_spark.operators.multimodal as mm

    rail = 400.0  # 40000 > 32767 -> clamps to the positive rail
    rows = [
        (0, "2024-01-01 00:00:00", 1, rail),
        (1, "2024-01-01 00:00:01", 1, rail),
        (2, "2024-01-01 00:00:02", 1, -rail),
        (3, "2024-01-01 00:00:03", 1, 5.0),
        (4, "2024-01-01 00:00:04", 1, rail),
        (5, "2024-01-01 00:00:00", 2, 1.0),
        (6, "2024-01-01 00:00:01", 2, 2.0),
    ]
    ev = spark.createDataFrame(
        [(i, ts, u, "t", v) for i, ts, u, v in rows],
        "event_id long, ts_s string, user_id long, event_type string,"
        " value double",
    ).selectExpr(
        "event_id", "CAST(ts_s AS TIMESTAMP) AS ts", "user_id",
        "event_type", "value", "'{}' AS props",
    )
    monkeypatch.setattr(mm, "table", lambda s, d, n: ev)
    got = {r["user_id"]: r for r in
           mm.mm_audio_clipping_screen(spark, "x").collect()}
    assert got[1]["n_samples"] == 5 and got[1]["n_clipped"] == 4
    assert got[1]["max_clip_run"] == 3
    assert got[1]["clip_ppm"] == 800000
    assert got[2]["n_clipped"] == 0 and got[2]["max_clip_run"] == 0
