"""Planted-fixture tests for the sixth round-6 operator batch: PII
incidence rollup, sentence stats, STL-lite decomposition, monthly
growth accounting, and the truncation budget."""

from __future__ import annotations

import fortisiem_clickhouse_monitor_spark.operators.advanced as adv
import fortisiem_clickhouse_monitor_spark.operators.behavior as bh
import fortisiem_clickhouse_monitor_spark.operators.corpus as corp
import fortisiem_clickhouse_monitor_spark.operators.text as tx


def _docs(spark, rows):
    """rows: (text, lang, source)."""
    return spark.createDataFrame(
        [(i, t, lg, src, len(t)) for i, (t, lg, src) in enumerate(rows)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )


def _events(spark, rows):
    """rows: (ts_string, user_id)."""
    return spark.createDataFrame(
        [(i, ts, u, "t", 1.0) for i, (ts, u) in enumerate(rows)],
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


def test_pii_rate_by_source_counts(spark, monkeypatch):
    docs = _docs(
        spark,
        [
            ("reach me at bob@example.com or 10.0.0.1", "en", "web"),
            ("clean text with no identifiers", "en", "web"),
            ("alice@test.org wrote to carol@test.org", "en", "mail"),
        ],
    )
    monkeypatch.setattr(tx, "table", lambda s, d, n: docs)
    got = {r["source"]: r for r in
           tx.privacy_pii_rate_by_source(spark, "x").collect()}
    assert got["web"]["n_docs"] == 2 and got["web"]["n_with_pii"] == 1
    assert got["web"]["n_emails"] == 1 and got["web"]["n_ips"] == 1
    assert got["mail"]["n_with_pii"] == 1 and got["mail"]["n_emails"] == 2


def test_sentence_stats_hand_planted(spark, monkeypatch):
    docs = _docs(
        spark,
        [
            ("One. Two two! Three three three?", "en", "w"),
            ("no terminal punctuation at all", "en", "w"),
            ("", "en", "w"),
        ],
    )
    monkeypatch.setattr(tx, "table", lambda s, d, n: docs)
    got = {r["doc_id"]: r for r in
           tx.text_sentence_stats(spark, "x").collect()}
    assert got[0]["n_sentences"] == 3
    assert got[0]["max_sentence_chars"] == len("Three three three")
    assert got[0]["sum_sentence_chars"] == 3 + 7 + 17
    # an unterminated run still counts as one trailing sentence
    assert got[1]["n_sentences"] == 1
    assert got[2]["n_sentences"] == 0 and got[2]["sum_sentence_chars"] == 0


def test_stl_perfect_weekly_pattern_zero_residual(spark, monkeypatch):
    """21 days with counts purely a function of ISO dow: every full
    7-day centered window sums one whole week -> trend = weekly mean
    everywhere it's defined, seasonal soaks the dow offsets, residual
    is exactly 0 on interior days (and NULL at the 3-day edges)."""
    dow_counts = {1: 4, 2: 2, 3: 2, 4: 2, 5: 2, 6: 1, 7: 1}  # mean = 2
    rows = []
    for d in range(21):  # 2024-01-01 is a Monday (isodow 1)
        day = d + 1
        iso = d % 7 + 1
        for u in range(dow_counts[iso]):
            rows.append((f"2024-01-{day:02d} 09:00:00", 1000 + u))
    ev = _events(spark, rows)
    monkeypatch.setattr(adv, "table", lambda s, d, n: ev)
    got = sorted(
        adv.timeseries_stl_daily(spark, "x").collect(),
        key=lambda r: str(r["day"]),
    )
    assert len(got) == 21
    for i, r in enumerate(got):
        if i < 3 or i >= 18:
            assert r["trend"] is None and r["residual"] is None
        else:
            assert r["trend"] == 2.0
            assert r["residual"] == 0.0
    # Monday seasonal offset = 4 - 2 = +2 (computed over interior rows)
    mondays = [r for r in got if str(r["day"]) in
               ("2024-01-08", "2024-01-15")]
    assert all(r["seasonal"] == 2.0 for r in mondays)


def test_growth_accounting_planted_lifecycle(spark, monkeypatch):
    """u1 active Jan+Feb, u2 Jan only, u3 Jan and Mar: Feb churn =
    active(Jan) - retained(Feb) = 3 - 1 = 2; Mar has one resurrected
    and churn 1 (u1)."""
    rows = [
        ("2024-01-05 00:00:00", 1),
        ("2024-01-06 00:00:00", 2),
        ("2024-01-07 00:00:00", 3),
        ("2024-02-05 00:00:00", 1),
        ("2024-03-05 00:00:00", 3),
    ]
    ev = _events(spark, rows)
    monkeypatch.setattr(bh, "table", lambda s, d, n: ev)
    got = {str(r["month_start"])[:7]: r for r in
           bh.behavior_growth_accounting_monthly(spark, "x").collect()}
    jan, feb, mar = got["2024-01"], got["2024-02"], got["2024-03"]
    assert jan["n_new"] == 3 and jan["n_churned"] is None
    assert feb["n_active"] == 1 and feb["n_retained"] == 1
    assert feb["n_churned"] == 2
    assert mar["n_resurrected"] == 1 and mar["n_retained"] == 0
    assert mar["n_churned"] == 1


def test_growth_accounting_gap_month_guards_churn(spark, monkeypatch):
    """Jan and Mar active with NO Feb activity at all: Mar's churn is
    NULL (the m-1 guard), not a bogus number computed against Jan."""
    rows = [("2024-01-05 00:00:00", 1), ("2024-03-05 00:00:00", 1)]
    ev = _events(spark, rows)
    monkeypatch.setattr(bh, "table", lambda s, d, n: ev)
    got = {str(r["month_start"])[:7]: r for r in
           bh.behavior_growth_accounting_monthly(spark, "x").collect()}
    assert got["2024-03"]["n_churned"] is None
    assert got["2024-03"]["n_resurrected"] == 1


def test_truncation_budget_hand_percentile(spark, monkeypatch):
    """20 docs of 1..20 tokens: percentile_cont(0.95) at n=20 is
    19 + 0.05 = 19.05; one doc exceeds it, losing 0.95 tokens."""
    docs = _docs(
        spark,
        [(" ".join(["w"] * n), "en", "s") for n in range(1, 21)],
    )
    monkeypatch.setattr(corp, "table", lambda s, d, n: docs)
    row = corp.corpus_truncation_budget(spark, "x").collect()[0]
    assert row["n_docs"] == 20 and row["total_tokens"] == 210
    assert row["cap_p95"] == 19.05
    assert row["n_docs_over_p95"] == 1
    assert abs(row["tokens_lost_at_p95"] - 0.95) < 1e-9


def test_budget_allocation_hamilton_exact(spark, monkeypatch):
    """Strata of sizes 7, 2, 1 under budget 100: floors are 70, 20, 10
    and remainders all zero -> exact proportional split.  Sizes 1,1,1
    under budget 100: 33+33+34 with the leftover going to the first
    remainder-tied language alphabetically."""
    docs = _docs(
        spark,
        [("x", "en", "s")] * 7 + [("x", "de", "s")] * 2 + [("x", "fr", "s")],
    )
    monkeypatch.setattr(corp, "table", lambda s, d, n: docs)
    got = {r["lang"]: r["allocation"]
           for r in corp.sample_budget_allocation(spark, "x").collect()}
    assert got == {"en": 70, "de": 20, "fr": 10}
    docs2 = _docs(
        spark, [("x", "en", "s"), ("x", "de", "s"), ("x", "fr", "s")]
    )
    monkeypatch.setattr(corp, "table", lambda s, d, n: docs2)
    got2 = {r["lang"]: r["allocation"]
            for r in corp.sample_budget_allocation(spark, "x").collect()}
    assert sum(got2.values()) == 100
    assert got2 == {"de": 34, "en": 33, "fr": 33}
