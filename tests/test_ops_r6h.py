"""Planted-fixture tests for the ninth round-6 batch: mutual
information screen and term burstiness."""

from __future__ import annotations

import math

import fortisiem_clickhouse_monitor_spark.operators.profiling as prof
import fortisiem_clickhouse_monitor_spark.operators.text as tx


def _events_v(spark, rows):
    """rows: (event_type, value)."""
    return spark.createDataFrame(
        [(i, "2024-01-01 00:00:00", 1, et, float(v))
         for i, (et, v) in enumerate(rows)],
        "event_id long, ts_s string, user_id long, event_type string,"
        " value double",
    ).selectExpr(
        "event_id", "CAST(ts_s AS TIMESTAMP) AS ts", "user_id",
        "event_type", "value", "'{}' AS props",
    )


def test_mi_perfectly_dependent_is_log2(spark, monkeypatch):
    """Type 'a' only emits low values, 'b' only high, 50/50: the value
    bin determines the type exactly -> total MI = ln 2."""
    rows = [("a", 0.0)] * 10 + [("b", 100.0)] * 10
    ev = _events_v(spark, rows)
    monkeypatch.setattr(prof, "table", lambda s, d, n: ev)
    got = prof.profile_mutual_information(spark, "x").collect()
    total = sum(r["mi_contrib"] for r in got)
    assert abs(total - math.log(2)) < 1e-5
    assert all(r["mi_contrib"] > 0 for r in got)  # joint beats independence


def test_mi_independent_is_zero(spark, monkeypatch):
    """Both types emit the identical value distribution -> every cell's
    joint equals the product of marginals -> all contributions 0."""
    rows = []
    for et in ("a", "b"):
        rows += [(et, 0.0)] * 5 + [(et, 100.0)] * 5
    ev = _events_v(spark, rows)
    monkeypatch.setattr(prof, "table", lambda s, d, n: ev)
    got = prof.profile_mutual_information(spark, "x").collect()
    assert got and all(abs(r["mi_contrib"]) < 1e-9 for r in got)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )


def test_burstiness_boilerplate_vs_ordinary(spark, monkeypatch):
    """'spam' appears 12 times inside ONE doc (burstiness 12); 'the'
    appears once in each of 12 docs (burstiness 1).  The bursty term
    ranks first; the ordinary one carries full doc coverage."""
    docs = _docs(
        spark,
        [" ".join(["spam"] * 12)] + ["the quick brown fox"] * 12,
    )
    monkeypatch.setattr(tx, "table", lambda s, d, n: docs)
    got = tx.vocab_burstiness_top_terms(spark, "x").collect()
    by_term = {r["term"]: r for r in got}
    assert got[0]["term"] == "spam"
    assert by_term["spam"]["burstiness"] == 12.0
    assert by_term["spam"]["cf"] == 12 and by_term["spam"]["df"] == 1
    assert by_term["the"]["burstiness"] == 1.0
    assert by_term["the"]["doc_coverage"] == round(12 / 13, 6)
    # below the cf floor: 'quick' (cf 12) passes, nothing with cf < 10
    assert all(r["cf"] >= 10 for r in got)


def test_winnowing_density_and_shared_anchor(spark, monkeypatch):
    """Structure checks: a 3-token doc (one shingle) yields exactly one
    fingerprint; identical docs yield identical checksums (the trivial
    locality case); a long doc's fingerprint count sits in the
    guaranteed band [ceil(m/w), m]; too-short docs are absent."""
    import math

    base = " ".join(f"tok{i}" for i in range(30))  # 28 shingles
    docs = _docs(spark, [base, base, "a b c", "one two"])
    monkeypatch.setattr(tx, "table", lambda s, d, n: docs)
    got = {r["doc_id"]: r for r in
           tx.text_winnowing_fingerprints(spark, "x").collect()}
    assert set(got) == {0, 1, 2}  # doc 3 (2 tokens) has no shingles
    assert got[2]["n_shingles"] == 1 and got[2]["n_fps"] == 1
    assert got[2]["compression"] == 1.0
    assert got[0]["fp_checksum"] == got[1]["fp_checksum"]
    assert got[0]["n_fps"] == got[1]["n_fps"]
    m, w = got[0]["n_shingles"], 4
    assert m == 28
    assert math.ceil(m / w) <= got[0]["n_fps"] <= m


def test_passage_anchors_surface_copied_paragraph(spark, monkeypatch):
    """Docs 0 and 1 are different except for one copied 12-token
    passage: winnowing's guarantee (shared run >= w+k-1 = 6 tokens
    shares an anchor) forces the pair out.  Doc 2 shares nothing ->
    appears in no pair."""
    import fortisiem_clickhouse_monitor_spark.operators.text as tx2

    passage = " ".join(f"quote{i}" for i in range(12))
    d0 = "alpha beta gamma " + passage + " delta epsilon zeta"
    d1 = "one two three four " + passage + " five six"
    d2 = " ".join(f"other{i}" for i in range(20))
    docs = _docs(spark, [d0, d1, d2])
    monkeypatch.setattr(tx2, "table", lambda s, d, n: docs)
    got = {(r["doc_a"], r["doc_b"]): r["shared_anchors"]
           for r in tx2.dedup_passage_anchor_pairs(spark, "x").collect()}
    assert (0, 1) in got and got[(0, 1)] >= 2
    assert all(2 not in pair for pair in got)


def test_knn_outliers_planted_lonely_vector(spark, tmp_path):
    """A tight cluster of 8 near-identical vectors plus one ANTI-aligned
    loner: the loner's 3rd-NN similarity is far below every cluster
    member's, so it ranks first in the outlier screen.  The planted
    table is written as a real fixture dir because the GEMM kernel
    loads its index executor-side from the parquet file."""
    import numpy as np

    import fortisiem_clickhouse_monitor_spark.operators.similarity as sim

    rng = np.random.RandomState(3)
    base = rng.standard_normal(8)
    vecs = [list(base + rng.standard_normal(8) * 0.01) for _ in range(8)]
    loner = list(np.array([-v for v in base]))  # opposite direction
    rows = [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)]
    rows.append((99, [float(x) for x in loner], 1))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    sf_dir = str(tmp_path / "sf")
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(sf_dir)
    pq.write_table(
        pa.table(
            {
                "vec_id": [r[0] for r in rows],
                "embedding": pa.array(
                    [r[1] for r in rows], type=pa.list_(pa.float32())
                ),
                "label": [r[2] for r in rows],
            }
        ),
        f"{sf_dir}/embeddings.parquet",
    )
    got = sim.sim_knn_distance_outliers(spark, sf_dir).collect()
    assert got[0]["vec_id"] == 99
    assert got[0]["knn3_sim"] < -0.9  # anti-aligned with the cluster
    assert all(r["knn3_sim"] > 0.9 for r in got if r["vec_id"] != 99)


def test_id_continuity_planted_holes_and_dups(spark, monkeypatch):
    """ids {1,2,2,5}: span 5, distinct 3 -> 2 missing (3,4), 1 dup."""
    ev = spark.createDataFrame(
        [(i, "2024-01-01 00:00:00", 1, "t", 1.0) for i in (1, 2, 2, 5)],
        "event_id long, ts_s string, user_id long, event_type string,"
        " value double",
    ).selectExpr(
        "event_id", "CAST(ts_s AS TIMESTAMP) AS ts", "user_id",
        "event_type", "value", "'{}' AS props",
    )
    monkeypatch.setattr(prof, "table", lambda s, d, n: ev)
    row = prof.quality_id_continuity_screen(spark, "x").collect()[0]
    assert row["min_id"] == 1 and row["max_id"] == 5
    assert row["n_rows"] == 4 and row["n_distinct"] == 3
    assert row["n_missing"] == 2 and row["n_duplicated"] == 1


def test_peak_hour_earliest_tie_and_share(spark, monkeypatch):
    """Type 'a': hours 9 and 17 tie at 3 events each (plus one at 12):
    the peak is the EARLIEST tied hour (9) with share 3/7."""
    import fortisiem_clickhouse_monitor_spark.operators.behavior as bh2

    rows = []
    for h, n in ((9, 3), (17, 3), (12, 1)):
        rows += [(f"2024-01-01 {h:02d}:00:00", u, "a") for u in range(n)]
    ev = spark.createDataFrame(
        [(i, ts, u, et, 1.0) for i, (ts, u, et) in enumerate(rows)],
        "event_id long, ts_s string, user_id long, event_type string,"
        " value double",
    ).selectExpr(
        "event_id", "CAST(ts_s AS TIMESTAMP) AS ts", "user_id",
        "event_type", "value", "'{}' AS props",
    )
    monkeypatch.setattr(bh2, "table", lambda s, d, n: ev)
    row = bh2.behavior_peak_hour_profile(spark, "x").collect()[0]
    assert row["peak_hour"] == 9 and row["peak_count"] == 3
    assert row["n_events"] == 7
    assert row["peak_share_bps"] == 10000 * 3 // 7
