"""Data-quality operators: planted-defect tests beyond oracle parity
(the sf tables are clean, so parity alone would only ever see zeros)."""

from __future__ import annotations

import fortisiem_clickhouse_monitor_spark.operators.profiling as prof


def test_fk_orphans_detects_planted_violations(spark, monkeypatch):
    tables = {
        "customer": spark.createDataFrame(
            [(1, "a", 10, 0.0, "m"), (2, "b", 99, 0.0, "m")],  # nation 99 missing
            schema="c_custkey LONG, c_name STRING, c_nationkey INT, "
                   "c_acctbal DOUBLE, c_mktsegment STRING",
        ),
        "nation": spark.createDataFrame(
            [(10, "x", 1)], schema="n_nationkey INT, n_name STRING, n_regionkey INT"
        ),
        "orders": spark.createDataFrame(
            [(100, 1, "O", 1.0, 1, "p"), (101, 7, "O", 1.0, 1, "p")],  # cust 7 missing
            schema="o_orderkey LONG, o_custkey LONG, o_orderstatus STRING, "
                   "o_totalprice DOUBLE, o_orderdate LONG, o_orderpriority STRING",
        ),
        "lineitem": spark.createDataFrame(
            [
                (100, 1, 1, 1, 1.0),
                (999, 1, 1, 1, 1.0),   # order 999 missing
                (100, 55, 1, 2, 1.0),  # part 55 missing
                (100, 1, 66, 3, 1.0),  # supplier 66 missing
            ],
            schema="l_orderkey LONG, l_partkey LONG, l_suppkey LONG, "
                   "l_linenumber INT, l_quantity DOUBLE",
        ),
        "part": spark.createDataFrame(
            [(1, "p", "b", "t", 1, 1.0)],
            schema="p_partkey LONG, p_name STRING, p_brand STRING, "
                   "p_type STRING, p_size INT, p_retailprice DOUBLE",
        ),
        "supplier": spark.createDataFrame(
            [(1, "s", 10, 0.0)],
            schema="s_suppkey LONG, s_name STRING, s_nationkey INT, "
                   "s_acctbal DOUBLE",
        ),
    }
    monkeypatch.setattr(prof, "table", lambda s, d, n: tables[n])
    out = {r["relationship"]: r["n_orphans"]
           for r in prof.quality_fk_orphans(spark, "x").collect()}
    assert out == {
        "orders.custkey->customer": 1,
        "lineitem.orderkey->orders": 1,
        "lineitem.partkey->part": 1,
        "lineitem.suppkey->supplier": 1,
        "customer.nationkey->nation": 1,
    }


def test_profile_counts_nulls_and_distincts(spark, monkeypatch):
    docs = spark.createDataFrame(
        [
            (1, "aa", "en", None, 2),
            (2, "bb", "en", "s1", 2),
            (3, None, "de", "s1", None),
        ],
        schema="doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    monkeypatch.setattr(prof, "table", lambda s, d, n: docs)
    out = {r["col_name"]: r
           for r in prof.profile_documents_columns(spark, "x").collect()}
    assert set(out) == {"doc_id", "text", "lang", "source", "n_chars"}
    assert all(r["n_rows"] == 3 for r in out.values())
    assert out["text"]["n_nulls"] == 1 and out["text"]["n_distinct"] == 2
    assert out["source"]["n_nulls"] == 1 and out["source"]["n_distinct"] == 1
    assert out["lang"]["n_nulls"] == 0 and out["lang"]["n_distinct"] == 2
    assert out["n_chars"]["min_val"] == "2" and out["doc_id"]["max_val"] == "3"


def test_embedding_drift_flags_shifted_dimension(spark, monkeypatch):
    import random

    rng = random.Random(7)
    rows = []
    for vid in range(200):
        v = [round(rng.gauss(0.0, 0.1), 4) for _ in range(64)]
        if vid % 2 == 1:
            v[5] += 1.0  # planted drift in dim 6 (1-based) of half B
        rows.append((vid, v, 0))
    e = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    monkeypatch.setattr(prof, "table", lambda s, d, n: e)
    out = {r["dim"]: r for r in
           prof.profile_embedding_drift(spark, "x").collect()}
    assert len(out) == 64
    z6 = abs(out[6]["z_score"])
    assert z6 > 30  # a full-sigma*10 shift is unmissable
    others = [abs(out[d]["z_score"]) for d in out if d != 6]
    assert max(others) < 5
    assert abs(out[6]["mean_b"] - out[6]["mean_a"] - 1.0) < 0.05


def test_event_time_sanity_counts_planted_violations(spark, monkeypatch):
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1), 7, "view", 1.0, "{}"),
        (2, None, 7, "view", 1.0, "{}"),                      # null ts
        (3, dt.datetime(1999, 12, 31), 7, "view", 1.0, "{}"), # before 2000
        (4, dt.datetime(2031, 1, 1), 7, "view", 1.0, "{}"),   # after 2030
        (5, dt.datetime(2024, 1, 2), 8, "view", 1.0, "{}"),
        (6, dt.datetime(2024, 1, 1), 8, "view", 1.0, "{}"),   # id/time inversion
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string"
    )
    monkeypatch.setattr(prof, "table", lambda s, d, n: ev)
    out = {r["check_name"]: r["n_violations"]
           for r in prof.quality_event_time_sanity(spark, "x").collect()}
    assert out == {"null_ts": 1, "before_2000": 1, "after_2030": 1,
                   "id_time_inversions": 1}
