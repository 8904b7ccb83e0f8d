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
