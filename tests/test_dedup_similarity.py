"""Semantic unit tests for the dedup/similarity operators beyond oracle
parity: LSH recall against ground truth, signature properties, and
planted near-duplicates (SURVEY.md §5 strategies #3/#4).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from conftest import SF_SMALL
from fortisiem_clickhouse_monitor_spark.functions import textfns, vectors
from fortisiem_clickhouse_monitor_spark.operators.dedup import (
    dedup_minhash_lsh_pairs,
    dedup_simhash_pairs,
)


def _planted_docs(spark):
    """documents-shaped frame with planted exact and near duplicates."""
    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the tall fence near the old barn door"
    )
    near = base.replace("lazy", "sleepy")  # 1-token change
    other = (
        "completely different content about distributed query engines "
        "processing columnar data with vectorized execution pipelines"
    )
    rows = [
        (1, base, "en", "s", len(base)),
        (2, base, "en", "s", len(base)),          # exact dup of 1
        (3, near, "en", "s", len(near)),          # near dup of 1
        (4, other, "en", "s", len(other)),
        (5, "tiny", "en", "s", 4),                # < 3 tokens: no shingles
    ]
    return spark.createDataFrame(
        rows, schema="doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    )


def test_minhash_lsh_finds_planted_dups(spark, tmp_path, monkeypatch):
    docs = _planted_docs(spark)
    # route the operator's table() call to our planted frame
    import fortisiem_clickhouse_monitor_spark.operators.dedup as dd

    monkeypatch.setattr(dd, "table", lambda s, d, n: docs)
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup_minhash_lsh_pairs(spark, "ignored").collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0   # exact dup
    assert (1, 3) in pairs and pairs[(1, 3)] > 0.5    # near dup
    assert not any(4 in p or 5 in p for p in pairs)   # distinct/tiny excluded


def test_simhash_finds_planted_dups(spark, monkeypatch):
    import fortisiem_clickhouse_monitor_spark.operators.dedup as dd

    monkeypatch.setattr(dd, "table", lambda s, d, n: _planted_docs(spark))
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dedup_simhash_pairs(spark, "ignored").collect()
    }
    assert pairs.get((1, 2)) == 0          # identical text -> distance 0
    assert not any(4 in p for p in pairs)  # unrelated text not paired


def test_minhash_signature_is_deterministic(spark):
    df = spark.createDataFrame([("a b c d e f",)], "text STRING")
    sig_cols = textfns.minhash_signature(
        textfns.shingles(textfns.tokens("text"), 3)
    )
    r1 = df.select(*sig_cols).collect()[0]
    r2 = df.select(*sig_cols).collect()[0]
    assert list(r1) == list(r2)
    assert all(v is not None and v >= 0 for v in r1)


def test_cosine_helper_matches_numpy(spark):
    import numpy as np

    a = [0.5, -1.0, 2.0, 0.0]
    b = [1.5, 0.25, -0.75, 3.0]
    df = spark.createDataFrame(
        [(a, b)], "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>"
    )
    got = df.select(vectors.cosine("a", "b").alias("c")).collect()[0]["c"]
    exp = float(
        np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
    )
    assert got == pytest.approx(exp, rel=1e-12)


def test_cosine_zero_norm_is_null(spark):
    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 2.0])], "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>"
    )
    assert df.select(vectors.cosine("a", "b").alias("c")).collect()[0]["c"] is None


def test_ann_bucket_contains_topk_overlap(spark):
    """The LSH bucket search returns a subset of the brute-force ranking
    restricted to the query's bucket — verify candidates are consistent."""
    qs = entrymod.queries()
    brute = {
        r["vec_id"]: r["cos_sim"]
        for r in qs["sim_cosine_topk"](spark, SF_SMALL).collect()
    }
    ann = qs["sim_ann_lsh_bucketed"](spark, SF_SMALL).collect()
    assert len(ann) <= 10
    for r in ann:
        # any ANN hit that also appears in the exact top-10 must carry
        # the identical similarity value
        if r["vec_id"] in brute:
            assert r["cos_sim"] == brute[r["vec_id"]]


def test_jaccard_gemm_tiling_matches_untiled(spark, monkeypatch):
    """A planted jumbo block (larger than the GEMM tile) must produce
    exactly the same pairs as the untiled kernel — tiling is a memory
    bound, not a semantics change."""
    import itertools

    import fortisiem_clickhouse_monitor_spark.operators.dedup as dd

    # 30 docs in ONE (lang, len-bucket) block: 10 groups of 3 mutual
    # near-dups (jaccard 1.0 within a group, low across groups).
    words = [f"w{i}" for i in range(12)]
    rows = []
    doc_id = 0
    for g in range(10):
        text = " ".join(f"g{g}_{w}" for w in words)
        for _ in range(3):
            rows.append((doc_id, text, "en", "s", 50))
            doc_id += 1
    docs = spark.createDataFrame(
        rows, schema="doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    )
    monkeypatch.setattr(dd, "table", lambda s, d, n: docs)

    def run():
        return sorted(
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in dd.dedup_ngram_jaccard_pairs(spark, "ignored").collect()
        )

    monkeypatch.setattr(dd, "_JACCARD_TILE", 7)  # forces 5 tiles over 30 rows
    tiled = run()
    monkeypatch.setattr(dd, "_JACCARD_TILE", 1024)
    untiled = run()
    assert tiled == untiled
    expect = sorted(
        (a, b, 1.0)
        for g in range(10)
        for a, b in itertools.combinations(range(3 * g, 3 * g + 3), 2)
    )
    assert tiled == expect


def test_alternating_components_planted_chain(spark):
    """A 20-node path graph: min-label propagation would need ~19
    rounds; the large-star/small-star alternation must label the whole
    chain with component 0 in O(log n) rounds."""
    from fortisiem_clickhouse_monitor_spark.operators.dedup import (
        alternating_components,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(19)] + [(100, 101)],
        schema="src LONG, dst LONG",
    )
    stars, rounds = alternating_components(chain)
    got = {(r["u"], r["v"]) for r in stars.collect()}
    assert got == {(0, i) for i in range(1, 20)} | {(100, 101)}
    assert rounds <= 7, f"expected O(log n) convergence, took {rounds} rounds"


def test_alternating_components_random_graphs_match_union_find(spark):
    """Property: on random graphs, the star-contraction labels equal a
    union-find ground truth (component = min node id)."""
    import random

    from fortisiem_clickhouse_monitor_spark.operators.dedup import (
        alternating_components,
    )

    rng = random.Random(20260813)
    for trial in range(6):
        n = rng.randint(2, 28)
        n_edges = rng.randint(0, 2 * n)
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(n_edges)
        ] or [(0, 0)]

        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        truth = {v: find(v) for v in range(n)}

        df = spark.createDataFrame(edges, schema="src LONG, dst LONG")
        stars, rounds = alternating_components(df)
        got = {v: v for v in range(n)}
        for r in stars.collect():
            got[r["v"]] = r["u"]
        assert got == truth, f"trial {trial}: {edges}"
        assert rounds <= 12
