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


def test_repeated_substring_windows_planted(spark, monkeypatch):
    """A shared 10-token span is flagged in both containing docs even
    though the documents as wholes are NOT near-dups; a disjoint doc
    reports zero duplicated windows; a doc shorter than the window is
    excluded."""
    import fortisiem_clickhouse_monitor_spark.operators.dedup as dd

    span = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    d1 = "intro words here " + span + " tail one"
    d2 = "totally other opening " + span + " different ending words now"
    d3 = (
        "unrelated content about columnar execution engines and their "
        "vectorized operators running over parquet data files"
    )
    rows = [
        (1, d1, "en", "s", len(d1)),
        (2, d2, "en", "s", len(d2)),
        (3, d3, "en", "s", len(d3)),
        (4, "too short", "en", "s", 9),
    ]
    docs = spark.createDataFrame(
        rows, schema="doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    )
    monkeypatch.setattr(dd, "table", lambda s, d, n: docs)
    out = {
        r["doc_id"]: r
        for r in dd.dedup_repeated_substring_windows(spark, "ignored").collect()
    }
    assert set(out) == {1, 2, 3}
    # the 10-token span yields 3 duplicated 8-token windows in each doc
    assert out[1]["n_dup_windows"] == 3 and out[2]["n_dup_windows"] == 3
    assert out[3]["n_dup_windows"] == 0 and out[3]["dup_window_frac"] == 0.0
    for i in (1, 2, 3):
        n_tokens = len(rows[i - 1][1].split())
        assert out[i]["n_windows"] == n_tokens - 8 + 1


def test_prefix_filter_finds_cross_block_pair(spark, monkeypatch):
    """A near-dup pair split across length buckets (one doc padded) is
    invisible to (lang, length)-blocked Jaccard but MUST be found by
    prefix filtering — completeness is its whole point. Note token-set
    Jaccard of doc1 vs doc2: identical distinct sets -> J = 1.0."""
    import fortisiem_clickhouse_monitor_spark.operators.dedup as dd

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon")
    # doc 2: same distinct token set, but n_chars lands 2 buckets away
    pad = " ".join(base.split()[:10])
    rows = [
        (1, base, "en", "s", 100),
        (2, base + " " + pad + " " + pad, "en", "s", 400),
        (3, "completely different words entirely here now", "en", "s", 100),
    ]
    docs = spark.createDataFrame(
        rows, schema="doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    )
    monkeypatch.setattr(dd, "table", lambda s, d, n: docs)
    pfx = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in dd.dedup_prefix_filter_pairs(spark, "x").collect()}
    assert pfx == {(1, 2): 1.0}
    blocked = {(r["doc_a"], r["doc_b"])
               for r in dd.dedup_ngram_jaccard_pairs(spark, "x").collect()}
    assert (1, 2) not in blocked  # the blocking miss prefix filtering fixes


def test_duplicate_spans_merges_windows(spark, monkeypatch):
    """The 3 consecutive duplicated windows of a shared 10-token span
    merge into ONE island whose token length equals the span (10), and
    the reported start is the span's first window position."""
    import fortisiem_clickhouse_monitor_spark.operators.dedup as dd

    span = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    d1 = "intro words here " + span + " tail one"          # span at tokens 4..13
    d2 = "totally other opening " + span + " different ending words now"
    d3 = "no duplication in this very distinct document at all ok"
    rows = [
        (1, d1, "en", "s", len(d1)),
        (2, d2, "en", "s", len(d2)),
        (3, d3, "en", "s", len(d3)),
    ]
    docs = spark.createDataFrame(
        rows, schema="doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    )
    monkeypatch.setattr(dd, "table", lambda s, d, n: docs)
    out = {r["doc_id"]: r for r in dd.dedup_duplicate_spans(spark, "x").collect()}
    assert set(out) == {1, 2}
    for i in (1, 2):
        assert out[i]["n_dup_spans"] == 1
        assert out[i]["longest_span_tokens"] == 10
    assert out[1]["first_span_start"] == 4   # 1-based window position
    assert out[2]["first_span_start"] == 4


def test_excise_spans_removes_shared_text(spark, monkeypatch):
    """Shared 10-token span excised from both docs; a doc that IS the
    span excises to the empty string (reported, not dropped); clean
    docs are absent from the output."""
    import fortisiem_clickhouse_monitor_spark.operators.dedup as dd

    span = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    d1 = "intro words here " + span + " tail one"
    d2 = span  # entirely boilerplate
    d3 = "no duplication in this very distinct document at all ok"
    rows = [
        (1, d1, "en", "s", len(d1)),
        (2, d2, "en", "s", len(d2)),
        (3, d3, "en", "s", len(d3)),
    ]
    docs = spark.createDataFrame(
        rows, schema="doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    )
    monkeypatch.setattr(dd, "table", lambda s, d, n: docs)
    out = {r["doc_id"]: r for r in dd.dedup_excise_spans(spark, "x").collect()}
    assert set(out) == {1, 2}
    assert out[1]["clean_text"] == "intro words here tail one"
    assert out[1]["n_kept"] == 5
    assert out[2]["clean_text"] == "" and out[2]["n_kept"] == 0


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


def test_incremental_cc_labels_match_full_recompute(spark):
    """Differential (VERDICT r3 #4): splitting a random graph's nodes
    into corpus/batch, computing corpus-only labels, then merging the
    batch's edges via merge_batch_into_labels must reproduce the
    full-graph CC labels exactly — including corpus components whose
    label CHANGES because a new lower-id bridge merges them."""
    import random

    from fortisiem_clickhouse_monitor_spark.operators.dedup import (
        alternating_components,
        merge_batch_into_labels,
    )
    from pyspark.sql import functions as F

    rng = random.Random(20260814)
    for trial in range(5):
        n = rng.randint(6, 30)
        n_edges = rng.randint(2, 2 * n)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(n_edges)]
        new_nodes = {v for v in range(n) if rng.random() < 0.4}

        # ground truth: full-graph union-find, min-id labels
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

        old_edges = [
            (a, b) for a, b in edges
            if a not in new_nodes and b not in new_nodes
        ] or [(0, 0)]
        new_edges = [
            (a, b) for a, b in edges
            if a in new_nodes or b in new_nodes
        ] or [(0, 0)]

        stars_old, _ = alternating_components(
            spark.createDataFrame(old_edges, schema="src LONG, dst LONG")
        )
        old_lab = {v: v for v in range(n) if v not in new_nodes}
        for r in stars_old.collect():
            if r["v"] in old_lab:
                old_lab[r["v"]] = r["u"]
        old_labels = spark.createDataFrame(
            [(v, c) for v, c in old_lab.items()] or [(0, 0)],
            schema="doc_id LONG, component LONG",
        )
        relabeled_old, red = merge_batch_into_labels(
            old_labels,
            spark.createDataFrame(new_edges, schema="src LONG, dst LONG"),
        )
        got = {v: v for v in range(n)}
        for r in relabeled_old.collect():
            got[r["doc_id"]] = r["component"]
        red_map = {r["node"]: r["label"] for r in red.collect()}
        for v in new_nodes:
            got[v] = red_map.get(v, v)
        assert got == truth, (
            f"trial {trial}: edges={edges} new={sorted(new_nodes)}"
        )


def test_triangles_degree_ordered_hub_robust(spark):
    """Planted hub: a star K1,20 generates ZERO wedges under degree
    ordering (the hub's edges all point into it), while the separate
    planted triangle is still found exactly once, id-ordered."""
    from fortisiem_clickhouse_monitor_spark.operators.dedup import (
        orient_by_degree,
        triangles_from_edges,
        wedges_by_degree,
    )

    hub = [(0, leaf) for leaf in range(1, 21)]  # hub 0, degree 20
    tri = [(100, 101), (100, 102), (101, 102)]
    edges = spark.createDataFrame(hub + tri, "doc_a LONG, doc_b LONG")

    oriented = orient_by_degree(edges)
    # Every star edge must point INTO the hub (leaves have degree 1).
    assert oriented.filter("src = 0").count() == 0
    # Wedge fan-out is bounded: only the triangle's 1 wedge exists —
    # id-ordered enumeration would have generated C(20,2)=190 more.
    assert wedges_by_degree(oriented.localCheckpoint()).count() == 1

    got = sorted(map(tuple, triangles_from_edges(edges).collect()))
    assert got == [(100, 101, 102)]


def test_triangles_match_naive_on_random_graph(spark):
    """Degree-ordered output == naive id-ordered two-join output on a
    random graph (exactly-once, a<b<c)."""
    import random

    from fortisiem_clickhouse_monitor_spark.operators.dedup import (
        triangles_from_edges,
    )

    rng = random.Random(7)
    n = 40
    edges = sorted(
        {
            (a, b)
            for _ in range(220)
            for a, b in [sorted(rng.sample(range(n), 2))]
        }
    )
    truth = set()
    eset = set(edges)
    for a, b in edges:
        for c in range(b + 1, n):
            if (a, c) in eset and (b, c) in eset:
                truth.add((a, b, c))

    df = spark.createDataFrame(edges, "doc_a LONG, doc_b LONG")
    got = sorted(map(tuple, triangles_from_edges(df).collect()))
    assert got == sorted(truth)


def test_triangle_counts_match_enumeration(spark):
    """The count-only scale form (triangle_counts_from_edges) must agree
    with per-vertex counts derived from the full enumeration, on a
    random graph AND on the planted-hub graph."""
    import random
    from collections import Counter

    from fortisiem_clickhouse_monitor_spark.operators.dedup import (
        triangle_counts_from_edges,
        triangles_from_edges,
    )

    rng = random.Random(11)
    n = 40
    random_edges = sorted(
        {
            (a, b)
            for _ in range(260)
            for a, b in [sorted(rng.sample(range(n), 2))]
        }
    )
    hub_edges = [(0, leaf) for leaf in range(1, 21)] + [
        (100, 101), (100, 102), (101, 102)
    ]
    for edges in (random_edges, hub_edges):
        df = spark.createDataFrame(edges, "doc_a LONG, doc_b LONG")
        enum = [tuple(r) for r in triangles_from_edges(df).collect()]
        truth = Counter(v for tri in enum for v in tri)
        got = {
            r["doc_id"]: r["n_triangles"]
            for r in triangle_counts_from_edges(df).collect()
        }
        assert got == dict(truth)
        # global count invariant: each triangle contributes 3 corners
        assert sum(got.values()) == 3 * len(enum)


def _planted_vectors(n_clusters=20, per_cluster=12, dim=64, noise=0.03):
    """Clustered unit-ish vectors: members of a cluster are the center
    plus small noise, so true near-dup pairs (cos>=0.9) exist and the
    true k-NN of a vector lives in its own cluster — unlike the
    driver's embeddings fixture, which is isotropic noise with ZERO
    >=0.9 pairs at every SF (verified; the brute operators return empty
    there, so recall must be tested on planted structure)."""
    import numpy as np

    rng = np.random.RandomState(42)
    rows = []
    vid = 0
    for c in range(n_clusters):
        center = rng.standard_normal(dim)
        center /= np.linalg.norm(center)
        for _ in range(per_cluster):
            v = center + noise * rng.standard_normal(dim)
            rows.append((vid, [float(x) for x in v], c))
            vid += 1
    return rows


def _brute_truth(rows, threshold):
    import numpy as np

    ids = np.array([r[0] for r in rows])
    mat = np.stack([np.array(r[1]) for r in rows])
    unit = mat / np.linalg.norm(mat, axis=1)[:, None]
    sims = np.round(unit @ unit.T, 4)
    ai, bj = np.where((sims >= threshold) & (ids[:, None] < ids[None, :]))
    return {(int(ids[a]), int(ids[b])): float(sims[a, b]) for a, b in zip(ai, bj)}


def test_banded_pairs_exact_precision_high_recall(spark):
    """The LSH-banded scale path on planted clusters: every returned
    pair is a true >=0.9 pair with the identical rounded cosine (exact
    precision — pairs are verified by in-cell GEMM), and recall over
    the brute truth is high (16 bands x 4 sign bits)."""
    from fortisiem_clickhouse_monitor_spark.operators.similarity import (
        banded_cosine_pairs,
    )

    rows = _planted_vectors()
    truth = _brute_truth(rows, 0.9)
    assert len(truth) > 100  # planted structure is real

    df = spark.createDataFrame(
        [(r[0], r[1]) for r in rows], "vec_id LONG, embedding ARRAY<FLOAT>"
    )
    got = {
        (r["vec_a"], r["vec_b"]): r["cos_sim"]
        for r in banded_cosine_pairs(df, 0.9).collect()
    }
    for pair, sim in got.items():
        assert abs(truth[pair] - sim) < 5e-4, pair  # float32 storage ulp
    recall = len(got) / len(truth)
    assert recall >= 0.9, f"banded recall {recall:.3f}"


def test_ivf_knn_join_high_recall_on_clusters(spark):
    """The IVF scale path on planted clusters (labels = true cluster):
    the probed cells contain the true top-1 neighbor for nearly every
    vector."""
    import numpy as np

    from fortisiem_clickhouse_monitor_spark.operators.similarity import (
        ivf_knn_join,
    )

    rows = _planted_vectors()
    ids = np.array([r[0] for r in rows])
    mat = np.stack([np.array(r[1]) for r in rows])
    unit = mat / np.linalg.norm(mat, axis=1)[:, None]
    sims = np.round(unit @ unit.T, 4)
    np.fill_diagonal(sims, -np.inf)
    true_top1 = {
        int(ids[i]): int(ids[np.lexsort((ids, -sims[i]))[0]])
        for i in range(len(ids))
    }

    df = spark.createDataFrame(
        rows, "vec_id LONG, embedding ARRAY<FLOAT>, label INT"
    )
    got_top1 = {}
    per_vec = {}
    for r in ivf_knn_join(df, 3).orderBy("vec_id", F.desc("cos_sim")).collect():
        got_top1.setdefault(r["vec_id"], r["neighbor_id"])
        per_vec.setdefault(r["vec_id"], []).append(r["neighbor_id"])
    assert set(got_top1) == set(true_top1)
    assert all(len(v) <= 3 for v in per_vec.values())
    recall1 = sum(got_top1[v] == true_top1[v] for v in true_top1) / len(true_top1)
    assert recall1 >= 0.9, f"IVF top-1 recall {recall1:.3f}"


def test_scale_route_activates_above_threshold(spark, monkeypatch):
    """Routing differential on the driver fixture: with the threshold
    forced to 0 both operators take the banded/IVF path end-to-end.
    The banded pairs must be a SUBSET of the brute truth with identical
    rounded cosines (exact precision) at high recall — the fixture's
    tau (_COSINE_NEAR_DUP_TAU) admits a real pair set, so this is a
    value check, not a shape check."""
    import duckdb

    from fortisiem_clickhouse_monitor_spark.operators import dedup, similarity

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF_SMALL}/embeddings.parquet')"
    )
    truth = {
        (a, b): s
        for a, b, s in con.execute(
            f"""SELECT * FROM (
                  SELECT a.vec_id, b.vec_id,
                    round(list_cosine_similarity(a.embedding::DOUBLE[],
                                                 b.embedding::DOUBLE[]), 4) AS cs
                  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
                ) WHERE cs >= {dedup._COSINE_NEAR_DUP_TAU}"""
        ).fetchall()
    }
    assert len(truth) > 0  # the fixture tau is non-vacuous

    monkeypatch.setattr(similarity, "BRUTE_INDEX_MAX_ROWS", 0)

    pairs = dedup.dedup_embedding_cosine_pairs(spark, SF_SMALL)
    assert pairs.columns == ["vec_a", "vec_b", "cos_sim"]
    got = {
        (r["vec_a"], r["vec_b"]): r["cos_sim"] for r in pairs.collect()
    }
    assert set(got) <= set(truth)
    for k, v in got.items():
        assert abs(truth[k] - v) < 5e-4, k  # float32 storage ulp
    assert len(got) >= 0.7 * len(truth), f"banded recall {len(got)}/{len(truth)}"

    knn = similarity.sim_knn_join_topk(spark, SF_SMALL)
    assert knn.columns == ["vec_id", "neighbor_id", "cos_sim"]
    counts = knn.groupBy("vec_id").count().collect()
    assert len(counts) == 500 and all(r["count"] <= 3 for r in counts)


def test_alternating_components_raises_on_non_convergence(spark, monkeypatch):
    """max_rounds too small must raise, not silently return a chained
    (non-star-forest) edge set that would duplicate doc_ids downstream.
    The driver-union-find gate is forced off: max_rounds only governs
    the distributed contraction path."""
    import fortisiem_clickhouse_monitor_spark.operators.dedup as dd

    monkeypatch.setattr(dd, "CC_DRIVER_MAX_EDGES", 0)
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "src LONG, dst LONG"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dd.alternating_components(chain, max_rounds=0)


def test_incremental_dedup_planted(spark, monkeypatch):
    """New-batch docs (src10..) get keep/drop verdicts against the old
    corpus (src0..src9) and each other; old docs never appear in the
    output and old-vs-old pairs are never generated (the incremental
    contract). Earliest-match-wins: an exact copy of an old doc drops
    against it; of two identical NEW docs only the higher id drops."""
    import fortisiem_clickhouse_monitor_spark.operators.dedup as dd

    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the tall fence near the old barn door"
    )
    uniq1 = (
        "completely different content about distributed query engines "
        "processing columnar data with vectorized execution pipelines"
    )
    uniq2 = (
        "another standalone passage describing adaptive shuffle "
        "partitioning and broadcast join planning in modern optimizers"
    )
    rows = [
        (1, base, "en", "src0", len(base)),       # old original
        (2, uniq2, "en", "src3", len(uniq2)),     # old, unique
        (100, base, "en", "src10", len(base)),    # new, dup of old 1
        (101, uniq1, "en", "src11", len(uniq1)),  # new, unique
        (102, uniq2 + " extra", "en", "src12", len(uniq2)),  # new, near-dup of old 2
        (103, uniq2 + " extra", "en", "src13", len(uniq2)),  # new, = 102
    ]
    docs = spark.createDataFrame(
        rows,
        schema="doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    monkeypatch.setattr(dd, "table", lambda s, d, n: docs)
    out = {
        r["doc_id"]: r
        for r in dd.dedup_incremental_new_vs_corpus(spark, "ignored").collect()
    }
    assert set(out) == {100, 101, 102, 103}, "old docs must not appear"
    assert out[100]["action"] == "drop" and out[100]["duplicate_of"] == 1
    assert out[100]["jaccard"] == 1.0
    assert out[101]["action"] == "keep" and out[101]["duplicate_of"] is None
    assert out[101]["n_matches"] == 0
    # 102 matches old doc 2 (near-dup) -> drops against the CORPUS copy,
    # not its new twin 103 (min doc_id wins)
    assert out[102]["action"] == "drop" and out[102]["duplicate_of"] == 2
    # 103 matches old 2 AND new 102; earliest is 2
    assert out[103]["action"] == "drop" and out[103]["duplicate_of"] == 2
    assert out[103]["n_matches"] >= 2


def test_incremental_dedup_consistent_with_full_pairs(spark, monkeypatch):
    """Differential contract on a seeded random corpus: a new doc drops
    iff the FULL-corpus MinHash pair set contains a verified pair
    linking it to an old doc or a lower-id new doc; duplicate_of is the
    minimum such partner and n_matches the count. The incremental
    operator must equal this restriction of the full result exactly."""
    import random

    import fortisiem_clickhouse_monitor_spark.operators.dedup as dd

    rng = random.Random(739)
    vocab = [f"w{i}" for i in range(40)]

    def mk_text():
        return " ".join(rng.choice(vocab) for _ in range(30))

    rows = []
    texts = []
    for i in range(30):
        if i >= 6 and rng.random() < 0.4:
            base = rng.choice(texts)
            toks = base.split()
            j = rng.randrange(len(toks))
            toks[j] = rng.choice(vocab)  # near-dup: 1-token mutation
            t = " ".join(toks)
        else:
            t = mk_text()
        texts.append(t)
        src = f"src{rng.randrange(20)}"  # src10..src19 = new batch
        rows.append((i, t, "en", src, len(t)))
    docs = spark.createDataFrame(
        rows,
        schema="doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    monkeypatch.setattr(dd, "table", lambda s, d, n: docs)

    full = dd.dedup_minhash_lsh_pairs(spark, "ignored").collect()
    inc = {r["doc_id"]: r for r in dd.dedup_incremental_new_vs_corpus(
        spark, "ignored").collect()}

    new_ids = {r[0] for r in rows if len(r[3]) == 5}  # src10..src19
    assert set(inc) == new_ids

    partners: dict[int, list[tuple[int, float]]] = {n: [] for n in new_ids}
    for p in full:
        a, b, j = p["doc_a"], p["doc_b"], p["jaccard"]
        for n, m in ((a, b), (b, a)):
            if n in new_ids and (m not in new_ids or m < n):
                partners[n].append((m, j))
    assert any(partners.values()), "seed produced no drops — test is vacuous"
    for n in new_ids:
        got = inc[n]
        if partners[n]:
            best_m = min(m for m, _ in partners[n])
            best_j = dict(partners[n])[best_m]
            assert got["action"] == "drop", (n, partners[n])
            assert got["duplicate_of"] == best_m
            assert got["jaccard"] == best_j
            assert got["n_matches"] == len(partners[n])
        else:
            assert got["action"] == "keep" and got["n_matches"] == 0


def test_unit_index_f32_resident_bit_parity(tmp_path):
    """UnitIndex (float32-resident, blocked float64 GEMM) must be
    BIT-identical to the old fully-float64 path: f32 storage is exact
    for parquet float columns, the upcast is exact, and the same f64
    normalization division + accumulation runs per block."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fortisiem_clickhouse_monitor_spark.functions.vectors import (
        load_unit_index,
    )

    rng = np.random.default_rng(7)
    n, dim = 1000, 16
    raw32 = rng.normal(size=(n, dim)).astype("float32")
    raw32[5] = 0.0  # zero-norm row must be dropped
    ids = np.arange(n, dtype="int64")
    path = str(tmp_path / "idx.parquet")
    pq.write_table(
        pa.table(
            {
                "vec_id": ids,
                "embedding": pa.array(
                    [list(map(float, r)) for r in raw32],
                    type=pa.list_(pa.float32()),
                ),
            }
        ),
        path,
    )

    idx = load_unit_index(path, "vec_id", "embedding")
    assert idx._raw.dtype == np.float32  # resident memory is halved
    assert len(idx.ids) == n - 1 and 5 not in idx.ids

    # old path: fully-f64 resident unit matrix
    mat64 = raw32.astype("float64")
    norms = np.linalg.norm(mat64, axis=1)
    keep = norms > 0
    unit64 = mat64[keep] / norms[keep, None]

    probes = rng.normal(size=(7, dim))
    probes /= np.linalg.norm(probes, axis=1)[:, None]
    expected = probes @ unit64.T
    # block smaller than n forces multi-block assembly
    got = idx.sims(probes, block=137)
    assert got.dtype == np.float64
    # the unit values are bit-identical; the GEMM itself may pick a
    # different BLAS kernel per block shape, so assert to 1e-12 (eight
    # orders below the 4-dp rounding the oracle contract is stated at)
    # and exact equality AFTER that rounding.
    assert np.max(np.abs(got - expected)) < 1e-12
    assert np.array_equal(np.round(got, 4), np.round(expected, 4))


def test_component_cohesion_clique_vs_chain(spark, monkeypatch):
    """Planted graph: a 3-clique reports density 1.0 (collapse), a
    4-chain reports 0.0 (review), a 2-component reports NULL (no
    triangle possible), singletons are excluded."""
    import fortisiem_clickhouse_monitor_spark.operators.dedup as dd

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3),            # clique k=3
         (10, 11), (11, 12), (12, 13),      # chain k=4
         (20, 21)],                          # pair k=2
        "doc_a LONG, doc_b LONG",
    )
    docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 10, 11, 12, 13, 20, 21, 30)],
        "doc_id LONG",
    )
    monkeypatch.setattr(dd, "dedup_ngram_jaccard_pairs", lambda s, d: edges)
    monkeypatch.setattr(dd, "table", lambda s, d, n: docs)
    out = {
        r["component"]: r
        for r in dd.graph_component_cohesion(spark, "x").collect()
    }
    assert set(out) == {1, 10, 20}  # singleton 30 excluded
    assert out[1]["n_members"] == 3 and out[1]["n_triangles"] == 1
    assert out[1]["triangle_density"] == 1.0
    assert out[10]["n_members"] == 4 and out[10]["n_triangles"] == 0
    assert out[10]["triangle_density"] == 0.0
    assert out[20]["n_members"] == 2
    assert out[20]["triangle_density"] is None
