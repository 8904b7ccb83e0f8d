"""Semantic tests for operators/curation.py and operators/graph.py
beyond the oracle parity gate (which already runs every registered
query differentially at sf0.001): chunk-overlap algebra, cap ordering,
deterministic mixture membership, Gopher-rule reconstruction, and
planted-graph PageRank against an exact integer simulation."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from fortisiem_clickhouse_monitor_spark.operators.curation import (
    _BLK,
    _CAP,
    _CS,
    _CW,
    _MIX_DEN,
    _MIX_PERMILLE,
    corpus_block_dedup_stats,
    corpus_cap_per_source,
    corpus_mixture_sample,
    text_chunk_sliding_window,
    text_gopher_rules,
)
from fortisiem_clickhouse_monitor_spark.operators.graph import (
    _PR_SCALE,
    graph_pagerank_top20,
    pagerank_int,
)
from fortisiem_clickhouse_monitor_spark.sources.tables import table

from conftest import SF_SMALL


def _doc_tokens(spark):
    rows = (
        table(spark, SF_SMALL, "documents")
        .select("doc_id", "text")
        .collect()
    )
    return {r.doc_id: r.text.split() for r in rows if r.text.strip()}


# ---------------------------------------------------------------------------
# Sliding-window chunking
# ---------------------------------------------------------------------------


def test_chunk_overlap_and_coverage(spark):
    toks = _doc_tokens(spark)
    chunks = {}
    for r in text_chunk_sliding_window(spark, SF_SMALL).collect():
        chunks.setdefault(r.doc_id, {})[r.chunk_id] = r.chunk_text.split()
    assert set(chunks) == set(toks)
    for doc_id, by_id in chunks.items():
        t = toks[doc_id]
        ordered = [by_id[i] for i in range(len(by_id))]
        # each chunk is the slice starting at i*stride
        for i, c in enumerate(ordered):
            assert c == t[i * _CS : i * _CS + _CW]
        # every token position is covered (stride < window => no gaps)
        covered = set()
        for i, c in enumerate(ordered):
            covered.update(range(i * _CS, i * _CS + len(c)))
        assert covered == set(range(len(t)))
        # consecutive chunks overlap by window-stride tokens
        for i in range(len(ordered) - 1):
            if len(ordered[i]) == _CW:
                assert ordered[i][_CS:] == ordered[i + 1][: _CW - _CS]


# ---------------------------------------------------------------------------
# Per-source caps
# ---------------------------------------------------------------------------


def test_cap_per_source_keeps_longest(spark):
    kept = corpus_cap_per_source(spark, SF_SMALL).collect()
    all_docs = (
        table(spark, SF_SMALL, "documents")
        .select("doc_id", "source", "n_chars")
        .collect()
    )
    by_src: dict[str, list] = {}
    for r in all_docs:
        by_src.setdefault(r.source, []).append(r)
    kept_by_src: dict[str, set] = {}
    for r in kept:
        kept_by_src.setdefault(r.source, set()).add(r.doc_id)
    for src, docs in by_src.items():
        want = {
            r.doc_id
            for r in sorted(docs, key=lambda r: (-r.n_chars, r.doc_id))[:_CAP]
        }
        assert kept_by_src.get(src, set()) == want


# ---------------------------------------------------------------------------
# Mixture sampling
# ---------------------------------------------------------------------------


def _hash60_bucket(doc_id: int) -> int:
    h = hashlib.md5(str(doc_id).encode()).hexdigest()
    return int(h[:15], 16) % _MIX_DEN


def test_mixture_sample_membership_exact(spark):
    got = {
        r.doc_id: r.accept_per_mille
        for r in corpus_mixture_sample(spark, SF_SMALL).collect()
    }
    all_docs = (
        table(spark, SF_SMALL, "documents").select("doc_id", "lang").collect()
    )
    for r in all_docs:
        thr = _MIX_PERMILLE[r.lang]
        if _hash60_bucket(r.doc_id) < thr:
            assert got[r.doc_id] == thr
        else:
            assert r.doc_id not in got


# ---------------------------------------------------------------------------
# Block dedup invariants
# ---------------------------------------------------------------------------


def test_block_dedup_invariants(spark):
    toks = _doc_tokens(spark)
    rows = corpus_block_dedup_stats(spark, SF_SMALL).collect()
    assert {r.doc_id for r in rows} == set(toks)
    # reconstruct ground truth in python
    blocks_by_doc = {}
    freq: dict[str, set] = {}
    for doc_id, t in toks.items():
        blks = [
            " ".join(t[i : i + _BLK]) for i in range(0, len(t), _BLK)
        ]
        blocks_by_doc[doc_id] = blks
        for b in blks:
            freq.setdefault(b, set()).add(doc_id)
    for r in rows:
        blks = blocks_by_doc[r.doc_id]
        dup = [b for b in blks if len(freq[b]) >= 2]
        assert r.n_blocks == len(blks)
        assert r.n_dup_blocks == len(dup)
        assert r.tokens_kept == sum(
            len(b.split()) for b in blks if len(freq[b]) < 2
        )


# ---------------------------------------------------------------------------
# Gopher rules reconstruction
# ---------------------------------------------------------------------------


def test_gopher_rules_reconstruct(spark):
    from fortisiem_clickhouse_monitor_spark.operators.curation import (
        _GOPHER_STOPS,
    )

    docs = {
        r.doc_id: r.text
        for r in table(spark, SF_SMALL, "documents").collect()
    }
    for r in text_gopher_rules(spark, SF_SMALL).collect():
        t = docs[r.doc_id].split()
        n = len(t)
        assert r.n_tokens == n
        assert r.ok_len == (20 <= n <= 90)
        sum_len = sum(len(x) for x in t)
        assert r.ok_word_len == (2 * n <= sum_len <= 8 * n)
        n_alpha = sum(1 for x in t if x.isalpha() and x.isascii())
        assert r.ok_alpha == (10 * n_alpha >= 8 * n)
        max_freq = max((t.count(x) for x in set(t)), default=0)
        assert r.ok_repetition == (8 * max_freq <= n)
        assert r.has_stopword == any(x in _GOPHER_STOPS for x in t)
        assert r.passes == (
            r.ok_len
            and r.ok_word_len
            and r.ok_alpha
            and r.ok_repetition
            and r.has_stopword
        )


# ---------------------------------------------------------------------------
# PageRank: planted graphs vs exact integer simulation
# ---------------------------------------------------------------------------


def _simulate(edges: list[tuple[int, int]], iters: int = 6) -> dict[int, int]:
    """Reference implementation of the exact integer recurrence."""
    from collections import defaultdict

    out = defaultdict(list)
    deg: dict[int, int] = defaultdict(int)
    for u, v in edges:
        out[u].append(v)
        deg[u] += 1
    pr = {u: _PR_SCALE for u in out}
    for _ in range(iters):
        recv: dict[int, int] = defaultdict(int)
        for u, vs in out.items():
            c = pr[u] // deg[u]
            for v in vs:
                recv[v] += c
        pr = {v: 150000 + (85 * s) // 100 for v, s in recv.items()}
    return dict(pr)


def _sym(pairs):
    return pairs + [(v, u) for u, v in pairs]


def test_pagerank_star_hub_ranks_highest(spark):
    edges = _sym([(0, i) for i in range(1, 11)])
    df = spark.createDataFrame(edges, "u: long, v: long")
    got = {r.node: r.pr for r in pagerank_int(df).collect()}
    want = _simulate(edges)
    assert got == want
    assert max(got, key=lambda n: (got[n], -n)) == 0


def test_pagerank_two_components_independent(spark):
    a = _sym([(1, 2), (2, 3), (3, 1)])  # triangle
    b = _sym([(10, 11)])  # isolated pair
    df = spark.createDataFrame(a + b, "u: long, v: long")
    got = {r.node: r.pr for r in pagerank_int(df).collect()}
    want = _simulate(a + b)
    assert got == want
    # symmetric regular components: uniform rank within each
    assert got[1] == got[2] == got[3]
    assert got[10] == got[11]


def test_training_prep_pipeline_composes_stage_outputs(spark):
    """Every surviving doc must independently pass each stage's
    registered query, and no passing doc may be missing."""
    from fortisiem_clickhouse_monitor_spark.operators.pipeline import (
        _DUP_NUM,
        pipeline_training_data_prep,
    )

    got = {r.doc_id: r for r in pipeline_training_data_prep(spark, SF_SMALL).collect()}
    rules = {r.doc_id for r in text_gopher_rules(spark, SF_SMALL).collect() if r.passes}
    mix = {r.doc_id for r in corpus_mixture_sample(spark, SF_SMALL).collect()}
    lowdup = {
        r.doc_id
        for r in corpus_block_dedup_stats(spark, SF_SMALL).collect()
        if _DUP_NUM * r.n_dup_blocks <= r.n_blocks
    }
    assert set(got) == rules & mix & lowdup
    for r in got.values():
        assert r.n_chunks == -(-r.n_tokens // 64)


def test_pagerank_top20_shape(spark):
    rows = graph_pagerank_top20(spark, SF_SMALL).collect()
    assert len(rows) == 20
    prs = [r.pr for r in rows]
    assert prs == sorted(prs, reverse=True)
    assert all(r.pr > 0 for r in rows)


# ---------------------------------------------------------------------------
# Containment near-dup: planted sub-document duplication
# ---------------------------------------------------------------------------


def test_containment_finds_embedded_subdocument(spark, monkeypatch):
    """A short doc copied verbatim inside a much longer one: containment
    flags the pair (1.0) while length-blocked Jaccard cannot (different
    length buckets, and the union denominator drowns the overlap)."""
    from fortisiem_clickhouse_monitor_spark.operators import dedup as dd

    span = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(20))
    rows = [
        (1, span, "en", "srcA", len(span)),
        (2, filler + " " + span + " " + filler, "en", "srcB", 600),
        (3, "totally different words here nothing shared at all", "en", "srcC", 51),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    monkeypatch.setattr(dd, "table", lambda s, d, n: docs)
    got = {
        (r.doc_a, r.doc_b): r.containment
        for r in dd.dedup_shingle_containment_pairs(spark, "ignored").collect()
    }
    assert got.get((1, 2)) == 1.0
    jac = {
        (r.doc_a, r.doc_b)
        for r in dd.dedup_ngram_jaccard_pairs(spark, "ignored").collect()
    }
    assert (1, 2) not in jac


# ---------------------------------------------------------------------------
# fanout: conditional parallelism repair
# ---------------------------------------------------------------------------


def test_fanout_noop_when_scan_already_parallel(spark):
    from fortisiem_clickhouse_monitor_spark.sources.tables import fanout

    p = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 10_000, numPartitions=p)
    assert fanout(wide) is wide  # no exchange added
    narrow = spark.range(0, 10_000, numPartitions=1)
    out = fanout(narrow)
    assert out is not narrow
    assert out.rdd.getNumPartitions() == p
    assert out.count() == 10_000


# ---------------------------------------------------------------------------
# Gap fill and confusion matrix semantics
# ---------------------------------------------------------------------------


def test_gap_fill_dense_grid(spark):
    from fortisiem_clickhouse_monitor_spark.operators.advanced import (
        timeseries_gap_fill_daily,
    )

    rows = timeseries_gap_fill_daily(spark, SF_SMALL).collect()
    days = {r.day for r in rows}
    types = {r.event_type for r in rows}
    # dense: every (type, day) cell exists exactly once
    assert len(rows) == len(days) * len(types)
    assert min(r.n for r in rows) >= 0
    # totals match the raw event count
    ev_n = table(spark, SF_SMALL, "events").count()
    assert sum(r.n for r in rows) == ev_n


def test_lang_confusion_diagonal_and_totals(spark):
    from fortisiem_clickhouse_monitor_spark.operators.text import (
        text_lang_confusion_matrix,
    )

    rows = text_lang_confusion_matrix(spark, SF_SMALL).collect()
    total = sum(r.n for r in rows)
    assert total == table(spark, SF_SMALL, "documents").count()
    # zh has no stopword list: it can never be guessed
    assert all(r.guessed_lang != "zh" for r in rows)


def test_label_propagation_separates_bicliques(spark, monkeypatch):
    """Two disjoint part-supplier bicliques end in distinct community
    labels (same-side nodes agree within a biclique)."""
    import fortisiem_clickhouse_monitor_spark.operators.graph as g

    rows = [(p, 1) for p in (1, 2, 3)] + [(p, 2) for p in (101, 102, 103)]
    li = spark.createDataFrame(rows, "l_partkey long, l_suppkey long")
    monkeypatch.setattr(g, "table", lambda s, d, n: li)
    out = {r["node"]: r["community"]
           for r in g.graph_label_propagation(spark, "x").collect()}
    a_parts = {out[p] for p in (1, 2, 3)}
    b_parts = {out[p] for p in (101, 102, 103)}
    assert len(a_parts) == 1 and len(b_parts) == 1
    assert a_parts != b_parts


def test_capped_wedges_exclude_hub_but_keep_signal(spark):
    """Planted hub: a K1,30 star's middle exceeds the cap and generates
    ZERO wedges (uncapped it would make C(30,2)=435), while a small
    planted co-neighbor structure below the cap survives untouched —
    the pre-dedup safety property of graph_common_neighbors_capped."""
    from fortisiem_clickhouse_monitor_spark.operators.graph import (
        capped_wedges,
    )

    hub = [(0, leaf) for leaf in range(1, 31)]  # hub 0, degree 30
    # docs 101 and 102 share middles 103, 104 (all degrees <= 2)
    small = [(101, 103), (102, 103), (101, 104), (102, 104)]
    pairs = spark.createDataFrame(hub + small, "doc_a LONG, doc_b LONG")

    w = capped_wedges(pairs, cap=5)
    rows = [(r["x"], r["y"]) for r in w.collect()]
    # hub-middle wedges gone; only the two (101, 102) wedges via 103/104
    # plus the (103, 104) wedges via 101/102 remain — all bounded.
    assert (0 not in {x for x, _ in rows}) and (0 not in {y for _, y in rows})
    assert rows.count((101, 102)) == 2
    assert rows.count((103, 104)) == 2
    assert len(rows) == 4

    # uncapped bound check: with a generous cap the hub contributes
    # exactly C(30,2) wedges again — the cap is the only thing between
    # linear and quadratic.
    w_all = capped_wedges(pairs, cap=1000)
    assert w_all.count() == 435 + 4


def test_sketch_common_neighbors_identical_sets_exact(spark, monkeypatch):
    """Identical neighbor sets give signature match fraction J = 1, so
    the estimate J/(1+J) * (da+db) collapses to the EXACT common count
    — the sketch's fixed point. Docs 101/102 both neighbor {1..5}
    (never each other), so the capped top-20 contains (101, 102) with
    exact = est = 5.0; a hub's cost under the sketch is one O(deg)
    signature pass, never a wedge blowup."""
    import fortisiem_clickhouse_monitor_spark.operators.graph as g

    edges = [(101, n) for n in range(1, 6)] + [(102, n) for n in range(1, 6)]
    pairs = spark.createDataFrame(edges, "doc_a LONG, doc_b LONG")
    monkeypatch.setattr(
        g, "dedup_ngram_jaccard_pairs", lambda s, d: pairs, raising=False
    )
    # the operator imports inside the function body from .dedup — patch
    # there instead
    import fortisiem_clickhouse_monitor_spark.operators.dedup as dd

    monkeypatch.setattr(dd, "dedup_ngram_jaccard_pairs", lambda s, d: pairs)
    out = {
        (r["doc_a"], r["doc_b"]): r
        for r in g.graph_common_neighbors_sketch_eval(spark, "x").collect()
    }
    assert (101, 102) in out
    r = out[(101, 102)]
    assert r["exact_common"] == 5
    assert r["est_common"] == 5.0 and r["abs_err"] == 0.0


def test_kcore_peels_pendants_keeps_triangle(spark, monkeypatch):
    import fortisiem_clickhouse_monitor_spark.operators.dedup as dd
    import fortisiem_clickhouse_monitor_spark.operators.graph as gr

    # triangle 1-2-3 plus a pendant chain 3-4-5: the chain peels away
    # (4 and 5 never reach degree 2 once 5 drops), triangle survives.
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)], "doc_a long, doc_b long"
    )
    monkeypatch.setattr(dd, "dedup_ngram_jaccard_pairs", lambda s, d: pairs)
    out = {r["node"]: r["core_degree"]
           for r in gr.graph_kcore_membership(spark, "x").collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_adamic_adar_discounts_hubs(spark, monkeypatch):
    import math

    import fortisiem_clickhouse_monitor_spark.operators.dedup as dd
    import fortisiem_clickhouse_monitor_spark.operators.graph as gr

    # x=1, y=2 share rare middle 10 (deg 2) and hub-ish middle 11
    # (deg 4): score = 1/ln(2) + 1/ln(4); pair (1,3) shares only 11.
    pairs = spark.createDataFrame(
        [(1, 10), (2, 10), (1, 11), (2, 11), (3, 11), (4, 11)],
        "doc_a long, doc_b long",
    )
    monkeypatch.setattr(dd, "dedup_ngram_jaccard_pairs", lambda s, d: pairs)
    rows = gr.graph_adamic_adar_top20(spark, "x").collect()
    scores = {(r["doc_a"], r["doc_b"]): (r["aa_score"], r["common_neighbors"])
              for r in rows}
    exp_12 = (round(1e6 / math.log(2)) + round(1e6 / math.log(4))) / 1e6
    assert scores[(1, 2)] == (round(exp_12, 4), 2)
    assert scores[(1, 3)][1] == 1
    # rare-neighbor pair outranks the hub-only pair
    assert scores[(1, 2)][0] > scores[(1, 3)][0]
    # symmetric twin: (10, 11) is seen through middles 1 AND 2
    assert scores[(10, 11)][1] == 2
