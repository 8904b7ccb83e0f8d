"""Property-based checks for the graph family: integer PageRank equals
an exact Python simulation of the same recurrence on random graphs
(the fixed-point arithmetic means EQUALITY, not tolerance), and random
token lists chunk back to their source."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fortisiem_clickhouse_monitor_spark.operators.graph import pagerank_int

from test_curation_graph import _simulate, _sym

_pairs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),
        st.integers(min_value=0, max_value=12),
    ).filter(lambda p: p[0] != p[1]),
    min_size=1,
    max_size=30,
    unique=True,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pairs=_pairs)
def test_pagerank_matches_simulation_on_random_graphs(spark, pairs):
    # de-dup undirected pairs before symmetrizing so edge multiplicity
    # matches between engine and simulation
    undirected = sorted({tuple(sorted(p)) for p in pairs})
    edges = _sym([(u, v) for u, v in undirected])
    df = spark.createDataFrame(edges, "u: long, v: long")
    got = {r.node: r.pr for r in pagerank_int(df).collect()}
    assert got == _simulate(edges)


# ---------------------------------------------------------------------------
# Containment pairs vs brute-force reference on random corpora
# ---------------------------------------------------------------------------

_words = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"])
_doc = st.lists(_words, min_size=0, max_size=12).map(" ".join)
_corpus = st.lists(_doc, min_size=2, max_size=8)


def _brute_containment(texts, cap, num, den):
    """Python reference with identical df-cap semantics."""
    from collections import Counter

    sh = {}
    for i, t in enumerate(texts):
        toks = t.split()
        sh[i + 1] = {
            " ".join(toks[j : j + 3]) for j in range(len(toks) - 2)
        }
    df = Counter(s for ss in sh.values() for s in ss)
    filt = {
        d: {s for s in ss if df[s] <= cap} for d, ss in sh.items()
    }
    out = {}
    ids = sorted(filt)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            inter = len(filt[a] & filt[b])
            mn = min(len(filt[a]), len(filt[b]))
            if mn and den * inter >= num * mn:
                out[(a, b)] = round(inter / mn, 4)
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_corpus)
def test_containment_matches_bruteforce(spark, texts, monkeypatch):
    from fortisiem_clickhouse_monitor_spark.operators import dedup as dd

    rows = [
        (i + 1, t, "en", "s", len(t)) for i, t in enumerate(texts)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    monkeypatch.setattr(dd, "table", lambda s, d, n: docs)
    got = {
        (r.doc_a, r.doc_b): r.containment
        for r in dd.dedup_shingle_containment_pairs(spark, "x").collect()
    }
    want = _brute_containment(
        texts, dd._CONT_DF_CAP, dd._CONT_NUM, dd._CONT_DEN
    )
    assert got == want


# ---------------------------------------------------------------------------
# Prefix-filter set-similarity join vs brute-force all-pairs Jaccard
# ---------------------------------------------------------------------------


def _brute_jaccard_pairs(texts, num, den):
    """All-pairs distinct-token Jaccard >= num/den — NO candidate
    pruning, so any prefix-filter miss shows up as a missing pair."""
    sets = {}
    for i, t in enumerate(texts):
        toks = set(t.split())
        if toks:
            sets[i + 1] = toks
    out = {}
    ids = sorted(sets)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            inter = len(sets[a] & sets[b])
            uni = len(sets[a] | sets[b])
            if den * inter >= num * uni:
                out[(a, b)] = round(inter / uni, 4)
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_corpus)
def test_prefix_filter_matches_bruteforce(spark, texts, monkeypatch):
    """Completeness property: prefix filtering (with the length filter)
    must return EXACTLY the brute-force all-pairs result — misses would
    mean the prefix principle or the length bound is implemented
    wrong."""
    from fortisiem_clickhouse_monitor_spark.operators import dedup as dd

    rows = [(i + 1, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    monkeypatch.setattr(dd, "table", lambda s, d, n: docs)
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dd.dedup_prefix_filter_pairs(spark, "x").collect()
    }
    want = _brute_jaccard_pairs(texts, dd._PFX_NUM, dd._PFX_DEN)
    assert got == want


_cc_edges = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=20),
        st.integers(min_value=0, max_value=20),
    ),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=_cc_edges)
def test_cc_driver_and_distributed_agree_on_random_graphs(spark, edges):
    """Property form of the CC forced-path differential: on arbitrary
    small multigraphs (self-loops and duplicate/reversed edges
    included), the driver union-find and the forced star contraction
    must emit the identical min-rooted star forest, and it must match
    a pure-python reference closure."""
    import fortisiem_clickhouse_monitor_spark.operators.dedup as dd

    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "src long, dst long"
    )

    old_gate = dd.CC_DRIVER_MAX_EDGES
    try:
        dd.CC_DRIVER_MAX_EDGES = 10**9
        driver, r0 = dd.alternating_components(df)
        got_driver = sorted((r["u"], r["v"]) for r in driver.collect())
        dd.CC_DRIVER_MAX_EDGES = 0
        dist, _ = dd.alternating_components(df)
        got_dist = sorted((r["u"], r["v"]) for r in dist.collect())
    finally:
        dd.CC_DRIVER_MAX_EDGES = old_gate

    assert got_driver == got_dist

    # pure-python reference: min label per component
    adj: dict = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seen: set = set()
    expected = []
    for n in adj:
        if n in seen:
            continue
        comp, stack = [], [n]
        while stack:
            x = stack.pop()
            if x in seen:
                continue
            seen.add(x)
            comp.append(x)
            stack.extend(adj[x] - seen)
        root = min(comp)
        expected.extend((root, x) for x in comp if x != root)
    assert got_driver == sorted(expected)
