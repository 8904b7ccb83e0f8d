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
