"""Focused equivalence tests for the r9 OPTIMIZATION round's internal
rewrites — each optimization that restructures an operator gets a
direct differential check here against the pre-rewrite computation
(the oracle gate already covers end-to-end results; these pin the
building blocks and the forced paths).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_ORACLE, SF_SMALL


def _ktruss_full_recompute(spark, sf_dir):
    """The pre-r9 k-truss: every round recomputes support for ALL
    surviving edges via the full adjacency intersect."""
    from fortisiem_clickhouse_monitor_spark.operators import graph as G
    from fortisiem_clickhouse_monitor_spark.operators.dedup import (
        shared_ngram_pairs,
    )

    edges = shared_ngram_pairs(spark, sf_dir).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    supp = G._edge_support(edges)
    for _ in range(G._TRUSS_ROUNDS - 1):
        supp = G._edge_support(
            supp.filter(F.col("c") >= G._TRUSS_K - 2).select("a", "b")
        )
    return supp.filter(F.col("c") >= G._TRUSS_K - 2).select(
        F.col("a").alias("doc_a"),
        F.col("b").alias("doc_b"),
        F.col("c").cast("long").alias("support"),
    )


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_ORACLE])
def test_ktruss_incremental_matches_full(spark, sf_dir):
    """The incremental support peel (decrement survivors by their lost
    triangles) must produce the IDENTICAL kept-edge set and support
    values as the full per-round recompute, at both small SFs."""
    from fortisiem_clickhouse_monitor_spark.operators.graph import (
        graph_ktruss_edges,
    )

    inc = sorted(
        (r["doc_a"], r["doc_b"], r["support"])
        for r in graph_ktruss_edges(spark, sf_dir).collect()
    )
    full = sorted(
        (r["doc_a"], r["doc_b"], r["support"])
        for r in _ktruss_full_recompute(spark, sf_dir).collect()
    )
    assert inc == full
    assert inc, f"vacuous differential: empty truss at {sf_dir}"


def test_ktruss_incremental_shuffle_fallback_matches(spark, monkeypatch):
    """The peel's dropped-edge probe joins ride the same broadcast-vs-
    shuffled-hash gate as the full intersect (_adj_sides); forcing the
    fallback must not change the kept-edge set or supports."""
    from fortisiem_clickhouse_monitor_spark.operators import graph as G

    base = sorted(
        (r["doc_a"], r["doc_b"], r["support"])
        for r in G.graph_ktruss_edges(spark, SF_SMALL).collect()
    )
    monkeypatch.setattr(G, "TRUSS_BROADCAST_MAX_EDGES", 0)
    forced = sorted(
        (r["doc_a"], r["doc_b"], r["support"])
        for r in G.graph_ktruss_edges(spark, SF_SMALL).collect()
    )
    assert base == forced
    assert base, "vacuous forced-path differential"


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_ORACLE])
def test_lpa_mode_vote_matches_two_stage(spark, sf_dir):
    """mode(lbl, deterministic=true) must equal the two-stage
    count + max(struct(c, -lbl)) argmax it replaced in the LPA round:
    most frequent label, smallest label on ties — checked by running
    the full LPA with each round shape over the same edge input."""
    from fortisiem_clickhouse_monitor_spark.operators.graph import (
        _LPA_ITERS,
        _SUPP_OFF,
        graph_label_propagation,
    )
    from fortisiem_clickhouse_monitor_spark.sources.tables import table

    li = table(spark, sf_dir, "lineitem")
    e0 = li.select(
        F.col("l_partkey").alias("u"),
        (F.col("l_suppkey") + _SUPP_OFF).alias("v"),
    ).distinct()
    edges = e0.unionByName(
        e0.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint()
    labels = edges.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )
    for _ in range(_LPA_ITERS):
        votes = (
            edges.join(F.broadcast(labels.withColumnRenamed("node", "u")), "u")
            .groupBy(F.col("v").alias("node"), "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            votes.groupBy("node")
            .agg(
                F.max(
                    F.struct(F.col("c"), (-F.col("lbl")).alias("neg"))
                ).alias("m")
            )
            .select("node", (-F.col("m.neg")).alias("lbl"))
            .localCheckpoint()
        )
    two_stage = sorted(
        (r["node"], r["lbl"]) for r in labels.collect()
    )
    installed = sorted(
        (r["node"], r["community"])
        for r in graph_label_propagation(spark, sf_dir).collect()
    )
    assert installed == two_stage
    assert installed, f"vacuous differential: no labels at {sf_dir}"
