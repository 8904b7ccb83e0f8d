"""Differential test for sim_kmeans_clusters against a numpy reference
implementation of the same deterministic Lloyd's specification
(k=5, 3 iterations, init = vec_id 0..4, lowest-index argmin ties,
empty clusters keep their centroid).

Float summation order differs between Spark's distributed avg and
numpy's mean, so assignments are compared allowing disagreement only
where the two nearest centroids are within 1e-9 of each other.
"""

from __future__ import annotations

import numpy as np

from fortisiem_clickhouse_monitor_spark import registry
from fortisiem_clickhouse_monitor_spark.operators import similarity
from fortisiem_clickhouse_monitor_spark.sources.tables import table
from tests.conftest import SF_SMALL


def _numpy_kmeans(ids, mat, k, iters):
    centroids = mat[np.argsort(ids)[:0]]  # placeholder
    order = np.argsort(ids)
    init_idx = [np.where(ids == i)[0][0] for i in range(k)]
    centroids = mat[init_idx].copy()
    assign = None
    for _ in range(iters):
        d = ((mat[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # argmin takes lowest index on ties
        for c in range(k):
            members = mat[assign == c]
            if len(members):
                # engine spec rounds centroids to 6 decimals per update
                centroids[c] = np.round(members.mean(axis=0), 6)
    d = ((mat[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    return d.argmin(axis=1), d


def test_kmeans_matches_numpy_reference(spark):
    got = {
        r["vec_id"]: r["cluster"]
        for r in registry.queries()["sim_kmeans_clusters"](spark, SF_SMALL).collect()
    }
    rows = (
        table(spark, SF_SMALL, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype="float64")
    expect, dists = _numpy_kmeans(ids, mat, similarity._KMEANS_K, similarity._KMEANS_ITERS)

    n_mismatch = 0
    for i, vid in enumerate(ids):
        if got[int(vid)] != expect[i]:
            two = np.sort(dists[i])[:2]
            assert two[1] - two[0] < 1e-9, (
                f"vec {vid}: spark={got[int(vid)]} numpy={expect[i]} "
                f"but nearest centroids differ by {two[1]-two[0]}"
            )
            n_mismatch += 1
    assert n_mismatch <= len(ids) * 0.01
    assert len(set(got.values())) > 1  # clustering actually separates


def test_pq_codebook_vectors_self_assign(spark):
    from fortisiem_clickhouse_monitor_spark.operators.similarity import (
        _PQ_K, _PQ_M, sim_pq_codes,
    )

    out = {r["vec_id"]: r for r in
           sim_pq_codes(spark, "/root/testdata/sf0.001").collect()}
    for vid in range(_PQ_K):  # codebook rows reconstruct exactly
        r = out[vid]
        assert [r[f"code_{s}"] for s in range(_PQ_M)] == [vid] * _PQ_M
        assert r["recon_err"] == 0.0
    for r in out.values():
        assert all(0 <= r[f"code_{s}"] < _PQ_K for s in range(_PQ_M))
        assert r["recon_err"] >= 0.0
