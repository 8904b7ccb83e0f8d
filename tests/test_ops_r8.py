"""Round-8 additions: cache-release on toggle-off (ADVICE r7), the
IVF nprobe recall/cost frontier, planted-structure ANN A/B, persisted
IVF-PQ index round-trip, and restart-resume coverage helpers."""

from __future__ import annotations

import pytest

from fortisiem_clickhouse_monitor_spark.session import free_local_checkpoint

SF_SMALL = "/root/testdata/sf0.001"


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_free_local_checkpoint_releases_blocks(spark):
    """DataFrame.unpersist() is a documented no-op for localCheckpoint
    blocks; free_local_checkpoint must actually release them — flat,
    and nested in the shapes the session caches use (dict of frames,
    tuple of (frame, [frames]))."""
    base = _n_persistent(spark)
    flat = spark.range(10).localCheckpoint(eager=True)
    nested = {
        ("k", "x"): (
            spark.range(5).localCheckpoint(eager=True),
            [spark.range(3).localCheckpoint(eager=True)],
        )
    }
    assert _n_persistent(spark) == base + 3
    free_local_checkpoint(flat)
    free_local_checkpoint(nested)
    assert _n_persistent(spark) == base


def test_free_local_checkpoint_tolerates_non_checkpoints(spark):
    """Non-LogicalRDD plans (plain scans, literals) and junk values
    must be skipped silently — the toggle path can never raise."""
    free_local_checkpoint(spark.range(4))  # un-checkpointed plan
    free_local_checkpoint(None)
    free_local_checkpoint({"a": [None, ("x",)]})


def test_cache_toggle_off_releases_checkpoints(spark):
    """enable_shared_*_cache(False) must unpersist the cached entries'
    checkpoint blocks (ADVICE r7: they leaked for the session).  Uses
    the k-means cache — the cheapest of the four — against sf0.001."""
    from fortisiem_clickhouse_monitor_spark.operators import similarity as sim

    base = _n_persistent(spark)
    sim.enable_shared_kmeans_cache(True)
    try:
        sim.shared_kmeans_assignment(spark, SF_SMALL).count()
        populated = _n_persistent(spark)
        assert populated > base
    finally:
        sim.enable_shared_kmeans_cache(False)
    # Exactly the cache's own checkpoint is released; any blocks the
    # kmeans computation checkpoints internally follow per-call
    # lifecycle and are not the toggle's to free.
    assert _n_persistent(spark) == populated - 1
    assert not sim._SHARED_KM


def test_union_find_empty_and_pandas_return_path(spark):
    """The driver union-find's columnar (pandas) return path must agree
    with the distributed contraction on a small forest, and an
    edgeless input must return an empty star frame, not raise."""
    from fortisiem_clickhouse_monitor_spark.operators.dedup import (
        alternating_components,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (5, 5)], "src LONG, dst LONG"
    )
    stars, rounds = alternating_components(edges)
    assert rounds == 0  # size gate took the driver path
    got = {(r["u"], r["v"]) for r in stars.collect()}
    assert got == {(1, 2), (1, 3), (10, 11)}

    empty = spark.createDataFrame([(7, 7)], "src LONG, dst LONG")
    stars2, _ = alternating_components(empty)
    assert stars2.count() == 0
