"""Planted-fixture tests for the record-linkage pack
(operators/linkage.py): sorted-neighborhood matching and entity
clustering with hand-known answers.  The sf0.01 oracle gate covers the
hash-exact cross-engine contract."""

from __future__ import annotations

import fortisiem_clickhouse_monitor_spark.operators.linkage as lk

_C_SCHEMA = (
    "c_custkey long, c_name string, c_nationkey int, "
    "c_acctbal double, c_mktsegment string"
)


def _cust(spark, rows):
    """rows: (custkey, name, nationkey, acctbal, segment)."""
    return spark.createDataFrame(rows, _C_SCHEMA)


def test_sorted_neighborhood_finds_adjacent_fuzzy_dupes(
    spark, monkeypatch
):
    """Names one edit apart, adjacent in sort order, same block ->
    matched; an identical name in a DIFFERENT block (other nation)
    must NOT match (blocking is a hard boundary)."""
    rows = [
        (1, "Acme Corp", 1, 10.0, "A"),
        (2, "Acme Corq", 1, 20.0, "A"),   # 1 edit from #1, same block
        (3, "Zeta Ltd", 1, 30.0, "A"),    # far from everything
        (4, "Acme Corp", 2, 40.0, "A"),   # exact dupe, other block
    ]
    monkeypatch.setattr(lk, "table", lambda s, d, n: _cust(spark, rows))
    got = {
        (r["custkey_a"], r["custkey_b"]): r["edit_distance"]
        for r in lk.sorted_neighborhood_pairs(spark, "x").collect()
    }
    assert got == {(1, 2): 1}


def test_sorted_neighborhood_window_limit(spark, monkeypatch):
    """A record W+1 positions away in the sorted block is NEVER
    compared, even if its name is identical — the method's documented
    recall/cost trade-off (window width _W = 3)."""
    rows = [
        (1, "Acme 0", 1, 1.0, "A"),
        (2, "Acme 1", 1, 1.0, "A"),
        (3, "Acme 2", 1, 1.0, "A"),
        (4, "Acme 3", 1, 1.0, "A"),
        (5, "Acme 0", 1, 1.0, "A"),  # sorts adjacent to #1 -> matched
        (6, "Zz 9999", 1, 1.0, "A"),
    ]
    monkeypatch.setattr(lk, "table", lambda s, d, n: _cust(spark, rows))
    pairs = {
        (r["custkey_a"], r["custkey_b"])
        for r in lk.sorted_neighborhood_pairs(spark, "x").collect()
    }
    # Sort order within the block: Acme 0(#1), Acme 0(#5), Acme 1,
    # Acme 2, Acme 3, Zz.  #1-#5 adjacent (ed 0); every "Acme i" is
    # within 3 positions of "Acme j" with ed 1 except (#1 vs #4): the
    # identical-prefix names are 4 apart only for (1,4)?  Enumerate:
    expected = {
        (1, 5),  # ed 0, adjacent
        (1, 2),  # positions 1->3 (dist 2), ed 1
        (5, 2),  # adjacent, ed 1
        (5, 3),  # dist 2, ed 1
        (2, 3),  # ed 1
        (2, 4),  # ed 1
        (3, 4),  # ed 1
        (1, 3),  # position dist 3, ed 1 -> still inside window
        (5, 4),  # position dist 3, ed 1
    }
    assert pairs == expected
    # and the window cap held: (1, 4) is 4 positions apart -> absent
    assert (1, 4) not in pairs


def test_entity_clusters_transitive_merge(spark, monkeypatch):
    """A~B and B~C (but A, C two edits apart each, four apart from each
    other) must land in ONE entity via transitive closure, with
    entity_id = min key and exact centi-unit balance sum."""
    rows = [
        (10, "Node aa", 1, 1.11, "A"),
        (11, "Node ab", 1, 2.22, "A"),   # 1 edit from #10 and #12
        (12, "Node bb", 1, 3.33, "A"),   # 2 edits from #10 -> still ok
        (13, "Other zz", 1, 9.99, "A"),  # singleton: excluded
    ]
    monkeypatch.setattr(lk, "table", lambda s, d, n: _cust(spark, rows))
    out = lk.linkage_entity_clusters(spark, "x").collect()
    assert len(out) == 1
    r = out[0]
    assert r["entity_id"] == 10
    assert r["n_members"] == 3
    assert r["canonical_name"] == "Node aa"
    assert r["acctbal_cents"] == 111 + 222 + 333
