"""Planted-fixture tests for the round-5 additions: snapshot-diff CDC,
daily autocorrelation, partition advisor, LPA modularity, and the
cross-video shared-frame detector (differential vs a pure-numpy
recompute).  The sf0.01 oracle gate covers cross-engine hashing."""

from __future__ import annotations

import datetime as dt

import fortisiem_clickhouse_monitor_spark.operators.advanced as adv
import fortisiem_clickhouse_monitor_spark.operators.behavior as beh
import fortisiem_clickhouse_monitor_spark.operators.graph as gr
import fortisiem_clickhouse_monitor_spark.operators.multimodal as mm
import fortisiem_clickhouse_monitor_spark.operators.profiling as prof

_O_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def _orders(spark, rows):
    """rows: (orderkey, custkey, totalprice, yyyy_mm_dd)."""
    return spark.createDataFrame(
        [
            (ok, ck, "O", tp, dt.datetime.fromisoformat(d), "1-URGENT")
            for ok, ck, tp, d in rows
        ],
        _O_SCHEMA,
    )


def test_snapshot_diff_statuses(spark, monkeypatch):
    """One unchanged, one changed (revenue moved), one removed, one
    added customer between month 1 and month 2 -> all four statuses
    with exact centi-unit deltas."""
    rows = [
        # cust 1: identical both months -> unchanged
        (1, 1, 10.00, "1995-01-05"),
        (2, 1, 10.00, "1995-02-05"),
        # cust 2: revenue 10.00 -> 12.50 -> changed, delta +250 cents
        (3, 2, 10.00, "1995-01-07"),
        (4, 2, 12.50, "1995-02-07"),
        # cust 3: only month 1 -> removed
        (5, 3, 99.99, "1995-01-09"),
        # cust 4: only month 2 -> added
        (6, 4, 5.25, "1995-02-09"),
        # noise in month 3: must not affect the diff
        (7, 9, 1000.0, "1995-03-01"),
    ]
    monkeypatch.setattr(beh, "table", lambda s, d, n: _orders(spark, rows))
    out = {
        r["status"]: r
        for r in beh.cdc_snapshot_diff_monthly(spark, "x").collect()
    }
    assert set(out) == {"unchanged", "changed", "removed", "added"}
    assert out["changed"]["n_customers"] == 1
    assert out["changed"]["revenue_delta_cents"] == 250
    assert out["removed"]["revenue_delta_cents"] == -9999
    assert out["added"]["revenue_delta_cents"] == 525
    assert out["unchanged"]["orders_a"] == 1
    assert out["unchanged"]["orders_b"] == 1


_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, "
    "event_type string, value double, props string"
)


def test_autocorrelation_alternating_series(spark, monkeypatch):
    """Daily counts 1,2,1,2,... over 10 consecutive days: perfect
    anti-correlation at lag 1 (acf = -1) and perfect correlation at
    lag 2 (acf = +1), with n_pairs = 10 - lag."""
    t0 = dt.datetime(2024, 5, 1, 12, 0, 0)
    rows, eid = [], 0
    for day in range(10):
        for _ in range(1 if day % 2 == 0 else 2):
            eid += 1
            rows.append(
                (eid, t0 + dt.timedelta(days=day), 1, "click", 1.0, "{}")
            )
    monkeypatch.setattr(
        adv,
        "table",
        lambda s, d, n: spark.createDataFrame(rows, _EV_SCHEMA),
    )
    out = {
        r["lag"]: r for r in adv.timeseries_autocorrelation(spark, "x").collect()
    }
    assert out[1]["acf"] == -1.0
    assert out[2]["acf"] == 1.0
    assert out[1]["n_pairs"] == 9
    assert out[2]["n_pairs"] == 8
    assert set(out) == set(range(1, 8))


def test_partition_advisor_thresholds(spark, monkeypatch):
    """Constant column -> constant_drop; unique key -> bucket_by_id;
    low-cardinality -> partition_by; middle ground -> sort_or_zorder."""
    n = 200
    rows = [
        (
            i,                      # o_orderkey: unique -> bucket_by_id
            i // 2,                 # o_custkey: ndv/n = 0.5 -> sort_or_zorder
            "O",                    # o_orderstatus: constant -> constant_drop
            float(i),               # o_totalprice: unique -> bucket_by_id
            dt.datetime(1995, 1, 1 + (i % 3)),  # 3 values -> partition_by
            f"p{i % 5}",            # 5 values -> partition_by
        )
        for i in range(n)
    ]
    monkeypatch.setattr(
        prof,
        "table",
        lambda s, d, nm: spark.createDataFrame(rows, _O_SCHEMA),
    )
    out = {
        r["col_name"]: r["advice"]
        for r in prof.profile_partition_advisor(spark, "x").collect()
    }
    assert out == {
        "o_orderkey": "bucket_by_id",
        "o_custkey": "sort_or_zorder",
        "o_orderstatus": "constant_drop",
        "o_totalprice": "bucket_by_id",
        "o_orderdate": "partition_by",
        "o_orderpriority": "partition_by",
    }


_LI_SCHEMA = "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double, l_extendedprice double, l_discount double, l_tax double, l_returnflag string, l_linestatus string, l_shipdate timestamp, l_commitdate timestamp, l_receiptdate timestamp"


def test_modularity_disjoint_pairs_exact_integers(spark, monkeypatch):
    """Two disjoint part-supplier edges.  Synchronous LPA over an odd
    round count leaves each bipartite side in its own community (the
    documented oscillation), so every community is one node with
    degree 1 and zero internal edges: contrib_4m2 = 0 - 1^2 = -1 for
    all four, modularity_contrib = -1/16 = -0.0625 exactly."""
    t = dt.datetime(1995, 1, 1)
    rows = [
        (1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", t, t, t),
        (2, 2, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", t, t, t),
    ]
    monkeypatch.setattr(
        gr,
        "table",
        lambda s, d, n: spark.createDataFrame(rows, _LI_SCHEMA),
    )
    out = gr.graph_modularity_lpa(spark, "x").collect()
    assert len(out) == 4
    for r in out:
        assert r["n_nodes"] == 1
        assert r["degree_sum"] == 1
        assert r["e_inside"] == 0
        assert r["contrib_4m2"] == -1
        assert r["modularity_contrib"] == -0.0625


def test_shared_frames_differential_numpy(spark):
    """Differential: recompute every sampled frame's dHash with the
    pure-python kernels (encode_ppm_frame -> decode_image -> dhash64)
    over the real sf0.001 documents and aggregate in plain dicts; the
    operator must return exactly the >=2-distinct-asset hash groups."""
    import duckdb

    con = duckdb.connect()
    docs = con.execute(
        "SELECT doc_id FROM '/root/testdata/sf0.001/documents.parquet'"
    ).fetchall()
    groups: dict[tuple[int, int], list[tuple[int, int]]] = {}
    for (doc_id,) in docs:
        n_frames = doc_id % 3 + 2
        w, h = (doc_id % 4) * 16 + 16, (doc_id % 3) * 8 + 8
        for f in range(0, n_frames * 10, 10):
            img = mm.decode_image(mm.encode_ppm_frame(doc_id, f, w, h))
            key = mm.dhash64(img)
            groups.setdefault(key, []).append((doc_id, f))
    expect = {
        key: (
            len({a for a, _ in members}),
            len(members),
            min(a for a, _ in members),
        )
        for key, members in groups.items()
        if len({a for a, _ in members}) >= 2
    }
    got = {
        (r["dhash_hi"], r["dhash_lo"]): (
            r["n_assets"],
            r["n_frames"],
            r["first_asset"],
        )
        for r in mm.mm_video_shared_frames(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert expect  # non-vacuous: collisions must exist at sf0.001
    assert got == expect


import fortisiem_clickhouse_monitor_spark.operators.corpus as corp


def test_negative_samples_exclude_positives(spark):
    """Against real sf0.001 data: every (custkey, neg_partkey) must be
    absent from the positive interactions, ranks are 1..K dense per
    customer, and every customer with positives gets samples."""
    import duckdb

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    pos = set(
        con.execute(
            f"""SELECT DISTINCT o_custkey, l_partkey
                FROM '{sf}/orders.parquet' o
                JOIN '{sf}/lineitem.parquet' l
                  ON l.l_orderkey = o.o_orderkey"""
        ).fetchall()
    )
    rows = corp.corpus_negative_samples(spark, sf).collect()
    by_cust: dict[int, list[int]] = {}
    for r in rows:
        assert (r["custkey"], r["neg_partkey"]) not in pos
        by_cust.setdefault(r["custkey"], []).append(r["rank"])
    assert set(by_cust) == {c for c, _ in pos}
    for ranks in by_cust.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= corp._NEG_K


def test_join_key_skew_planted_hot_key(spark, monkeypatch):
    """999 rows on one key + 1 row on each of 111 others: max=999,
    mean ~ 9.9, skew_ratio ~ 100x, exactly one hot key."""
    rows = [(i, 0, "O", 1.0, dt.datetime(1995, 1, 1), "x") for i in range(999)]
    rows += [
        (1000 + j, 1 + j, "O", 1.0, dt.datetime(1995, 1, 1), "x")
        for j in range(111)
    ]
    df = spark.createDataFrame(rows, _O_SCHEMA)
    t = dt.datetime(1995, 1, 1)
    li = spark.createDataFrame(
        [(1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", t, t, t)], _LI_SCHEMA
    )
    monkeypatch.setattr(
        prof, "table", lambda s, d, n: df if n == "orders" else li
    )
    out = {
        r["key_name"]: r
        for r in prof.profile_join_key_skew(spark, "x").collect()
    }
    r = out["orders.o_custkey"]
    assert r["n_rows"] == 1110
    assert r["n_keys"] == 112
    assert r["max_cnt"] == 999
    assert r["n_hot_keys"] == 1  # 999 * 112 > 10 * 1110; 1 * 112 is not
    assert abs(r["skew_ratio"] - 999 * 112 / 1110) < 1e-6


def test_ktruss_clique_survives_triangle_peeled(spark, monkeypatch):
    """K5 clique: every edge has support 3 >= 2 -> survives all rounds
    with support 3.  A separate plain triangle: support 1 < 2 -> peeled
    in round 1.  A pendant chain: support 0 -> gone.  (4-truss, i.e.
    threshold = 2.)"""
    import itertools

    import fortisiem_clickhouse_monitor_spark.operators.dedup as dd

    clique = list(itertools.combinations(range(1, 6), 2))
    triangle = [(10, 11), (10, 12), (11, 12)]
    chain = [(20, 21), (21, 22)]
    pairs = spark.createDataFrame(
        [(a, b) for a, b in clique + triangle + chain],
        "doc_a long, doc_b long",
    )
    monkeypatch.setattr(
        gr, "dedup_ngram_jaccard_pairs", lambda s, d: pairs, raising=False
    )
    # graph_ktruss_edges imports the pairs fn inside the function body,
    # so patch the source module attribute it resolves.
    monkeypatch.setattr(dd, "dedup_ngram_jaccard_pairs", lambda s, d: pairs)
    out = {
        (r["doc_a"], r["doc_b"]): r["support"]
        for r in gr.graph_ktruss_edges(spark, "x").collect()
    }
    assert out == {(a, b): 3 for a, b in clique}


def test_temporal_holdout_planted(spark, monkeypatch):
    """User A: 10 daily events, span 9 days -> cutoff = t0 + 7.2 days,
    so days 0..7 train (8 events), days 8..9 test (2).  User B: one
    event on day 9 -> test-only.  Shared users = {A}."""
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(days=i), 1, "click", 1.0, "{}")
        for i in range(10)
    ] + [(99, t0 + dt.timedelta(days=9), 2, "click", 1.0, "{}")]
    monkeypatch.setattr(
        corp,
        "table",
        lambda s, d, n: spark.createDataFrame(rows, _EV_SCHEMA),
    )
    r = corp.corpus_temporal_holdout_summary(spark, "x").collect()[0]
    base = int(t0.replace(tzinfo=dt.timezone.utc).timestamp())
    assert r["cutoff_epoch"] == base + (9 * 86400 * 8) // 10
    assert r["n_train_events"] == 8
    assert r["n_test_events"] == 3
    assert r["n_train_users"] == 1
    assert r["n_test_users"] == 2
    assert r["n_shared_users"] == 1


def test_zorder_block_locality_bound(spark):
    """The Z-curve guarantee the query demonstrates: every 256-key
    Z-block spans at most a 16x16 (custkey-bucket x day-bucket)
    rectangle, and the block id is consistent with re-deriving the
    Morton code from any contained bucket pair."""
    rows = prof.layout_zorder_locality(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_custkey_buckets"] <= 16
        assert 1 <= r["n_day_buckets"] <= 16


def test_morton_roundtrip_exhaustive():
    """Pure-python check of the unrolled bit interleave against the
    definitional encoding for the full 8-bit x 8-bit domain."""
    def ref(x, y):
        out = 0
        for i in range(8):
            out |= ((x >> i) & 1) << (2 * i + 1)
            out |= ((y >> i) & 1) << (2 * i)
        return out

    import duckdb

    con = duckdb.connect()
    expr = prof._duck_morton("x", "y")
    got = con.execute(
        f"SELECT x, y, {expr} AS m FROM range(256) a(x), range(256) b(y)"
    ).fetchall()
    for x, y, m in got:
        assert m == ref(x, y)


_DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def test_waterfill_mixed_satisfied_and_capped(spark, monkeypatch):
    """Sources with 2/4/100/100 one-token docs and budget 19/20 of 206
    = 195: the two small sources keep everything (2, 4), the two big
    ones split the rest evenly: (195 - 6) div 2 = 94 each."""
    rows, did = [], 0
    for src, n in (("a", 2), ("b", 4), ("c", 100), ("d", 100)):
        for _ in range(n):
            rows.append((did, "tok", "en", src, 3))
            did += 1
    monkeypatch.setattr(
        corp,
        "table",
        lambda s, d, nm: spark.createDataFrame(rows, _DOC_SCHEMA),
    )
    out = {
        r["source"]: (r["allocated_tokens"], r["fully_satisfied"])
        for r in corp.corpus_mixture_waterfill(spark, "x").collect()
    }
    assert out == {
        "a": (2, True),
        "b": (4, True),
        "c": (94, False),
        "d": (94, False),
    }


def test_funnel_latency_planted(spark, monkeypatch):
    """Three converters with latencies 10, 20, 100 s (one purchase
    BEFORE signup must not count; one signup-only user must not
    count): median_2x = 40, p90 = smallest rank with rn*10 >= 27
    -> rank 3 -> 100."""
    t0 = dt.datetime(2024, 6, 1)

    def ev(eid, sec, uid, et):
        return (eid, t0 + dt.timedelta(seconds=sec), uid, et, 1.0, "{}")

    rows = [
        ev(1, 0, 1, "signup"), ev(2, 10, 1, "purchase"),
        ev(3, 0, 2, "signup"), ev(4, 20, 2, "purchase"),
        ev(5, 0, 3, "signup"), ev(6, 100, 3, "purchase"),
        ev(7, 50, 4, "purchase"), ev(8, 60, 4, "signup"),  # wrong order
        ev(9, 0, 5, "signup"),                              # never buys
    ]
    monkeypatch.setattr(
        beh,
        "table",
        lambda s, d, n: spark.createDataFrame(rows, _EV_SCHEMA),
    )
    r = beh.funnel_conversion_latency(spark, "x").collect()[0]
    assert r["n_converters"] == 3
    assert r["min_s"] == 10
    assert r["median_2x_s"] == 40
    assert r["p90_disc_s"] == 100
    assert r["max_s"] == 100


def test_benford_uniform_prices_deviate(spark):
    """On the real (uniform-price) fixture the screen must flag the
    Benford signature violation: digit-1 ppm far below 301030, and the
    observed ppm column must sum to ~1e6 (integer floor loss < 9)."""
    out = prof.quality_benford_screen(
        spark, "/root/testdata/sf0.001"
    ).collect()
    ppm = {r["digit"]: r["obs_micro"] for r in out}
    assert sum(ppm.values()) > 1_000_000 - 9
    for r in out:
        assert r["dev_micro"] == r["obs_micro"] - r["exp_micro"]
    # uniform prices: digit 1 well below Benford's 301030 ppm, digit 4
    # (inflated by the uniform range) well above its 96910 ppm
    assert ppm[1] < 280_000
    assert ppm[4] > 150_000


def test_ppr_mass_stays_near_seeds(spark, monkeypatch):
    """Two disjoint 2-node components, seeds {0..4} touch only the
    first: the second component must receive ZERO rank (filtered out),
    and the seed's direct neighbor must outrank nothing in the other
    component.  Exact round-0/1 arithmetic: seed starts at 1e6; after a
    round its neighbor holds (85 * 1e6) div 100 = 850000."""
    t = dt.datetime(1995, 1, 1)
    rows = [
        # component A: part 0 (seed) -- supplier 7
        (1, 0, 7, 1.0, 1.0, 0.0, 0.0, "N", "O", t, t, t),
        # component B: part 100 -- supplier 8 (no seed)
        (2, 100, 8, 1.0, 1.0, 0.0, 0.0, "N", "O", t, t, t),
    ]
    monkeypatch.setattr(
        gr, "table", lambda s, d, n: spark.createDataFrame(rows, _LI_SCHEMA)
    )
    out = {r["node"]: r["pr"] for r in gr.graph_ppr_seeded_top20(spark, "x").collect()}
    supp = gr._SUPP_OFF
    assert set(out) == {0, supp + 7}  # component B filtered at 0
    assert out[0] > out[supp + 7] > 0


def test_rolling_slope_exact_linear(spark, monkeypatch):
    """Daily counts growing exactly +2/day: every window with n >= 3
    reports slope_micro == 2_000_000 exactly; the first two days are
    suppressed (n < 3)."""
    t0 = dt.datetime(2024, 7, 1)
    rows, eid = [], 0
    for day in range(10):
        for _ in range(3 + 2 * day):
            eid += 1
            rows.append(
                (eid, t0 + dt.timedelta(days=day), 1, "click", 1.0, "{}")
            )
    monkeypatch.setattr(
        adv, "table", lambda s, d, n: spark.createDataFrame(rows, _EV_SCHEMA)
    )
    out = adv.trend_rolling_7d_slope(spark, "x").collect()
    assert len(out) == 8  # days 2..9
    for r in out:
        assert r["slope_micro"] == 2_000_000


def test_dau_mau_stickiness_planted(spark, monkeypatch):
    """User 1 active on days 0 and 10; user 2 active on day 10 only.
    Day 0: dau=1, mau=1 (stickiness 1e6).  Day 10: dau=2, mau=2 (user
    1's day-0 activity covers day 10 but they're also active; user 2
    new) -> stickiness 1e6.  Add user 3 active day 0 only: day 10 mau
    becomes 3 while dau stays 2 -> 666666 ppm."""
    t0 = dt.datetime(2024, 8, 1)
    rows = [
        (1, t0, 1, "click", 1.0, "{}"),
        (2, t0 + dt.timedelta(days=10), 1, "click", 1.0, "{}"),
        (3, t0 + dt.timedelta(days=10), 2, "click", 1.0, "{}"),
        (4, t0, 3, "click", 1.0, "{}"),
    ]
    monkeypatch.setattr(
        beh, "table", lambda s, d, n: spark.createDataFrame(rows, _EV_SCHEMA)
    )
    base = int(t0.replace(tzinfo=dt.timezone.utc).timestamp()) // 86400
    out = {
        r["day_num"]: r
        for r in beh.behavior_dau_mau_stickiness(spark, "x").collect()
    }
    assert set(out) == {base, base + 10}
    assert (out[base]["dau"], out[base]["mau"]) == (2, 2)
    assert (out[base + 10]["dau"], out[base + 10]["mau"]) == (2, 3)
    assert out[base + 10]["stickiness_micro"] == 666666


def test_cross_lang_components_planted(spark, monkeypatch):
    """Component {1,2,3} with langs {en,en,zh} -> reported with
    langs='en,zh'; monolingual component {10,11} -> excluded.  The
    edge source is the lang-agnostic LSH pair kernel (planted here;
    the oracle gate exercises the real kernel, where the fixtures'
    planted translation duplicates make the screen non-vacuous)."""
    import fortisiem_clickhouse_monitor_spark.operators.dedup as dd

    pairs = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 0.6), (10, 11, 0.9)],
        "doc_a long, doc_b long, jaccard double",
    )
    docs = spark.createDataFrame(
        [
            (i, "t", lang, "s", 1)
            for i, lang in [
                (1, "en"), (2, "en"), (3, "zh"), (10, "de"), (11, "de"),
            ]
        ],
        _DOC_SCHEMA,
    )
    monkeypatch.setattr(dd, "dedup_minhash_lsh_pairs", lambda s, d: pairs)
    monkeypatch.setattr(dd, "table", lambda s, d, n: docs)
    out = dd.dedup_cross_lang_components(spark, "x").collect()
    assert len(out) == 1
    r = out[0]
    assert r["component"] == 1
    assert r["n_members"] == 3
    assert r["n_langs"] == 2
    assert r["langs"] == "en,zh"


def test_static_video_screen_planted_vs_kernel(spark):
    """Differential on real sf0.001 assets: n_distinct_frames must
    match a pure-python recompute, and is_static iff one distinct
    hash.  (The synthetic per-frame gradient varies with f, so truly
    static videos may or may not occur — the invariant, not a fixed
    count, is asserted.)"""
    import duckdb

    con = duckdb.connect()
    docs = con.execute(
        "SELECT doc_id FROM '/root/testdata/sf0.001/documents.parquet'"
    ).fetchall()
    expect = {}
    for (doc_id,) in docs:
        n_frames = doc_id % 3 + 2
        w, h = (doc_id % 4) * 16 + 16, (doc_id % 3) * 8 + 8
        hashes = {
            mm.dhash64(mm.decode_image(mm.encode_ppm_frame(doc_id, f, w, h)))
            for f in range(0, n_frames * 10, 10)
        }
        expect[doc_id] = (n_frames, len(hashes))
    got = {
        r["asset_id"]: (r["n_frames"], r["n_distinct_frames"], r["is_static"])
        for r in mm.mm_video_static_screen(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert set(got) == set(expect)
    for aid, (nf, nd) in expect.items():
        assert got[aid][:2] == (nf, nd)
        assert got[aid][2] == (nd == 1)


def test_join_cardinality_bound_is_sound(spark):
    """On real sf0.001 data: the bucketed estimate must upper-bound the
    exact join size, and the exact size must equal the true join row
    count computed independently in DuckDB."""
    import duckdb

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    true_rows = con.execute(
        f"""SELECT count(*) FROM '{sf}/orders.parquet' o
            JOIN '{sf}/lineitem.parquet' l ON l.l_orderkey = o.o_orderkey"""
    ).fetchone()[0]
    r = prof.profile_join_cardinality_bound(spark, sf).collect()[0]
    assert r["actual"] == true_rows
    assert r["est_upper"] >= r["actual"]
    assert r["overestimate_micro"] >= 1_000_000
