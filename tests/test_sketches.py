"""HLL sketch rollup: the merged monthly estimate must stay within
HLL's error envelope of the exact distinct count."""

from __future__ import annotations

from pyspark.sql import functions as F

from fortisiem_clickhouse_monitor_spark import registry
from fortisiem_clickhouse_monitor_spark.sources.tables import table
from tests.conftest import SF_ORACLE


def test_sketch_rollup_close_to_exact(spark):
    got = {
        r["month"]: r["est_users"]
        for r in registry.queries()["sketch_monthly_users_from_daily"](
            spark, SF_ORACLE
        ).collect()
    }
    exact = {
        r["month"]: r["exact_users"]
        for r in table(spark, SF_ORACLE, "events")
        .groupBy(F.date_trunc("month", "ts").alias("month"))
        .agg(F.countDistinct("user_id").alias("exact_users"))
        .collect()
    }
    assert set(got) == set(exact)
    for m, est in got.items():
        assert abs(est - exact[m]) <= max(3, 0.05 * exact[m]), (m, est, exact[m])


def test_misra_gries_planted_heavy_hitters(spark, tmp_path_factory):
    """Adversarial stream: one token at ~40%, one at ~20%, long uniform
    tail. The candidate+verify pipeline must return the exact top-25 by
    count (tie-broken by token) — same contract the oracle checks, but
    on a distribution built to stress the decrement bound."""
    import tempfile

    from fortisiem_clickhouse_monitor_spark import registry

    rows = []
    doc = 0
    for i in range(2000):
        # heavy tokens interleaved with a 1000-token tail
        toks = ["heavy_a", "tail_%d" % (i % 1000)]
        if i % 2 == 0:
            toks.append("heavy_b")
        toks.append("heavy_a")
        rows.append((doc, " ".join(toks), "en", "src1", 0))
        doc += 1
    df = spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    )
    d = tempfile.mkdtemp(prefix="mg_")
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")

    got = registry.queries()["sketch_heavy_hitter_tokens"](spark, d).collect()
    assert got[0]["token"] == "heavy_a" and got[0]["n"] == 4000
    assert got[1]["token"] == "heavy_b" and got[1]["n"] == 1000
    # the tail is uniform at 2 occurrences; exact top-25 still ordered
    # by (count desc, token asc)
    tail = [r["token"] for r in got[2:]]
    assert tail == sorted(tail)
    assert all(r["n"] == 2 for r in got[2:])


def test_jl_projection_norm_preservation(spark):
    """The JL/Achlioptas guarantee actually promised at out_dim=8 is
    UNBIASED squared-norm preservation: E||Px||^2 = ||x||^2, with
    per-vector deviation ~1/sqrt(out_dim). (Pairwise-distance
    correlation is NOT testable here: random high-dim distances
    concentrate, so their spread drowns in projection noise at k=8.)"""
    import numpy as np

    from fortisiem_clickhouse_monitor_spark import registry
    from fortisiem_clickhouse_monitor_spark.sources.tables import table
    from tests.conftest import SF_ORACLE

    proj = registry.queries()["sim_random_projection"](spark, SF_ORACLE).collect()
    raw = {
        r["vec_id"]: np.array(r["embedding"], dtype="float64")
        for r in table(spark, SF_ORACLE, "embeddings").collect()
    }
    ratios = []
    for r in proj:
        x = raw[r["vec_id"]]
        p = np.array([r[f"p{j}"] for j in range(8)])
        nx = np.dot(x, x)
        if nx > 0:
            ratios.append(np.dot(p, p) / nx)
    ratios = np.array(ratios)
    # unbiased in expectation...
    assert abs(ratios.mean() - 1.0) < 0.15, f"norm bias: {ratios.mean()}"
    # ...and concentrated enough to be useful
    assert np.median(np.abs(ratios - 1.0)) < 0.5
