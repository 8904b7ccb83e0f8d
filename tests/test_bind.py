"""Semantics of sources.tables.bind: the Generate barrier must be
value-transparent — identical rows to plain withColumn — across nulls,
empty arrays, empty frames, and multi-column binds."""

from __future__ import annotations

from pyspark.sql import functions as F

from fortisiem_clickhouse_monitor_spark.sources.tables import bind


def test_bind_matches_withcolumn(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, ""), (3, None), (4, "  ")],
        "id long, text string",
    )
    expr = F.split(F.coalesce(F.trim("text"), F.lit("")), r"\s+")
    via_bind = bind(df, toks=expr).orderBy("id").collect()
    via_wc = df.withColumn("toks", expr).orderBy("id").collect()
    assert via_bind == via_wc
    assert len(via_bind) == 4  # no rows lost to the explode


def test_bind_multiple_columns_one_generate(spark):
    df = spark.createDataFrame([(1, 10), (2, 20)], "id long, v long")
    out = bind(df, double=F.col("v") * 2, name=F.concat(F.lit("k"), "id"))
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["double"] == 20 and rows[1]["name"] == "k1"
    assert rows[2]["double"] == 40 and rows[2]["name"] == "k2"
    # exactly one Generate for the whole bind
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Generate") == 1


def test_bind_on_empty_frame(spark):
    df = spark.createDataFrame([], "id long, v long")
    assert bind(df, w=F.col("v") + 1).count() == 0


def test_bind_preserves_partitioning_no_exchange(spark):
    df = spark.range(100).repartition(8, "id")
    out = bind(df, y=F.col("id") * 3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the hash repartition exchange, nothing added by bind
    assert plan.count("Exchange") == 1


def test_bound_column_usable_in_downstream_lambda(spark):
    df = spark.createDataFrame([(1, [1.0, 2.0, 3.0])], "id long, v array<double>")
    b = bind(df, s=F.aggregate("v", F.lit(0.0), lambda a, x: a + x))
    out = b.select(
        F.transform("v", lambda x: x / F.col("s")).alias("frac")
    ).collect()[0]["frac"]
    assert [round(x, 6) for x in out] == [0.166667, 0.333333, 0.5]
