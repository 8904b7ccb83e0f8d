"""Salting utilities must be result-identical to their unsalted forms
on skewed data (one key owning ~90% of rows)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fortisiem_clickhouse_monitor_spark.functions import skew


def _skewed_fact(spark, n=20_000):
    # ~90% of rows land on key 7
    return spark.range(n).select(
        F.col("id").alias("row_id"),
        F.when(F.pmod("id", F.lit(10)) < 9, F.lit(7))
        .otherwise(F.pmod("id", F.lit(100)))
        .cast("long")
        .alias("k"),
        (F.col("id") * 2).alias("payload"),
    )


def _dim(spark):
    return spark.range(100).select(
        F.col("id").alias("dk"), F.concat(F.lit("name_"), "id").alias("dname")
    )


def test_salted_join_matches_plain_join(spark):
    fact = _skewed_fact(spark)
    dim = _dim(spark)
    plain = fact.join(dim, fact["k"] == dim["dk"]).select("row_id", "dname")
    salted = skew.salted_join(
        fact, dim, "k", "dk", n_salts=8, salt_source="row_id"
    ).select("row_id", "dname")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_left_outer(spark):
    fact = _skewed_fact(spark, n=2_000)
    dim = _dim(spark).filter(F.col("dk") < 50)  # some fact keys unmatched
    plain = fact.join(dim, fact["k"] == dim["dk"], "left").select("row_id", "dname")
    salted = skew.salted_join(
        fact, dim, "k", "dk", n_salts=4, salt_source="row_id", how="left"
    ).select("row_id", "dname")
    assert sorted(
        map(tuple, salted.collect()), key=lambda t: (t[0], t[1] or "")
    ) == sorted(map(tuple, plain.collect()), key=lambda t: (t[0], t[1] or ""))


def test_salted_collect_list_matches_plain(spark):
    fact = _skewed_fact(spark, n=5_000)
    plain = fact.groupBy("k").agg(
        F.array_sort(F.collect_list("payload")).alias("values")
    )
    salted = skew.salted_collect_list(fact, "k", "payload", n_salts=8, salt_source="row_id")
    p = {r["k"]: r["values"] for r in plain.collect()}
    s = {r["k"]: r["values"] for r in salted.collect()}
    assert p == s


def test_salt_distribution_spreads_hot_key(spark):
    fact = _skewed_fact(spark)
    salted = fact.withColumn("s", skew._salt_of("row_id", 8))
    per_salt = (
        salted.filter(F.col("k") == 7).groupBy("s").count().collect()
    )
    counts = [r["count"] for r in per_salt]
    assert len(counts) == 8  # hot key uses every salt bucket
    assert max(counts) < sum(counts) * 0.25  # no bucket owns the key
