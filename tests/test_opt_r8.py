"""Focused equivalence tests for the r8 OPTIMIZATION round's internal
rewrites — each optimization that changed an operator's arithmetic or
expression shape gets a direct bit-identity check here (the oracle gate
already covers the end-to-end results; these pin the building blocks).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from fortisiem_clickhouse_monitor_spark.functions import vectors


def test_cosine_pre_bit_identical_to_cosine(spark):
    """cosine_pre with per-row norms must equal cosine() BIT-exactly —
    the eval-family rewrite moves the two self-norm folds out of the
    pair scan, it must not move the value by even an ulp."""
    rows = [
        ([0.5, -1.0, 2.0, 0.0], [1.5, 0.25, -0.75, 3.0]),
        ([1e-8, 2e8, -3.5, 7.25], [-1.0, 1.0, -1.0, 1.0]),
        ([0.1] * 4, [0.1] * 4),
    ]
    df = spark.createDataFrame(rows, "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>")
    got = df.select(
        vectors.cosine("a", "b").alias("plain"),
        vectors.cosine_pre(
            "a", "b", vectors.norm("a"), vectors.norm("b")
        ).alias("pre"),
    ).collect()
    for r in got:
        assert r["pre"] == r["plain"]  # exact, not approx


def test_cosine_pre_zero_norm_is_null(spark):
    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 2.0])], "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>"
    )
    r = df.select(
        vectors.cosine_pre(
            "a", "b", vectors.norm("a"), vectors.norm("b")
        ).alias("c")
    ).collect()[0]
    assert r["c"] is None


def test_python_norm_fold_matches_spark_aggregate(spark):
    """sim_kcenter folds the center's norm in Python; the left-to-right
    IEEE-double sequence must reproduce the Spark aggregate exactly."""
    vec = [0.125, -2.5, 3.1415926535, 1e-7, -0.333333, 42.0, 0.0, 9.75]
    df = spark.createDataFrame([(vec,)], "v ARRAY<DOUBLE>")
    spark_norm = df.select(vectors.norm("v").alias("n")).collect()[0]["n"]
    acc = 0.0
    for x in vec:
        acc += float(x) * float(x)
    assert math.sqrt(acc) == spark_norm  # exact


@pytest.mark.parametrize(
    "a,b,t",
    [
        ("kitten", "sitting", 3),
        ("kitten", "sitting", 2),
        ("abc", "abc", 0),
        ("Customer#000000001", "Customer#000000101", 2),
        ("Customer#000000001", "Customer#100000101", 2),
        ("", "xyz", 2),
    ],
)
def test_thresholded_levenshtein_equivalence(spark, a, b, t):
    """lev(a, b, t) >= 0  <=>  lev(a, b) <= t, and the value on kept
    rows is the full distance — the predicate rewrite in the linkage /
    edit-distance family relies on exactly this contract."""
    df = spark.createDataFrame([(a, b)], "a STRING, b STRING")
    r = df.select(
        F.levenshtein("a", "b").alias("full"),
        F.levenshtein("a", "b", t).alias("thr"),
    ).collect()[0]
    if r["full"] <= t:
        assert r["thr"] == r["full"]
    else:
        assert r["thr"] == -1


def test_doremi_tdiv_matches_sql_div(spark):
    """corpus_doremi_mixture's driver-side rounds use a truncating
    division helper; it must match Spark's DIV (toward zero) on every
    sign combination — Python's // floors and differs on negatives."""

    def tdiv(a: int, b: int) -> int:
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    cases = [(7, 2), (-7, 2), (7, -2), (-7, -2), (-333333, 16), (1, 3)]
    df = spark.createDataFrame(cases, "a LONG, b LONG")
    got = df.select("a", "b", F.expr("a DIV b").alias("d")).collect()
    for r in got:
        assert tdiv(r["a"], r["b"]) == r["d"], (r["a"], r["b"])


def test_doremi_driver_rounds_match_unrolled_oracle(spark):
    """End-to-end: the driver-side fixed point must still hash-match
    the unrolled-CTE oracle (covered by the gate too; pinned here so a
    future edit to the Python rounds fails fast in unit tests)."""
    from tests.conftest import SF_SMALL

    from fortisiem_clickhouse_monitor_spark.operators.corpus import (
        corpus_doremi_mixture,
    )
    from fortisiem_clickhouse_monitor_spark.registry import all_queries
    from fortisiem_clickhouse_monitor_spark.testing import (
        compare,
        duck_connection,
    )

    con = duck_connection(SF_SMALL)
    try:
        sql = all_queries()["corpus_doremi_mixture"].oracle
        assert compare(corpus_doremi_mixture(spark, SF_SMALL), con, sql) == []
    finally:
        con.close()
