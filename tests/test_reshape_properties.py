"""Property-based checks (SURVEY.md §5 strategy #4): nest→explode is the
identity, and empty-string dropping matches NULL-drop under to_json.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),          # group key
        st.integers(min_value=-1000, max_value=1000),   # payload a
        st.text(alphabet="abc", max_size=3),            # payload b
    ),
    min_size=1,
    max_size=25,
    unique=True,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_rows)
def test_nest_explode_roundtrip_identity(spark, rows):
    df = spark.createDataFrame(rows, "k INT, a INT, b STRING")
    nested = df.groupBy("k").agg(
        F.collect_list(F.struct("a", "b")).alias("items")
    )
    back = nested.select("k", F.explode("items").alias("it")).select(
        "k", F.col("it.a").alias("a"), F.col("it.b").alias("b")
    )
    assert sorted(map(tuple, back.collect())) == sorted(rows)


def test_remove_empty_keys_equals_null_drop(spark):
    """chStats.py:63-64 drops '' dict values; NULLing empties + to_json
    (which omits nulls) produces the same documents."""
    df = spark.createDataFrame(
        [("x", ""), ("y", "v"), ("z", None)], "k STRING, v STRING"
    )
    out = df.select(
        F.to_json(
            F.struct(
                "k",
                F.when(F.col("v") == "", None).otherwise(F.col("v")).alias("v"),
            )
        ).alias("j")
    ).collect()
    got = sorted(r["j"] for r in out)
    assert got == ['{"k":"x"}', '{"k":"y","v":"v"}', '{"k":"z"}']
