"""Property-based tests (SURVEY §5.4) for the keeper key-value parsers:
the F5/F6 split + type-inference ladder must agree with a direct
Python reference implementation on arbitrary line content.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from fortisiem_clickhouse_monitor_spark.plans import keeper

# printable, no newlines (line frames are single lines by construction)
_KEY = st.text(
    st.characters(min_codepoint=32, max_codepoint=126, exclude_characters=":="),
    min_size=1,
    max_size=20,
)
_VAL = st.one_of(
    st.integers(min_value=0, max_value=10**15).map(str),
    st.sampled_from(["true", "false", "True", "FALSE"]),
    st.text(
        st.characters(min_codepoint=32, max_codepoint=126),
        max_size=30,
    ),
)


def _expected(key: str, val: str):
    """Pure-Python reference of the inference ladder
    (chStats.py:227-238 semantics)."""
    norm_key = key.replace(" ", "_").lower()
    if val.isdigit():
        return norm_key, val, int(val), None, "int"
    if val.lower() == "true":
        return norm_key, val, None, True, "bool"
    if val.lower() == "false":
        return norm_key, val, None, False, "bool"
    return norm_key, val, None, None, "str"


@settings(max_examples=30, deadline=None)
@given(kvs=st.lists(st.tuples(_KEY, _VAL), min_size=1, max_size=8))
def test_colon_parser_matches_reference(spark, kvs):
    rows = [("n1", f"{k}: {v}") for k, v in kvs]
    df = spark.createDataFrame(rows, schema="node_ip STRING, line STRING")
    got = [
        (r["key"], r["val_str"], r["val_int"], r["val_bool"], r["val_type"])
        for r in keeper._kv_parse(df, keeper._KV_COLON).collect()
    ]
    expected = [_expected(k, v) for k, v in kvs]
    assert sorted(got, key=str) == sorted(expected, key=str)


@settings(max_examples=30, deadline=None)
@given(kvs=st.lists(st.tuples(_KEY, _VAL), min_size=1, max_size=8))
def test_equals_parser_matches_reference(spark, kvs):
    rows = [("n1", f"{k}={v}") for k, v in kvs]
    df = spark.createDataFrame(rows, schema="node_ip STRING, line STRING")
    got = [
        (r["key"], r["val_str"], r["val_int"], r["val_bool"], r["val_type"])
        for r in keeper._kv_parse(df, keeper._KV_EQ).collect()
    ]
    expected = [_expected(k, v) for k, v in kvs]
    assert sorted(got, key=str) == sorted(expected, key=str)


def test_garbage_lines_dropped(spark):
    df = spark.createDataFrame(
        [("n1", "no separator here"), ("n1", "k: v")],
        schema="node_ip STRING, line STRING",
    )
    out = keeper._kv_parse(df, keeper._KV_COLON).collect()
    assert len(out) == 1 and out[0]["key"] == "k"
