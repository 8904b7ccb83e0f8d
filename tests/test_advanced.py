"""Unit tests for operators/advanced.py and the as-of / range joins —
semantic edge cases the sf-scale oracle diff can't isolate: as-of
strictness and tie-breaks, range-join bucket boundaries, EXCEPT
multiset semantics, and the Jaccard GEMM kernel vs a naive Python
reference on a hand-built block.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from fortisiem_clickhouse_monitor_spark import registry
from tests.conftest import SF_SMALL


def _ts(minute: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(minutes=minute)


EVENTS_COLS = "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING"


def _events_df(spark, rows):
    return spark.createDataFrame(rows, schema=EVENTS_COLS)


def _run_on(spark, name, df):
    """Run a registered events-table query against an injected frame by
    materializing it as a one-table parquet dir."""
    import tempfile

    d = tempfile.mkdtemp(prefix="adv_")
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    return registry.queries()[name](spark, d)


class TestAsofJoin:
    def test_strictly_earlier_and_tiebreak(self, spark):
        rows = [
            # user 1: purchase before click -> picked up
            (1, _ts(0), 1, "purchase", 10.0, "{}"),
            (2, _ts(5), 1, "click", 1.0, "{}"),
            # same-timestamp purchase with HIGHER event_id than the click
            # -> excluded (strictly-earlier by (ts, event_id))
            (3, _ts(5), 1, "purchase", 99.0, "{}"),
            # user 2: click with no prior purchase -> NULL
            (4, _ts(1), 2, "click", 1.0, "{}"),
            # user 2: later click sees the purchase in between
            (5, _ts(2), 2, "purchase", 7.0, "{}"),
            (6, _ts(3), 2, "click", 1.0, "{}"),
        ]
        out = {
            r["click_id"]: r["last_purchase_value"]
            for r in _run_on(
                spark, "join_asof_last_purchase", _events_df(spark, rows)
            ).collect()
        }
        assert out == {2: 10.0, 4: None, 6: 7.0}

    def test_same_ts_lower_event_id_included(self, spark):
        rows = [
            (1, _ts(5), 1, "purchase", 42.0, "{}"),
            (2, _ts(5), 1, "click", 1.0, "{}"),  # purchase id 1 < click id 2
        ]
        out = _run_on(
            spark, "join_asof_last_purchase", _events_df(spark, rows)
        ).collect()
        assert out[0]["last_purchase_value"] == 42.0


class TestRangeJoin:
    def test_window_boundaries(self, spark):
        rows = [
            (1, _ts(0), 1, "error", 0.0, "{}"),
            (2, _ts(0), 1, "view", 0.0, "{}"),    # same instant -> excluded (>)
            (3, _ts(5), 1, "view", 0.0, "{}"),    # exactly +5min -> included (<=)
            (4, _ts(5.001), 1, "view", 0.0, "{}"),  # just past -> excluded
            (5, _ts(3), 2, "view", 0.0, "{}"),    # other user -> excluded
            (6, _ts(4), 1, "click", 0.0, "{}"),   # inside, crosses bucket edge
        ]
        got = sorted(
            r["follow_id"]
            for r in _run_on(
                spark, "join_range_error_burst", _events_df(spark, rows)
            ).collect()
        )
        assert got == [3, 6]

    def test_no_duplicate_pairs_across_buckets(self, spark):
        # error at t=4.9 min: its two covering buckets are [0,5) and [5,10);
        # a follower at t=5.1 must appear exactly once.
        rows = [
            (1, _ts(4.9), 1, "error", 0.0, "{}"),
            (2, _ts(5.1), 1, "view", 0.0, "{}"),
        ]
        got = _run_on(
            spark, "join_range_error_burst", _events_df(spark, rows)
        ).collect()
        assert len(got) == 1 and got[0]["follow_id"] == 2


class TestSetOps:
    def test_except_is_distinct_not_multiset(self, spark, duck_small):
        q = registry.all_queries()["set_except_churned_buyers"]
        spark_rows = sorted(
            r["custkey"] for r in q.fn(spark, SF_SMALL).collect()
        )
        duck_rows = sorted(
            r[0] for r in duck_small.sql(q.oracle).fetchall()
        )
        assert spark_rows == duck_rows
        assert len(spark_rows) == len(set(spark_rows))


class TestJaccardKernel:
    def test_gemm_matches_naive_python(self, spark):
        import tempfile

        texts = [
            (0, "a b c d e", "en", "t", 9),
            (1, "a b c d f", "en", "t", 9),   # J(0,1) = 4/6 < 0.8
            (2, "a b c d e", "en", "t", 9),   # J(0,2) = 1.0
            (3, "a b c d e x", "en", "t", 11),  # J(0,3)=5/6=0.8333 -> kept
            (4, "a b c d e", "fr", "t", 9),   # other lang -> other block
        ]
        df = spark.createDataFrame(
            texts, schema="doc_id LONG, text STRING, lang STRING, source STRING, n_chars INT"
        )
        d = tempfile.mkdtemp(prefix="jac_")
        df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        got = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in registry.queries()["dedup_ngram_jaccard_pairs"](spark, d).collect()
        }
        assert got == {(0, 2): 1.0, (0, 3): 0.8333, (2, 3): 0.8333}

    def test_pivot_explicit_values_zero_fill(self, spark):
        rows = [
            (1, _ts(0), 1, "click", 1.0, "{}"),
            (2, _ts(1), 1, "click", 1.0, "{}"),
            (3, _ts(2), 2, "error", 1.0, "{}"),
        ]
        out = {
            r["user_id"]: (r["click"], r["error"], r["purchase"])
            for r in _run_on(
                spark, "pivot_events_by_type", _events_df(spark, rows)
            ).collect()
        }
        assert out[1] == (2, 0, 0)
        assert out[2] == (0, 1, 0)
