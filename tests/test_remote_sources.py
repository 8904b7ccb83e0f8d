"""Out-of-process source wiring tests (sandbox has no live endpoints):
plans must CONSTRUCT lazily, carry the right options, and fail only at
materialization with the standard source errors — proving the calls
reach Spark's JDBC/socket layers rather than short-circuiting."""

from __future__ import annotations

import time

import pytest
from py4j.protocol import Py4JJavaError
from pyspark.errors.exceptions.captured import (
    AnalysisException,
    StreamingQueryException,
)

from fortisiem_clickhouse_monitor_spark.sources import remote


def test_jdbc_plan_requires_bounds_with_partition_column(spark):
    with pytest.raises(ValueError, match="lower_bound"):
        remote.jdbc_table(
            spark,
            "jdbc:clickhouse://ch:8123/system",
            "SELECT * FROM system.replicas",
            partition_column="shard_num",
        )


def test_jdbc_materialization_reaches_driver_loading(spark):
    """Construction + load must reach the JVM's JDBC driver resolution
    (ClassNotFound for the absent ClickHouse jar) — not fail earlier in
    our own code."""
    with pytest.raises((Py4JJavaError, AnalysisException)) as ei:
        remote.jdbc_table(
            spark,
            "jdbc:clickhouse://ch:8123/system",
            "SELECT database, table FROM system.replicas",
            partition_column="shard_num",
            lower_bound=0,
            upper_bound=8,
        )
    assert "ClickHouseDriver" in str(ei.value)


def test_socket_stream_constructs_lazily_and_fails_on_start(spark, tmp_path):
    df = remote.socket_lines_stream(spark, "keeper.invalid", 2181)
    assert df.isStreaming and [f.name for f in df.schema.fields] == ["value"]
    q = (
        df.writeStream.format("memory")
        .queryName("t_socket_probe")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    # Poll q.exception() with a deadline rather than relying on
    # awaitTermination/processAllAvailable to raise: on a slow DNS or
    # connect-timeout path neither raises inside a fixed window.
    deadline = time.time() + 90
    exc = None
    while time.time() < deadline:
        exc = q.exception()
        if exc is not None:
            break
        time.sleep(0.5)
    q.stop()
    assert isinstance(exc, StreamingQueryException)


# ---------------------------------------------------------------------------
# Sink side
# ---------------------------------------------------------------------------


def test_jdbc_batch_writer_reaches_driver_loading(spark):
    """The foreachBatch JDBC writer must build a real JDBC write plan:
    materializing against an absent jar fails in driver resolution,
    not earlier in our code — and the version stamp is applied."""
    sink = remote.jdbc_batch_writer(
        "jdbc:clickhouse://ch:8123/default",
        "events_state",
        key_cols=["user_id"],
        order_col="ts",
    )
    df = spark.createDataFrame(
        [(1, 2, 10.0), (1, 3, 11.0)], "user_id LONG, ts LONG, v DOUBLE"
    )
    with pytest.raises((Py4JJavaError, AnalysisException)) as ei:
        sink(df, 7)
    assert "ClickHouseDriver" in str(ei.value)


def _sqlite_connect_factory(path: str):
    def connect():
        import sqlite3

        con = sqlite3.connect(path, timeout=60)
        con.execute("PRAGMA busy_timeout=60000")
        return con

    return connect


@pytest.fixture()
def sqlite_state(tmp_path):
    import sqlite3

    path = str(tmp_path / "state.db")
    con = sqlite3.connect(path)
    con.execute(
        "CREATE TABLE user_state ("
        "user_id INTEGER PRIMARY KEY, ts INTEGER, v DOUBLE)"
    )
    con.commit()
    con.close()
    return path


def _read_state(path: str) -> dict[int, tuple[int, float]]:
    import sqlite3

    con = sqlite3.connect(path)
    try:
        rows = con.execute(
            "SELECT user_id, ts, v FROM user_state"
        ).fetchall()
    finally:
        con.close()
    return {r[0]: (r[1], r[2]) for r in rows}


def test_dbapi_sink_upsert_replay_and_last_writer_wins(spark, sqlite_state):
    """Exactly-once-per-key by idempotence: a replayed batch rewrites
    the same state; within a batch the greatest-ts row wins."""
    sink = remote.dbapi_batch_sink(
        _sqlite_connect_factory(sqlite_state),
        "user_state",
        ["user_id"],
        order_col="ts",
    )
    b0 = spark.createDataFrame(
        [(1, 10, 1.0), (1, 20, 2.0), (2, 5, 9.0)],
        "user_id LONG, ts LONG, v DOUBLE",
    )
    b1 = spark.createDataFrame(
        [(2, 30, 99.0), (3, 1, 7.0)], "user_id LONG, ts LONG, v DOUBLE"
    )
    sink(b0, 0)
    sink(b1, 1)
    sink(b1, 1)  # replay after simulated recovery
    assert _read_state(sqlite_state) == {
        1: (20, 2.0),
        2: (30, 99.0),
        3: (1, 7.0),
    }


def test_dbapi_sink_from_streaming_query(spark, sqlite_state, tmp_path):
    """North-star wiring end-to-end: Structured Streaming foreachBatch
    through the database sink equals the batch groupBy-argmax, and a
    full second run of the same source is a no-op on final state."""
    from conftest import SF_SMALL
    from fortisiem_clickhouse_monitor_spark.sources.tables import table
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    (
        table(spark, SF_SMALL, "events")
        .select(
            "user_id",
            F.unix_micros("ts").alias("ts"),
            F.col("value").cast("double").alias("v"),
        )
        .repartition(4)
        .write.parquet(src)
    )
    sink = remote.dbapi_batch_sink(
        _sqlite_connect_factory(sqlite_state),
        "user_state",
        ["user_id"],
        order_col="ts",
    )

    def run(chk: str) -> None:
        stream = (
            spark.readStream.schema("user_id LONG, ts LONG, v DOUBLE")
            .option("maxFilesPerTrigger", "2")
            .parquet(src)
        )
        q = (
            stream.writeStream.foreachBatch(sink)
            .trigger(availableNow=True)
            .option("checkpointLocation", chk)
            .start()
        )
        q.awaitTermination(120)

    run(str(tmp_path / "chk1"))
    got = _read_state(sqlite_state)

    batch = (
        spark.read.parquet(src)
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.col("ts").desc())
            ),
        )
        .filter("_rn = 1")
    )
    want = {
        r["user_id"]: (r["ts"], r["v"]) for r in batch.collect()
    }
    assert got == want

    # Fresh checkpoint -> every batch replays; state must be unchanged.
    run(str(tmp_path / "chk2"))
    assert _read_state(sqlite_state) == want
