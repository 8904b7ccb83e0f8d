"""Out-of-process source wiring tests (sandbox has no live endpoints):
plans must CONSTRUCT lazily, carry the right options, and fail only at
materialization with the standard source errors — proving the calls
reach Spark's JDBC/socket layers rather than short-circuiting."""

from __future__ import annotations

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
    with pytest.raises(StreamingQueryException):
        q.awaitTermination(30)
        q.processAllAvailable()
    q.stop()
