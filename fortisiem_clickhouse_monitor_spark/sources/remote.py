"""Out-of-process source wiring: JDBC (ClickHouse system tables) and a
generic socket line source.

The reference reads live systems — SQL-over-HTTP against ClickHouse
(chStats.py:31-41), a TCP four-letter-word protocol against Keeper
(chStats.py:531-533), Redis hashes (chStats.py:52-75). In this sandbox
those endpoints do not exist, so every registered query runs on the
parquet/fixture stand-ins per SURVEY §2.1 — but the Spark-side wiring
for the real thing belongs in the engine, and this module is it:

- :func:`jdbc_table` builds the actual ``spark.read.format("jdbc")``
  plan, with predicate-pushdown-friendly ``dbtable``-subquery wiring
  and partitioned parallel reads — swap in a reachable URL + driver jar
  and every plans/health.py pipeline runs against live system tables by
  replacing its ``table()`` call.
- :func:`socket_lines_stream` is the Structured Streaming socket source
  (``readStream.format("socket")``) for the Keeper-style line protocol,
  feeding the same parsers plans/keeper.py applies to text fixtures.

Everything here is lazy: plans are CONSTRUCTED without a live endpoint;
failures surface only on materialization (standard Spark source
semantics), which is what makes the wiring unit-testable in-sandbox.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: ClickHouse's own JDBC driver class (public com.clickhouse artifact).
CLICKHOUSE_DRIVER = "com.clickhouse.jdbc.ClickHouseDriver"


def jdbc_table(
    spark: SparkSession,
    url: str,
    query: str,
    *,
    driver: str = CLICKHOUSE_DRIVER,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    fetch_size: int = 10_000,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """JDBC scan of ``query`` (a SELECT, wrapped as a dbtable subquery
    so the remote engine evaluates it and Spark's column pruning /
    filter pushdown compose on top).

    Partitioned reads: pass ``partition_column``/bounds to split the
    scan into ``num_partitions`` parallel range queries — the JDBC
    equivalent of parquet split planning; without them the scan is one
    task (fine for system tables, wrong for facts)."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", f"({query}) AS src")
        .option("driver", driver)
        .option("fetchsize", str(fetch_size))
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partition_column requires lower_bound and upper_bound"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def socket_lines_stream(
    spark: SparkSession, host: str, port: int
) -> DataFrame:
    """Streaming line source (``value STRING`` rows) for the Keeper
    four-letter-word protocol: connect, stream response lines, feed the
    same key:value / table parsers plans/keeper.py runs over fixtures."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
