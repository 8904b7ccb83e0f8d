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

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

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


# ---------------------------------------------------------------------------
# Sink side: streaming -> database (the BASELINE.json north star is
# "Spark Structured Streaming + ClickHouse sink"; the reference's sink
# side is the UDP fan-out at chStats.py:413-483 — this is its durable
# database twin).
# ---------------------------------------------------------------------------


def _latest_per_key(
    batch_df: DataFrame, key_cols: list[str], order_col: str | None
) -> DataFrame:
    """Last-writer-wins within a micro-batch: keep one row per key,
    the one with the greatest ``order_col`` (deterministic tie-break on
    the key itself).  Without an order column the batch is assumed
    pre-deduplicated by the caller (e.g. a groupBy upstream)."""
    if order_col is None:
        return batch_df
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).desc())
    return (
        batch_df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def jdbc_batch_writer(
    url: str,
    table: str,
    *,
    driver: str = CLICKHOUSE_DRIVER,
    key_cols: list[str] | None = None,
    order_col: str | None = None,
    batch_size: int = 50_000,
    options: dict[str, str] | None = None,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` JDBC sink (ClickHouse wiring).

    Exactly-once-per-key WITHOUT coordinator transactions: every row is
    appended stamped with ``_version = batch_id``; the target is a
    ClickHouse ReplacingMergeTree(_version) ORDER BY (key), so a
    REPLAYED micro-batch after failure recovery re-inserts identical
    (key, _version) rows that collapse away at merge — idempotence at
    the storage layer, the standard CH streaming-ingest contract.
    Each Spark partition opens its own JDBC connection and appends in
    parallel (``mode("append")`` fan-out), so ingest scales with the
    executor count, not the driver.

    Usage::

        q = (df.writeStream
               .foreachBatch(jdbc_batch_writer(url, "events_state",
                                               key_cols=["user_id"],
                                               order_col="ts"))
               .option("checkpointLocation", chk).start())
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        out = _latest_per_key(batch_df, key_cols or [], order_col)
        writer = (
            out.withColumn("_version", F.lit(batch_id))
            .write.format("jdbc")
            .option("url", url)
            .option("dbtable", table)
            .option("driver", driver)
            .option("batchsize", str(batch_size))
            .option("isolationLevel", "NONE")  # CH has no txns; plain append
        )
        for k, v in (options or {}).items():
            writer = writer.option(k, v)
        writer.mode("append").save()

    return write


def dbapi_batch_sink(
    connect: Callable[[], object],
    table: str,
    key_cols: list[str],
    *,
    order_col: str | None = None,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` sink over any DB-API 2.0 connection factory —
    the driver-jar-free twin of :func:`jdbc_batch_writer`, and the
    shape a ClickHouse NATIVE-protocol sink takes (clickhouse-driver's
    ``Client.execute`` is DB-API-ish executemany).

    Scale contract: the upsert runs in ``foreachPartition`` on the
    EXECUTORS — each partition opens its own connection and upserts its
    rows; nothing is collected to the driver.  Exactly-once-per-key by
    idempotence: the statement is ``INSERT ... ON CONFLICT(key) DO
    UPDATE`` (sqlite/duckdb/postgres dialect), so a replayed batch
    rewrites the same final state.  ``connect`` must be picklable
    (top-level function or simple closure): it is invoked inside the
    Python worker, never on the driver.
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        out = _latest_per_key(batch_df, key_cols, order_col)
        cols = out.columns
        non_keys = [c for c in cols if c not in key_cols]
        set_clause = ", ".join(f"{c}=excluded.{c}" for c in non_keys)
        sql = (
            f"INSERT INTO {table} ({', '.join(cols)}) "
            f"VALUES ({', '.join('?' for _ in cols)}) "
            f"ON CONFLICT({', '.join(key_cols)}) DO UPDATE SET {set_clause}"
        )
        if order_col is not None:
            # Monotone guard: an out-of-order or replayed row with an
            # older order_col never regresses committed state — this is
            # what makes the sink exactly-once-per-key regardless of
            # micro-batch arrival order.
            sql += f" WHERE excluded.{order_col} > {table}.{order_col}"

        def upsert_partition(rows) -> None:
            batch = [tuple(r) for r in rows]
            if not batch:
                return
            con = connect()
            try:
                cur = con.cursor()
                cur.executemany(sql, batch)
                con.commit()
            finally:
                con.close()

        out.foreachPartition(upsert_partition)

    return write
