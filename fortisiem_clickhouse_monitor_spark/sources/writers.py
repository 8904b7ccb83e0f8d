"""Table-layout writers: the output half of the 100 TB story.

The reference's only sinks are UDP datagrams and pretty-printed JSON
(chStats.py:481-483, 738-744); an analytics engine that *stores* data
needs layout control, because at scale the write layout IS the read
plan:

- `write_partitioned`: hive-style directory partitioning (e.g. events
  by day) → static + dynamic partition pruning on read; time-range
  queries touch only their days.
- `write_bucketed`: hash-bucketed + sorted table → joins/aggregations
  on the bucket key need NO shuffle at read time (verified by
  tests/test_writers.py, which asserts the bucketed self-join plans
  with zero Exchange nodes).
- `compact`: explicit small-file compaction via repartition — the
  maintenance pass that keeps file counts sane after streaming appends.

All writers funnel through the built-in parquet datasource, so
readers keep vectorized scans, pushdown, and pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned parquet. Partition columns should be
    low-cardinality derivatives (day, event_type) — one directory per
    value; a 100 TB events table partitioned by day keeps any
    time-ranged scan proportional to the range, not the table."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def with_day(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Standard day-derivation for time-partitioned layouts."""
    return df.withColumn("day", F.to_date(ts_col))


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Hash-bucketed (and optionally sorted) managed table. Two tables
    bucketed identically on their join key co-locate: Catalyst drops
    the Exchange on both sides, so repeated fact⋈fact joins pay the
    shuffle ONCE at write time instead of per query. Bucket count is a
    layout decision: at 100 TB pick buckets ≈ cluster cores so each
    bucket is one task."""
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table_name)


def compact(df: DataFrame, path: str, target_files: int) -> None:
    """Rewrite a directory at a controlled file count. Streaming
    micro-batches leave many small files; periodic compaction restores
    scan efficiency (row-group-sized files, fewer tasks)."""
    df.repartition(target_files).write.mode("overwrite").parquet(path)
