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


def write_artifact_group(parts: dict[str, DataFrame], path: str) -> None:
    """Persist a named group of DataFrames as one on-disk artifact —
    ``{path}/{name}`` parquet per entry.  The 100 TB contract for
    derived structures (ANN indexes, trained codebooks, dedup labels):
    they are WRITTEN once and loaded by every consumer, not recomputed
    per query; a rebuild is an explicit pipeline stage.  Plain parquet
    per part keeps loaders on the vectorized scan + pushdown path and
    the artifact readable by any engine (DuckDB included)."""
    for name, df in parts.items():
        df.write.mode("overwrite").parquet(f"{path}/{name}")


def read_artifact_group(
    spark, path: str, names: tuple[str, ...]
) -> dict[str, DataFrame]:
    """Load the named parts of a :func:`write_artifact_group` artifact."""
    return {n: spark.read.parquet(f"{path}/{n}") for n in names}


def _interleave_bits(a, b, bits: int = 16):
    """Morton (Z-order) code of two columns already rank-mapped into
    [0, 2^bits): interleaves their bits so points close in BOTH
    dimensions land close on the curve."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            .bitwiseOR(F.shiftleft(a.bitwiseAND(F.lit(1 << i)), i))
            .bitwiseOR(F.shiftleft(b.bitwiseAND(F.lit(1 << i)), i + 1))
        )
    return z


def _bucketize(col: str, boundaries: list[float]):
    """Map a numeric column to its bucket index (0..len(boundaries))
    against pre-computed sorted boundaries — a vectorized JVM count of
    boundaries <= value, O(|boundaries|) per row, no shuffle."""
    barr = F.array(*[F.lit(float(b)) for b in boundaries])
    return F.size(F.filter(barr, lambda b: b <= F.col(col).cast("double")))


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 16,
    bits: int = 8,
    mode: str = "overwrite",
) -> None:
    """Z-order clustering on TWO numeric predicate columns: quantile-
    bucket each column into [0, 2^bits) (equi-depth, so skew cannot
    concentrate codes), interleave bits into a Morton code, then
    range-partition + sort files by it.

    Why it matters at 100 TB: hive partitioning prunes on ONE
    dimension; Z-order makes parquet row-group min/max stats selective
    on BOTH columns at once, so scans filtered on either (or both)
    skip most files — the multi-dimensional clustering move
    (Delta/Iceberg OPTIMIZE ZORDER) built from primitives here.

    Deliberately NOT percent_rank over a global window (that is a
    single-partition sort): bucket boundaries come from approxQuantile
    — a sample-based aggregate job — and the per-row mapping is a
    map-side array probe, so the only exchange is the final range
    partition by code."""
    n_buckets = 1 << bits
    qs = [i / n_buckets for i in range(1, n_buckets)]
    d = df.withColumn("_a", F.col(col_a).cast("double")).withColumn(
        "_b", F.col(col_b).cast("double")
    )
    bounds_a, bounds_b = d.approxQuantile(["_a", "_b"], qs, 0.001)

    def code(col: str, bounds: list[float]):
        # Normalize the bucket index to the FULL bit width: a low-
        # cardinality column yields few distinct boundaries, and without
        # rescaling its index would only occupy the low bits — the
        # interleave would then be dominated by the other column's high
        # bits and the "Z" would degenerate into a single-column sort.
        bs = sorted(set(bounds))
        idx = _bucketize(col, bs).cast("double")
        return F.floor(idx * ((n_buckets - 1) / max(len(bs), 1))).cast("long")

    coded = d.withColumn(
        "_z", _interleave_bits(code("_a", bounds_a), code("_b", bounds_b), bits)
    )
    (
        coded.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", "_a", "_b")
        .write.mode(mode)
        .parquet(path)
    )
