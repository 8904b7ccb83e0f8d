"""Regression tests for sources.tables.table() timestamp normalization —
the bug class that killed round 1's entire benchmark: events.ts arrives
differently depending on the parquet writer (TIMESTAMP(NANOS) → bigint
under nanosAsLong; micros without isAdjustedToUTC → TIMESTAMP_NTZ;
micros with UTC adjustment → TIMESTAMP), and every consumer must see
ONE type that unix_micros() accepts."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from fortisiem_clickhouse_monitor_spark.sources.tables import table

TS = datetime.datetime(2024, 1, 5, 12, 30, 45, 123456)


def _write_events(tmp_path, unit: str, tz: str | None) -> str:
    d = tmp_path / f"events_{unit}_{tz or 'naive'}"
    d.mkdir()
    t = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array([TS], pa.timestamp(unit, tz=tz)),
            "user_id": pa.array([7], pa.int64()),
            "event_type": pa.array(["click"]),
            "value": pa.array([1.5], pa.float64()),
            "props": pa.array(["{}"]),
        }
    )
    pq.write_table(t, str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize(
    "unit,tz",
    [("ns", None), ("us", None), ("us", "UTC")],
    ids=["nanos", "micros-ntz", "micros-utc"],
)
def test_events_ts_normalizes_to_timestamp(spark, tmp_path, unit, tz):
    sf_dir = _write_events(tmp_path, unit, tz)
    ev = table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp", (
        f"writer variant {unit}/{tz} must normalize to TIMESTAMP"
    )
    row = ev.select(
        F.unix_micros("ts").alias("us"), F.col("ts").alias("ts")
    ).collect()[0]
    # session TZ is UTC, so the naive fixture value IS the UTC value
    expect_us = int(TS.replace(tzinfo=datetime.timezone.utc).timestamp() * 1e6)
    assert row["us"] == expect_us
    assert row["ts"] == TS
