"""Multi-format source tests: the same rows written as CSV / JSON-lines
/ ORC must read back identical to the parquet source, and the
quarantine reader must separate dirty rows without dropping clean
ones."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMALL
from fortisiem_clickhouse_monitor_spark.sources import formats
from fortisiem_clickhouse_monitor_spark.sources.tables import table

SCHEMA = (
    "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING,"
    " value DOUBLE, props STRING"
)
COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


@pytest.fixture(scope="module")
def sample(spark):
    return (
        table(spark, SF_SMALL, "events")
        .select(*COLS)
        .orderBy("event_id")
        .limit(50)
        .cache()
    )


def _assert_same(got, expect):
    assert sorted(map(tuple, got.select(*COLS).collect())) == sorted(
        map(tuple, expect.select(*COLS).collect())
    )


def test_csv_roundtrip(spark, sample, tmp_path):
    out = str(tmp_path / "ev_csv")
    (
        sample.withColumn(
            "ts", F.date_format("ts", formats.TS_FORMAT)
        ).write.option("header", "true").csv(out)
    )
    _assert_same(formats.read_csv(spark, out, SCHEMA), sample)


def test_jsonl_roundtrip(spark, sample, tmp_path):
    out = str(tmp_path / "ev_json")
    sample.withColumn("ts", F.date_format("ts", formats.TS_FORMAT)).write.json(out)
    _assert_same(formats.read_jsonl(spark, out, SCHEMA), sample)


def test_orc_roundtrip(spark, sample, tmp_path):
    out = str(tmp_path / "ev_orc")
    sample.write.orc(out)
    _assert_same(formats.read_orc(spark, out, SCHEMA), sample)


def test_quarantine_separates_dirty_rows(spark, tmp_path):
    p = tmp_path / "dirty"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"event_id": 1, "user_id": 7, "event_type": "click", "value": 1.5}\n'
        'this is not json\n'
        '{"event_id": 2, "user_id": 8, "event_type": "view", "value": 2.5}\n'
    )
    df = formats.permissive_with_quarantine(
        spark,
        str(p),
        "event_id LONG, user_id LONG, event_type STRING, value DOUBLE",
    ).cache()
    clean = df.filter(F.col("_corrupt").isNull())
    dirty = df.filter(F.col("_corrupt").isNotNull())
    assert {r["event_id"] for r in clean.collect()} == {1, 2}
    assert dirty.count() == 1
    assert "not json" in dirty.collect()[0]["_corrupt"]
