"""Streaming near-dup screening (streaming/neardup.py): stream-static
LSH band join against a historical signature index; streaming result
must equal the batch evaluation of the same expressions."""

from __future__ import annotations

import pytest

DOCS_SCHEMA = (
    "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
)

_HIST = [
    (100, "the quick brown fox jumps over the lazy dog again and again", "en", "h", 60),
    (101, "completely different historical content about spark shuffles", "en", "h", 60),
    (102, "a third document with its own unique words and phrasing", "en", "h", 55),
]

# doc 1 = near-copy of 100 (one token changed); 2 = unrelated; 3 = near-copy of 102
_NEW_BATCH1 = [
    (1, "the quick brown fox jumps over the lazy cat again and again", "en", "s", 60),
    (2, "nothing in common with anything stored before at all today", "en", "s", 58),
]
_NEW_BATCH2 = [
    (3, "a third document with its own unique words and phrasing", "en", "s", 55),
]


@pytest.fixture(scope="module")
def band_index(spark):
    from fortisiem_clickhouse_monitor_spark.streaming.neardup import (
        build_band_index,
    )

    hist = spark.createDataFrame(_HIST, DOCS_SCHEMA)
    return build_band_index(hist).persist()


def _expected_pairs():
    return {(1, 100), (3, 102)}


def test_batch_mode_finds_planted_near_dups(spark, band_index):
    from fortisiem_clickhouse_monitor_spark.streaming.neardup import (
        streaming_near_dup_matches,
    )

    new = spark.createDataFrame(_NEW_BATCH1 + _NEW_BATCH2, DOCS_SCHEMA)
    rows = (
        streaming_near_dup_matches(new, band_index)
        .dropDuplicates(["new_doc_id", "hist_doc_id"])
        .collect()
    )
    got = {(r.new_doc_id, r.hist_doc_id) for r in rows}
    assert got == _expected_pairs()
    jac = {(r.new_doc_id, r.hist_doc_id): r.jaccard for r in rows}
    assert jac[(3, 102)] == 1.0  # exact copy
    assert 0.5 <= jac[(1, 100)] < 1.0  # one token changed


def test_streaming_matches_batch(spark, band_index, tmp_path_factory):
    from fortisiem_clickhouse_monitor_spark.streaming.neardup import (
        near_dup_screen_query,
    )

    d = tmp_path_factory.mktemp("neardup_stream")
    spark.createDataFrame(_NEW_BATCH1, DOCS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(d / "b1"))
    spark.createDataFrame(_NEW_BATCH2, DOCS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(d / "b2"))
    # one arriving-files dir: move parquet parts up
    import shutil

    files = sorted(
        str(p) for sub in ("b1", "b2") for p in (d / sub).glob("*.parquet")
    )
    for i, f in enumerate(files):
        shutil.copy(f, str(d / f"in_{i}.parquet"))

    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    collected = []
    q = near_dup_screen_query(
        stream, band_index, lambda batch: collected.extend(batch.collect())
    ).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r.new_doc_id, r.hist_doc_id) for r in collected}
    assert got == _expected_pairs()
    # per-batch dedup: no pair reported twice
    assert len(collected) == len(got)
