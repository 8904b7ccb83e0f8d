"""Streaming near-duplicate screening: new documents arrive as a
stream and are checked against a STATIC MinHash signature index of the
historical corpus — the online admission-control form of the batch
dedup family (operators/dedup.py).

Shape: the stream side computes shingles + MinHash signature + band
keys map-only per micro-batch (the exact expressions the batch query
uses — minhash_doc_sigs / minhash_bands); candidates come from a
stream-static equi-join on (band_id, band_key) against the prebuilt
index; verification is the same exact-Jaccard array intersection.
Stream-static joins need no watermark and no streaming state: each
micro-batch joins against the (broadcastable) index snapshot.

At 100 TB: the historical band index is a bucketed table on
(band_id, band_key) so each micro-batch's join is co-located; the
index is refreshed by appending the accepted batch's band rows (the
keyed-upsert parquet sink in streaming/jobs.py is that refresh path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import minhash_bands, minhash_doc_sigs


def build_band_index(history_docs: DataFrame) -> DataFrame:
    """Static index over the historical corpus: one row per
    (doc_id, band_id, band_key) plus the doc's shingle set for exact
    verification. Built batch; persist or write bucketed by
    (band_id, band_key) before serving a stream."""
    sigs = minhash_doc_sigs(history_docs)
    return (
        minhash_bands(sigs)
        .join(sigs.select("doc_id", "shingles"), "doc_id")
        .select(
            F.col("doc_id").alias("hist_doc_id"),
            "band_id",
            "band_key",
            F.col("shingles").alias("hist_shingles"),
        )
    )


def streaming_near_dup_matches(
    stream_docs: DataFrame, band_index: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """Matches (new_doc_id, hist_doc_id, jaccard) for every streamed
    document whose exact shingle Jaccard against a historical document
    is >= threshold. Candidate generation is LSH-banded (recall bounded
    by the same 8x2 banding as the batch query); precision is exact
    (verified on the true shingle sets). Works on a streaming OR batch
    ``stream_docs`` frame — tests run both and compare."""
    sigs = minhash_doc_sigs(stream_docs)
    bands = minhash_bands(sigs).join(
        sigs.select("doc_id", "shingles"), "doc_id"
    )
    cand = bands.join(band_index, ["band_id", "band_key"])
    inter = F.size(F.array_intersect("shingles", "hist_shingles"))
    uni = F.size("shingles") + F.size("hist_shingles") - inter
    jac = inter.cast("double") / uni
    # NOTE: a pair colliding in several bands appears once per band
    # here. The per-pair dedup belongs in foreachBatch (see
    # near_dup_screen_query): a streamed doc lives in exactly ONE
    # micro-batch, so per-batch dropDuplicates is complete AND keeps
    # zero cross-batch streaming state — a global stream-level
    # dropDuplicates would grow state forever for no extra correctness.
    return cand.select(
        F.col("doc_id").alias("new_doc_id"),
        "hist_doc_id",
        F.round(jac, 4).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


def near_dup_screen_query(
    stream_docs: DataFrame,
    band_index: DataFrame,
    sink,
    threshold: float = 0.5,
):
    """Admission-control StreamingQuery: per micro-batch, emit the
    deduplicated (new_doc_id, hist_doc_id, jaccard) matches to ``sink``
    (a callable taking the deduped batch DataFrame). foreachBatch keeps
    the pair dedup batch-local — bounded state by construction."""
    matches = streaming_near_dup_matches(stream_docs, band_index, threshold)

    def _emit(batch_df: DataFrame, _batch_id: int) -> None:
        sink(batch_df.dropDuplicates(["new_doc_id", "hist_doc_id"]))

    return matches.writeStream.outputMode("append").foreachBatch(_emit)
