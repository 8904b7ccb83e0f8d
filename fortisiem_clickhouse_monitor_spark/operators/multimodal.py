"""Multimodal columns (north-star extension): image/audio/video as
opaque ``binary`` columns with typed metadata, plus Pandas-batched
decode / feature-extract / frame-sample plumbing.

The container has no image/audio libraries, so the actual codec step is
STUBBED (docs/PERF_NOTES.md rationale: plumbing — schema, partitioning,
Arrow batch shape, UDF signatures — is what must be real and tested; the
decode body is replaceable). `decode_image` raises NotImplementedError
when a real codec is requested; the default deterministic fake derives
"pixels" from the bytes so tests have exact expected values.

Scale: binary payloads ride through Spark as columnar Arrow binary —
mapInPandas streams record batches, so executor memory is bounded by
batch size (spark.sql.execution.arrow.maxRecordsPerBatch), not by file
count; metadata predicates (width/height/codec) prune before any decode.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import table


def with_synthetic_binary(docs: DataFrame) -> DataFrame:
    """documents → multimodal-shaped frame: an opaque binary payload
    (utf-8 of the text, standing in for image bytes) + typed metadata."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("fake/raw").alias("codec"),
            (F.pmod(F.col("doc_id"), F.lit(4)) * 160 + 320).cast("int").alias("width"),
            (F.pmod(F.col("doc_id"), F.lit(3)) * 120 + 240).cast("int").alias("height"),
            F.col("n_chars").cast("long").alias("n_bytes_claimed"),
        ).alias("meta"),
    )


@register(
    "mm_asset_metadata",
    oracle="""
    SELECT doc_id AS asset_id,
           octet_length(encode(text)) AS n_bytes,
           CAST((doc_id % 4) * 160 + 320 AS INTEGER) AS width,
           CAST((doc_id % 3) * 120 + 240 AS INTEGER) AS height,
           CAST((doc_id % 4) * 160 + 320 AS INTEGER)
             * CAST((doc_id % 3) * 120 + 240 AS INTEGER) AS n_pixels
    FROM documents
    """,
    tags=("MM",),
)
def mm_asset_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata projection over binary assets: payload size and
    derived pixel count — the predicate columns a decode stage would be
    pruned by (filter on width/height BEFORE touching bytes)."""
    mm = with_synthetic_binary(table(spark, sf_dir, "documents"))
    return mm.select(
        "asset_id",
        F.octet_length("payload").alias("n_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        (F.col("meta.width").cast("long") * F.col("meta.height")).alias("n_pixels"),
    )


@register(
    "mm_frame_sample",
    oracle="""
    SELECT doc_id AS asset_id, u.frame_idx
    FROM (
      SELECT doc_id, CAST(doc_id % 3 + 2 AS INTEGER) AS n_frames
      FROM documents
    ), unnest(range(0, n_frames * 10, 10)) AS u(frame_idx)
    """,
    tags=("MM",),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for video-shaped assets: every 10th frame index up
    to the asset's frame count — sequence + explode, no decode needed."""
    d = table(spark, sf_dir, "documents")
    n_frames = (F.pmod(F.col("doc_id"), F.lit(3)) + 2).cast("int")
    idxs = F.sequence(F.lit(0), (n_frames * 10) - 10, F.lit(10))
    return d.select(
        F.col("doc_id").alias("asset_id"),
        F.explode(idxs).alias("frame_idx"),
    ).select("asset_id", F.col("frame_idx").cast("long"))


def decode_image(payload: bytes, codec: str = "fake/raw") -> list[int]:
    """Stubbed decode step. A real deployment would dispatch on codec to
    PIL/opencv/ffmpeg; this container has none of them, so only the
    deterministic fake codec is implemented (first 16 byte values as
    'pixels') and anything else is explicit."""
    if codec != "fake/raw":
        raise NotImplementedError(
            f"codec {codec!r} requires an image library not present in this "
            "environment; only the deterministic 'fake/raw' stub is available"
        )
    return list(payload[:16])


@register("mm_feature_extract", oracle=None, tags=("MM", "UDF"))
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    mapInPandas: decode (stub) → mean/max 'pixel' + byte length. The
    batch iterator shape is the real contract — a codec swap touches
    only decode_image. Rows-only check (the stub is not SQL-expressible
    in DuckDB); exact values are unit-tested in tests/test_multimodal.py."""
    import pandas as pd

    mm = with_synthetic_binary(table(spark, sf_dir, "documents"))
    src = mm.select("asset_id", "payload", F.col("meta.codec").alias("codec"))

    schema = "asset_id LONG, n_bytes LONG, pixel_mean DOUBLE, pixel_max LONG"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pixels = [
                decode_image(bytes(p), c)
                for p, c in zip(pdf["payload"], pdf["codec"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "pixel_mean": [
                        float(sum(px)) / len(px) if px else None for px in pixels
                    ],
                    "pixel_max": [max(px) if px else None for px in pixels],
                }
            )

    return src.mapInPandas(extract, schema=schema)
