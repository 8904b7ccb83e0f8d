"""Multimodal plumbing tests: the PPM encode→decode roundtrip, the
NotImplementedError gate for codecs that need absent libraries, and the
feature-extract values against an independent numpy computation."""

from __future__ import annotations

import numpy as np
import pytest

import __spark_entry__ as entrymod
from conftest import SF_SMALL
from fortisiem_clickhouse_monitor_spark.operators.multimodal import (
    decode_image,
    encode_ppm,
)


def test_ppm_roundtrip_is_deterministic():
    payload = encode_ppm(7, 32, 16)
    assert payload.startswith(b"P6\n32 16\n255\n")
    img = decode_image(payload)
    assert img.shape == (16, 32, 3)
    assert img.dtype == np.uint8
    # byte i == (7*7 + i) % 256
    flat = img.reshape(-1)
    expect = (np.arange(32 * 16 * 3, dtype=np.int64) + 49) % 256
    assert (flat == expect).all()
    assert (decode_image(encode_ppm(7, 32, 16)) == img).all()


def test_decode_image_real_codec_is_gated():
    with pytest.raises(NotImplementedError, match="image library"):
        decode_image(b"\x89PNG...", codec="image/png")


def test_decode_image_rejects_non_ppm():
    with pytest.raises(ValueError, match="P6"):
        decode_image(b"JUNKJUNKJUNK")


def test_feature_extract_values(spark):
    out = {
        r["asset_id"]: r
        for r in entrymod.queries()["mm_feature_extract"](spark, SF_SMALL).collect()
    }
    doc_ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    assert set(out) == set(doc_ids)
    for doc_id in doc_ids[:20]:
        w = (doc_id % 4) * 16 + 16
        h = (doc_id % 3) * 8 + 8
        img = decode_image(encode_ppm(doc_id, w, h))
        flat = img.reshape(-1).astype("int64")
        r = out[doc_id]
        assert r["width"] == w and r["height"] == h
        assert r["n_pixel_bytes"] == w * h * 3
        assert r["pixel_max"] == int(flat.max())
        assert r["pixel_mean"] == pytest.approx(flat.mean(), abs=1e-6)
