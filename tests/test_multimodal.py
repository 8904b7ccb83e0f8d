"""Multimodal plumbing tests: Arrow batch shape, stubbed decode
determinism, and the NotImplementedError gate for real codecs."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from conftest import SF_SMALL
from fortisiem_clickhouse_monitor_spark.operators.multimodal import decode_image


def test_decode_image_stub_is_deterministic():
    payload = b"hello multimodal world!"
    px = decode_image(payload)
    assert px == list(payload[:16])
    assert decode_image(payload) == px


def test_decode_image_real_codec_is_gated():
    with pytest.raises(NotImplementedError, match="image library"):
        decode_image(b"\x89PNG...", codec="image/png")


def test_feature_extract_values(spark):
    out = {
        r["asset_id"]: r
        for r in entrymod.queries()["mm_feature_extract"](spark, SF_SMALL).collect()
    }
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_SMALL}/documents.parquet").collect()
    }
    assert set(out) == set(docs)
    for doc_id in list(docs)[:20]:
        payload = docs[doc_id].encode()
        px = list(payload[:16])
        r = out[doc_id]
        assert r["n_bytes"] == len(payload)
        assert r["pixel_max"] == max(px)
        assert r["pixel_mean"] == pytest.approx(sum(px) / len(px))
