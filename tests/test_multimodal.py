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


def test_dhash64_constant_and_monotone_images():
    from fortisiem_clickhouse_monitor_spark.operators.multimodal import dhash64

    # constant image: no adjacent difference -> all bits 0
    flat = np.full((16, 32, 3), 128, dtype=np.uint8)
    assert dhash64(flat) == (0, 0)
    # strictly decreasing gray along each row -> every comparison true
    col = np.arange(32, dtype=np.int64)[::-1] * 8
    img = np.repeat(col[None, :], 16, axis=0)
    rgb = np.stack([img, img, img], axis=2).astype(np.uint8)
    assert dhash64(rgb) == (0xFFFFFFFF, 0xFFFFFFFF)


def test_dhash_identical_pixels_share_group(spark, monkeypatch):
    """Assets whose (width, height, base-byte) coincide decode to
    identical pixels and must land in one hash group."""
    import fortisiem_clickhouse_monitor_spark.operators.multimodal as mm

    # doc_ids 12*k + c share (w, h); base repeats when a*7 % 256 ties.
    # ids 0 and 768: 768 % 4 == 0, 768 % 3 == 0, 768*7 % 256 == 0 == 0*7%256
    rows = [(i, "x", "en", "s", 1) for i in (0, 768, 5)]
    docs = spark.createDataFrame(
        rows, schema="doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    )
    monkeypatch.setattr(mm, "table", lambda s, d, n: docs)
    out = mm.mm_image_dhash_groups(spark, "ignored").collect()
    by_keeper = {r["keeper_asset_id"]: r["n_assets"] for r in out}
    assert by_keeper[0] == 2  # 0 and 768 are pixel-identical
    assert by_keeper.get(5, 1) == 1


def test_dhash_near_pairs_banding_and_hamming(spark, monkeypatch):
    """Planted hashes: 1-bit-apart reps pair with hamming=1; identical
    hashes collapse to one rep (no intra-group pairs); far hashes stay
    unpaired."""
    import fortisiem_clickhouse_monitor_spark.operators.multimodal as mm

    rows = [
        (1, 0, 0b0001),
        (9, 0, 0b0001),          # exact dup of asset 1 -> same rep
        (2, 0, 0b0011),          # hamming 1 from rep 1
        (3, 0x0F0F0F0F, 0xF0F0F0F0),  # far from everything
    ]
    frame = spark.createDataFrame(
        rows, schema="asset_id LONG, dhash_hi LONG, dhash_lo LONG"
    )
    monkeypatch.setattr(mm, "_dhash_frame", lambda s, d: frame)
    out = {(r["rep_a"], r["rep_b"]): r["hamming"]
           for r in mm.mm_image_dhash_near_pairs(spark, "ignored").collect()}
    assert out == {(1, 2): 1}


def test_scene_cut_diff_matches_brute_force(spark, monkeypatch):
    """The decode-and-diff path must equal the brute-force byte diff,
    and the closed-form oracle arithmetic must equal both."""
    import fortisiem_clickhouse_monitor_spark.operators.multimodal as mm

    rows = [(i, "x", "en", "s", 1) for i in (3, 10, 257)]
    docs = spark.createDataFrame(
        rows, schema="doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    )
    monkeypatch.setattr(mm, "table", lambda s, d, n: docs)
    out = {(r["asset_id"], r["frame_from"]): r
           for r in mm.mm_video_scene_cuts(spark, "x").collect()}
    for aid in (3, 10, 257):
        w, h, nf = (aid % 4) * 16 + 16, (aid % 3) * 8 + 8, (aid % 3) + 2
        n = w * h * 3
        for f in range(nf - 1):
            b1 = (aid * 7 + 13 * f * f) % 256
            d = (13 * (2 * f + 1)) % 256
            brute = sum(
                abs((b1 + i) % 256 - (b1 + d + i) % 256) for i in range(n)
            )
            r = out[(aid, f)]
            assert r["n_pixel_bytes"] == n
            assert r["sum_abs_diff"] == brute
            assert r["is_cut"] == (brute >= 100 * n)


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


def test_resize_nearest_samples_expected_pixels():
    """Nearest-neighbor resize must select exactly the grid pixels
    (r*h//8, c*w//8) of the decoded image — checked against direct
    indexing, plus shape and dtype."""
    import numpy as np

    from fortisiem_clickhouse_monitor_spark.operators.multimodal import (
        decode_image,
        encode_ppm,
        resize_nearest,
    )

    img = decode_image(encode_ppm(5, 48, 16))
    thumb = resize_nearest(img, 8, 8)
    assert thumb.shape == (8, 8, 3) and thumb.dtype == img.dtype
    for r in range(8):
        for c in range(8):
            assert (thumb[r, c] == img[(r * 16) // 8, (c * 48) // 8]).all()
    # idempotence on an already-8x8 image
    small = decode_image(encode_ppm(3, 8, 8))
    assert (resize_nearest(small, 8, 8) == small).all()
