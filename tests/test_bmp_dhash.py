"""Real-format image path in CI (VERDICT r14 task 5): a
dependency-free uncompressed-BMP decoder (multimodal.decode_bmp) +
exact-integer 2-D dHash (bmp_dhash) so dhash_images exercises real
2-D image geometry — width/height/stride/channel order/bottom-up row
order — in every test run, with no new hard dependency.  PIL remains
the preferred feature-detected path for compressed formats."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from hive_scd_spark.operators.multimodal import (
    bmp_dhash,
    decode_bmp,
    dhash_images,
    multimodal_dedup_near,
)


def encode_bmp(rgb: np.ndarray, top_down: bool = False) -> bytes:
    """Minimal 24-bit BI_RGB BMP writer (test fixture only): rgb is
    (H, W, 3) uint8 in RGB order; rows padded to 4 bytes, bottom-up
    unless top_down."""
    h, w, _ = rgb.shape
    stride = ((w * 24 + 31) // 32) * 4
    body = bytearray()
    row_order = range(h) if top_down else range(h - 1, -1, -1)
    for y in row_order:
        row = bytearray()
        for x in range(w):
            r, g, b = rgb[y, x]
            row += bytes((b, g, r))
        row += b"\x00" * (stride - len(row))
        body += row
    data_off = 14 + 40
    file_size = data_off + len(body)
    header = b"BM" + struct.pack("<IHHI", file_size, 0, 0, data_off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, 24, 0,
        len(body), 2835, 2835, 0, 0,
    )
    return bytes(header + dib + body)


def _test_image(seed: int, h: int = 24, w: int = 32) -> np.ndarray:
    """Deterministic structured image: gradient + seeded blocks."""
    rng = np.random.RandomState(seed)
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[..., 0] = (np.arange(w)[None, :] * 255 // max(w - 1, 1)).astype(np.uint8)
    img[..., 1] = (np.arange(h)[:, None] * 255 // max(h - 1, 1)).astype(np.uint8)
    for _ in range(6):
        y = rng.randint(0, max(h - 4, 1))
        x = rng.randint(0, max(w - 8, 1))
        img[y : y + 4, x : x + 8] = rng.randint(0, 256, 3)
    return img


def _upscale(rgb: np.ndarray, k: int) -> np.ndarray:
    return np.repeat(np.repeat(rgb, k, axis=0), k, axis=1)


def test_decode_roundtrip_geometry():
    img = _test_image(1, h=5, w=7)  # odd width → nontrivial stride pad
    gray = decode_bmp(encode_bmp(img))
    assert gray.shape == (5, 7)
    exp = (
        299 * img[..., 0].astype(np.int64)
        + 587 * img[..., 1].astype(np.int64)
        + 114 * img[..., 2].astype(np.int64)
    )
    assert (gray == exp).all()


def test_decode_topdown_equals_bottomup():
    img = _test_image(2)
    assert (
        decode_bmp(encode_bmp(img)) == decode_bmp(encode_bmp(img, top_down=True))
    ).all()


def test_decode_rejects_garbage():
    with pytest.raises(ValueError, match="BM"):
        decode_bmp(b"not a bitmap at all, nope" * 10)


def test_bmp_dhash_exact_under_integer_resize():
    """The exact-integration resample makes k× nearest-neighbor
    upscales Hamming-0 BY CONSTRUCTION — the 2-D analog of the
    envelope-hash invariance."""
    for seed in range(5):
        img = _test_image(seed)
        h0 = bmp_dhash(encode_bmp(img))
        for k in (2, 3):
            assert bmp_dhash(encode_bmp(_upscale(img, k))) == h0


def test_bmp_dhash_distinguishes_images():
    hashes = {bmp_dhash(encode_bmp(_test_image(s))) for s in range(8)}
    assert len(hashes) == 8


def test_planted_resized_copies_found(spark):
    """The r14-task-5 done-criterion: dhash_images runs REAL 2-D
    geometry on a real format in CI, and planted resized copies are
    found at Hamming <= 3 by the banded join."""
    from pyspark.sql import functions as F

    base = [(s, encode_bmp(_test_image(s))) for s in range(1, 9)]
    planted = [(s + 100, encode_bmp(_upscale(_test_image(s), 2))) for s in range(1, 9)]
    df = spark.createDataFrame(
        base + planted, "doc_id long, img binary"
    ).select(
        F.col("doc_id").alias("media_id"),
        F.col("img").alias("payload"),
        F.lit("image").alias("media_type"),
        F.length("img").cast("long").alias("n_bytes"),
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in multimodal_dedup_near(df, decoder="bmp").collect()
    }
    for s in range(1, 9):
        assert (s, s + 100) in pairs, f"planted resized copy {s} missed"
        assert pairs[(s, s + 100)] <= 3
    # distinct images must not collapse into one near-dup blob
    cross = [p for p in pairs if p[0] != p[1] - 100]
    assert len(cross) <= 4


def test_strict_mode_accepts_bmp(spark):
    """decoder='bmp' is a REAL perceptual hash — strict mode allows it
    (only the stub is refused)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, encode_bmp(_test_image(1)))], "media_id long, payload binary"
    ).select("media_id", "payload")
    out = dhash_images(df, strict=True, decoder="bmp").collect()
    assert out[0]["dhash"] == bmp_dhash(encode_bmp(_test_image(1)))
