"""Real-format VIDEO path in CI (completing the r15 real-format set
for all three modalities): frame_dhash decoder='bmpseq' walks a
concatenated-BMP container — each frame split on its header's
declared file size, hashed with the exact 2-D bmp_dhash — so the
video near-dup lane exercises real container parsing + real 2-D
frame geometry every run, dependency-free."""

from __future__ import annotations

import numpy as np
import pytest

from hive_scd_spark.operators.multimodal import (
    bmp_dhash,
    frame_dhash,
    multimodal_dedup_near_video,
    split_bmp_frames,
)
from tests.test_bmp_dhash import _test_image, _upscale, encode_bmp


def _video(seeds, k: int = 1) -> bytes:
    """A clip = concatenated BMP frames (optionally k× upscaled)."""
    return b"".join(
        encode_bmp(_upscale(_test_image(s), k) if k > 1 else _test_image(s))
        for s in seeds
    )


def test_split_walks_declared_sizes():
    frames = [encode_bmp(_test_image(s)) for s in range(4)]
    got = split_bmp_frames(b"".join(frames))
    assert got == frames
    # frames of DIFFERENT geometry split correctly too (size-driven,
    # not fixed-window)
    mixed = [
        encode_bmp(_test_image(0, h=6, w=9)),
        encode_bmp(_test_image(1, h=20, w=30)),
    ]
    assert split_bmp_frames(b"".join(mixed)) == mixed


def test_split_rejects_corruption():
    f0, f1 = encode_bmp(_test_image(0)), encode_bmp(_test_image(1))
    # corrupt the SECOND frame's magic — the walk must fail there, not
    # silently shift every later frame
    with pytest.raises(ValueError, match=f"magic at byte {len(f0)}"):
        split_bmp_frames(f0 + b"XX" + f1[2:])
    with pytest.raises(ValueError, match="magic"):
        split_bmp_frames(f0 + f1 + b"trailing-garbage")
    # a frame whose declared size overruns the payload
    with pytest.raises(ValueError, match="size"):
        split_bmp_frames(f0[:20])


def test_frame_hashes_are_real_2d(spark):
    video = _video([1, 2, 3])
    df = spark.createDataFrame([(1, video)], "media_id long, payload binary")
    rows = frame_dhash(df, decoder="bmpseq", strict=True).collect()
    assert [r["frame_idx"] for r in sorted(rows, key=lambda r: r["frame_idx"])] == [0, 1, 2]
    got = {r["frame_idx"]: r["fhash"] for r in rows}
    for i, s in enumerate([1, 2, 3]):
        assert got[i] == bmp_dhash(encode_bmp(_test_image(s)))


def test_trimmed_and_upscaled_copies_found(spark):
    """The video near-dup contract on the real format: a head-trimmed
    copy shares the surviving frames; a 2×-UPSCALED copy (every frame
    resized) still shares ALL frame hashes because bmp_dhash is
    exactly invariant under integer upscaling — the property the
    byte-window stub could not give."""
    from pyspark.sql import functions as F

    rows = [
        (1, _video([1, 2, 3, 4, 5])),
        (2, _video([3, 4, 5])),          # head-trimmed copy of 1
        (3, _video([1, 2, 3, 4, 5], k=2)),  # 2x-upscaled copy of 1
        (4, _video([6, 7, 8])),          # unrelated clip
    ]
    df = spark.createDataFrame(rows, "doc_id long, v binary").select(
        F.col("doc_id").alias("media_id"),
        F.col("v").alias("payload"),
        F.lit("video").alias("media_type"),
        F.length("v").cast("long").alias("n_bytes"),
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in multimodal_dedup_near_video(df, decoder="bmpseq").collect()
    }
    assert pairs.get((1, 2)) == 3   # the three surviving frames
    assert pairs.get((1, 3)) == 5   # upscale: every frame hash identical
    assert pairs.get((2, 3)) == 3
    assert not any(4 in p for p in pairs)


def test_stub_path_unchanged(spark):
    """decoder='stub' byte-window slicing is byte-identical to r14
    (the refactor to frames_of must not move any window)."""
    payload = bytes(range(256)) * 3
    df = spark.createDataFrame([(1, payload)], "media_id long, payload binary")
    rows = {
        r["frame_idx"]: r["fhash"]
        for r in frame_dhash(df, frame_bytes=64, stride=2).collect()
    }
    from hive_scd_spark.operators.multimodal import stub_dhash

    n = (len(payload) + 63) // 64
    exp = {
        i: stub_dhash(payload[i * 64 : (i + 1) * 64]) for i in range(0, n, 2)
    }
    assert rows == exp
