"""Perceptual near-dup media lane (multimodal.dhash_images /
multimodal_dedup_near + dedup.banded_hamming_pairs) — VERDICT r13
task 5."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from hive_scd_spark.operators.multimodal import (
    attach_binary,
    dhash_images,
    multimodal_dedup_near,
    pil_available,
    stub_dhash,
)


def test_stub_dhash_exact_under_uniform_upsample():
    payload = b"the quick brown fox jumps over the lazy dog 0123456789" * 3
    for k in (2, 3, 7):
        up = bytes(c for c in payload for _ in range(k))
        assert stub_dhash(up) == stub_dhash(payload)


def test_stub_dhash_distinguishes_content():
    a = stub_dhash(b"a completely different payload with its own byte shape" * 4)
    b = stub_dhash(b"zzz 999 unrelated bytes with another distribution ///" * 4)
    assert a != b


def _media(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, t string")
    return attach_binary(df, id_col="doc_id", payload_col="t", media_type="image")


def test_planted_reencodes_found_at_hamming_zero(spark):
    base = [
        (i, f"document number {i} with some distinctive content " * 4 + "x" * i)
        for i in range(1, 9)
    ]
    # plant a 2x "re-encode" of each original
    planted = [(i + 100, "".join(c * 2 for c in t)) for i, t in base]
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in multimodal_dedup_near(_media(spark, base + planted)).collect()
    }
    for i, _t in base:
        assert pairs.get((i, i + 100)) == 0, f"planted pair {i} missed"


def test_unrelated_media_not_paired(spark):
    import random

    rng = random.Random(11)
    rows = [
        (i, "".join(chr(rng.randrange(32, 127)) for _ in range(300)))
        for i in range(1, 40)
    ]
    out = multimodal_dedup_near(_media(spark, rows)).collect()
    assert out == []


def test_dhash_matches_driver_function(spark):
    rows = [(1, "alpha beta gamma " * 10), (2, "delta epsilon zeta " * 9)]
    got = {
        r["media_id"]: r["dhash"]
        for r in dhash_images(_media(spark, rows)).collect()
    }
    exp = {i: stub_dhash(t.encode()) for i, t in rows}
    assert got == exp


def test_strict_mode_refuses_stub(spark):
    media = _media(spark, [(1, "x" * 100)])
    if pil_available():
        pytest.skip("Pillow importable — strict mode would use it")
    with pytest.raises(NotImplementedError, match="real perceptual hash"):
        dhash_images(media, strict=True)


def test_pil_dhash_when_available(spark):
    if not pil_available():
        pytest.skip("Pillow not importable")
    import io

    from PIL import Image

    from hive_scd_spark.operators.multimodal import pil_dhash

    im = Image.new("L", (64, 64))
    im.putdata([(x * 7 + y * 3) % 256 for y in range(64) for x in range(64)])
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    h1 = pil_dhash(buf.getvalue())
    big = im.resize((128, 128))
    buf2 = io.BytesIO()
    big.save(buf2, format="PNG")
    h2 = pil_dhash(buf2.getvalue())
    assert bin(h1 ^ h2).count("1") <= 6  # resize keeps most bits


def test_near_dup_corpus_keeps_canonical(spark):
    """Media endgame (r14): pairs -> clusters -> keepers.  Every
    planted re-encode collapses to its original (the min id); unpaired
    media survive."""
    from hive_scd_spark.operators.cluster import dedup_corpus

    base = [
        (i, f"document number {i} with some distinctive content " * 4 + "y" * i)
        for i in range(1, 7)
    ]
    planted = [(i + 100, "".join(c * 2 for c in t)) for i, t in base[:4]]
    media = _media(spark, base + planted)
    pairs = multimodal_dedup_near(media)
    keep = dedup_corpus(media, pairs, "media_id")
    got = sorted(r["media_id"] for r in keep.collect())
    assert got == [1, 2, 3, 4, 5, 6]


def test_audio_hash_invariances():
    """Audio stub (r14): EXACT invariance under uniform k× sample
    duplication and positive volume scaling."""
    import numpy as np

    from hive_scd_spark.operators.multimodal import stub_audio_hash

    rng = np.random.default_rng(5)
    s = rng.integers(-9000, 9000, size=200).astype("<i2")
    payload = s.tobytes()
    h = stub_audio_hash(payload)
    dup2 = np.repeat(s, 2).astype("<i2").tobytes()
    dup3 = np.repeat(s, 3).astype("<i2").tobytes()
    vol3 = (s.astype(np.int64) * 3).astype("<i2").tobytes()  # no clipping
    assert stub_audio_hash(dup2) == h
    assert stub_audio_hash(dup3) == h
    assert stub_audio_hash(vol3) == h
    other = rng.integers(-9000, 9000, size=200).astype("<i2").tobytes()
    assert stub_audio_hash(other) != h


def test_audio_near_dup_planted_recall(spark):
    from hive_scd_spark.operators.multimodal import (
        attach_binary,
        multimodal_dedup_near_audio,
    )

    base = [
        (i, f"audio clip number {i} with distinctive waveform bytes " * 4)
        for i in range(1, 9)
    ]
    planted = [
        (i + 100, "".join(t[j : j + 2] * 2 for j in range(0, len(t) - 1, 2)))
        for i, t in base
    ]
    df = spark.createDataFrame(base + planted, "doc_id long, t string")
    media = attach_binary(df, id_col="doc_id", payload_col="t", media_type="audio")
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in multimodal_dedup_near_audio(
            media.select("media_id", "payload")
        ).collect()
    }
    for i, _t in base:
        assert pairs.get((i, i + 100)) == 0, f"planted audio pair {i} missed"


def test_audio_strict_mode_refuses_stub(spark):
    import pytest

    from hive_scd_spark.operators.multimodal import (
        ahash_audio,
        attach_binary,
        soundfile_available,
    )

    if soundfile_available():
        pytest.skip("soundfile importable — strict mode would use it")
    df = spark.createDataFrame([(1, "x" * 200)], "doc_id long, t string")
    media = attach_binary(df, id_col="doc_id", payload_col="t", media_type="audio")
    with pytest.raises(NotImplementedError, match="real audio decoder"):
        ahash_audio(media, strict=True)


def test_video_trim_copies_found(spark):
    """Video lane (r14): head-trimmed and tail-trimmed copies share
    their surviving frames with the original."""
    from hive_scd_spark.operators.multimodal import (
        attach_binary,
        multimodal_dedup_near_video,
    )

    import random

    def clip(i):
        rng = random.Random(1000 + i)  # per-clip content, no shared windows
        return "".join(chr(rng.randrange(33, 123)) for _ in range(320))

    base = [(i, clip(i)) for i in range(1, 7)]
    head_trim = [(i + 100, t[64:]) for i, t in base[:3]]
    tail_trim = [(i + 200, t[:-64]) for i, t in base[3:]]
    df = spark.createDataFrame(
        base + head_trim + tail_trim, "doc_id long, t string"
    )
    media = attach_binary(df, id_col="doc_id", payload_col="t", media_type="video")
    pairs = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in multimodal_dedup_near_video(
            media.select("media_id", "payload")
        ).collect()
    }
    for i, _t in base[:3]:
        assert pairs.get((i, i + 100), 0) >= 2, f"head-trim pair {i} missed"
    for i, _t in base[3:]:
        assert pairs.get((i, i + 200), 0) >= 2, f"tail-trim pair {i} missed"
    # unrelated clips share no frames
    assert (1, 2) not in pairs


def test_frame_dhash_matches_driver_slices(spark):
    from hive_scd_spark.operators.multimodal import (
        attach_binary,
        frame_dhash,
        stub_dhash,
    )

    text = "abcdefgh" * 20  # 160 bytes -> frames of 64: 64, 64, 32
    df = spark.createDataFrame([(1, text)], "doc_id long, t string")
    media = attach_binary(df, id_col="doc_id", payload_col="t", media_type="video")
    got = {
        (r["media_id"], r["frame_idx"]): r["fhash"]
        for r in frame_dhash(media).collect()
    }
    b = text.encode()
    exp = {
        (1, i): stub_dhash(b[i * 64 : (i + 1) * 64])
        for i in range(3)
    }
    assert got == exp
