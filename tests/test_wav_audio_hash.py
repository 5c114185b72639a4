"""Real-format audio path in CI: a dependency-free RIFF/WAVE PCM
decoder (multimodal.decode_wav) + envelope hash (wav_audio_hash) so
ahash_audio exercises real container geometry — chunk walk, channel
interleave, sample width — every test run, with no new hard
dependency.  The audio sibling of test_bmp_dhash.py; soundfile stays
the feature-detected path for compressed formats."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from hive_scd_spark.operators.multimodal import (
    ahash_audio,
    decode_wav,
    multimodal_dedup_near_audio,
    wav_audio_hash,
)


def encode_wav(samples: np.ndarray, rate: int = 16000, bits: int = 16) -> bytes:
    """Minimal RIFF/WAVE PCM writer (test fixture only): samples is
    (n,) mono or (n, ch) int."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    if bits == 16:
        body = samples.astype("<i2").tobytes()
        ba = ch * 2
    else:
        body = (samples.astype(np.int64) + 128).astype(np.uint8).tobytes()
        ba = ch
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ba, ba, bits)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
        + (b"\x00" if len(body) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _clip(seed: int, n: int = 400) -> np.ndarray:
    rng = np.random.RandomState(seed)
    t = np.arange(n)
    wave = (
        900 * np.sin(2 * np.pi * t / (20 + seed))
        + 400 * np.sin(2 * np.pi * t / (7 + seed))
    ).astype(np.int64)
    wave[rng.randint(0, n, 8)] += rng.randint(-2000, 2000, 8)
    return wave


def test_decode_roundtrip_mono16():
    s = _clip(1)
    got, rate = decode_wav(encode_wav(s, rate=8000))
    assert rate == 8000
    assert (got == s).all()


def test_decode_stereo_mixdown_and_8bit():
    s = _clip(2)
    stereo = np.stack([s, -s // 2], axis=1)
    got, _ = decode_wav(encode_wav(stereo))
    assert (got == s + (-s // 2)).all()
    small = np.clip(_clip(3) // 32, -127, 127)
    got8, _ = decode_wav(encode_wav(small, bits=8))
    assert (got8 == small).all()


def test_decode_rejects_garbage_and_nonpcm():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not audio at all " * 10)
    # format tag 3 (IEEE float) must be refused loudly
    s = _clip(4)
    payload = bytearray(encode_wav(s))
    payload[20] = 3  # audio_fmt lives at offset 20 (12 + 8 header)
    with pytest.raises(ValueError, match="format tag 1"):
        decode_wav(bytes(payload))


def test_wav_hash_exact_invariances():
    """The envelope-hash invariances hold EXACTLY on the real format:
    uniform k× sample duplication (naive resample) and positive
    volume scaling leave every hash bit unchanged."""
    for seed in range(5):
        s = _clip(seed)
        h0 = wav_audio_hash(encode_wav(s))
        for k in (2, 3):
            assert wav_audio_hash(encode_wav(np.repeat(s, k))) == h0
        assert wav_audio_hash(encode_wav(s * 2)) == h0


def test_wav_hash_distinguishes_clips():
    hashes = {wav_audio_hash(encode_wav(_clip(s))) for s in range(8)}
    assert len(hashes) == 8


def test_planted_resampled_copies_found(spark):
    """End-to-end through the public operator: re-sampled / re-leveled
    WAV copies are found at Hamming <= 3 by the banded join with
    decoder='wav' — real container parsing in the Arrow lane."""
    from pyspark.sql import functions as F

    base = [(s, encode_wav(_clip(s))) for s in range(1, 9)]
    planted = [
        (s + 100, encode_wav(np.repeat(_clip(s), 2) * 2)) for s in range(1, 9)
    ]
    df = spark.createDataFrame(
        base + planted, "doc_id long, clip binary"
    ).select(
        F.col("doc_id").alias("media_id"),
        F.col("clip").alias("payload"),
        F.lit("audio").alias("media_type"),
        F.length("clip").cast("long").alias("n_bytes"),
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in multimodal_dedup_near_audio(df, decoder="wav").collect()
    }
    for s in range(1, 9):
        assert (s, s + 100) in pairs, f"planted resampled copy {s} missed"
        assert pairs[(s, s + 100)] == 0  # exact invariance, not approximate


def test_strict_mode_accepts_wav(spark):
    df = spark.createDataFrame(
        [(1, encode_wav(_clip(1)))], "media_id long, payload binary"
    )
    out = ahash_audio(df, strict=True, decoder="wav").collect()
    assert out[0]["ahash"] == wav_audio_hash(encode_wav(_clip(1)))
