"""Property tests for the round-15 operators: BMP 2-D dHash and WAV
envelope-hash invariances over ARBITRARY randomized images/clips (the
pinned fixtures in test_bmp_dhash / test_wav_audio_hash prove the
planted cases; these prove the construction), and the bench
noise-bound percentile against an independent nearest-rank reference."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from hive_scd_spark.operators.multimodal import (
    bmp_dhash,
    decode_bmp,
    decode_wav,
    wav_audio_hash,
)
from tests.test_bmp_dhash import encode_bmp
from tests.test_wav_audio_hash import encode_wav

images = arrays(
    np.uint8,
    st.tuples(
        st.integers(min_value=1, max_value=24),
        st.integers(min_value=1, max_value=24),
        st.just(3),
    ),
)


@given(images, st.integers(min_value=2, max_value=4))
@settings(max_examples=60, deadline=None)
def test_bmp_dhash_invariant_under_any_integer_upscale(img, k):
    up = np.repeat(np.repeat(img, k, axis=0), k, axis=1)
    assert bmp_dhash(encode_bmp(up)) == bmp_dhash(encode_bmp(img))


@given(images)
@settings(max_examples=60, deadline=None)
def test_bmp_decode_roundtrip_any_geometry(img):
    gray = decode_bmp(encode_bmp(img))
    assert gray.shape == img.shape[:2]
    exp = (
        299 * img[..., 0].astype(np.int64)
        + 587 * img[..., 1].astype(np.int64)
        + 114 * img[..., 2].astype(np.int64)
    )
    assert (gray == exp).all()
    # top-down row order decodes identically
    assert (decode_bmp(encode_bmp(img, top_down=True)) == gray).all()


clips = arrays(
    np.int16,
    st.integers(min_value=1, max_value=300),
    elements=st.integers(min_value=-4000, max_value=4000),
)


@given(clips, st.integers(min_value=2, max_value=5))
@settings(max_examples=60, deadline=None)
def test_wav_hash_invariant_under_any_duplication(clip, k):
    s = clip.astype(np.int64)
    assert wav_audio_hash(encode_wav(np.repeat(s, k))) == wav_audio_hash(
        encode_wav(s)
    )


@given(clips, st.integers(min_value=2, max_value=4))
@settings(max_examples=60, deadline=None)
def test_wav_hash_invariant_under_any_volume(clip, k):
    s = clip.astype(np.int64)
    assert wav_audio_hash(encode_wav(s * k)) == wav_audio_hash(encode_wav(s))


@given(
    clips,
    st.integers(min_value=1, max_value=4),
    st.sampled_from([8000, 16000, 44100]),
)
@settings(max_examples=60, deadline=None)
def test_wav_roundtrip_any_channels(clip, ch, rate):
    s = clip.astype(np.int64)
    multi = np.stack([s] * ch, axis=1)
    mix, got_rate = decode_wav(encode_wav(multi, rate=rate))
    assert got_rate == rate
    assert (mix == s * ch).all()


@given(
    st.lists(
        st.floats(min_value=0.01, max_value=100.0, allow_nan=False),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=100, deadline=None)
def test_noise_bound_is_nearest_rank_p90(times):
    """merge_sessions' pct is the standard nearest-rank percentile —
    never the max unless p90's rank IS the max (n*0.9 > n-1)."""
    import math

    import bench

    s1 = {f"q{i}": 1.0 for i in range(len(times))}
    s2 = {f"q{i}": t for i, t in enumerate(times)}
    m = bench.merge_sessions([
        {"queries": s1, "sf": 0.1}, {"queries": s2, "sf": 0.1},
    ])
    ratios = sorted(max(t, 1.0) / min(t, 1.0) for t in times)
    idx = max(0, math.ceil(0.9 * len(ratios)) - 1)
    assert m["envelope"]["noise_bound"] == round(ratios[idx], 3)
