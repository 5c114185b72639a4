"""Feature-detected optional-library hooks (VERDICT r3 item 8): real
image decode (Pillow) and model-based language ID (langdetect) behind
clean fallbacks.  In this container both libraries are absent, so the
"present" tests skip cleanly and the fallback/raise paths run."""

from __future__ import annotations

import pytest

from hive_scd_spark.operators.multimodal import (
    attach_binary,
    extract_image_features,
    pil_available,
)
from hive_scd_spark.operators.text import (
    lang_id_model,
    langdetect_available,
)


@pytest.fixture()
def media(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "x" * 2000)], "media_id long, body string"
    )
    return attach_binary(df, "media_id", "body", "image/fake")


def test_auto_decoder_falls_back_to_stub_when_pil_absent(spark, media):
    if pil_available():
        pytest.skip("Pillow present — fallback path not reachable")
    auto = extract_image_features(media, decoder="auto").collect()
    stub = extract_image_features(media, decoder="stub").collect()
    assert sorted(map(tuple, auto)) == sorted(map(tuple, stub))


def test_pil_decoder_requires_pillow(spark, media):
    if pil_available():
        pytest.skip("Pillow present")
    with pytest.raises(NotImplementedError, match="Pillow"):
        extract_image_features(media, decoder="pil")


def test_strict_requires_real_decoder(spark, media):
    if pil_available():
        pytest.skip("Pillow present — strict+stub path not reachable")
    with pytest.raises(NotImplementedError, match="strict"):
        extract_image_features(media, strict=True)


def test_unknown_decoder_rejected(spark, media):
    with pytest.raises(ValueError, match="unknown decoder"):
        extract_image_features(media, decoder="torch")


@pytest.mark.skipif(not pil_available(), reason="Pillow not installed")
def test_pil_decode_real_image(spark):
    """Runs only where Pillow exists: a real 1-px PNG round trip."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (3, 2)).save(buf, format="PNG")
    df = spark.createDataFrame([(1, bytearray(buf.getvalue()))], "media_id long, body binary")
    media = attach_binary(df, "media_id", "body", "image/png")
    row = extract_image_features(media, decoder="pil").collect()[0]
    assert (row["width"], row["height"]) == (3, 2)


def test_lang_id_model_raises_without_langdetect(spark):
    if langdetect_available():
        pytest.skip("langdetect present")
    df = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
    with pytest.raises(ImportError, match="langdetect"):
        lang_id_model(df, "doc_id", "text")


@pytest.mark.skipif(not langdetect_available(), reason="langdetect not installed")
def test_lang_id_model_detects_english(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    row = lang_id_model(df, "doc_id", "text").collect()[0]
    assert row["pred_lang"] == "en"
    assert row["confidence"] > 0.5
