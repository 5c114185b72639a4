"""Span-attribute pipeline (operators/text.py: paragraph_spans /
tag_span_attrs / scrub_spans) — the Dolma tagger/mixer architecture:
offset-exact spans, decoupled long-form attributes, verbatim-rebuild
mixer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_scd_spark.operators.text import (
    paragraph_spans,
    scrub_spans,
    tag_span_attrs,
)

DOCS = [
    (1, "alpha beta gamma delta\n\nok\n\nmail me at a@b.com now\n\nnormal closing paragraph here"),
    (2, "!!!! ???? ####\n\nplain body text stays"),
    (3, ""),
    (4, None),
    (5, "one\n\n\n\ntwo three four five"),  # empty span between seps
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.fixture(scope="module")
def spans(docs):
    s = paragraph_spans(docs, "doc_id", "text").persist()
    s.count()
    yield s
    s.unpersist()


def test_offsets_slice_back_to_spans(docs, spans):
    """THE span contract: text[start : start+len] == span, verbatim."""
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    rows = spans.collect()
    assert rows
    for r in rows:
        t = texts[r["doc_id"]] or ""
        assert t[r["span_start"] : r["span_start"] + r["span_len"]] == r["span"]


def test_null_text_yields_no_spans(spans):
    assert spans.filter(F.col("doc_id") == 4).count() == 0


def test_empty_spans_are_real(spans):
    idxs = [r["span_idx"] for r in spans.filter(F.col("doc_id") == 5).collect()]
    assert sorted(idxs) == [0, 1, 2]  # "one", "", "two three four five"


def test_taggers_fire_correctly(spans):
    attrs = tag_span_attrs(spans, "doc_id", min_tokens=3, max_symbol_ratio=0.5)
    fired = {(r["doc_id"], r["span_idx"], r["attr"]) for r in attrs.collect()}
    assert (1, 1, "too_short") in fired       # "ok"
    assert (1, 2, "has_pii") in fired         # the email span
    assert (2, 0, "symbol_heavy") in fired    # "!!!! ???? ####"
    assert (1, 0, "too_short") not in fired   # 4-token clean span
    assert (1, 3, "has_pii") not in fired


def test_mixer_rebuilds_verbatim_and_counts(docs, spans):
    attrs = tag_span_attrs(spans, "doc_id", min_tokens=3, max_symbol_ratio=0.5)
    out = {
        r["doc_id"]: r
        for r in scrub_spans(
            docs, spans, attrs, "doc_id", "text",
            drop_attrs=("too_short", "has_pii", "symbol_heavy"),
        ).collect()
    }
    assert out[1]["scrubbed_text"] == (
        "alpha beta gamma delta\n\nnormal closing paragraph here"
    )
    assert (out[1]["n_spans_kept"], out[1]["n_spans_removed"]) == (2, 2)
    assert out[1]["chars_removed"] == len("ok") + len("mail me at a@b.com now")
    assert out[2]["scrubbed_text"] == "plain body text stays"
    # every input document survives, even fully-scrubbed / null-text ones
    assert set(out) == {1, 2, 3, 4, 5}
    assert out[4] == pytest.approx(out[4])  # row exists
    assert out[3]["n_spans_kept"] == 0 and out[3]["scrubbed_text"] == ""


def test_mixer_respects_drop_list(docs, spans):
    """Dropping only PII must keep the short and symbol-heavy spans —
    attribute table and rule set are decoupled."""
    attrs = tag_span_attrs(spans, "doc_id", min_tokens=3, max_symbol_ratio=0.5)
    out = {
        r["doc_id"]: r
        for r in scrub_spans(
            docs, spans, attrs, "doc_id", "text", drop_attrs=("has_pii",)
        ).collect()
    }
    assert out[1]["n_spans_removed"] == 1
    assert "ok" in out[1]["scrubbed_text"]
    assert "a@b.com" not in out[1]["scrubbed_text"]
    assert out[2]["n_spans_removed"] == 0


def test_custom_tagger_rows_compose(docs, spans):
    """A user-supplied tagger is just more long-form rows — the mixer
    needs no change (the architecture's point)."""
    attrs = tag_span_attrs(spans, "doc_id")
    extra = spans.filter(F.col("span").contains("closing")).select(
        "doc_id", "span_idx", F.lit("custom_block").alias("attr"),
        F.lit(1.0).alias("score"),
    )
    out = {
        r["doc_id"]: r
        for r in scrub_spans(
            docs, spans, attrs.unionByName(extra), "doc_id", "text",
            drop_attrs=("custom_block",),
        ).collect()
    }
    assert "closing" not in out[1]["scrubbed_text"]
    assert out[1]["n_spans_removed"] == 1
