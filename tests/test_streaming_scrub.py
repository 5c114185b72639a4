"""Streaming span-scrub + NB-quality lane (streaming.scrub_classify_sink
— VERDICT r12 task 7): per micro-batch scrub → score against a FROZEN
nb_model table → append.  With the model frozen every step is row-local
per document, so incremental file drops must reproduce the batch path
value-for-value (the curation-composition batch-equivalence pin)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from hive_scd_spark.operators.quality import nb_logodds, nb_model, nb_score
from hive_scd_spark.operators.text import (
    paragraph_spans,
    scrub_spans,
    tag_span_attrs,
)
from hive_scd_spark.streaming import scrub_classify_sink


def _docs(spark, lo, hi):
    rows = [
        (
            i,
            f"good paragraph about training data quality number {i}.\n\n"
            f"contact me at user{i}@example.com\n\nok\n\n"
            f"closing body paragraph for document {i} with enough tokens.",
        )
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _refs(spark):
    pos = spark.createDataFrame(
        [(1000 + i, "training data quality matters a great deal") for i in range(6)],
        "doc_id long, text string",
    )
    neg = spark.createDataFrame(
        [(2000 + i, "spam spam buy now cheap pills") for i in range(6)],
        "doc_id long, text string",
    )
    return pos, neg


def _batch_path(docs, model):
    spans = paragraph_spans(docs, "doc_id", "text")
    attrs = tag_span_attrs(spans, "doc_id", min_tokens=3, max_symbol_ratio=0.5)
    scrubbed = scrub_spans(
        docs, spans, attrs, "doc_id", "text",
        drop_attrs=("too_short", "has_pii", "symbol_heavy"),
    )
    scored = nb_score(
        scrubbed.select("doc_id", F.col("scrubbed_text").alias("text")),
        "doc_id", "text", model, vocab_size=20, threshold=0.0,
    )
    return scrubbed.join(scored, "doc_id").select(
        "doc_id", "scrubbed_text", "n_spans_kept", "n_spans_removed",
        "chars_removed", "n_tokens", "nb_logodds", "kept",
    )


def test_streaming_scrub_matches_batch(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    pos, neg = _refs(spark)
    model = nb_model(pos, neg, "doc_id", "text", vocab_size=20).persist()
    model.count()

    _docs(spark, 0, 25).coalesce(1).write.mode("append").parquet(str(src))
    stream = spark.readStream.schema("doc_id long, text string").parquet(str(src))
    q = scrub_classify_sink(
        stream, out, ckpt, model, vocab_size=20, threshold=0.0,
    ).start()
    try:
        q.processAllAvailable()
        _docs(spark, 25, 40).coalesce(1).write.mode("append").parquet(str(src))
        q.processAllAvailable()
    finally:
        q.stop()

    got = {tuple(r) for r in spark.read.parquet(out).collect()}
    exp = {tuple(r) for r in _batch_path(_docs(spark, 0, 40), model).collect()}
    assert got == exp
    assert len(got) == 40
    # the scrub really fired: every doc lost its planted PII paragraph
    assert all(r[3] >= 1 for r in got)  # n_spans_removed
    model.unpersist()


def test_nb_score_equals_nb_logodds(spark):
    docs = _docs(spark, 0, 30).select(
        "doc_id", F.concat(F.col("text"), F.lit(" extra token")).alias("text")
    )
    pos, neg = _refs(spark)
    direct = nb_logodds(docs, "doc_id", "text", pos, neg,
                        vocab_size=20, threshold=0.0)
    model = nb_model(pos, neg, "doc_id", "text", vocab_size=20)
    split = nb_score(docs, "doc_id", "text", model, vocab_size=20, threshold=0.0)
    assert sorted(map(tuple, direct.collect())) == sorted(map(tuple, split.collect()))


def test_nb_score_oov_token_sees_class_totals(spark):
    """A token the reference corpora never produced maps to <unk> with
    NO model row; its llr must still use the class totals (ln(1/(Np+V1))
    - ln(1/(Nn+V1))), not coalesce the totals to zero."""
    pos = spark.createDataFrame([(1, "alpha alpha beta")], "doc_id long, text string")
    neg = spark.createDataFrame([(2, "gamma")], "doc_id long, text string")
    model = nb_model(pos, neg, "doc_id", "text", vocab_size=10)
    # training corpora are fully in-vocab (4 distinct <= 10): no <unk> row
    assert not any(r["__w"] == "<unk>" for r in model.collect())
    doc = spark.createDataFrame([(7, "zzz")], "doc_id long, text string")
    got = nb_score(doc, "doc_id", "text", model, vocab_size=10).collect()[0]
    v1 = 11.0
    exp = round(math.log(1.0 / (3 + v1)) - math.log(1.0 / (1 + v1)), 6)
    assert got["nb_logodds"] == exp
    assert exp != 0.0  # the regression shape: totals-as-zero gives 0
