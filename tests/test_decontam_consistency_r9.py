"""Cross-operator decontamination consistency: the exact 13-gram
screen (decontam.ngram_contamination) and the constant-size Bloom
screen (bloom.*) must AGREE on planted contamination — the Bloom
screen's no-false-NEGATIVE guarantee means its hit set is a superset
of the exact screen's, and on a small plant (far below the false-
positive regime of a 2^18-bit sketch) the two sets coincide.

This is an operator-AGREEMENT test, not a per-operator semantics test
(those live in test_decontam*.py / test_bloom*.py): a regression in
either gram pipeline (tokenizer drift, hash change, off-by-one window)
breaks the agreement even if each operator stays self-consistent.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_scd_spark.operators.bloom import bloom_build, bloom_probe, bloom_to_hex
from hive_scd_spark.operators.decontam import ngram_contamination


def _corpus(spark):
    """20 eval docs; a train side with (a) verbatim eval copies,
    (b) eval docs embedded mid-document, (c) clean docs sharing < n
    contiguous tokens with any eval doc."""
    eval_rows = [
        (1000 + i, " ".join(f"ev{i}w{j}" for j in range(15))) for i in range(20)
    ]
    train_rows = []
    for i in range(20):
        if i % 4 == 0:  # verbatim copy
            train_rows.append((i, eval_rows[i][1]))
        elif i % 4 == 1:  # embedded mid-document
            train_rows.append(
                (i, f"lead{i} tokens here " + eval_rows[i][1] + f" trail{i}")
            )
        else:  # clean: same vocabulary style, no 13-gram overlap
            train_rows.append(
                (i, " ".join(f"cl{i}w{j}" for j in range(20)))
            )
    schema = "doc_id long, text string"
    return (
        spark.createDataFrame(train_rows, schema),
        spark.createDataFrame(eval_rows, schema),
    )


def test_exact_and_bloom_screens_agree_on_plants(spark):
    train, eval_df = _corpus(spark)
    contaminated = {i for i in range(20) if i % 4 in (0, 1)}

    exact = ngram_contamination(train, eval_df, "doc_id", "text", n=13)
    exact_ids = {r.train_id for r in exact.collect()}
    assert exact_ids == contaminated

    m_bits, k = 1 << 18, 4
    hx = bloom_to_hex(
        bloom_build(eval_df, "text", n=13, m_bits=m_bits, k=k), m_bits=m_bits
    )
    probed = bloom_probe(train, "doc_id", "text", hx, n=13, m_bits=m_bits, k=k)
    bloom_ids = {r.doc_id for r in probed.filter(F.col("n_hit") > 0).collect()}

    # no false negatives: every exact hit is a Bloom hit; and on this
    # plant size the sketch is far below its false-positive regime, so
    # the sets coincide exactly
    assert exact_ids <= bloom_ids
    assert bloom_ids == contaminated


def test_screens_agree_that_clean_corpus_is_clean(spark):
    train, eval_df = _corpus(spark)
    clean = train.filter((F.col("doc_id") % 4).isin(2, 3))
    assert ngram_contamination(clean, eval_df, "doc_id", "text", n=13).count() == 0
    m_bits, k = 1 << 18, 4
    hx = bloom_to_hex(
        bloom_build(eval_df, "text", n=13, m_bits=m_bits, k=k), m_bits=m_bits
    )
    hits = bloom_probe(
        clean, "doc_id", "text", hx, n=13, m_bits=m_bits, k=k
    ).filter(F.col("n_hit") > 0)
    assert hits.count() == 0
