"""Round-12 winnowing work (VERDICT r11 task 5 + the selection
codegen rewrite): the df-capped recall gate keeps 100% planted-pair
recall at small SFs, and the explode-first codegen selection is
byte-identical to the reference HOF formulation."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from hive_scd_spark.operators.dedup import (
    HASH_P,
    winnow_dup_pairs,
    winnow_pairs_from_selected,
    winnow_selected,
)


def _hof_reference_selected(df, id_col, text_col, k=12, w=8):
    """The pre-r12 formulation: hash array via F.transform (interpreted
    lambda), posexplode, count-over-doc window — kept here as the
    independent reference for the codegen rewrite."""
    txt = F.lower(F.trim(F.coalesce(F.col(text_col), F.lit(""))))
    n_grams = F.greatest(F.length(txt) - (k - 1), F.lit(1))
    hashes = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: F.conv(F.substring(F.md5(F.substring(txt, i, k)), 1, 8), 16, 10)
        .cast("long")
        % F.lit(HASH_P),
    )
    e = df.select(F.col(id_col), F.posexplode(hashes).alias("__pos", "__h"))
    win = W.partitionBy(id_col).orderBy("__pos").rowsBetween(0, w - 1)
    n = W.partitionBy(id_col)
    m = e.select(
        F.col(id_col),
        "__pos",
        F.min("__h").over(win).alias("__wmin"),
        F.count("*").over(n).alias("__n"),
    ).filter(F.col("__pos") <= F.greatest(F.col("__n") - w, F.lit(0)))
    return m.select(id_col, F.col("__wmin").alias("fingerprint")).distinct()


def test_codegen_selection_matches_hof_reference(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    got = winnow_selected(docs, "doc_id", "text")
    ref = _hof_reference_selected(docs, "doc_id", "text")
    assert got.exceptAll(ref).count() == 0
    assert ref.exceptAll(got).count() == 0


def test_codegen_selection_edge_docs(spark):
    # shorter than k (single whole-array window), exactly k, NULL and
    # empty text — the clamped-slice edge cases
    docs = spark.createDataFrame(
        [
            (1, "short"),
            (2, "x" * 12),
            (3, None),
            (4, ""),
            (5, "y" * 19),  # k+w-1: exactly one full window
            (6, "z" * 20),  # two window starts
        ],
        "doc_id long, text string",
    )
    got = winnow_selected(docs, "doc_id", "text")
    ref = _hof_reference_selected(docs, "doc_id", "text")
    assert sorted(got.collect()) == sorted(ref.collect())
    # every doc yields at least one fingerprint (clamp to one gram)
    assert got.select("doc_id").distinct().count() == 6


def test_capped_recall_small_sf(spark, sf_dir):
    """max_df=16 keeps EVERY planted verbatim-copy pair at small SFs
    (the dedup_winnow_capped gate claim; the sf0.1 density trade-off
    is documented in the gate docstring)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    copies = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(copies)
    sel = winnow_selected(corpus, "doc_id", "text")
    pairs = winnow_pairs_from_selected(sel, "doc_id", max_df=16, min_shared=5)
    planted = docs.filter(F.col("doc_id") % 5 == 0).count()
    hits = pairs.filter(F.col("id_b") == F.col("id_a") + 100000).count()
    assert hits == planted, f"capped recall {hits}/{planted}"


def test_winnow_dup_pairs_wrapper_unchanged(spark, sf_dir):
    """The composing wrapper (selection → pair gen) must equal the
    two-step path at the production cap."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    a = winnow_dup_pairs(docs, "doc_id", "text", max_df=50, min_shared=5)
    b = winnow_pairs_from_selected(
        winnow_selected(docs, "doc_id", "text"), "doc_id",
        max_df=50, min_shared=5,
    )
    assert sorted(a.collect()) == sorted(b.collect())
