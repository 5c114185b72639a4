"""Unit tests for the round-5 training-pipeline operators:
sequence packing (operators/pack.py) and benchmark decontamination
(operators/decontam.py).  Value-level, hand-computed expectations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_scd_spark.operators.decontam import ngram_contamination
from hive_scd_spark.operators.pack import distributed_prefix_sum, pack_sequences


def test_prefix_sum_matches_serial(spark):
    rows = [(i, (i * 37) % 11 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, v long").repartition(7)
    out = {
        r["id"]: r["p"]
        for r in distributed_prefix_sum(df, [F.asc("id")], "v", "p").collect()
    }
    acc = 0
    for i, v in rows:
        assert out[i] == acc, i
        acc += v


def test_pack_sequences_hand_example(spark):
    # docs of 3, 5, 4 tokens, context 4:
    # stream offsets: d1=[0,3) d2=[3,8) d3=[8,12)
    # seq0=[0,4): d1 full (0..2), d2 first token
    # seq1=[4,8): d2 tokens 1..4
    # seq2=[8,12): d3 full
    df = spark.createDataFrame([(1, 3), (2, 5), (3, 4)], "doc_id long, n long")
    got = {
        (r["doc_id"], r["seq_id"]): (r["slice_start"], r["slice_len"])
        for r in pack_sequences(df, "doc_id", "n", 4).collect()
    }
    assert got == {
        (1, 0): (0, 3),
        (2, 0): (0, 1),
        (2, 1): (1, 4),
        (3, 2): (0, 4),
    }


def test_pack_sequences_drops_empty_docs_and_conserves_tokens(spark):
    df = spark.createDataFrame(
        [(i, max(0, (i * 13) % 7 - 1)) for i in range(300)], "doc_id long, n long"
    )
    out = pack_sequences(df, "doc_id", "n", 5).collect()
    expect = sum(max(0, (i * 13) % 7 - 1) for i in range(300))
    # every token lands in exactly one sequence slice
    assert sum(r.slice_len for r in out) == expect
    # no slice crosses a context boundary, no empty slices
    assert all(0 < r.slice_len <= 5 for r in out)
    empty_ids = {i for i in range(300) if max(0, (i * 13) % 7 - 1) == 0}
    assert not any(r.doc_id in empty_ids for r in out)
    # every sequence is filled to exactly context_len except the last
    per_seq = {}
    for r in out:
        per_seq[r.seq_id] = per_seq.get(r.seq_id, 0) + r.slice_len
    last = max(per_seq)
    assert set(per_seq) == set(range(last + 1))  # sequences are contiguous
    assert all(v == 5 for s, v in per_seq.items() if s != last)
    assert 0 < per_seq[last] <= 5
    # per-doc slices are contiguous and cover [0, n)
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.seq_id, r.slice_start, r.slice_len))
    for doc, slices in by_doc.items():
        slices.sort()
        n = max(0, (doc * 13) % 7 - 1)
        pos = 0
        for seq, start, ln in slices:
            assert start == pos
            pos += ln
        assert pos == n
        # the sequence ids a doc spans are consecutive
        seqs = [s for s, _st, _ln in slices]
        assert seqs == list(range(seqs[0], seqs[0] + len(seqs)))


def test_pack_sequences_rejects_bad_context():
    with pytest.raises(ValueError, match="context_len"):
        pack_sequences(None, "id", "n", 0)


def test_ngram_contamination_finds_planted_overlap(spark):
    shared = "the quick brown fox jumps over the lazy dog near the old mill"
    train = spark.createDataFrame(
        [
            (1, f"prefix words here {shared} and a different tail entirely"),
            (2, "no overlap with anything else in this corpus at all truly"),
            (3, f"{shared} copied verbatim straight into document three"),
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, f"benchmark question: {shared} answer choice")],
        "doc_id long, text string",
    )
    out = {
        (r["train_id"], r["eval_id"]): r["n_shared"]
        for r in ngram_contamination(train, eval_df, "doc_id", "text", n=13).collect()
    }
    assert set(out) == {(1, 100), (3, 100)}  # doc 2 is clean
    assert all(v >= 1 for v in out.values())


def test_ngram_contamination_short_docs_no_grams(spark):
    train = spark.createDataFrame([(1, "only five words right here")], "doc_id long, text string")
    eval_df = spark.createDataFrame([(2, "only five words right here")], "doc_id long, text string")
    assert ngram_contamination(train, eval_df, "doc_id", "text", n=13).count() == 0


def test_ngram_contamination_case_and_punct_invariant(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu"
    train = spark.createDataFrame([(1, base.upper())], "doc_id long, text string")
    eval_df = spark.createDataFrame(
        [(9, base.replace(" ", ", "))], "doc_id long, text string"
    )
    out = ngram_contamination(train, eval_df, "doc_id", "text", n=13).collect()
    assert len(out) == 1 and out[0]["n_shared"] == 1


def test_embedding_lsh_auto_planes_scale_with_corpus(spark):
    """n_planes='auto' sizes the bucket resolution from the corpus so a
    bigger corpus gets more planes (SCALE_NOTES r5 design rule)."""
    from hive_scd_spark.operators.dedup import auto_n_planes, embedding_near_dup_pairs

    # the heuristic itself: expected bucket population ~ target_bucket
    assert auto_n_planes(64, 32) == 2      # ceil(log2(2)) = 1, clamped to 2
    assert auto_n_planes(640, 32) == 5     # ceil(log2(20))
    assert auto_n_planes(5_000, 32) == 8
    assert auto_n_planes(50_000, 32) == 11
    assert auto_n_planes(1, 32) == 2       # degenerate corpora clamp
    assert auto_n_planes(10**12, 32) == 35  # 100 TB-class corpus

    def vecs(n):
        return spark.createDataFrame(
            [(i, [float((i * 7 + j) % 5 - 2) for j in range(8)]) for i in range(n)],
            "vec_id long, embedding array<float>",
        )

    # end-to-end: auto mode builds and runs
    out = embedding_near_dup_pairs(
        vecs(128), use_lsh=True, n_planes="auto", n_bands=2, target_bucket=16
    )
    assert out.columns == ["id_a", "id_b", "cos"]
    out.collect()

    with __import__("pytest").raises(ValueError, match="n_planes"):
        embedding_near_dup_pairs(vecs(8), use_lsh=True, n_planes="bogus")


def test_cap_per_group_deterministic_and_bounded(spark):
    from hive_scd_spark.operators.sampling import cap_per_group

    df = spark.createDataFrame(
        [(i, f"src{i % 3}") for i in range(100)], "id long, grp string"
    )
    out = cap_per_group(df, "grp", "id", 7, rank_col="rk").collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r.grp, []).append((r.rk, r.id))
    assert set(by_grp) == {"src0", "src1", "src2"}
    for grp, rows in by_grp.items():
        assert sorted(r for r, _ in rows) == list(range(1, 8))
    # determinism: same selection on a different partitioning
    out2 = cap_per_group(df.repartition(13), "grp", "id", 7).collect()
    assert sorted(r.id for r in out) == sorted(r.id for r in out2)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="n must be positive"):
        cap_per_group(df, "grp", "id", 0)


def test_decontaminate_removes_hits_keeps_rest(spark):
    """decontaminate = train minus any doc sharing >=min_shared
    13-grams with the eval set; survivors keep ALL their columns."""
    from hive_scd_spark.operators.decontam import decontaminate

    base = " ".join(f"w{i}" for i in range(20))  # 20 words, shares 13-grams
    train = spark.createDataFrame(
        [
            (1, base + " tail one", "s1"),       # contaminated (prefix overlap)
            (2, "completely different words " * 5, "s2"),  # clean
            (3, "short doc", "s3"),              # <13 words: no grams, clean
        ],
        "doc_id int, text string, source string",
    )
    eval_df = spark.createDataFrame([(100, base + " other ending")], "doc_id int, text string")
    out = decontaminate(train, eval_df, "doc_id", "text", n=13)
    assert set(out.columns) == {"doc_id", "text", "source"}
    assert {r["doc_id"] for r in out.collect()} == {2, 3}


def test_decontaminate_min_shared_threshold(spark):
    """min_shared above the actual overlap keeps the document."""
    from hive_scd_spark.operators.decontam import decontaminate

    words = " ".join(f"w{i}" for i in range(13))  # exactly one 13-gram
    train = spark.createDataFrame([(1, words)], "doc_id int, text string")
    eval_df = spark.createDataFrame([(9, words)], "doc_id int, text string")
    assert decontaminate(train, eval_df, "doc_id", "text", min_shared=2).count() == 1
    assert decontaminate(train, eval_df, "doc_id", "text", min_shared=1).count() == 0
