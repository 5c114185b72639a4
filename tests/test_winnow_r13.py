"""Round-13 winnow df-cap default (VERDICT r12 task 4).

dedup_winnow_corpus now builds its pair graph at max_df=32 instead of
50.  The quality claim the docstring makes — tightening the cap drops
only INCIDENTAL boilerplate merges, never a planted-duplicate
decision — is pinned here at sf0.001: planted recall is identical
(100%) at both caps, every planted copy is removed by both keeper
sets, and the keeper-set difference (if any) is confined to original
documents merged through common fingerprints, not to planted pairs.
"""

from __future__ import annotations

import pytest

from hive_scd_spark.operators.cluster import dedup_corpus
from hive_scd_spark.operators.dedup import winnow_pairs_from_selected
from hive_scd_spark.queries import _dup_corpus, shared_winnow_selected

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sel(spark):
    return shared_winnow_selected(spark, SF)


def _planted_hits(sel, cap):
    pairs = winnow_pairs_from_selected(sel, "doc_id", max_df=cap, min_shared=5)
    return {
        r["id_a"]
        for r in pairs.filter("id_b = id_a + 100000").select("id_a").collect()
    }


def _keepers(spark, sel, cap):
    pairs = winnow_pairs_from_selected(sel, "doc_id", max_df=cap, min_shared=5)
    keep = dedup_corpus(_dup_corpus(spark, SF), pairs, "doc_id")
    return {r["doc_id"] for r in keep.select("doc_id").collect()}


def test_planted_recall_cap_invariant(spark, sel):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    planted = {r["doc_id"] for r in docs.filter("doc_id % 5 = 0").collect()}
    h32 = _planted_hits(sel, 32)
    h50 = _planted_hits(sel, 50)
    assert h32 == planted  # 100% recall at the production cap
    assert h32 == h50      # tightening 50 -> 32 loses no planted pair


def test_keeper_diff_is_incidental_only(spark, sel):
    k32 = _keepers(spark, sel, 32)
    k50 = _keepers(spark, sel, 50)
    # every planted copy is removed by BOTH keeper sets (the dedup
    # decision the gate exists for is cap-invariant)
    assert not any(d >= 100000 for d in k32)
    assert not any(d >= 100000 for d in k50)
    # whatever churn the cap causes is confined to incidental merges
    # among ORIGINAL documents (boilerplate-band false merges at 50)
    diff = k32 ^ k50
    assert all(d < 100000 for d in diff)
    # tightening the cap can only DROP pairs, so clusters shrink and
    # the keeper set can only grow
    assert k32 >= k50
