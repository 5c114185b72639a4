"""Plan linter: known-bad plans flag, registry plans audit clean.

The linter (hive_scd_spark/plans/audit.py) mechanizes the plan-review
checklist applied by hand each round: no cartesian/unbounded
nested-loop joins, no row-pickled Python, no full-stream
single-partition exchanges.
"""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import Window, functions as F

from hive_scd_spark.plans.audit import assert_scale_safe, audit_plan


def codes(df):
    return sorted({f.code for f in audit_plan(df) if f.severity == "error"})


def test_cartesian_and_nested_loop_flag(spark):
    a = spark.range(100)
    b = spark.range(100).withColumnRenamed("id", "id2")
    assert codes(a.crossJoin(b)) == ["nested-loop"]
    with pytest.raises(AssertionError, match="nested-loop"):
        assert_scale_safe(a.crossJoin(b))


def test_one_row_aggregate_build_is_exempt(spark):
    a = spark.range(100)
    stats = a.agg(F.sum("id").alias("s"))
    assert codes(a.join(F.broadcast(stats))) == []


def test_row_udf_flags_but_pandas_udf_does_not(spark):
    from pyspark.sql.functions import pandas_udf, udf

    rowu = udf(lambda x: x + 1, "bigint")
    assert codes(spark.range(10).select(rowu("id"))) == ["python-row-udf"]

    @pandas_udf("bigint")
    def vec(x: pd.Series) -> pd.Series:
        return x + 1

    assert codes(spark.range(10).select(vec("id"))) == []


def test_global_window_flags_single_partition(spark):
    w = Window.orderBy("id")
    df = spark.range(100).withColumn("rn", F.row_number().over(w))
    assert codes(df) == ["single-partition"]
    # partitioned window is fine
    wp = Window.partitionBy(F.col("id") % 10).orderBy("id")
    assert codes(spark.range(100).withColumn("rn", F.row_number().over(wp))) == []


def test_global_aggregate_combine_is_exempt(spark):
    assert codes(spark.range(100).agg(F.sum("id"))) == []


def test_unpushed_filter_is_info_not_error(spark, sf_dir):
    # a filter Spark cannot push (expression over a computed value)
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.length(F.reverse("text")) % 7 == 3
    )
    fs = audit_plan(df)
    assert all(f.severity == "info" for f in fs)


# One representative per family; the ANN gates carry the documented
# bounded-build exemption (the query-vector set is small BY CONTRACT —
# a filtered scan, so the plan cannot prove it; the allowlist is the
# contract's signature).
SWEEP = [
    ("scd_asof_timeline", set()),
    ("q1_pricing_summary", set()),
    ("q5_local_supplier_revenue", set()),
    ("q13_customer_distribution", set()),
    ("q17_small_quantity_revenue", set()),
    ("q22_global_sales_opportunity", set()),
    ("window_running_supplier_revenue", set()),
    ("events_sessionize", set()),
    ("range_join_event_windows", set()),
    ("asof_join_click_purchase", set()),
    ("dedup_exact", set()),
    ("dedup_minhash_lsh", set()),
    ("dedup_exact_substring", set()),
    ("dedup_minhash_incremental", set()),
    ("window_range_frame_spend", set()),
    ("q19_disjunctive_pred", set()),
    ("decontam_ngram_overlap", set()),
    ("pack_sequences_ctx", set()),
    ("pipeline_corpus_to_sequences", set()),
    ("pipeline_semantic_dedup", set()),
    ("text_bm25_topk", set()),
    # bounded-build contract like the ANN gates: the BNLJ build is the
    # QUERY docs' hash embeddings (grouped per query doc — bounded by
    # the query-set contract, provably small but not 1-row)
    ("text_hash_embed_ann", {"nested-loop"}),
    ("table_profile_documents", set()),
    ("sample_token_budget_per_source", set()),
    ("shard_assignment", set()),
    ("ann_lsh_topk", set()),
    # r7 TPC-H completion: the 1-row scalar builds (q11 total, q15 max)
    # are the one-row-aggregate exemption; everything else must be clean
    ("q2_min_cost_supplier", set()),
    ("q9_product_profit", set()),
    ("q11_important_stock", set()),
    ("q12_shipping_priority_classes", set()),
    ("q15_top_supplier", set()),
    ("q16_supplier_part_counts", set()),
    ("q20_excess_shippers", set()),
    ("q21_waiting_orders", set()),
    # r7 banded SimHash Hamming search (bucket-local equi-join)
    ("dedup_simhash_near", set()),
    # r7 embedding-family incremental ingest (broadcast batch probe)
    ("dedup_embedding_lsh_incremental", set()),
    # r7 PassJoin edit-distance join (block-key equi-join + verify)
    ("fuzzy_typo_pairs", set()),
    # r7 weighted sampling (bounded explode + map-combined max + top-n)
    ("sample_weighted_docs", set()),
    # r7 two-table record linkage (same block-key equi-join shape)
    ("fuzzy_link_master", set()),
    # r7 mergeable-quantile sketch: the ungrouped cumulative window runs
    # over a ≤128-row sketch — bounded BY CONSTRUCTION (n_buckets), the
    # same provably-small-but-not-1-row contract as the ANN builds
    ("sketch_quantile_totalprice", {"single-partition"}),
    ("knn_brute_force", {"nested-loop"}),
    ("ivf_cosine_topk", {"nested-loop"}),
    ("ivf_kmeans_topk", {"nested-loop"}),
    # r9: the broadcast bitmap dimension is ONE row by construction
    # (IdentityBroadcastMode — the bitmap moved out of the plan literal
    # into a broadcast; an equi-join on a constant key constant-folds
    # back to the same BNLJ, so the exemption is the honest shape)
    ("decontam_bloom_screen", {"nested-loop"}),
    # r12 session-2 additions: heavy hitters and KN trigram are clean
    # (their 1-row totals ride the recognized one-row-aggregate
    # broadcast); PQ's BNLJ builds are the query-set-bounded LUT and
    # the n_sub x n_codes codebook — the ANN bounded-build contract
    ("sketch_heavy_hitters", set()),
    ("text_kn_trigram_logprob", set()),
    ("ann_pq_adc_topk", {"nested-loop"}),
    # r13: the incremental path shares the batch ADC back half
    # (_pq_adc_from_codes) — same query-set-bounded LUT / codebook
    # BNLJ builds, same exemption
    ("ann_pq_incremental", {"nested-loop"}),
    # r15: the IVF×PQ composition — the coarse-probe crossJoin builds
    # against the stride-sampled centroid table and the LUT builds are
    # both query-set/codebook-bounded (the ANN bounded-build contract);
    # the ADC scan itself is an equi-join on the stored list id
    ("ann_ivf_pq_topk", {"nested-loop"}),
    # r15 second tranche: the frozen-index serving loop shares the same
    # bounded centroid/LUT builds
    ("ann_ivf_pq_incremental", {"nested-loop"}),
    # span pipeline: row-local taggers + one reassembly shuffle
    ("text_span_scrub", set()),
    # NB classifier (V-bounded model broadcasts + 1-row totals) and the
    # session-2 capstone chaining span scrub into it
    ("select_nb_quality", set()),
    ("pipeline_scrub_classify_report", set()),
    # interval x interval overlap: equi-join on bin, no dedup pass
    ("range_join_interval_overlap", set()),
    # LOCF grid fill: explode grid + key-partitioned window
    ("events_gap_fill_locf", set()),
    # soft dedup: the audited CC pass + pair-graph-sized size groupBy
    ("sample_softdedup_weights", set()),
    # code quality: one codegen projection, no shuffle
    ("text_code_quality", set()),
    # KL drift report: vocabulary-bounded shuffles + broadcast models
    ("report_source_divergence", set()),
    # r13 second tranche: one key-partitioned window pass (zscore);
    # gram shuffle + source-bounded pair fan-out + two broadcast
    # totals joins (overlap matrix)
    ("events_anomaly_zscore", set()),
    ("report_source_overlap", set()),
]


@pytest.mark.parametrize("name,allow", SWEEP, ids=[n for n, _ in SWEEP])
def test_registry_plans_audit_scale_safe(spark, sf_dir, name, allow):
    from hive_scd_spark.queries import QUERIES

    assert_scale_safe(QUERIES[name](spark, sf_dir), allow=allow)


def test_global_limit_exchange_is_exempt(spark):
    """GlobalLimit <- Exchange SinglePartition <- LocalLimit carries at
    most partitions x limit rows — the docstring's 'global limit'
    exemption (was a confirmed false positive)."""
    dim = spark.range(10).withColumnRenamed("id", "k")
    df = (
        spark.range(100000)
        .limit(10)
        .join(F.broadcast(dim), F.col("id") == F.col("k"))
    )
    assert codes(df) == []


def test_nested_loop_exemption_requires_one_row_build(spark):
    """The exemption must check the build's substantive ROOT is a
    keys-empty aggregate — 'some aggregate anywhere below' let
    corpus-sized builds through (confirmed false negatives)."""
    big = spark.range(100000)
    one = spark.range(10).agg(F.sum("id").alias("s"))
    assert codes(big.join(F.broadcast(one))) == []
    deep = spark.range(5000).crossJoin(one)
    assert "nested-loop" in codes(big.crossJoin(F.broadcast(deep)))
    grouped = spark.range(5000).groupBy((F.col("id") % 7).alias("g")).count()
    assert "nested-loop" in codes(big.crossJoin(F.broadcast(grouped)))


def test_single_partition_exemption_requires_global_agg(spark):
    """A grouped FINAL aggregate under an Exchange SinglePartition is
    corpus-sized (one row per key) and must flag; only the keys-empty
    combine is exempt."""
    w = Window.orderBy("g")
    df = (
        spark.range(1000)
        .groupBy((F.col("id") % 5).alias("g"))
        .count()
        .withColumn("rn", F.row_number().over(w))
    )
    assert codes(df) == ["single-partition"]
