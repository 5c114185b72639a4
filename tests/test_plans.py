"""Plan-quality assertions — the 100 TB design properties, enforced.

These tests pin the *physical plan shape*, not results: predicate
pushdown through the compiled SCD chain, column pruning, dimension
broadcast, and a Python-free row path for the JVM-only operators.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from hive_scd_spark.plans import (
    codegen_stage_count,
    physical_plan,
    plan_summary,
    pushed_filters,
    scan_read_schemas,
    uses_broadcast_join,
)
from hive_scd_spark.scd import apply_statements


@pytest.fixture(scope="module")
def dim_parquet(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("dimplan") / "dim"
    spark.range(10000).selectExpr(
        "id",
        "cast(id % 97 as double) as bal",
        "concat('name_', id) as name",
        "cast(id % 5 as int) as grp",
    ).write.mode("overwrite").parquet(str(d))
    return str(d)


def test_filter_on_untouched_column_pushes_into_scan(spark, dim_parquet):
    base = spark.read.parquet(dim_parquet)
    out = apply_statements(
        base, "UPDATE t SET bal = bal * 2 WHERE grp = 1;"
    ).filter(F.col("id") > 9000)
    # `id` is not assigned by any statement → the query filter must
    # reach the parquet scan as a pushed filter
    assert "GreaterThan(id,9000)" in pushed_filters(out)


def test_column_pruning_through_scd_chain(spark, dim_parquet):
    base = spark.read.parquet(dim_parquet)
    out = apply_statements(base, "DELETE FROM t WHERE grp = 3;").select("id", "grp")
    (schema,) = scan_read_schemas(out)
    # neither bal nor name is needed → pruned from the scan
    assert "bal" not in schema and "name" not in schema


def test_scd_chain_single_codegen_stage(spark, dim_parquet):
    base = spark.read.parquet(dim_parquet)
    out = apply_statements(
        base,
        "UPDATE t SET bal = bal + 1 WHERE grp = 0;\n"
        "UPDATE t SET name = upper(name) WHERE bal > 50;\n"
        "DELETE FROM t WHERE grp = 4;",
    )
    # three statements fuse into ONE codegen span over the scan —
    # the reference's 3×-per-row H2 replay becomes straight-line code
    assert codegen_stage_count(out) == 1
    assert plan_summary(out)["shuffles"] == 0


def test_flagship_join_broadcasts_dimension(spark, sf_dir):
    from hive_scd_spark.queries import QUERIES

    df = QUERIES["scd_customer_orders_revenue"](spark, sf_dir)
    assert uses_broadcast_join(df)


def test_jvm_operators_have_no_python_in_plan(spark, sf_dir):
    from hive_scd_spark.queries import QUERIES

    for name in [
        "dedup_minhash_lsh",
        "text_quality_stats",
        "events_sessionize",
        "text_repetition_stats",
        "text_unigram_logprob",
        "text_redact_pii",
        "text_chunk_sliding",
        "sample_token_budget_per_source",
        "embedding_quantize_int8",
        "corpus_top_ngrams",
        "text_remove_boilerplate",
        "text_url_domain_filter",
        "sample_split_assign",
        "text_script_detect",
        "text_hash_embed_ann",
        "corpus_source_report",
        "text_strip_html",
        "pipeline_semantic_dedup",
    ]:
        df = QUERIES[name](spark, sf_dir)
        assert plan_summary(df)["python_evals"] == 0, name


def test_multimodal_uses_arrow_python(spark, sf_dir):
    from hive_scd_spark.queries import QUERIES

    df = QUERIES["multimodal_image_features"](spark, sf_dir)
    plan = physical_plan(df)
    # the pandas path must be Arrow-vectorized, not row-pickled
    assert "MapInPandas" in plan or "ArrowEvalPython" in plan

def test_capstone_pipeline_plan_is_scale_safe(spark, sf_dir):
    """The composed dedup→filter→cap→pack plan must stay a chain of
    hash/window/broadcast operators — no nested-loop or cartesian
    joins anywhere, and no row-at-a-time Python."""
    from hive_scd_spark.queries import QUERIES

    df = QUERIES["pipeline_corpus_to_sequences"](spark, sf_dir)
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan_summary(df)["python_evals"] == 0


def test_substring_dedup_plan_is_join_free_single_scan(spark, sf_dir):
    """substring_dup_pairs must compute doc-frequency + representative
    as window aggregates — the aggregate-then-rejoin form broadcasts a
    CORPUS-SIZED per-gram stats table (one row per distinct gram) on a
    small-input estimate, a driver OOM at scale."""
    from hive_scd_spark.queries import QUERIES

    df = QUERIES["dedup_exact_substring"](spark, sf_dir)
    plan = physical_plan(df)
    assert "Join" not in plan
    s = plan_summary(df)
    assert s["scans"] == 1
    assert s["python_evals"] == 0
