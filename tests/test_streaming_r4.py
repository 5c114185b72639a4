"""Round-4 streaming parity: streaming exact dedup (bounded-state
digest dedup) and the bin-bucketed range join running as a
stream-static join, each checked against its batch twin."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def test_dedup_stream_keeps_one_row_per_digest(spark, tmp_path):
    from hive_scd_spark.streaming import dedup_stream

    src = tmp_path / "docs_src"
    src.mkdir()
    rows = [
        (1, "2024-01-01 00:01:00", "Hello   World"),
        (2, "2024-01-01 00:02:00", "hello world"),  # dup of 1 after normalize
        (3, "2024-01-01 00:03:00", "something else"),
        (4, "2024-01-01 00:04:00", "HELLO WORLD"),  # dup again
    ]
    batch = spark.createDataFrame(
        rows, "doc_id long, ts_s string, text string"
    ).select("doc_id", F.col("ts_s").cast("timestamp").alias("ts"), "text")
    batch.coalesce(1).write.mode("overwrite").parquet(str(src))

    stream = spark.readStream.schema(batch.schema).parquet(str(src))
    out = dedup_stream(stream, text_col="text", ts_col="ts", watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        kept = spark.sql("SELECT * FROM dedup_out").collect()
    finally:
        q.stop()
    # one survivor per normalized digest: {hello world, something else}
    assert len(kept) == 2
    assert {r["text"].lower().split()[0] for r in kept} == {"hello", "something"}
    # batch twin agrees on WHICH contents are distinct (winner row may
    # differ: batch keeps min-id, streaming keeps first-arrived)
    from hive_scd_spark.operators.dedup import exact_dedup

    batch_kept = exact_dedup(batch, "doc_id", text_col="text").collect()
    assert len(batch_kept) == len(kept)


def test_range_join_stream_static_equals_batch(spark, tmp_path):
    """range_join's bin-bucketed equi-join composes with a streaming
    point side unchanged (stream-static inner join, append mode) and
    produces exactly the batch result on the same data."""
    from hive_scd_spark.operators.range_join import range_join

    src = tmp_path / "points_src"
    src.mkdir()
    batch_points = spark.createDataFrame(
        [(i, i * 7 % 100) for i in range(40)], "pid long, x long"
    )
    batch_points.coalesce(1).write.mode("overwrite").parquet(str(src))
    intervals = spark.createDataFrame(
        [(0, 0, 25), (1, 20, 60), (2, 55, 99)],
        "iv long, lo long, hi long",
    )

    stream_points = spark.readStream.schema(batch_points.schema).parquet(str(src))
    joined = range_join(stream_points, intervals, "x", "lo", "hi", bin_width=16)
    assert joined.isStreaming
    q = (
        joined.writeStream.format("memory")
        .queryName("rj_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            (r["pid"], r["iv"]) for r in spark.sql("SELECT * FROM rj_out").collect()
        )
    finally:
        q.stop()
    want = sorted(
        (r["pid"], r["iv"])
        for r in range_join(
            batch_points, intervals, "x", "lo", "hi", bin_width=16
        ).collect()
    )
    assert got == want and len(got) > 0


def test_decontam_stream_equals_batch(spark, tmp_path):
    """decontam_stream (stream-static gram join + complete-mode count)
    produces exactly the batch ngram_contamination result on the same
    data."""
    from hive_scd_spark.operators.decontam import ngram_contamination
    from hive_scd_spark.streaming import decontam_stream

    shared = "the quick brown fox jumps over the lazy dog near the old mill"
    src = tmp_path / "docs_src"
    src.mkdir()
    train = spark.createDataFrame(
        [
            (1, f"leading filler {shared} trailing filler words"),
            (2, "a perfectly clean training document with no overlap at all here"),
            (3, f"{shared} appears in this one too"),
        ],
        "doc_id long, text string",
    )
    train.coalesce(1).write.mode("overwrite").parquet(str(src))
    eval_df = spark.createDataFrame(
        [(100, f"benchmark item: {shared} answer")], "doc_id long, text string"
    )

    stream = spark.readStream.schema(train.schema).parquet(str(src))
    flagged = decontam_stream(stream, eval_df, "doc_id", "text", n=13)
    assert flagged.isStreaming
    q = (
        flagged.writeStream.format("memory")
        .queryName("decontam_out")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            (r["train_id"], r["eval_id"], r["n_shared"])
            for r in spark.sql("SELECT * FROM decontam_out").collect()
        )
    finally:
        q.stop()
    want = sorted(
        (r["train_id"], r["eval_id"], r["n_shared"])
        for r in ngram_contamination(train, eval_df, "doc_id", "text", n=13).collect()
    )
    assert got == want and len(got) == 2


def test_quality_filters_stream_equals_batch(spark, tmp_path):
    """The row-local r6 quality operators (PII redaction, repetition
    stats) are pure projections, so they compose with Structured
    Streaming unchanged — the streaming result over a file source must
    equal the batch result on the same data."""
    from hive_scd_spark.operators.quality import repetition_stats
    from hive_scd_spark.operators.text import redact_pii

    src = tmp_path / "quality_src"
    src.mkdir()
    rows = [
        (1, "mail a.b@test.org now\nmail a.b@test.org now"),
        (2, "clean line one\nclean line two"),
        (3, "x x x x x"),
    ]
    batch = spark.createDataFrame(rows, "doc_id long, text string")
    batch.coalesce(1).write.mode("overwrite").parquet(str(src))

    stream = spark.readStream.schema(batch.schema).parquet(str(src))
    # two independent parity checks (a stream-stream join would need
    # watermarks; each operator is checked as its own projection)
    for op, name in [
        (lambda df: redact_pii(df, "doc_id", "text"), "redact"),
        (lambda df: repetition_stats(df, "doc_id", "text"), "rep"),
    ]:
        q = (
            op(stream)
            .writeStream.format("memory")
            .queryName(f"quality_{name}")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            got = sorted(
                [tuple(r) for r in spark.sql(f"SELECT * FROM quality_{name}").collect()]
            )
        finally:
            q.stop()
        want = sorted([tuple(r) for r in op(batch).collect()])
        assert got == want, name
