"""Structured Streaming extensions.

The reference is strictly batch (read-time SCD); streaming is the
rebuild's north-star extension (SURVEY.md §7.6).  Two pieces:

- :func:`scd_stream` — the *same compiled statement chain* applied to a
  streaming DataFrame.  Because ``apply_statements`` folds to stateless
  projections/filters, it composes with any streaming source unchanged
  — one code path for batch and streaming (the Catalyst payoff again).
- :func:`windowed_event_counts` — watermarked tumbling-window
  aggregation over an event stream, the standard late-data-tolerant
  rollup.  Batch equivalence is tested against
  ``queries.events_window_counts``.
- :func:`scd_snapshot_sink` — ``foreachBatch`` writer keeping a Parquet
  "current snapshot" in sync, the streaming version of the README's
  compaction pattern (``README.md:239-244``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from hive_scd_spark.scd import apply_statements


def scd_stream(stream_df: DataFrame, stmts, as_of=None) -> DataFrame:
    """Apply a parsed (or raw-text) .updates statement chain to a
    streaming DataFrame.  Stateless → supported in any output mode."""
    return apply_statements(stream_df, stmts, as_of=as_of)


def windowed_event_counts(
    stream_df: DataFrame,
    ts_col: str = "ts",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    group_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling-window counts/sums with a watermark for late data."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window), F.col(group_col))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(value_col).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col(group_col),
            "n_events",
            "sum_value",
        )
    )


def sessionize_stream(
    stream_df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Custom stateful streaming operator: per-user sessionization with
    an inactivity gap, via ``applyInPandasWithState``.

    State per user = (session_count, last_event_ts).  Each micro-batch
    folds its events into the state and emits one row per user with the
    updated totals.  This is the pattern for operators Spark's built-in
    streaming aggregations can't express (session ids spanning
    micro-batches); state lives in the state store, partitioned by the
    group key, so it scales horizontally like any keyed stream."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, n_sessions long, n_events long"
    state_schema = "n_sessions long, n_events long, last_ts double"

    def fold(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        if state.exists:
            n_sessions, n_events, last_ts = state.get
        else:
            n_sessions, n_events, last_ts = 0, 0, None
        for pdf in pdfs:
            for ts in sorted(pdf[ts_col]):
                t = ts.timestamp()
                if last_ts is None or t - last_ts > gap_seconds:
                    n_sessions += 1
                n_events += 1
                last_ts = t
        state.update((n_sessions, n_events, last_ts))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_sessions": [n_sessions], "n_events": [n_events]}
        )

    return stream_df.groupBy(user_col).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_stream(
    stream_df: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    normalize: bool = True,
) -> DataFrame:
    """Streaming exact dedup by content digest — the streaming
    complement of ``operators.dedup.exact_dedup``.

    Uses ``dropDuplicatesWithinWatermark`` so the dedup state store
    holds only digests younger than the watermark: duplicates arriving
    within the window are dropped, and state is EVICTED as the
    watermark advances — bounded memory at any stream volume, which
    plain ``dropDuplicates`` on a stream (state grows forever) does
    not give.  The digest (md5 of normalized text) matches the batch
    operator exactly, so batch backfill + streaming ingest agree on
    what "duplicate" means."""
    from hive_scd_spark.functions import norm_text

    key = F.md5(norm_text(text_col) if normalize else F.col(text_col))
    return (
        stream_df.withColumn("__content_key", key)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__content_key"])
        .drop("__content_key")
    )


def scd_snapshot_sink(stream_df: DataFrame, stmts, path: str, checkpoint: str):
    """writeStream.foreachBatch sink: apply the SCD chain to each
    micro-batch and append to a Parquet snapshot directory."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        apply_statements(batch_df, stmts, as_of=None).write.mode("append").parquet(path)

    return (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(write_batch)
    )


def decontam_stream(
    stream_df: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str | None = None,
    n: int = 13,
    min_shared: int = 1,
) -> DataFrame:
    """Streaming benchmark decontamination — the streaming complement of
    ``operators.decontam.ngram_contamination``: incoming documents are
    flagged against a STATIC held-out set as they arrive.

    Plan shape mirrors the batch operator: the stream side computes its
    word n-gram hashes row-locally (``array_distinct`` before the
    explode — no stream-side shuffle), the static benchmark gram list
    broadcasts, and the stream-static inner join emits one row per
    (stream doc, eval doc, shared gram).  The per-pair ``n_shared``
    groupBy is a streaming STATEFUL aggregation (complete/update output
    modes) whose state is one counter per CONTAMINATED pair — hits, not
    corpus — so it stays bounded at any stream volume.  For an
    append-only document stream (each doc arrives once) the result
    equals batch ``ngram_contamination`` exactly (parity-pinned in
    ``tests/test_streaming_r4.py``).

    Every operation in the batch operator is stream-compatible, so this
    IS the batch operator applied to a streaming DataFrame — one body,
    so batch fixes can never silently diverge from the parity contract."""
    from hive_scd_spark.operators.decontam import ngram_contamination

    return ngram_contamination(
        stream_df,
        eval_df,
        id_col,
        text_col,
        eval_id_col=eval_id_col,
        n=n,
        min_shared=min_shared,
    )


def minhash_ingest_sink(
    stream_df: DataFrame,
    state_path: str,
    pairs_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    threshold: float = 0.3,
):
    """Continuous-ingest near-dup detection: a ``foreachBatch`` loop
    around ``operators.dedup.minhash_incremental_pairs`` maintaining
    the persisted band-table state.

    Per micro-batch: (1) detect every verified near-dup pair between
    the batch and the standing corpus state at *state_path* (plus
    within-batch pairs) and append them to *pairs_path*; (2) append the
    batch's own band rows to the state, so later batches dedup against
    it.  Batch-side work is bounded by batch size (its band table
    broadcasts); the corpus state is only ever PROBED and appended —
    never rewritten, never shuffled.  Exactly the incremental contract
    of ``minhash_incremental_pairs``, driven by the streaming engine's
    delivery/checkpoint machinery.

    Verification needs candidate texts, so the batch's (id, text) pairs
    are also appended to the state directory (subdir ``texts``) —
    state growth is one band-table row per (doc, band) plus the text
    payload, both linear in ingested volume.  foreachBatch sinks are
    at-least-once: a replayed batch re-appends its rows; downstream
    consumers of *pairs_path* dedupe on (id_a, id_b) — documented
    rather than hidden, matching scd_snapshot_sink's contract."""
    from hive_scd_spark.operators.dedup import (
        minhash_band_table,
        minhash_incremental_pairs,
    )

    bands_dir = f"{state_path}/bands"
    texts_dir = f"{state_path}/texts"

    def ingest(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.select(id_col, text_col).localCheckpoint()
        # state probe through Spark's reader, NOT driver-local
        # os.path.exists — state_path is any Hadoop filesystem
        # (hdfs://, s3a://); a local-only check would silently take the
        # first-batch path forever and never detect cross-corpus dups.
        # ONLY path-not-found means "no state yet": any other failure
        # (throttle, permissions, corrupt footer) must raise, or the
        # batch would silently dedup against nothing while the pair log
        # permanently misses its cross-corpus pairs
        from pyspark.errors import AnalysisException

        try:
            corpus_bands = spark.read.parquet(bands_dir)
            corpus_texts = spark.read.parquet(texts_dir)
            have_state = True
        except AnalysisException as exc:
            msg = str(exc)
            if "PATH_NOT_FOUND" not in msg and "Path does not exist" not in msg:
                raise
            have_state = False
        # the batch band table is computed ONCE (checkpointed) and
        # serves both pair detection and the state append — the
        # signature pipeline is the dominant per-batch CPU cost
        nb = minhash_band_table(batch_df, id_col, text_col, k=k).localCheckpoint()
        if have_state:
            pairs = minhash_incremental_pairs(
                batch_df,
                corpus_texts,
                id_col,
                text_col,
                corpus_bands=corpus_bands,
                new_bands=nb,
                k=k,
                threshold=threshold,
            )
        else:
            # first batch: only within-batch pairs exist — the
            # incremental path with an EMPTY corpus reuses nb for the
            # within-batch self-join instead of re-signing the batch
            empty = spark.createDataFrame([], batch_df.schema)
            pairs = minhash_incremental_pairs(
                batch_df,
                empty,
                id_col,
                text_col,
                corpus_bands=nb.limit(0),
                new_bands=nb,
                k=k,
                threshold=threshold,
            )
        pairs.write.mode("append").parquet(pairs_path)
        nb.write.mode("append").parquet(bands_dir)
        batch_df.write.mode("append").parquet(texts_dir)

    return (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(ingest)
    )


def embedding_ingest_sink(
    stream_df: DataFrame,
    state_path: str,
    pairs_path: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
    n_planes: int = 4,
    n_bands: int = 4,
    dim: int | None = None,
):
    """Continuous-ingest embedding near-dup detection — the
    embedding-family mirror of :func:`minhash_ingest_sink`: a
    ``foreachBatch`` loop around
    ``operators.dedup.embedding_incremental_pairs`` maintaining the
    persisted band-bucket state.

    Per micro-batch: (1) every verified cosine pair between the batch
    and the standing corpus state (plus within-batch pairs) is
    appended to *pairs_path*; (2) the batch's own bucket rows and
    (id, vector) payloads are appended to the state.  The corpus state
    is only ever PROBED and appended — never rewritten, never
    shuffled; the md5-seeded hyperplanes mean the state needs no plane
    matrix and survives session restarts by construction.  Same
    at-least-once append contract as minhash_ingest_sink (downstream
    dedupes on (id_a, id_b))."""
    from hive_scd_spark.operators.dedup import embedding_incremental_pairs
    from hive_scd_spark.operators.similarity import lsh_band_buckets

    buckets_dir = f"{state_path}/buckets"
    vectors_dir = f"{state_path}/vectors"

    def ingest(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.select(id_col, vec_col).localCheckpoint()
        # state probe through Spark's reader with the strict-error
        # contract of minhash_ingest_sink: only path-not-found means
        # "no state yet" — anything else must raise, or the batch
        # would silently dedup against nothing
        from pyspark.errors import AnalysisException

        try:
            corpus_buckets = spark.read.parquet(buckets_dir)
            corpus_vectors = spark.read.parquet(vectors_dir)
            have_state = True
        except AnalysisException as exc:
            msg = str(exc)
            if "PATH_NOT_FOUND" not in msg and "Path does not exist" not in msg:
                raise
            have_state = False
        # bucket the batch ONCE (checkpointed) for both pair detection
        # and the state append
        nb = lsh_band_buckets(
            batch_df, id_col, vec_col, n_planes, n_bands, dim
        ).localCheckpoint()
        if have_state:
            pairs = embedding_incremental_pairs(
                batch_df,
                corpus_vectors,
                id_col,
                vec_col,
                corpus_buckets=corpus_buckets,
                new_buckets=nb,
                threshold=threshold,
                n_planes=n_planes,
                n_bands=n_bands,
                dim=dim,
            )
        else:
            empty = spark.createDataFrame([], batch_df.schema)
            pairs = embedding_incremental_pairs(
                batch_df,
                empty,
                id_col,
                vec_col,
                corpus_buckets=nb.limit(0),
                new_buckets=nb,
                threshold=threshold,
                n_planes=n_planes,
                n_bands=n_bands,
                dim=dim,
            )
        pairs.write.mode("append").parquet(pairs_path)
        nb.write.mode("append").parquet(buckets_dir)
        batch_df.write.mode("append").parquet(vectors_dir)

    return (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(ingest)
    )


def histogram_ingest_sink(
    stream_df: DataFrame,
    state_path: str,
    checkpoint: str,
    value_col: str,
    lo: float,
    hi: float,
    n_buckets: int = 128,
):
    """Continuous quantile-sketch maintenance: per micro-batch, build
    the batch's equi-width histogram sketch
    (``operators.profile.histogram_sketch``) and APPEND it to
    *state_path* — merge is a sum of counts, so the state never needs
    rewriting and any reader answers percentiles from
    ``histogram_merge`` + ``histogram_quantiles`` over the state read
    through :func:`read_histogram_state`.  The streaming mirror of the
    HLL/minhash persist-and-merge loops: state is fixed-size per batch
    (≤ n_buckets rows).

    Replay caveat — sharper here than in the pair sinks: foreachBatch
    is at-least-once, and where a replayed PAIR row is harmless after
    (id_a, id_b) dedup, a replayed SKETCH row double-COUNTS.  Batch
    content is deterministic per epoch, so the epoch column written
    with every row makes the fix exact: dedup on (epoch, bucket)
    before merging — which :func:`read_histogram_state` does; read the
    state through it, not with a bare ``spark.read``."""
    from hive_scd_spark.operators.profile import histogram_sketch

    def ingest(batch_df: DataFrame, epoch_id: int) -> None:
        sk = histogram_sketch(batch_df, value_col, lo, hi, n_buckets)
        sk.withColumn("epoch", F.lit(epoch_id)).write.mode("append").parquet(
            state_path
        )

    return (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(ingest)
    )


def read_histogram_state(spark, state_path: str) -> DataFrame:
    """Read :func:`histogram_ingest_sink` state with replayed epochs
    collapsed: a crash between the parquet append and the checkpoint
    commit re-appends that epoch's (deterministic) sketch rows, so
    exactly-once counts are restored by dropping duplicate
    (epoch, bucket) rows before the merge.  Returns (bucket, cnt)
    rows ready for ``histogram_merge``."""
    return (
        spark.read.parquet(state_path)
        .dropDuplicates(["epoch", "bucket"])
        .drop("epoch")
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "10 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-STREAM interval join: pair each left event with the right
    events of the same *key* arriving within ``[left_ts, left_ts +
    within]`` — the click→purchase attribution shape, both sides live
    streams (the stream-static variant is plain ``range_join``
    composition; this is the one that needs engine state).

    Both sides carry a watermark, and the time-bound condition is what
    lets the engine EVICT state: a buffered left row can stop waiting
    once the right watermark passes ``left_ts + within``, so state is
    bounded by (watermark + within) × arrival rate, not by stream
    history.  Spark rejects the join without both constraints — the
    API here just packages the contract (rename-safe columns, the
    interval condition spelled once) so callers can't accidentally
    build the unbounded version.  Batch parity: applying the same
    condition to static frames gives the identical row set
    (pinned in tests/test_streaming_r6.py)."""
    lt = left.withWatermark(left_ts, watermark).alias("l")
    rt = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {within}")
        )
    )
    return lt.join(rt, cond)


def statement_log_sink(
    stmt_stream: DataFrame,
    base_df: DataFrame,
    path: str,
    checkpoint: str,
    seq_col: str = "seq",
    sql_col: str = "sql",
    compat: str = "quoted",
):
    """SCD with the DML STATEMENTS arriving as a stream (SURVEY §7.6
    second form; the reference's ``.updates`` file is the batch
    rendering of exactly this log, ``SQLUpdater.java:96-108``).

    Each micro-batch of ``(seq, sql)`` rows — ``sql`` holding one DML
    statement, optionally prefixed by its ``-- time=`` directive — is:

    1. appended DURABLY to ``<path>/_statement_log/epoch=<id>`` with
       overwrite-on-retry, so a replayed batch lands idempotently (the
       foreachBatch at-least-once contract becomes exactly-once for
       the log);
    2. folded into a full recompile: the ENTIRE accumulated log, in
       ``seq`` order, goes through the same ``apply_statements``
       compiler as a batch ``.updates`` script, and the resulting
       current snapshot (``as_of=None`` — the as-of default) is
       atomically rewritten at ``<path>/snapshot``.

    Recompile-per-batch is the right cost model: a statement log is
    human-scale (the reference's worked example is 5 statements), the
    compiled chain is a projection stack costing ~a select, and the
    recompile is what keeps EVENT-TIME as-of exact — a statement whose
    ``-- time=`` predates an earlier batch's frontier still lands in
    its correct position in the chain, because the chain is rebuilt
    from the full ordered log, never incrementally appended.  Late
    statements therefore need no watermark: ordering comes from
    ``seq``, selection from the time directives.

    :func:`read_statement_log_scd` reads the table at ANY as-of from
    the durable log — the parity contract (pinned in tests): statements
    split across N micro-batches ≡ batch ``apply_statements`` over the
    whole script, at every as-of.
    """
    log_dir = f"{path}/_statement_log"
    snap_dir = f"{path}/snapshot"

    def ingest(batch_df: DataFrame, epoch_id: int) -> None:
        new = batch_df.select(seq_col, sql_col)
        # per-epoch overwrite: replays rewrite the same directory
        new.coalesce(1).write.mode("overwrite").parquet(
            f"{log_dir}/epoch={epoch_id}"
        )
        snapshot = read_statement_log_scd(
            batch_df.sparkSession,
            base_df,
            path,
            as_of=None,
            seq_col=seq_col,
            sql_col=sql_col,
            compat=compat,
        )
        # localCheckpoint cuts the snapshot's lineage from the parquet
        # files about to be overwritten — overwrite-what-you-read
        snapshot.localCheckpoint().write.mode("overwrite").parquet(snap_dir)

    return (
        stmt_stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(ingest)
    )


def read_statement_log_scd(
    spark,
    base_df: DataFrame,
    path: str,
    as_of=None,
    seq_col: str = "seq",
    sql_col: str = "sql",
    compat: str = "quoted",
    max_statements: int = 100_000,
) -> DataFrame:
    """Read the SCD table at *as_of* from a statement log maintained by
    :func:`statement_log_sink`: the accumulated statements are
    reassembled in ``seq`` order into one script and compiled by the
    SAME ``apply_statements`` path as a batch ``.updates`` file — one
    compiler, two delivery mechanisms.

    The driver collect is bounded by the statement log (human-scale by
    nature — it is the same text a batch deployment would keep in one
    ``.updates`` file), and *max_statements* makes the bound LOUD (the
    package's census idiom): a log past the cap raises with the count
    and the remedy (compact/snapshot the table, or raise the cap
    consciously) instead of silently materializing an unbounded script
    on the driver.  No log yet → the base table unchanged (the
    reference's missing-updates-file behavior, SQLUpdater.java:96)."""
    from pyspark.errors import AnalysisException

    if max_statements < 1:
        raise ValueError(f"max_statements must be positive, got {max_statements}")
    log_dir = f"{path}/_statement_log"
    try:
        # limit(cap+1) bounds the collect itself; the +1 row is the
        # loud-overflow sentinel, never compiled
        rows = (
            spark.read.parquet(log_dir)
            .select(seq_col, sql_col)
            .orderBy(seq_col)
            .limit(max_statements + 1)
            .collect()
        )
    except AnalysisException as exc:
        msg = str(exc)
        if "PATH_NOT_FOUND" not in msg and "Path does not exist" not in msg:
            raise
        rows = []
    if len(rows) > max_statements:
        raise ValueError(
            f"read_statement_log_scd: statement log at {log_dir} exceeds "
            f"max_statements={max_statements}.  A log this large is no "
            f"longer a human-scale update script — snapshot/compact the "
            f"table to fold history into the base, or raise "
            f"max_statements explicitly if the log really is that long."
        )
    if not rows:
        return base_df
    script = "\n".join(
        r[sql_col].rstrip().rstrip(";") + ";" for r in rows
    )
    return apply_statements(base_df, script, as_of=as_of, compat=compat)


def warc_stream(spark, path: str) -> DataFrame:
    """Continuous WARC ingestion — the crawl first mile as a stream:
    new ``.warc`` / ``.warc.gz`` files landing under *path* decode into
    :data:`~hive_scd_spark.sources.warc.WARC_SCHEMA` rows as they
    arrive.  Built on the ``binaryFile`` streaming source (file-arrival
    semantics, checkpointable exactly-once per file) + the same
    executor-side record parser the batch reader uses — one decode code
    path for batch and streaming.

    Granularity note: streaming decodes ONE TASK PER FILE (the
    ``maxFilesPerTrigger`` option bounds a micro-batch).  Byte-range
    splits are a BATCH optimization for oversized files; a crawl
    delivery pipeline ships bounded-size files (CommonCrawl: ~1 GB), so
    file-granular is the honest streaming unit — and parity with the
    split batch path is pinned in ``tests/test_warc_stream_r9.py``.
    """
    from collections.abc import Iterator

    from hive_scd_spark.sources.warc import (
        WARC_SCHEMA,
        _parse_gzip_file,
        parse_warc_bytes,
    )

    cols = [f.name for f in WARC_SCHEMA.fields]

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            for r in pdf.itertuples(index=False):
                data = bytes(r.content)
                rows = (
                    _parse_gzip_file(data)
                    if str(r.path).endswith(".gz")
                    else parse_warc_bytes(data)
                )
                yield pd.DataFrame(
                    [[row.get(c) for c in cols] for row in rows],
                    columns=cols,
                    dtype=object,
                )

    # streaming sources require an explicit schema; binaryFile's is
    # fixed by the format
    binary = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("pathGlobFilter", "[!._]*")
        .load(path)
    )
    return binary.select("path", "content").mapInPandas(decode, schema=WARC_SCHEMA)


def frequent_ingest_sink(
    stream_df: DataFrame,
    state_path: str,
    checkpoint: str,
    key_col: str,
    capacity: int = 512,
):
    """Continuous frequent-items maintenance — the FREQUENCY member of
    the streaming sketch loops (distinct → minhash/embedding ingest,
    quantile → :func:`histogram_ingest_sink`, frequency → this).  Per
    micro-batch: the batch's Misra-Gries candidates
    (``operators.profile.mg_candidates``, ≤ *capacity* keys per
    partition) are exact-counted within the batch by broadcast
    semi-join — foreachBatch re-reads the SAME static epoch data, so
    the two-pass trick batch :func:`~hive_scd_spark.operators.profile.
    heavy_hitters` uses survives streaming intact — and APPENDED to
    *state_path* as (key, cnt, epoch, batch_n, capacity) rows.

    What the state can answer (through :func:`read_frequent_state`):
    for every key, exact-count-where-candidate plus a per-epoch miss
    bound — a non-candidate of epoch b carries at most
    ``d_b = batch_n/(capacity+1)`` occurrences (the MG pass-1
    guarantee), so ``cnt_min ≤ c(key) ≤ cnt_min + Σ_absent d_b`` with
    NO false negatives for any φ = 1/k ≥ 1/capacity.  This is the
    honest streaming trade-off made explicit: the raw stream is gone,
    so instead of a second exact pass the reader returns certified
    [cnt_min, cnt_max] intervals.

    Replay caveat (the histogram sink's, verbatim): foreachBatch is
    at-least-once and a replayed count row double-counts; batch
    content is deterministic per epoch, so the reader's
    (run, epoch, key) dedup restores exactly-once.  Epoch ids are only
    unique WITHIN one checkpoint — a second query appending to the
    same *state_path* from a fresh checkpoint restarts at epoch 0 — so
    every row is stamped with ``run`` = md5(checkpoint path): restarts
    of the SAME query (same checkpoint, replayed epoch ids) dedup
    away, while distinct queries keep distinct (run, epoch) meta rows
    and their batch totals add, never collide.  Read the state through
    :func:`read_frequent_state`, never bare ``spark.read``."""
    import hashlib

    from hive_scd_spark.operators.profile import mg_candidates

    run_id = hashlib.md5(str(checkpoint).encode("utf-8")).hexdigest()[:16]

    def ingest(batch_df: DataFrame, epoch_id: int) -> None:
        keyed = batch_df.select(F.col(key_col)).filter(F.col(key_col).isNotNull())
        n_b = keyed.count()
        if n_b == 0:
            return
        cand = mg_candidates(keyed, key_col, capacity)
        counts = (
            keyed.join(F.broadcast(cand), key_col, "left_semi")
            .groupBy(key_col)
            .agg(F.count("*").alias("cnt"))
        )
        (
            counts.withColumn("run", F.lit(run_id))
            .withColumn("epoch", F.lit(epoch_id))
            .withColumn("batch_n", F.lit(n_b))
            .withColumn("capacity", F.lit(capacity))
            .write.mode("append")
            .parquet(state_path)
        )

    return (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(ingest)
    )


def scrub_classify_sink(
    stream_df: DataFrame,
    out_path: str,
    checkpoint: str,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 1000,
    threshold: float = 0.0,
    drop_attrs: tuple = ("too_short", "has_pii", "symbol_heavy"),
    min_tokens: int = 3,
    max_symbol_ratio: float = 0.5,
):
    """Streaming curation lane (VERDICT r12 task 7): documents arrive
    → span scrub (offset-exact paragraph spans → row-local taggers →
    mixer, ``operators/text.py``) → NB quality scoring against a
    FROZEN :func:`~hive_scd_spark.operators.quality.nb_model` table →
    scored scrubbed rows appended to *out_path*.

    The model is the load-bearing argument: train it ONCE on the
    static trusted/rejected reference corpora (``nb_model``), persist
    it (V+1 rows), and pass it in — per-batch retraining would both
    re-scan the references every trigger and make scores depend on
    trigger boundaries.  With the model frozen, every pipeline step is
    row-local per document, so the union of per-batch outputs is
    VALUE-IDENTICAL to the batch path (scrub + ``nb_score``) over the
    concatenated corpus — the curation-composition batch-equivalence
    pin, extended to the session-2 quality families
    (``tests/test_streaming_scrub.py``).

    Output columns: (id_col, scrubbed_text, n_spans_kept,
    n_spans_removed, chars_removed, n_tokens, nb_logodds, kept).
    Replay caveat: foreachBatch is at-least-once; rows are
    deterministic per document, so readers dedup on *id_col* (the
    statement-log precedent)."""
    from hive_scd_spark.operators.quality import nb_score
    from hive_scd_spark.operators.text import (
        paragraph_spans,
        scrub_spans,
        tag_span_attrs,
    )

    def ingest(batch_df: DataFrame, epoch_id: int) -> None:
        base = batch_df.select(F.col(id_col), F.col(text_col))
        spans = paragraph_spans(base, id_col, text_col)
        attrs = tag_span_attrs(
            spans, id_col, min_tokens=min_tokens,
            max_symbol_ratio=max_symbol_ratio,
        )
        scrubbed = scrub_spans(
            base, spans, attrs, id_col, text_col, drop_attrs=drop_attrs
        )
        scored = nb_score(
            scrubbed.select(id_col, F.col("scrubbed_text").alias(text_col)),
            id_col, text_col, model, vocab_size=vocab_size,
            threshold=threshold,
        )
        (
            scrubbed.join(scored, id_col)
            .select(
                id_col, "scrubbed_text", "n_spans_kept", "n_spans_removed",
                "chars_removed", "n_tokens", "nb_logodds", "kept",
            )
            .write.mode("append")
            .parquet(out_path)
        )

    return (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(ingest)
    )


class LateArrivalError(ValueError):
    """A micro-batch carried a per-key out-of-order event — its
    (time, order) is ≤ the key's stored tail maximum — and the sink
    was configured with ``on_late="error"`` (the default).  Scoring it
    silently would diverge from the batch operator on the same data;
    the contract fails loudly instead (the repo's TRUNCATE rule)."""


def anomaly_ingest_sink(
    stream_df: DataFrame,
    out_path: str,
    state_path: str,
    checkpoint: str,
    key_col: str,
    time_col: str,
    value_col: str,
    order_col: str,
    lookback: int = 20,
    min_history: int = 8,
    z_threshold: float = 3.0,
    scale: int = 1000,
    on_late: str = "error",
    keep_epochs: int | None = 8,
    allowed_lateness: float | None = None,
):
    """Continuous rolling z-score anomaly flags — the streaming form of
    :func:`~hive_scd_spark.operators.asof.anomaly_zscore` (the
    monitoring lane: ingest-volume spikes and metric drift flagged as
    events arrive, not in a nightly batch).

    State is EXACT and lookback-bounded: per key, the last *lookback*
    (time, order, value) observations.  Per micro-batch the batch rows
    union the prior tail, run the batch operator, and only the BATCH
    rows' scores append to *out_path*; the refreshed per-key tail is
    written to *state_path* **partitioned by epoch with dynamic
    partition overwrite** — an at-least-once replay of epoch b
    REPLACES epoch b's partition with identical rows instead of
    appending a duplicate tail (idempotent state, ADVICE r13), and the
    causal read below prunes to one partition instead of scanning the
    whole history.  Replay safety is the histogram sink's epoch
    discipline made causal: the tail read for epoch b uses only rows
    stamped with the LATEST epoch < b (the pre-batch state), so a
    replay recomputes exactly the same scores and the (epoch, key,
    order) dedup in :func:`read_anomaly_state` restores exactly-once.

    Ordering contract (ENFORCED, VERDICT r13 task 4): batch-equivalence
    requires per-key IN-ORDER arrival across batches (each key's
    (time, order) never goes backwards between epochs) — the standard
    monitoring assumption, but real event streams are late.  The sink
    therefore checks every batch against the stored tail maxima and,
    under ``on_late="error"`` (default), raises
    :class:`LateArrivalError` so the query fails loudly rather than
    silently diverging from the batch operator.  ``on_late="score"``
    opts into the documented weaker contract: a late straggler is
    scored against the history PRESENT AT ARRIVAL (the batch path
    would instead rewrite earlier scores, which a streaming monitor by
    definition cannot).

    ``on_late="buffer"`` (VERDICT r14 task 4) is the bounded-lateness
    middle ground: with an *allowed_lateness* horizon L (same units as
    the NUMERIC *time_col*), events are held unscored until the key's
    max seen event time advances L past them, then scored in
    event-time order against their TRUE preceding window — emitted
    scores are exactly the batch operator's.  The invariant that makes
    this sound: a row is finalized only when ``time <= key_max - L``,
    and an arrival at-or-before the FINALIZED frontier still raises
    :class:`LateArrivalError` — so no accepted arrival can ever
    precede an emitted score, and buffered rows re-sort freely.
    Buffered rows are strictly later (in event time) than every
    finalized row, so finalized baselines never depend on the buffer.
    Cost of the contract: scores are delayed until the watermark
    passes (a key that stops sending never finalizes its last L of
    events — the standard allowed-lateness tradeoff), and state grows
    by the unscored buffer (bounded by L × per-key event rate).

    Note the contract binds EPOCHS, not source
    writes: a multi-file drop can split across micro-batch boundaries
    in file-listing order, which the checker correctly flags — deliver
    each drop as one atomically-committed file (or per-key ordered
    files) when using a file source.

    Retention: *keep_epochs* bounds the state directory — after
    writing epoch b, partitions older than ``b - keep_epochs`` are
    deleted (driver-side metadata ops).  Structured Streaming replays
    at most the last uncommitted batch, so any ``keep_epochs ≥ 1``
    preserves replay correctness; ``None`` keeps everything (audit
    mode).

    Scale: state is ≤ lookback rows per key per retained epoch
    (bounded, like the band tables); per batch ONE key-partitioned
    window pass over |batch| + |touched tails| rows plus one
    partition-pruned state read."""
    from hive_scd_spark.operators.asof import anomaly_zscore

    if on_late not in ("error", "score", "buffer"):
        raise ValueError(
            f"on_late must be 'error', 'score' or 'buffer', got {on_late!r}"
        )
    if on_late == "buffer":
        if allowed_lateness is None or allowed_lateness <= 0:
            raise ValueError(
                "on_late='buffer' requires allowed_lateness > 0 "
                f"(got {allowed_lateness!r})"
            )
        t_type = dict(stream_df.dtypes).get(time_col, "")
        if t_type.startswith(("timestamp", "date")):
            raise NotImplementedError(
                f"on_late='buffer' needs a numeric event-time column to "
                f"apply the allowed_lateness horizon; {time_col!r} is "
                f"{t_type} — cast to epoch millis upstream"
            )
    elif allowed_lateness is not None:
        raise ValueError(
            "allowed_lateness only applies to on_late='buffer' "
            f"(on_late={on_late!r})"
        )

    def ingest(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.select(
            F.col(key_col), F.col(time_col), F.col(order_col), F.col(value_col)
        )
        # Explicit existence check (ADVICE r13): ONLY path-not-found
        # means "first epoch".  A corrupt footer or transient FS error
        # must fail the batch (Structured Streaming retries), never be
        # silently treated as empty history.  FS ops go through the
        # scheme-dispatching facade (ADVICE r14): plain local paths are
        # os-backed — no py4j, Spark-Connect-safe; URI-scheme paths
        # need the classic session's JVM and fail with one clear
        # message on Connect (fs.fs_for).
        from hive_scd_spark.fs import fs_for

        fsx = fs_for(spark, state_path)
        tail = None
        buf = None
        if fsx.exists(state_path):
            # the state schema is known (batch columns + the epoch
            # partition column), so the read never needs inference —
            # an existing-but-empty directory reads as zero rows
            # instead of throwing UNABLE_TO_INFER_SCHEMA
            from pyspark.sql import types as _T

            extra = (
                [_T.StructField("__fin", _T.BooleanType())]
                if on_late == "buffer"
                else []
            )
            st_schema = _T.StructType(
                batch.schema.fields
                + extra
                + [_T.StructField("epoch", _T.LongType())]
            )
            st = spark.read.schema(st_schema).parquet(state_path)
            # causal read: the latest complete epoch BEFORE this one —
            # a replayed epoch must see the same pre-batch tail.  Both
            # filters hit the epoch PARTITION column, so old epochs
            # are pruned at the directory listing, never scanned.
            prev = (
                st.filter(F.col("epoch") < epoch_id)
                .agg(F.max("epoch").alias("e"))
                .first()["e"]
            )
            if prev is not None:
                # dropDuplicates is belt-and-braces: dynamic partition
                # overwrite already makes replays exact, and epoch rows
                # are deterministic, so duplicates would be exact copies
                prevrows = (
                    st.filter(F.col("epoch") == prev)
                    .drop("epoch")
                    .dropDuplicates([key_col, time_col, order_col])
                )
                if on_late == "buffer":
                    tail = prevrows.filter(F.col("__fin")).drop("__fin")
                    buf = prevrows.filter(~F.col("__fin")).drop("__fin")
                else:
                    tail = prevrows
        if tail is not None and on_late in ("error", "buffer"):
            # arrival-contract check: any batch row at-or-before its
            # key's stored tail maximum is out of order (bounded work:
            # tails are ≤ lookback rows per touched key).  In buffer
            # mode the tail holds FINALIZED rows only, so this is
            # exactly the beyond-allowed-lateness condition: such a
            # row would precede an already-emitted score.
            tmax = tail.groupBy(key_col).agg(
                F.max(F.struct(F.col(time_col), F.col(order_col))).alias("__tmax")
            )
            late = (
                batch.join(tmax, key_col)
                .filter(F.struct(F.col(time_col), F.col(order_col)) <= F.col("__tmax"))
            )
            sample = late.select(key_col, time_col, order_col).take(5)
            if sample:
                rows = ", ".join(
                    f"({r[key_col]!r}, t={r[time_col]}, {r[order_col]})"
                    for r in sample
                )
                if on_late == "buffer":
                    raise LateArrivalError(
                        f"anomaly_ingest_sink: epoch {epoch_id} carries "
                        f"event(s) beyond the allowed_lateness horizon "
                        f"({allowed_lateness}) — (time, order) at or "
                        f"before a FINALIZED (already scored and "
                        f"emitted) observation; first: {rows}.  Raise "
                        f"allowed_lateness, or deliver closer to order."
                    )
                raise LateArrivalError(
                    f"anomaly_ingest_sink: epoch {epoch_id} carries "
                    f"out-of-order event(s) — (time, order) at or before "
                    f"the stored per-key tail maximum; first: {rows}.  "
                    f"Scoring them would silently diverge from the batch "
                    f"operator.  Deliver per-key in order, or opt into "
                    f"score-at-arrival semantics with on_late='score', "
                    f"or bounded-lateness buffering with "
                    f"on_late='buffer'."
                )
        if on_late == "buffer":
            # watermark finalization: a pending row is scorable once
            # the key's max seen event time is ≥ allowed_lateness past
            # it — no accepted future arrival can precede it (the
            # check above rejects anything at-or-before the finalized
            # frontier), so its event-time window is complete.
            pending = (
                batch if buf is None else buf.unionByName(batch)
            ).localCheckpoint()
            km = pending.groupBy(key_col).agg(
                F.max(time_col).alias("__km")
            )
            pend = pending.join(km, key_col)
            horizon = F.col("__km") - F.lit(allowed_lateness)
            fin_new = pend.filter(F.col(time_col) <= horizon).drop("__km")
            buf_new = pend.filter(F.col(time_col) > horizon).drop("__km")
            emit = fin_new
            # buffered rows are strictly LATER in event time than every
            # finalized row, so finalized baselines never read them:
            # score over finalized history only
            hist = fin_new if tail is None else tail.unionByName(fin_new)
        else:
            emit = batch
            buf_new = None
            hist = batch if tail is None else tail.unionByName(batch)
        scored = anomaly_zscore(
            hist, key_col, time_col, value_col, order_col,
            lookback=lookback, min_history=min_history,
            z_threshold=z_threshold, scale=scale,
        )
        # only newly-emittable rows leave the sink (tail rows were
        # scored in their own epochs); semi-join on the full identity
        out_rows = scored.join(
            emit.select(key_col, time_col, order_col),
            [key_col, time_col, order_col],
            "left_semi",
        )
        out_rows.withColumn("epoch", F.lit(epoch_id)).write.mode(
            "append"
        ).parquet(out_path)
        w = W.partitionBy(key_col).orderBy(
            F.col(time_col).desc(), F.col(order_col).desc()
        )
        new_tail = (
            hist.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= lookback)
            .drop("__rk")
        )
        state_rows = new_tail
        if on_late == "buffer":
            state_rows = new_tail.withColumn("__fin", F.lit(True)).unionByName(
                buf_new.withColumn("__fin", F.lit(False))
            )
        # dynamic partition overwrite keyed by epoch: a replayed epoch
        # rewrites ITS partition with identical rows (idempotent) and
        # never touches other epochs' partitions
        (
            state_rows.withColumn("epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(state_path)
        )
        if keep_epochs is not None:
            # retention: metadata-sized driver-side deletes of epoch
            # partitions older than the replay horizon
            cutoff = epoch_id - keep_epochs
            for name in fsx.list_dir(state_path):
                if name.startswith("epoch="):
                    try:
                        e = int(name.split("=", 1)[1])
                    except ValueError:
                        continue
                    if e < cutoff:
                        fsx.delete(fsx.join(state_path, name), True)

    return (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(ingest)
    )


def read_anomaly_state(spark, out_path: str, key_col: str, order_col: str) -> DataFrame:
    """Exactly-once view over :func:`anomaly_ingest_sink`'s output:
    replayed epochs rewrite identical rows (deterministic per epoch +
    causal state read), so (epoch, key, order) dedup restores
    exactly-once.  Read scores through this, never bare
    ``spark.read``."""
    return (
        spark.read.parquet(out_path)
        .dropDuplicates(["epoch", key_col, order_col])
        .drop("epoch")
    )


def read_frequent_state(
    spark, state_path: str, key_col: str, k: int = 128
) -> DataFrame:
    """Answer "which keys exceeded 1/k of all traffic" from
    :func:`frequent_ingest_sink` state: (key, cnt_min, cnt_max,
    certain) for every key whose certified interval CAN reach the
    threshold (``cnt_max·k ≥ N``) — no false negatives; ``certain``
    marks keys whose lower bound alone clears it (``cnt_min·k ≥ N``).
    Keys absent from every epoch's candidates carry at most
    ``Σ_b d_b ≤ N/(capacity+1) < N/k`` occurrences, so they are
    correctly absent.  Replayed epochs are collapsed by
    (run, epoch, key) dedup before any sum — ``run`` (stamped by the
    sink from the checkpoint path) keeps two queries that appended to
    the same state path from colliding on restarted epoch ids: their
    meta rows stay distinct and their batch totals ADD instead of one
    run's counts being arbitrarily dropped.  Pre-run-column state
    (older sinks) reads as a single run.  Requires k ≤ the smallest
    capacity the state was written with (validated — one
    metadata-sized first())."""
    st = spark.read.parquet(state_path)
    if "run" not in st.columns:
        st = st.withColumn("run", F.lit(""))
    st = st.dropDuplicates(["run", "epoch", key_col])
    meta = st.select("run", "epoch", "batch_n", "capacity").distinct()
    min_cap = meta.agg(F.min("capacity").alias("c")).first()["c"]
    if min_cap is not None and k > min_cap:
        raise ValueError(
            f"k ({k}) exceeds the state's smallest capacity ({min_cap}); "
            "the no-false-negative guarantee needs k <= capacity"
        )
    eps = meta.select(
        "run",
        "epoch",
        "batch_n",
        F.expr("batch_n div (capacity + 1)").alias("d_b"),
    )
    tot = eps.agg(
        F.sum("batch_n").alias("__n"), F.sum("d_b").alias("__total_d")
    )
    per = (
        st.join(eps.select("run", "epoch", "d_b"), ["run", "epoch"])
        .groupBy(key_col)
        .agg(F.sum("cnt").alias("cnt_min"), F.sum("d_b").alias("__present_d"))
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            key_col,
            "cnt_min",
            (F.col("cnt_min") + F.col("__total_d") - F.col("__present_d")).alias(
                "cnt_max"
            ),
            (F.col("cnt_min") * k >= F.col("__n")).alias("certain"),
            F.col("__n").alias("__nn"),
        )
        .filter(F.col("cnt_max") * k >= F.col("__nn"))
        .drop("__nn")
    )
