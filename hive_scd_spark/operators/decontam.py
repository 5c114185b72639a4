"""Benchmark decontamination: n-gram overlap between a training corpus
and an evaluation set.

The standard contamination check (popularized by the GPT-3 and PaLM
data cards) flags a training document when it shares at least one
long word-level n-gram (usually 13-grams) with any benchmark document.
The expensive side is the corpus; the benchmark side is tiny by nature
(thousands of documents), which fixes the join strategy:

- both sides: lowercase → word split → sliding n-grams → 60-bit hash →
  ``(doc, hash)`` DISTINCT (dedupes repeats within a document);
- the benchmark gram list BROADCASTS (explicit hint — it is bounded by
  benchmark size, a design contract, not a stats guess), so the corpus
  side is never shuffled by the join;
- the only shuffle is the final ``groupBy (train_doc, eval_doc)``
  count, whose input is the matched grams — contamination hits, not
  the corpus.

Hashing: 60 bits of md5 via ``conv(substring(md5(g),1,15),16,10)`` —
the same public construction every other text operator here uses, and
computable bit-identically in DuckDB for the oracle.  A hash collision
could in principle count one phantom shared gram, but both engines
collide identically, so the value check is exact; at n=13 the
false-flag probability is ~|grams|²/2^61 — irrelevant at any corpus
size that fits a benchmark broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# lowercase word tokens: explicit ASCII class, identical semantics in
# Java regex (Spark) and RE2 (DuckDB) — \w is engine-dependent, this is not
_WORD_SPLIT = "[^0-9a-z_]+"


def _doc_ngram_hashes(
    df: DataFrame, id_col: str, text_col: str, n: int, out_id: str
) -> DataFrame:
    """(doc, hash) per DISTINCT word n-gram of the document."""
    words = F.expr(
        f"filter(split(lower({text_col}), '{_WORD_SPLIT}'), w -> w <> '')"
    )
    # array_distinct BEFORE the explode: every gram of a document lives
    # in its own row's array, so per-document dedup is a row-local
    # operation — an explode + dropDuplicates would instead SHUFFLE the
    # full corpus gram set just to dedupe keys that never left their
    # row (caught in the round-5 plan audit: two corpus-sized
    # exchanges, both gone with this form).
    grams = F.expr(
        "array_distinct(transform(sequence(1, size(__w) - {m}), "
        "i -> conv(substring(md5(array_join(slice(__w, i, {n}), ' ')), 1, 15), 16, 10)))".format(
            m=n - 1, n=n
        )
    )
    return (
        df.select(F.col(id_col).alias(out_id), words.alias("__w"))
        # documents shorter than n words carry no n-gram.  The filter is
        # REQUIRED, not cosmetic: sequence(1, size-m) with size <= m
        # generates a DESCENDING [1, 0, ...] sequence in Spark, which
        # would fabricate out-of-range slices instead of an empty list.
        .filter(F.size("__w") > n - 1)
        .select(out_id, F.explode(grams).alias("__g"))
        .select(out_id, F.col("__g").cast("long").alias("__h"))
    )


def ngram_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    eval_id_col: str | None = None,
    text_col_eval: str | None = None,
    n: int = 13,
    min_shared: int = 1,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Contaminated (train document, eval document) pairs with the count
    of shared distinct word *n*-grams.

    Output: ``(train_id, eval_id, n_shared)`` for every pair sharing at
    least *min_shared* distinct n-grams, ``n_shared`` descending order
    is up to the caller (the result is a plain DataFrame).

    ``broadcast_eval=True`` (default) asserts the module contract that
    *eval_df* is a bounded benchmark set — the hint keeps the corpus
    side shuffle-free.  Callers screening against something that GROWS
    with the corpus (another corpus split, a crawl) must pass
    ``broadcast_eval=False``: the join then plans as a normal shuffle
    join (AQE still broadcasts at runtime when the eval side turns out
    small) instead of OOMing the driver on a forced broadcast.
    """
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    eval_id_col = eval_id_col or id_col
    text_col_eval = text_col_eval or text_col
    tg = _doc_ngram_hashes(train, id_col, text_col, n, "train_id")
    eg = _doc_ngram_hashes(eval_df, eval_id_col, text_col_eval, n, "eval_id")
    hits = tg.join(F.broadcast(eg) if broadcast_eval else eg, "__h")
    return (
        hits.groupBy("train_id", "eval_id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    eval_id_col: str | None = None,
    text_col_eval: str | None = None,
    n: int = 13,
    min_shared: int = 1,
    broadcast_eval: bool = True,
) -> DataFrame:
    """The pipeline last mile: the SURVIVING training corpus — every
    *train* row except those sharing at least *min_shared* distinct
    word *n*-grams with ANY *eval_df* document (the pair-level detail
    is :func:`ngram_contamination`; this collapses it to the filter a
    data pipeline actually consumes).

    The removal is a ``left_anti`` join against the distinct
    contaminated-id set.  No forced broadcast: the contaminated set is
    usually tiny but is corpus-bounded, not benchmark-bounded (one
    viral benchmark sentence can flag millions of documents), so the
    plan stays a shuffle anti-join and AQE demotes it to broadcast at
    runtime when the set turns out small — the same OOM-aware last-mile
    shape as ``cluster.canonical_docs``.  Parameters forward to
    :func:`ngram_contamination` unchanged (see its docstring for the
    ``broadcast_eval`` contract)."""
    hits = (
        ngram_contamination(
            train,
            eval_df,
            id_col,
            text_col,
            eval_id_col=eval_id_col,
            text_col_eval=text_col_eval,
            n=n,
            min_shared=min_shared,
            broadcast_eval=broadcast_eval,
        )
        .select(F.col("train_id").alias(id_col))
        .distinct()
    )
    return train.join(hits, id_col, "left_anti")


def source_overlap_matrix(
    df: DataFrame,
    source_col: str,
    text_col: str,
    n: int = 8,
    max_sources_per_gram: int | None = None,
) -> DataFrame:
    """Cross-source contamination MATRIX: for every pair of sources,
    how many distinct word n-gram hashes they share, with the Jaccard
    over their distinct-gram sets — the census a curation team reads
    before mixing sources (two crawls of the same sites, a dataset
    re-released under a new name, a benchmark leaked into a crawl all
    show up as an off-diagonal spike).

    Pipeline: per-source DISTINCT gram set (the decontamination
    hashing, ``_doc_ngram_hashes``'s row-local dedup then one
    (source, hash) distinct), then the grouped inverted-index idiom
    the winnow family uses — group by gram, collect the sorted source
    list, emit each pair once via posexplode+slice.  Per-gram fan-out
    is bounded by the SOURCE COUNT (tens), never the corpus: Σ|pairs|
    ≤ |distinct grams| × C(n_sources, 2).  *max_sources_per_gram*
    optionally drops grams present in more than that many sources
    (the df-cap move — a gram in EVERY source is boilerplate and says
    nothing about pairwise contamination); NULL keeps all.  Under a
    cap, EVERY reported statistic (n_shared, n_a, n_b, jaccard) is
    over the capped gram universe, so jaccard stays the true Jaccard
    of the capped per-source sets (ADVICE r13: capping only the
    numerator would bias it low).

    Output: (source_a, source_b, n_shared, n_a, n_b, jaccard) with
    source_a < source_b, jaccard = ROUND(shared / (n_a + n_b −
    shared), 6) — integer counts, so the only float is the final
    division.  Scale: one corpus explode + ONE gram-keyed shuffle +
    one pair-keyed combiner-collapsed count.  The per-(source, gram)
    dedup folds INTO the gram groupBy (``collect_set``) instead of a
    separate ``distinct()`` — one corpus-wide exchange, not two — and
    the per-source totals then derive from the already-grouped table
    (explode the source sets, count per source: |distinct grams of s| =
    |grams whose set contains s|), a gram-count-×-avg-sources-sized
    pass over grouped data that BROADCASTS back onto the pair rows.
    The grouped table is lazily ``localCheckpoint``-ed — it feeds BOTH
    the pair generation and the totals, and without the barrier
    Catalyst re-derives the corpus explode + gram shuffle per consumer
    (the shared-selection / simhash-band-table precedent; it is an
    inverted index, the thing one materializes).  At true 100 TB the
    same barrier would be a persisted table with a disk storage level
    rather than an executor-memory checkpoint."""
    grams = _doc_ngram_hashes(df, source_col, text_col, n, "__src")
    by_gram = grams.groupBy("__h").agg(
        F.sort_array(F.collect_set("__src")).alias("__ss")
    ).localCheckpoint(eager=False)
    # the df cap applies BEFORE the totals (ADVICE r13): n_shared, n_a,
    # n_b, and jaccard are all statistics over the SAME capped gram
    # universe — otherwise shared excludes capped grams while both
    # denominators include them and the "jaccard" is not the Jaccard
    # of any consistent pair of sets
    if max_sources_per_gram is not None:
        by_gram = by_gram.filter(F.size("__ss") <= max_sources_per_gram)
    totals = (
        by_gram.select(F.explode("__ss").alias("__src"))
        .groupBy("__src")
        .agg(F.count("*").alias("__tot"))
    )
    sized = by_gram.filter(F.size("__ss") >= 2)
    pairs_raw = sized.select(
        F.posexplode("__ss").alias("__i", "source_a"), F.col("__ss")
    ).select(
        "source_a",
        F.explode(F.slice("__ss", F.col("__i") + 2, F.size("__ss"))).alias(
            "source_b"
        ),
    )
    shared = pairs_raw.groupBy("source_a", "source_b").agg(
        F.count("*").cast("long").alias("n_shared")
    )
    ta = totals.select(
        F.col("__src").alias("source_a"), F.col("__tot").alias("n_a")
    )
    tb = totals.select(
        F.col("__src").alias("source_b"), F.col("__tot").alias("n_b")
    )
    out = shared.join(F.broadcast(ta), "source_a").join(F.broadcast(tb), "source_b")
    return out.select(
        "source_a",
        "source_b",
        "n_shared",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(
            F.col("n_shared")
            / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
            6,
        ).alias("jaccard"),
    )
