"""BM25 document retrieval over a tokenized corpus.

The query side of a training-data pipeline: given a handful of query
terms, score every document with BM25 (Robertson/Sparck Jones; the
idf form below is Lucene's ``ln(1 + (N - df + 0.5)/(df + 0.5))``) and
return the top-k.

Scale shape — everything is a projection or a partial-aggregated
groupBy, and the per-term work touches only documents CONTAINING a
query term (the token filter runs before the first shuffle, so the
inverted-index effect falls out of predicate pushdown rather than a
materialized index):

- tokenize → explode (narrow);
- ``filter(token IN query)`` immediately — at 100 TB this is the step
  that turns "all tokens" into "posting lists for 3 terms";
- tf per (doc, term): groupBy with map-side combine;
- df per term: tiny (≤ |query|) — broadcast back;
- doc lengths: one groupBy over the corpus (the only full-corpus
  shuffle; a real deployment precomputes/caches this column);
- corpus stats (N, avgdl): single-row aggregate, broadcast into the
  scoring expression via crossJoin — no driver action, stays lazy;
- final top-k: global sort-limit (TakeOrdered — k rows per partition
  then k at the driver, never a single-partition window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-*k* documents by BM25 for *query_terms* (whitespace
    tokenization, lowercased).  Returns ``(id, n_tokens, score)``
    ordered by ``(score desc, id)`` — rounded to 6 dp for cross-engine
    determinism."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    # deliberately NO fan_out here: unlike the md5-heavy dedup explodes,
    # tokenization is cheap relative to reshuffling the text column, and
    # the tok stream feeds two branches (lengths + tf) — measured 3×
    # slower with a repartition at sf0.1
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("__t"),
    )
    dl = toks.groupBy("__id").agg(F.count("*").alias("__dl"))
    stats = dl.agg(
        F.count("*").alias("__n_docs"), F.avg("__dl").alias("__avgdl")
    )  # 1 row — broadcast into every scoring task
    tf = (
        toks.filter(F.col("__t").isin([t.lower() for t in query_terms]))
        .groupBy("__id", "__t")
        .agg(F.count("*").alias("__tf"))
    )
    dfreq = tf.groupBy("__t").agg(F.count("*").alias("__df"))  # ≤ |query| rows
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n_docs") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
    )
    term_score = idf * (
        F.col("__tf")
        * (k1 + 1.0)
        / (F.col("__tf") + k1 * (1.0 - b + b * F.col("__dl") / F.col("__avgdl")))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "__t")
        .join(dl, "__id")
        .crossJoin(F.broadcast(stats))
        .groupBy("__id", "__dl")
        .agg(F.round(F.sum(term_score), 6).alias("score"))
    )
    return (
        scored.select(
            F.col("__id").alias(id_col), F.col("__dl").alias("n_tokens"), "score"
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def build_inverted_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_df: int | None = None,
    block_size: int = 1 << 20,
) -> DataFrame:
    """Materialized inverted index: ``(term, block, doc_freq,
    postings)`` with postings sorted ascending — the artifact form of
    retrieval (bm25_topk computes scores inline; a standing index is
    what repeated query workloads read).

    The two at-scale hazards, handled structurally:

    - **Hot terms**: a stopword's posting list is corpus-sized; packing
      it into ONE array row is the giant-row failure.  Postings are
      BLOCKED by ``doc_id div block_size`` — every output row is
      bounded by block_size entries regardless of term frequency, and
      a reader streams a hot term's blocks like any other range scan.
      ``doc_freq`` stays the GLOBAL per-term count, derived from the
      per-block counts by a column-pruned aggregate (term, __block_df
      only — ceil(df/block_size) tiny rows per term) JOINED back to
      the blocked rows.  Not a window over the blocked rows: a
      WindowExec partition buffers its rows WHOLE, postings arrays
      included, so a stopword's window task would hold the entire
      posting set — the exact giant-task failure the blocking exists
      to prevent (review r7).  The join-back re-shuffles the index
      once on term, but a shuffle/hash-join task STREAMS its rows;
      nothing corpus-sized is ever resident.
    - **max_df**: terms above the cap are dropped after the blocked
      assembly — each block row is already bounded by block_size, so a
      hot term costs bounded-row work before being discarded, and the
      cap still bounds the OUTPUT volume.

    Per-document duplicate terms are removed row-locally
    (``array_distinct`` before the explode — the decontamination
    module's no-corpus-shuffle trick), so the only shuffle is the
    (term, block) grouping.  ``sort_array`` makes postings
    deterministic under any partitioning."""
    words = F.expr(
        f"array_distinct(filter(split(lower({text_col}), '[^0-9a-z_]+'), "
        "w -> w <> ''))"
    )
    pairs = df.select(
        F.col(id_col).alias("__id"), F.explode(words).alias("term")
    )
    blocked = pairs.groupBy(
        "term", F.expr(f"__id div {int(block_size)}").alias("block")
    ).agg(
        F.count(F.lit(1)).alias("__block_df"),
        F.sort_array(F.collect_list("__id")).alias("postings"),
        # lazy checkpoint: the doc_freq aggregate AND the join-back both
        # consume this frame, and column pruning makes their exchanges
        # non-identical (one side drops postings) so ReuseExchange
        # cannot dedupe them — without the checkpoint the corpus
        # explode would run twice (the minhash_near_dup_pairs rule)
    ).localCheckpoint(eager=False)
    doc_freq = blocked.select("term", "__block_df").groupBy("term").agg(
        F.sum("__block_df").alias("doc_freq")
    )
    out = blocked.join(doc_freq, "term")
    if max_df is not None:
        out = out.filter(F.col("doc_freq") <= max_df)
    return out.select("term", "block", "doc_freq", "postings")
