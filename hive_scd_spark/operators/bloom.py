"""Mergeable Bloom-filter membership sketch over word n-grams — the
constant-size decontamination screen.

:mod:`.decontam` answers "which corpus docs share a gram with the
benchmark" EXACTLY, by broadcasting the benchmark gram set.  That
broadcast is bounded by benchmark *gram count* — fine for one
benchmark, but a pipeline screening against the union of every eval
suite it has ever shipped (the production posture after a few model
releases) carries millions of grams, and the broadcast grows linearly
with them.  The classic fix (Bloom, CACM 1970) is a bit-array sketch:

- **build**: each benchmark gram sets *k* md5-derived bits in an
  *m*-bit array.  The array is built distributed — per-nibble rows
  aggregated with ``bit_or`` (one shuffle over at most m/4 keys) — so
  no single task ever sees the full gram set.
- **merge**: sketches from different benchmarks (or different ingest
  batches) union with ``bit_or`` per nibble — the HLL-style mergeable
  property, so the screen is maintained incrementally without ever
  re-reading old benchmarks.
- **probe**: the bitmap is rendered to one hex string (m/4 chars —
  32 KiB at the default m=2^18, a *constant* independent of benchmark
  size) and inlined into a single projection: per document, a gram is
  "possibly contaminated" iff all k of its bits are set.  ZERO joins,
  zero shuffles — the 100 TB corpus is screened in the same map stage
  that scans it, which is the whole point of carrying a sketch instead
  of the exact set.

False positives are inherent (rate ~(1-e^{-kn/m})^k) and *flag extra
docs for review*, never miss one: every exactly-contaminated doc is
Bloom-flagged (no false negatives — pinned in tests).  Both engines
compute identical md5 bit positions, so the DuckDB oracle replays the
probe bit-for-bit from the same benchmark split (engine-exact FPs
included): position_j(g) = ``conv(substring(md5(j||':'||g),1,15),16,10)
% m`` — the same public 60-bit-md5 construction every text operator
here uses (cf. operators/decontam.py:19).

Driver collect: ``bloom_to_hex`` materializes at most m/4 = 65 536
nibble rows (~2 MB) — the sketch is BY DESIGN driver-sized, same
contract class as the k-means seed collect (similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .decontam import _WORD_SPLIT

DEFAULT_M_BITS = 1 << 18
DEFAULT_K = 4


def _gram_texts(text_col: str, n: int):
    """Column expr: array of DISTINCT word n-gram strings (row-local
    dedup, same rationale as decontam._doc_ngram_hashes); empty array —
    not a dropped row — for docs shorter than n words (the sequence()
    guard is load-bearing: sequence(1, size-m) DESCENDS when size<=m)."""
    return F.expr(
        f"""CASE WHEN size(__w) >= {n} THEN
              array_distinct(transform(sequence(1, size(__w) - {n - 1}),
                i -> array_join(slice(__w, i, {n}), ' ')))
            ELSE CAST(array() AS ARRAY<STRING>) END"""
    )


def _words(text_col: str):
    return F.expr(
        f"filter(split(lower({text_col}), '{_WORD_SPLIT}'), w -> w <> '')"
    )


def _positions_sql(gram: str, m_bits: int, k: int) -> str:
    """SQL fragment: array of the k md5 bit positions of gram expr."""
    return (
        f"transform(sequence(1, {k}), j -> "
        f"CAST(conv(substring(md5(concat(CAST(j AS STRING), ':', {gram})), "
        f"1, 15), 16, 10) AS BIGINT) % {m_bits})"
    )


def bloom_build(
    df: DataFrame,
    text_col: str,
    n: int = 13,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Distributed sketch build: ``(nibble, val)`` rows, one row per
    nonzero 4-bit nibble of the m-bit array (``val`` in 1..15).

    One shuffle (groupBy nibble, <= m/4 keys, map-side combined); the
    benchmark gram set is exploded but never collected or broadcast.
    """
    if m_bits % 4 or m_bits <= 0:
        raise ValueError(f"m_bits must be a positive multiple of 4, got {m_bits}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    return (
        df.select(_words(text_col).alias("__w"))
        .select(F.explode(_gram_texts(text_col, n)).alias("__g"))
        .select(F.explode(F.expr(_positions_sql("__g", m_bits, k))).alias("__p"))
        .select(
            F.expr("CAST(__p div 4 AS INT)").alias("nibble"),
            F.expr("shiftleft(1, CAST(__p % 4 AS INT))").alias("val"),
        )
        .groupBy("nibble")
        .agg(F.expr("bit_or(val)").alias("val"))
    )


def bloom_merge(*sketches: DataFrame) -> DataFrame:
    """OR together sketches built with the SAME (n, m_bits, k) — the
    mergeable-sketch property: screen state is maintained per benchmark
    / per ingest batch and combined without re-reading any source."""
    if not sketches:
        raise ValueError("bloom_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("nibble").agg(F.expr("bit_or(val)").alias("val"))


def bloom_to_hex(sketch: DataFrame, m_bits: int = DEFAULT_M_BITS) -> str:
    """Render the sketch to the m/4-char hex bitmap the probe inlines.

    Driver collect bounded by m/4 rows (module contract — see header).
    """
    vals = {int(r["nibble"]): int(r["val"]) for r in sketch.collect()}
    bad = [i for i in vals if not 0 <= i < m_bits // 4]
    if bad:
        raise ValueError(
            f"sketch nibble index out of range for m_bits={m_bits}: {bad[:3]}"
        )
    return "".join(format(vals.get(i, 0), "x") for i in range(m_bits // 4))


def bloom_probe(
    df: DataFrame,
    id_col: str,
    text_col: str,
    hex_bitmap: str,
    n: int = 13,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Screen *df* against the bitmap: ``(id, n_grams, n_hit)`` where
    ``n_hit`` counts the document's distinct n-grams whose k bits are
    ALL set (possible contamination; superset of the exact answer).

    The corpus text never shuffles: grams explode in the scan stage,
    each tests the bitmap with flat (whole-stage-codegen) expressions,
    and the map-side-combined groupBy ships exactly one counter row per
    (doc, partition).  Two designs that LOOK cheaper measured 6-30x
    slower at sf0.1 and are deliberately rejected:

    - bitmap as a hex-string literal + ``substring``: UTF8String
      substring is O(position) (it walks bytes counting code points),
      so each bit test scans ~m/8 bytes — 48 s of a 50 s run.  Packed
      ``array<bigint>`` + ``element_at`` is O(1).
    - single-projection HOF form (``size(filter(grams, g ->
      forall(...)))``): lambda functions run OUTSIDE whole-stage
      codegen, and a downstream ``filter(n_hit > 0)`` is pushed through
      the projection by substitution, re-inlining the whole gram tree
      into the predicate (1.7 s -> 11.2 s measured).  Exploded flat
      expressions stay in codegen and aggregate once — the same fix
      :func:`minhash_signatures` documents (dedup.py:171).
    """
    if len(hex_bitmap) * 4 != m_bits:
        raise ValueError(
            f"hex bitmap length {len(hex_bitmap)} != m_bits/4 = {m_bits // 4}"
        )
    from .layout import fan_out

    # Nibble i covers bits 4i..4i+3 (the bloom_to_hex layout), so
    # 64-bit word j packs nibbles 16j..16j+15; wrap to signed for lit().
    words = [0] * ((m_bits + 63) // 64)
    for i, ch in enumerate(hex_bitmap):
        words[(4 * i) // 64] |= int(ch, 16) << ((4 * i) % 64)
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]

    pcols = [
        F.expr(
            f"CAST(conv(substring(md5(concat('{j}:', __g)), 1, 15), 16, 10)"
            f" AS BIGINT) % {m_bits}"
        ).alias(f"__p{j}")
        for j in range(1, k + 1)
    ]
    hit = F.expr(
        " AND ".join(
            f"((shiftright(element_at(__bm, CAST(__p{j} div 64 AS INT) + 1),"
            f" CAST(__p{j} % 64 AS INT)) & 1) = 1)"
            for j in range(1, k + 1)
        )
    )
    return (
        fan_out(df)  # single-split inputs would serialize the md5 work
        .select(F.col(id_col), _words(text_col).alias("__w"))
        .select(
            F.col(id_col), F.explode_outer(_gram_texts(text_col, n)).alias("__g")
        )
        .withColumn("__bm", F.lit(words))
        .select(F.col(id_col), "__g", "__bm", *pcols)
        .select(F.col(id_col), "__g", hit.alias("__hit"))
        .groupBy(id_col)
        .agg(
            F.count("__g").alias("n_grams"),  # NULL gram (short doc) -> 0
            F.coalesce(F.sum(F.col("__hit").cast("long")), F.lit(0))
            .cast("long")
            .alias("n_hit"),
        )
    )
