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
  size) and shipped to executors as a broadcast single-row dimension:
  per document, a gram is "possibly contaminated" iff all k of its
  bits are set.  ZERO shuffles — the 100 TB corpus is screened in the
  same map stage that scans it, which is the whole point of carrying a
  sketch instead of the exact set.

The sketch's shape parameters ``(n, m_bits, k)`` travel WITH the
sketch (:class:`BloomSketch`) and with the rendered bitmap
(:class:`BloomBitmap`): a bitmap probed with mismatched parameters
would silently void the no-false-negative guarantee, so every consumer
validates them and fails loudly on conflict.

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

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .decontam import _WORD_SPLIT

DEFAULT_M_BITS = 1 << 18
DEFAULT_K = 4


@dataclass(frozen=True)
class BloomSketch:
    """A distributed (nibble, val) sketch plus the shape parameters it
    was built with — carried so merge/render/probe can validate instead
    of trusting callers to re-supply the same (n, m_bits, k)."""

    nibbles: DataFrame
    n: int
    m_bits: int
    k: int

    @property
    def params(self) -> tuple[int, int, int]:
        return (self.n, self.m_bits, self.k)


class BloomBitmap(str):
    """The rendered m/4-char hex bitmap, as a ``str`` subclass so
    existing string handling (len, equality, persistence) keeps
    working, with the build parameters attached for probe validation."""

    n: int
    m_bits: int
    k: int

    def __new__(cls, hex_bitmap: str, n: int, m_bits: int, k: int):
        if len(hex_bitmap) * 4 != m_bits:
            raise ValueError(
                f"hex bitmap length {len(hex_bitmap)} != m_bits/4 = {m_bits // 4}"
            )
        obj = super().__new__(cls, hex_bitmap)
        obj.n = n
        obj.m_bits = m_bits
        obj.k = k
        return obj


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
) -> BloomSketch:
    """Distributed sketch build: ``(nibble, val)`` rows, one row per
    nonzero 4-bit nibble of the m-bit array (``val`` in 1..15).

    One shuffle (groupBy nibble, <= m/4 keys, map-side combined); the
    benchmark gram set is exploded but never collected or broadcast.
    """
    if m_bits % 4 or m_bits <= 0:
        raise ValueError(f"m_bits must be a positive multiple of 4, got {m_bits}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    nibbles = (
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
    return BloomSketch(nibbles, n=n, m_bits=m_bits, k=k)


def bloom_merge(*sketches: BloomSketch) -> BloomSketch:
    """OR together sketches — the mergeable-sketch property: screen
    state is maintained per benchmark / per ingest batch and combined
    without re-reading any source.  Merging sketches with different
    (n, m_bits, k) would be silent garbage, so it fails loudly."""
    if not sketches:
        raise ValueError("bloom_merge needs at least one sketch")
    shapes = {s.params for s in sketches}
    if len(shapes) > 1:
        raise ValueError(
            f"bloom_merge: mismatched sketch parameters (n, m_bits, k): {sorted(shapes)}"
        )
    out = sketches[0].nibbles
    for s in sketches[1:]:
        out = out.unionByName(s.nibbles)
    merged = out.groupBy("nibble").agg(F.expr("bit_or(val)").alias("val"))
    return BloomSketch(merged, *sketches[0].params)


def bloom_to_hex(sketch: BloomSketch, m_bits: int | None = None) -> BloomBitmap:
    """Render the sketch to the m/4-char hex bitmap the probe ships.

    ``m_bits`` is optional and only accepted for callers that want to
    assert the sketch's shape; a mismatch is an error, never a resize.
    Driver collect bounded by m/4 rows (module contract — see header).
    """
    if m_bits is not None and m_bits != sketch.m_bits:
        raise ValueError(
            f"m_bits={m_bits} conflicts with the sketch's m_bits={sketch.m_bits}"
        )
    m = sketch.m_bits
    vals = {int(r["nibble"]): int(r["val"]) for r in sketch.nibbles.collect()}
    bad = [i for i in vals if not 0 <= i < m // 4]
    if bad:
        raise ValueError(
            f"sketch nibble index out of range for m_bits={m}: {bad[:3]}"
        )
    hex_bitmap = "".join(format(vals.get(i, 0), "x") for i in range(m // 4))
    return BloomBitmap(hex_bitmap, n=sketch.n, m_bits=m, k=sketch.k)


def _resolve_probe_params(
    hex_bitmap: str,
    n: int | None,
    m_bits: int | None,
    k: int | None,
) -> tuple[int, int, int]:
    """Probe parameters come FROM the bitmap when it carries them;
    explicit arguments are only accepted when they agree (or for raw
    hex strings, where they are required knowledge)."""
    if isinstance(hex_bitmap, BloomBitmap):
        carried = (hex_bitmap.n, hex_bitmap.m_bits, hex_bitmap.k)
        for name, given, have in zip(
            ("n", "m_bits", "k"), (n, m_bits, k), carried
        ):
            if given is not None and given != have:
                raise ValueError(
                    f"bloom_probe: {name}={given} conflicts with the bitmap's "
                    f"{name}={have} (probing with mismatched parameters voids "
                    f"the no-false-negative guarantee)"
                )
        return carried
    # Raw hex string: legacy path — defaults apply, length still checked.
    rn = 13 if n is None else n
    rm = DEFAULT_M_BITS if m_bits is None else m_bits
    rk = DEFAULT_K if k is None else k
    if len(hex_bitmap) * 4 != rm:
        raise ValueError(
            f"hex bitmap length {len(hex_bitmap)} != m_bits/4 = {rm // 4}"
        )
    return rn, rm, rk


def bloom_probe(
    df: DataFrame,
    id_col: str,
    text_col: str,
    hex_bitmap: str,
    n: int | None = None,
    m_bits: int | None = None,
    k: int | None = None,
) -> DataFrame:
    """Screen *df* against the bitmap: ``(id, n_grams, n_hit)`` where
    ``n_hit`` counts the document's distinct n-grams whose k bits are
    ALL set (possible contamination; superset of the exact answer).

    Pass a :class:`BloomBitmap` (what :func:`bloom_to_hex` returns) and
    the probe inherits the build's (n, m_bits, k); explicit arguments
    that disagree fail loudly instead of silently voiding the
    no-false-negative guarantee.

    The corpus text never shuffles: grams explode in the scan stage,
    each tests the bitmap with flat (whole-stage-codegen) expressions,
    and the map-side-combined groupBy ships exactly one counter row per
    (doc, partition).  The bitmap itself rides a BROADCAST single-row
    dimension (packed ``array<bigint>``), not a plan literal: an
    ``F.lit(words)`` array is re-serialized into every task binary via
    the plan, which at m=2^24 is a multi-MB payload per task; the
    broadcast ships it once per executor.  Two designs that LOOK
    cheaper measured 6-30x slower at sf0.1 and are deliberately
    rejected:

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
    n, m_bits, k = _resolve_probe_params(hex_bitmap, n, m_bits, k)
    from .layout import fan_out

    # Nibble i covers bits 4i..4i+3 (the bloom_to_hex layout), so
    # 64-bit word j packs nibbles 16j..16j+15; wrap to signed.
    words = [0] * ((m_bits + 63) // 64)
    for i, ch in enumerate(hex_bitmap):
        words[(4 * i) // 64] |= int(ch, 16) << ((4 * i) % 64)
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]

    # One-row broadcast dimension instead of F.lit(words): keeps the
    # bitmap OUT of the serialized plan (constant plan size at any m).
    # The join is a BroadcastNestedLoopJoin whose build side is ONE row
    # BY CONSTRUCTION (IdentityBroadcastMode, no hash overhead) — a
    # documented plans.audit exemption, same bounded-build class as the
    # knn/ivf query-side broadcasts.  (An equi-join on a constant key
    # does not help: Catalyst constant-folds the condition and degrades
    # to the same BNLJ.)
    spark = df.sparkSession
    bm_df = spark.createDataFrame([(words,)], "__bm: array<bigint>")

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
        .join(F.broadcast(bm_df))
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
