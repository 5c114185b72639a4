"""Deduplication operators — exact, MinHash+LSH, SimHash, n-gram
Jaccard.  The scale story for each:

- **exact**: one shuffle on the content digest (md5 of normalized
  text), uniformly distributed by construction — no skew at any scale.
- **MinHash LSH**: signatures are per-row array math (no shuffle);
  candidate generation shuffles on (band, band_key) buckets, so cost is
  O(near-duplicates), never O(n²).  This is the 100 TB path.
- **n-gram Jaccard**: exact pairwise via a shingle inverted index —
  quadratic in bucket size; correct baseline and verifier for LSH, not
  the at-scale default (the module docstring of each function says
  which to reach for).
- **SimHash**: a per-row 60-bit fingerprint; hamming-adjacent docs can
  then be banded like MinHash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from hive_scd_spark.functions import (
    HASH_P,
    char_shingles,
    hash32,
    minhash_perms,
    minhash_signature,
    norm_text,
)


def exact_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str | None = None,
    key_cols: list[str] | None = None,
    normalize: bool = True,
) -> DataFrame:
    """Keep one row (smallest *id_col*) per distinct content.

    Content key = md5 of normalized *text_col*, or the tuple of
    *key_cols*.  Single hash-partition shuffle on the digest; the
    min-id winner is picked with a window (sort within each hash
    partition only)."""
    if (text_col is None) == (key_cols is None):
        raise ValueError("pass exactly one of text_col / key_cols")
    if text_col is not None:
        key = F.md5(norm_text(text_col) if normalize else F.col(text_col))
        keys = [key.alias("__content_key")]
        partition = ["__content_key"]
    else:
        keys = []
        partition = list(key_cols or [])
    work = df.select("*", *keys)
    w = W.partitionBy(*partition).orderBy(F.col(id_col).asc())
    out = work.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    return out.drop("__rn", *(["__content_key"] if text_col is not None else []))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    threshold: float = 0.3,
) -> DataFrame:
    """Exact near-duplicate pairs by character-k-gram Jaccard.

    Inverted-index join: explode distinct shingles, self-join on the
    shingle, count shared, compute |∩|/|∪|.  Exact but quadratic within
    a shingle bucket — use as the correctness baseline / final verifier;
    at 100 TB generate candidates with :func:`minhash_near_dup_pairs`
    first."""
    sh = df.select(
        F.col(id_col).alias("__id"),
        F.explode(char_shingles(text_col, k)).alias("__s"),
    ).distinct()
    sizes = sh.groupBy("__id").agg(F.count("*").alias("__n"))
    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(b, (F.col("a.__s") == F.col("b.__s")) & (F.col("a.__id") < F.col("b.__id")))
        .groupBy(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .agg(F.count("*").alias("__shared"))
    )
    sa = sizes.select(F.col("__id").alias("id_a"), F.col("__n").alias("__na"))
    sb = sizes.select(F.col("__id").alias("id_b"), F.col("__n").alias("__nb"))
    jac = F.col("__shared") / (F.col("__na") + F.col("__nb") - F.col("__shared"))
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    num_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.3,
    seed: int = 42,
) -> DataFrame:
    """MinHash + LSH near-duplicate pairs, verified by exact Jaccard.

    shingle → 32-perm minhash signature (per-row array math, codegen)
    → 8 bands × 4 rows → shuffle on (band, band_key) → candidate pairs
    within buckets → exact-Jaccard verification of candidates only.
    With s = Jaccard, the banding hit probability is
    1-(1-s^4)^8 (≈0.97 at s=0.5), and verification removes false
    positives, so output = exact pairs above *threshold* that LSH
    recalled.  Scales as O(candidates), not O(n²)."""
    rows = num_perm // bands
    perms = minhash_perms(num_perm, seed)
    sig = df.select(
        F.col(id_col).alias("__id"),
        minhash_signature(char_shingles(text_col, k), perms).alias("__sig"),
        char_shingles(text_col, k).alias("__sh"),
    )
    banded = sig.select(
        "__id",
        "__sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ",", *[F.slice("__sig", b * rows + 1, rows)[i].cast("string") for i in range(rows)]
                        ).alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("__b"),
    ).select("__id", "__sh", F.col("__b.band").alias("__band"), F.col("__b.key").alias("__key"))
    a = banded.alias("a")
    b = banded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.__band") == F.col("b.__band"))
            & (F.col("a.__key") == F.col("b.__key"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__sh").alias("__sha"),
            F.col("b.__sh").alias("__shb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("__sha", "__shb"))
    union = F.size("__sha") + F.size("__shb") - inter
    jac = inter.cast("double") / union
    return candidates.select(
        "id_a", "id_b", F.round(jac, 6).alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 60) -> DataFrame:
    """Per-document SimHash fingerprint over whitespace tokens.

    Token hash = top 15 hex chars of md5 (60 bits — stays in signed
    64-bit on every engine).  Bit b of the fingerprint is set when the
    majority of token hashes have bit b set.  Pure array math per row;
    near-dup detection then bands the fingerprint like MinHash."""
    tokens = F.split(F.trim(F.col(text_col)), r"\s+")
    th = F.transform(
        tokens, lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
    )
    n_tokens = F.size(tokens)
    bit_votes = [
        F.aggregate(
            th,
            F.lit(0),
            lambda acc, h: acc + F.shiftright(h, b).bitwiseAND(F.lit(1)).cast("int"),
        )
        for b in range(bits)
    ]
    fingerprint = None
    for b, votes in enumerate(bit_votes):
        bit = F.when(votes * 2 > n_tokens, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, b)
        fingerprint = term if fingerprint is None else fingerprint + term
    return df.select(F.col(id_col), fingerprint.alias("simhash"))
