"""Shared column-expression helpers — all JVM-side built-ins (no Python
UDFs), so every operator built on them stays inside whole-stage codegen.

Hash conventions are chosen to be *cross-engine deterministic* (same
values in Spark and any ANSI engine with md5): ``hash32`` is the first
8 hex chars of md5 as an integer.  This is what makes the dedup /
fingerprint operators oracle-checkable in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^31-1: keeps (a*h+b) % P inside signed 64-bit range
HASH_P = 2_147_483_647


def norm_text(col) -> Column:
    """Normalization for exact dedup: lowercase, collapse whitespace."""
    col = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def ws_tokens(col) -> Column:
    """Lowercased whitespace tokens — THE shared tokenizer
    (text analysis, quality filters, BM25, unigram LM all key on it).
    Splits on \\s, which Java extends to \\x0B and RE2 does not, so the
    oracle contract assumes \\x0B-free text (``clean_text``'s explicit
    whitespace class is the sanctioned pre-step where that matters).
    Empty input yields [''] (split semantics) and NULL yields NULL —
    callers that must keep empty/NULL docs guard at the row level
    (see quality.repetition_stats / similarity.hash_embed)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(F.lower(col)), r"\s+")


def hash32(col) -> Column:
    """First 8 hex chars of md5 → bigint in [0, 2^32).  Deterministic
    across engines (DuckDB: ``('0x' || substr(md5(x),1,8))::BIGINT``)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def char_shingles(col, k: int = 8) -> Column:
    """Distinct character k-shingles as an array column.  Positions are
    1-based; docs shorter than k yield their whole text as one shingle
    (formula mirrored exactly in the DuckDB oracles)."""
    col = F.col(col) if isinstance(col, str) else col
    positions = F.sequence(F.lit(1), F.greatest(F.length(col) - (k - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(positions, lambda i: F.substring(col, i, k))
    )


def minhash_perms(num_perm: int = 32, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) permutation constants via a fixed LCG —
    shared verbatim with the DuckDB oracle SQL."""
    out = []
    state = seed
    for _ in range(num_perm):
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
        a = state % (HASH_P - 1) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
        b = state % HASH_P
        out.append((a, b))
    return out


def minhash_signature(shingles: Column, perms: list[tuple[int, int]]) -> Column:
    """Array of minhash values, one per permutation: min over shingles of
    ``(a * (hash32(s) % P) + b) % P``.  Pure array transforms — no
    explode, no shuffle; the signature is computed in a single pass per
    row inside codegen."""
    hashed = F.transform(
        shingles,
        lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
        % F.lit(HASH_P),
    )
    return F.array(
        *[
            F.array_min(
                F.transform(hashed, lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(HASH_P))
            )
            for a, b in perms
        ]
    )


def vector_norm(a: Column) -> Column:
    """L2 norm of a float-array column, double precision, sequential
    fold order (matches ``SQRT(list_sum(list_transform(...)))``)."""
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine of two float-array columns, computed in double with
    sequential left-fold order (stable across engines for hashing)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    nb = F.sqrt(
        F.aggregate(
            F.transform(b, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return F.try_divide(dot, na * nb)  # zero-norm → NULL, not ANSI error
