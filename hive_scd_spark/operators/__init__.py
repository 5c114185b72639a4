"""Beyond-the-reference operators for large-scale training-data
pipelines: deduplication, similarity search, text analysis, multimodal
column plumbing.  All are designed partition-first (SURVEY.md §7.6):
no driver-side loops, dimension sides broadcast, candidate generation
via bucketing instead of cross joins.
"""

from hive_scd_spark.operators.dedup import (
    exact_dedup,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from hive_scd_spark.operators.similarity import cosine_topk, lsh_bucketize
from hive_scd_spark.operators.text import (
    doc_fingerprint,
    lang_id,
    quality_stats,
)

__all__ = [
    "exact_dedup",
    "minhash_near_dup_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    "cosine_topk",
    "lsh_bucketize",
    "doc_fingerprint",
    "lang_id",
    "quality_stats",
]
