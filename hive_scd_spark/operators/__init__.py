"""Beyond-the-reference operators for large-scale training-data
pipelines: deduplication, similarity search, text analysis, multimodal
column plumbing.  All are designed partition-first (SURVEY.md §7.6):
no driver-side loops, dimension sides broadcast, candidate generation
via bucketing instead of cross joins.
"""

from hive_scd_spark.operators.asof import asof_join
from hive_scd_spark.operators.dedup import (
    embedding_near_dup_pairs,
    exact_dedup,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from hive_scd_spark.operators.multimodal import attach_binary, extract_image_features
from hive_scd_spark.operators.similarity import (
    ann_cosine_topk,
    cosine_topk,
    ivf_assign,
    ivf_cosine_topk,
    lsh_bucketize,
)
from hive_scd_spark.operators.skew import salted_agg, salted_join
from hive_scd_spark.operators.text import (
    doc_fingerprint,
    lang_id,
    quality_stats,
    token_counts,
)

__all__ = [
    "asof_join",
    "embedding_near_dup_pairs",
    "exact_dedup",
    "minhash_near_dup_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    "attach_binary",
    "extract_image_features",
    "ann_cosine_topk",
    "cosine_topk",
    "ivf_assign",
    "ivf_cosine_topk",
    "lsh_bucketize",
    "salted_agg",
    "salted_join",
    "doc_fingerprint",
    "lang_id",
    "quality_stats",
    "token_counts",
]
