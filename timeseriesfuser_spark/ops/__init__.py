"""Large-scale data-pipeline extension operators (beyond the reference's own
surface, per BASELINE.json north star): deduplication, similarity search,
text analysis, multimodal column plumbing.

Every operator here is designed for the 100 TB bar: built-in JVM expressions
(no row-at-a-time Python), shuffle only on declared keys, broadcast for
small sides, and determinism that survives an engine swap (integer/decimal
arithmetic wherever floats would drift — see each module's notes).
"""

from timeseriesfuser_spark.ops.dedup import (
    exact_duplicates,
    ngram_jaccard_pairs,
    minhash_lsh_pairs,
    simhash_pairs,
)
from timeseriesfuser_spark.ops.text import (
    tokens_col,
    text_stats,
    language_id,
    doc_fingerprint,
)
from timeseriesfuser_spark.ops.similarity import cosine_topk, ivf_cosine_topk

__all__ = [
    "exact_duplicates",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "tokens_col",
    "text_stats",
    "language_id",
    "doc_fingerprint",
    "cosine_topk",
    "ivf_cosine_topk",
]
