"""Large-scale data-pipeline extension operators (beyond the reference's own
surface, per BASELINE.json north star): deduplication, similarity search,
text analysis, multimodal column plumbing.

Every operator here is designed for the 100 TB bar: built-in JVM expressions
(no row-at-a-time Python), shuffle only on declared keys, broadcast for
small sides, and determinism that survives an engine swap (integer/decimal
arithmetic wherever floats would drift — see each module's notes).
"""

from timeseriesfuser_spark.ops.dedup import (
    connected_components,
    dedup_verdicts,
    exact_duplicates,
    minhash_lsh_pairs,
    minhash_lsh_pairs_between,
    neardup_clusters,
    ngram_jaccard_pairs,
    ngram_novelty,
    passage_dedup,
    simhash_pairs,
)
from timeseriesfuser_spark.ops.behavior import (
    funnel_counts,
    latest_snapshot,
    retention_cohorts,
    scd2_history,
    snapshot_diff,
)
from timeseriesfuser_spark.ops.entity import (
    canonical_entities,
    fuzzy_match_pairs,
)
from timeseriesfuser_spark.ops.expect import check_expectations
from timeseriesfuser_spark.ops.sketches import (
    bloom_bits,
    bloom_merge,
    bloom_prefilter,
    countmin_estimate,
    countmin_merge,
    countmin_sketch,
    histogram_merge,
    histogram_quantiles,
    histogram_sketch,
    hll_estimate,
    hll_estimate_corrected,
    hll_merge,
    hll_registers,
)
from timeseriesfuser_spark.ops.lm import (
    bigram_lm_score,
    curation_verdicts,
    hashed_classifier_score,
)
from timeseriesfuser_spark.ops.packing import (
    byte_shards,
    shard_manifest,
    chunk_documents,
    length_bucketed_batches,
    sequence_pack,
)
from timeseriesfuser_spark.ops.text import (
    decontaminate_spans,
    doc_fingerprint,
    language_id,
    text_stats,
    tfidf_top_terms,
    tokens_col,
)
from timeseriesfuser_spark.ops.similarity import (
    cosine_topk,
    ivf_cosine_topk,
    pq_codes,
    quantize_int8,
    rp_project,
    semantic_dedup_pairs,
    srp_signatures,
)
from timeseriesfuser_spark.ops.scale import (
    key_skew_report,
    profile_columns,
    zorder_key,
    zorder_layout,
)
from timeseriesfuser_spark.ops.timeseries import (
    event_transitions,
    ewma,
    interpolate_grid,
    lagged_crosscorr,
    lttb_downsample,
    ohlc_bars,
    pivot_features,
    rolling_anomalies,
    rolling_corr,
    twap_bars,
    value_rates,
    vwap_bars,
)

__all__ = [
    "bigram_lm_score",
    "canonical_entities",
    "fuzzy_match_pairs",
    "scd2_history",
    "zorder_key",
    "zorder_layout",
    "byte_shards",
    "curation_verdicts",
    "funnel_counts",
    "latest_snapshot",
    "retention_cohorts",
    "snapshot_diff",
    "chunk_documents",
    "hashed_classifier_score",
    "interpolate_grid",
    "key_skew_report",
    "lagged_crosscorr",
    "length_bucketed_batches",
    "lttb_downsample",
    "passage_dedup",
    "pivot_features",
    "pq_codes",
    "profile_columns",
    "ewma",
    "rolling_anomalies",
    "rolling_corr",
    "twap_bars",
    "value_rates",
    "connected_components",
    "cosine_topk",
    "dedup_verdicts",
    "doc_fingerprint",
    "event_transitions",
    "exact_duplicates",
    "ivf_cosine_topk",
    "language_id",
    "minhash_lsh_pairs",
    "minhash_lsh_pairs_between",
    "neardup_clusters",
    "ngram_jaccard_pairs",
    "ngram_novelty",
    "ohlc_bars",
    "quantize_int8",
    "rp_project",
    "semantic_dedup_pairs",
    "sequence_pack",
    "simhash_pairs",
    "srp_signatures",
    "text_stats",
    "tfidf_top_terms",
    "tokens_col",
    "vwap_bars",
    "bloom_bits",
    "bloom_merge",
    "bloom_prefilter",
    "check_expectations",
    "countmin_estimate",
    "countmin_merge",
    "countmin_sketch",
    "decontaminate_spans",
    "histogram_merge",
    "histogram_quantiles",
    "histogram_sketch",
    "hll_estimate",
    "hll_estimate_corrected",
    "hll_merge",
    "hll_registers",
    "shard_manifest",
]
