#!/usr/bin/env python
"""End-to-end LLM training-data pipeline demo over the synthetic
documents/embeddings tables: quality gate → exact dedup → near-dup
clustering (MinHash-LSH + connected components) → contamination check →
tf-idf keywords → stratified sample → sliding-window chunking → sequence
packing, plus embedding-side ANN and compression, BM25 retrieval,
corpus-geometry diagnostics, class balancing and a k-anonymity audit. Run:

    python examples/demo_llm_pipeline.py [sf_dir]   # default sf0.01
"""

import os
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from timeseriesfuser_spark.ops import dedup as D  # noqa: E402
from timeseriesfuser_spark.ops import packing as P  # noqa: E402
from timeseriesfuser_spark.ops import sampling as SA  # noqa: E402
from timeseriesfuser_spark.ops import similarity as S  # noqa: E402
from timeseriesfuser_spark.ops import text as X  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("tsf_llm_pipeline_demo")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n0 = docs.count()
    print(f"corpus: {n0} docs")

    # 1. Quality gate (Gopher-style composite rules).
    kept = X.quality_filter(docs).filter("keep")
    print(f"quality gate: {kept.count()}/{n0} pass")

    # 2. Exact dedup: collapse identical content, keep min-id canonical.
    groups = D.exact_duplicates(docs)
    n_unique = groups.count()
    print(f"exact dedup: {n_unique} distinct contents")

    # 3. Near-dup clustering: LSH pairs -> connected components ->
    #    keep one survivor per cluster (the min id).
    clusters = D.neardup_clusters(docs, num_hashes=16, bands=4, threshold=0.4)
    survivors = clusters.filter(F.col("doc_id") == F.col("cluster_id"))
    print(f"near-dup clustering: {survivors.count()} survivors "
          f"({clusters.filter('cluster_size > 1').count()} docs in non-trivial clusters)")

    # 4. Benchmark contamination: n-gram overlap vs a held-out set
    #    (here: the 5 longest docs stand in for a benchmark).
    bench = docs.orderBy(F.desc("n_chars")).limit(5).select("doc_id", "text")
    contam = X.contamination_check(docs, bench)
    print(f"contamination: {contam.filter('contamination_frac >= 0.8').count()} "
          "docs heavily overlapping the benchmark")

    # 5. Per-doc keywords for corpus exploration.
    X.tfidf_top_terms(docs, k=3).show(6, truncate=60)

    # 6. Deterministic stratified sample by language.
    sample = SA.stratified_sample(docs, {"en": 0.25}, strata_col="lang", default_rate=0.25)
    print(f"stratified 25% sample: {sample.count()} docs")

    # 7. Context-window prep: sliding 32-token chunks, then packed
    #    sequences from global token offsets.
    chunks = P.chunk_documents(docs, chunk_size=32, stride=24)
    print(f"chunking: {chunks.count()} windows")
    packed = P.sequence_pack(docs, budget=512)
    packed.select("doc_id", "n_tokens", "start_offset", "bin_first",
                  "offset_in_bin", "n_bins").show(4)

    # 8. Embedding side: ANN top-k and JL compression.
    queries = emb.limit(3)
    S.cosine_topk(emb, queries, k=3).show(9)
    S.rp_project(emb, out_dim=8).show(3, truncate=60)

    # 9. Span-level decontamination: remove the benchmark-overlapping
    #    n-gram spans instead of dropping whole documents.
    cleaned = X.decontaminate_spans(docs, bench)
    print(f"decontamination: {cleaned.filter('n_removed > 0').count()} docs "
          "had contaminated spans removed")

    # 10. Monitoring sketches — the fixed-size state a 100 TB pipeline
    #     keeps instead of exact per-key aggregates: doc-length quantiles
    #     from a mergeable histogram, plus a Bloom pre-filter that lets a
    #     selective join skip most of the corpus before shuffling.
    from timeseriesfuser_spark.ops.sketches import (
        bloom_bits,
        bloom_prefilter,
        histogram_quantiles,
        histogram_sketch,
    )

    hist = histogram_sketch(docs, "n_chars", lo=0.0, hi=2000.0, bins=128)
    histogram_quantiles(hist, [0.5, 0.9, 0.99], lo=0.0, hi=2000.0, bins=128).show()
    bits = bloom_bits(survivors.select("doc_id"), "doc_id", m_bits=65536, k=3)
    prefiltered = bloom_prefilter(docs, bits, "doc_id", m_bits=65536, k=3)
    print(f"bloom pre-filter: {prefiltered.count()} candidate rows reach the "
          f"exact survivor join (of {docs.count()})")

    # 10b. Retrieval over the curated corpus: BM25 lexical ranking (the
    #      query terms here are just the corpus's own df-mid tokens),
    #      and the corpus-geometry histogram that calibrates near-dup /
    #      ANN thresholds.
    vocab = (
        docs.select(F.explode(X.tokens_col(F.col("text"))).alias("tk"))
        .groupBy("tk").count().orderBy(F.desc("count"), F.asc("tk"))
        .limit(30).collect()
    )
    terms = [vocab[i]["tk"] for i in (9, 19, 29) if i < len(vocab)]
    top = X.bm25_topk(docs, terms, k=5).collect()
    print(f"bm25 top-5 for {terms}: "
          + ", ".join(f"doc {r['id']} ({r['bm25_u']}u)" for r in top))
    S.embedding_sim_histogram(emb, sample_buckets=8).orderBy("bin").show()

    # 10c. Class balance + governance: rebalance the corpus to its
    #      smallest source and audit quasi-identifier re-identification
    #      risk before publishing.
    from timeseriesfuser_spark.ops.expect import k_anonymity
    from timeseriesfuser_spark.ops.sampling import balanced_sample

    bal = balanced_sample(docs, strata_col="source", id_col="doc_id")
    print(f"balanced sample: {bal.count()} docs kept")
    risky = k_anonymity(docs, ["source", "lang"], 5).filter("at_risk = 1")
    print(f"k-anonymity: {risky.count()} (source, lang) classes under k=5")

    # 11. Publish gate: declarative expectations over the curated corpus.
    #     The demo exercises BOTH paths: the clean corpus must pass (the
    #     pipeline publishes), and a deliberately poisoned batch must be
    #     caught (the pipeline refuses to publish) — living documentation
    #     of the DQ surface.
    from timeseriesfuser_spark.ops.expect import check_expectations

    rules = [
        {"name": "text_not_null", "type": "not_null", "col": "text"},
        {"name": "lang_domain", "type": "accepted_values", "col": "lang",
         "values": ["en", "de", "fr", "es", "zh"]},
        {"name": "chars_consistent", "type": "expression",
         "expr": "n_chars = length(text)"},
        {"name": "doc_id_unique", "type": "unique", "cols": ["doc_id"]},
    ]

    report = check_expectations(docs, rules)
    report.show(truncate=False)
    failed = [r["rule"] for r in report.collect() if not r["passed"]]
    assert not failed, f"publish gate failed on the clean corpus: {failed}"
    print("publish gate: PASS — corpus is publishable")

    # Poison the batch: a NULL text, an out-of-domain lang, a doc whose
    # n_chars lies about its text, and a duplicated doc_id.
    poison = spark.createDataFrame(
        [
            (90_000_001, None, "en", 10),
            (90_000_002, "ok text", "tlh", 7),
            (90_000_003, "short", "en", 9999),
        ],
        "doc_id long, text string, lang string, n_chars long",
    ).withColumn("text", F.col("text").cast("string"))
    dup = docs.limit(1).select("doc_id", "text", "lang", "n_chars")
    poisoned = docs.select("doc_id", "text", "lang", "n_chars").unionByName(
        poison
    ).unionByName(dup)

    report2 = check_expectations(poisoned, rules)
    report2.show(truncate=False)
    caught = {r["rule"] for r in report2.collect() if not r["passed"]}
    expected = {"text_not_null", "lang_domain", "chars_consistent",
                "doc_id_unique"}
    assert caught == expected, (
        f"gate missed poisoned rows: caught {caught}, expected {expected}"
    )
    print("publish gate: poisoned batch BLOCKED — every injected defect "
          f"caught ({', '.join(sorted(caught))})")

    spark.stop()


if __name__ == "__main__":
    main()
