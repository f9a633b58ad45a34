"""Training-data pipeline: sampling, mixing, packing, shuffling, LM and
classifier scoring, curation verdicts, shards, leakage-safe splits.

Split from the single-module registry (round 7); the query/oracle
registration surface (contract.QUERIES / contract.ORACLES) is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timeseriesfuser_spark.config import FuserConfig, SourceConfig
from timeseriesfuser_spark.intervals import (
    boundary_label_col,
    floor_boundary_col,
    interval_to_ms,
)
from timeseriesfuser_spark.operators.fill import forward_fill
from timeseriesfuser_spark.operators.fuse import TimeSeriesFuser
from timeseriesfuser_spark.operators.resample import resample_last_interval
from timeseriesfuser_spark.ops import dedup as D
from timeseriesfuser_spark.ops import packing as P
from timeseriesfuser_spark.ops import sampling as SA
from timeseriesfuser_spark.ops import similarity as S
from timeseriesfuser_spark.ops import text as X
from timeseriesfuser_spark.ops import timeseries as TS
from timeseriesfuser_spark.timeutils import coerce_to_epoch_ms, ts_epoch_ms_col

from timeseriesfuser_spark.contract._base import (  # noqa: F401
    QUERIES,
    ORACLES,
    register,
    _t,
    _events,
    _sql_hash64,
    _TOKS,
    _SHINGLES,
    _shingle_rel,
    _SHINGLE_REL,
    _H1,
    _ff,
    _fdiv,
    _NH,
    _NB,
    _MT,
    _minhash_sql,
    _H1GAP,
    _DIFF_MID,
)



# Per-source sampling rates used by the stratified-sample query: sources
# src0..src19; src<N> keeps 20/40/60/80% by N mod 4 — exercising several
# distinct rates plus determinism across engines.
_SAMPLE_RATES = {f"src{i}": (200_000 + (i % 4) * 200_000) / 1e6 for i in range(20)}


@register(
    "stratified_sample",
    oracle=f"""
    WITH s AS (
        SELECT doc_id, source,
               {_sql_hash64("source || ':' || CAST(doc_id AS VARCHAR)")} % 1000000 AS hash_ppm,
               CAST(200000 + (CAST(substr(source, 4) AS BIGINT) % 4) * 200000 AS BIGINT) AS rate_ppm
        FROM documents
    )
    SELECT doc_id, source, CAST(hash_ppm AS BIGINT) AS hash_ppm, rate_ppm
    FROM s WHERE hash_ppm < rate_ppm
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based per-source sampling
    (ops.sampling.stratified_sample): md5(source:doc_id) mod 1e6 under a
    per-source ppm rate. Pure projection + filter — no shuffle; the verdict
    for a row is stable under corpus growth and nested across rates."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return SA.stratified_sample(docs, _SAMPLE_RATES)


@register(
    "mixing_weights",
    oracle=f"""
    WITH per AS (
        SELECT source AS stratum,
               CAST((CAST(substr(source, 4) AS BIGINT) % 4) + 1 AS BIGINT) AS share,
               CAST(sum(len({_TOKS})) AS BIGINT) AS total_tokens
        FROM documents GROUP BY source
    ),
    k AS (SELECT CAST(sum(share) AS BIGINT) AS kk FROM per),
    c AS (
        SELECT per.*, k.kk,
               CASE WHEN share > 0
                    THEN CAST(total_tokens * k.kk AS DOUBLE) / CAST(share AS DOUBLE)
                    END AS capacity
        FROM per, k
    ),
    t AS (SELECT min(capacity) AS tstar FROM c)
    SELECT stratum AS source, total_tokens, share,
           CAST(share AS DOUBLE) / CAST(kk AS DOUBLE) AS target_weight,
           capacity,
           CASE WHEN share > 0
                THEN (CAST(share AS DOUBLE) * t.tstar) / CAST(kk * total_tokens AS DOUBLE)
                ELSE 0.0 END AS sample_rate,
           (CASE WHEN share > 0
                 THEN (CAST(share AS DOUBLE) * t.tstar) / CAST(kk * total_tokens AS DOUBLE)
                 ELSE 0.0 END) * CAST(total_tokens AS DOUBLE) AS expected_tokens
    FROM c, t
    """,
)
def q_mixing_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixing rates (ops.sampling.mixing_weights): per-source token
    totals + integer target shares (src<N> gets share N%4+1) → the largest
    downsample-only corpus hitting the target mixture, and each source's
    sampling rate (1.0 for the binding source). All doubles are fixed
    chains on exact integer counts — engine-reproducible."""
    shares = {f"src{i}": i % 4 + 1 for i in range(20)}
    return SA.mixing_weights(_t(spark, sf_dir, "documents"), shares)


_PACK_BUDGET = 256


@register(
    "sequence_pack",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, CAST(COALESCE(len({_TOKS}), 0) AS BIGINT) AS n_tokens
        FROM documents
    ),
    o AS (
        SELECT doc_id, n_tokens,
               CAST(COALESCE(sum(n_tokens) OVER
                   (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS start_offset
        FROM t
    )
    SELECT doc_id, n_tokens, start_offset,
           CAST(start_offset // {_PACK_BUDGET} AS BIGINT) AS bin_first,
           CAST(CASE WHEN n_tokens > 0
                     THEN (start_offset + n_tokens - 1) // {_PACK_BUDGET}
                     ELSE start_offset // {_PACK_BUDGET} END AS BIGINT) AS bin_last,
           CAST(start_offset % {_PACK_BUDGET} AS BIGINT) AS offset_in_bin,
           CAST(CASE WHEN n_tokens > 0
                     THEN (start_offset + n_tokens - 1) // {_PACK_BUDGET}
                          - start_offset // {_PACK_BUDGET} + 1
                     ELSE 0 END AS BIGINT) AS n_bins
    FROM o
    """,
)
def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing (ops.packing.sequence_pack): each
    document's span of fixed-256-token training sequences under the global
    doc_id concat order. The global prefix sum is the two-pass
    range-bucketed scheme (bucketed window + literal per-bucket carry) —
    no global-order single-task window; the SQL twin is the plain window
    cumsum."""
    return P.sequence_pack(
        _t(spark, sf_dir, "documents"), budget=_PACK_BUDGET
    )


_SHUF_SHARDS = 8


@register(
    "epoch_shuffle",
    oracle=f"""
    SELECT doc_id,
           CAST({_sql_hash64("concat('epoch0:', CAST(doc_id AS VARCHAR))")}
                % {_SHUF_SHARDS} AS BIGINT) AS shard,
           CAST({_sql_hash64("concat('epoch0:', CAST(doc_id AS VARCHAR))")}
                AS BIGINT) AS rank
    FROM documents
    """,
)
def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle (ops.sampling.epoch_shuffle): md5-derived
    60-bit rank + shard per doc — a reproducible global permutation with no
    RNG state; the op itself is a zero-shuffle projection (the permutation
    is realized by the shard-partitioned write)."""
    return SA.epoch_shuffle(
        _t(spark, sf_dir, "documents"), n_shards=_SHUF_SHARDS
    )


@register(
    "bigram_lm",
    oracle="""
    WITH tk AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
                FROM documents),
    bg AS (SELECT doc_id, unnest([tk[i] || ' ' || tk[i+1] FOR i IN range(1, len(tk))]) AS bg
           FROM tk),
    c2 AS (SELECT bg, count(*) AS c2 FROM bg GROUP BY bg),
    c1 AS (SELECT split_part(bg, ' ', 1) AS w1, count(*) AS c1 FROM bg GROUP BY 1),
    model AS (SELECT bg, CAST(c2 * 1000000 // c1 AS BIGINT) AS ppm
              FROM c2 JOIN c1 ON split_part(c2.bg, ' ', 1) = c1.w1),
    per AS (SELECT b.doc_id, count(*) AS nb, sum(m.ppm) AS sp, min(m.ppm) AS mp
            FROM bg b JOIN model m USING (bg) GROUP BY b.doc_id)
    SELECT d.doc_id,
           CAST(coalesce(nb, 0) AS BIGINT) AS n_bigrams,
           CAST(sp AS BIGINT) AS sum_ppm,
           CAST(mp AS BIGINT) AS min_ppm,
           CASE WHEN nb > 0 THEN CAST(sp AS DOUBLE) / nb END AS avg_ppm
    FROM documents d LEFT JOIN per USING (doc_id)
    """,
)
def q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram-LM likelihood proxy (ops.lm.bigram_lm_score): KenLM-
    style quality axis — P(w2|w1) = c2/c1 stored integer-exact in ppm;
    per-doc Σ/min/avg over bigram occurrences. Model build = one word-count
    agg (+c1 derived from the distinct-bigram relation); scoring join left
    to AQE, which broadcasts small (Zipf) models and shuffles web-scale
    ones."""
    from timeseriesfuser_spark.ops import lm as LM

    return LM.bigram_lm_score(_t(spark, sf_dir, "documents"))


_QC_BUCKETS, _QC_SPAN = 1 << 20, 1000


@register(
    "quality_classifier",
    oracle=f"""
    WITH tk AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
                FROM documents),
    t AS (SELECT doc_id, unnest(tk) AS tok FROM tk),
    w AS (SELECT doc_id,
                 {_sql_hash64("concat('17', chr(31), tok)")} % {_QC_BUCKETS} AS bucket
          FROM t),
    ws AS (SELECT doc_id,
                  {_sql_hash64("concat('qw:', CAST(bucket AS VARCHAR))")}
                    % {2 * _QC_SPAN + 1} - {_QC_SPAN} AS wt
           FROM w),
    per AS (SELECT doc_id, count(*) AS n, sum(wt) AS s FROM ws GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(coalesce(n, 0) AS BIGINT) AS n_tokens,
           CAST(coalesce(s, 0) AS BIGINT) AS sum_weight,
           CASE WHEN n > 0 THEN CAST(s AS DOUBLE) / n END AS logit,
           (coalesce(s, 0) > 0) AS label_keep
    FROM documents d LEFT JOIN per USING (doc_id)
    """,
)
def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style hashed linear quality scorer (ops.lm.
    hashed_classifier_score): token → 2^20 feature buckets → md5-derived
    bucket weight; logit = mean weight, keep-decision integer-exact.
    Pure projection — ZERO shuffles (the per-doc sum runs inside the row
    via F.aggregate)."""
    from timeseriesfuser_spark.ops import lm as LM

    return LM.hashed_classifier_score(
        _t(spark, sf_dir, "documents"), n_buckets=_QC_BUCKETS, span=_QC_SPAN
    )


_LB_BAND, _LB_BATCH, _LB_SHARDS = 16, 8, 4


@register(
    "length_batches",
    oracle=f"""
    WITH tk AS (SELECT doc_id,
                       COALESCE(len(regexp_extract_all(lower(text),
                                                       '[a-z0-9]+')), 0)
                         AS n_tokens
                FROM documents),
    r AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                 CAST(n_tokens // {_LB_BAND} AS BIGINT) AS band,
                 {_sql_hash64("concat('lb0:', CAST(doc_id AS VARCHAR))")} AS rk
          FROM tk),
    s AS (SELECT *, CAST(rk % {_LB_SHARDS} AS BIGINT) AS shard FROM r),
    w AS (SELECT doc_id, n_tokens, band, shard,
                 row_number() OVER (PARTITION BY band, shard
                                    ORDER BY rk, doc_id) - 1 AS rn
          FROM s)
    SELECT doc_id, n_tokens, band, shard,
           CAST(rn // {_LB_BATCH} AS BIGINT) AS batch_in_shard,
           CAST(rn % {_LB_BATCH} AS BIGINT) AS pos_in_batch
    FROM w
    """,
)
def q_length_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch assignment (ops.packing.
    length_bucketed_batches): similar-length docs share padded batches;
    md5-rank epoch shuffle; batches cut per (band, shard) so window
    partitions are data/|bands·shards| — each shard is one writer task."""
    return P.length_bucketed_batches(
        _t(spark, sf_dir, "documents"),
        band_tokens=_LB_BAND,
        batch_size=_LB_BATCH,
        n_shards=_LB_SHARDS,
    )


_CUR_LM_MIN = 30_000

# The curation oracle COMPOSES the already-registered component oracles as
# CTEs (each body carries its own WITH — legal subquery SQL), so the
# composition can never drift from the components.
_CURATION_ORACLE = f"""
    WITH qf AS ({{qf}}),
    cls AS ({{cls}}),
    lm AS ({{lm}}),
    ex AS (
        SELECT doc_id,
               min(doc_id) OVER (PARTITION BY md5(text)) != doc_id AS is_dup
        FROM documents
    ),
    v AS (
        SELECT d.doc_id,
               CASE WHEN ex.is_dup THEN 'exact_dup'
                    WHEN NOT qf.keep THEN 'gopher:' || qf.drop_reason
                    WHEN NOT cls.label_keep THEN 'classifier'
                    WHEN coalesce(lm.sum_ppm, 0) < {_CUR_LM_MIN} * lm.n_bigrams
                         THEN 'low_lm_score'
                    ELSE 'keep' END AS verdict
        FROM documents d
        JOIN ex USING (doc_id)
        JOIN qf USING (doc_id)
        JOIN cls USING (doc_id)
        JOIN lm USING (doc_id)
    )
    SELECT doc_id, verdict, verdict = 'keep' AS keep FROM v
"""


@register(
    "curation_verdicts",
    oracle=_CURATION_ORACLE.format(
        qf=ORACLES["quality_filter"],
        cls=ORACLES["quality_classifier"],
        lm=ORACLES["bigram_lm"],
    ),
)
def q_curation_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-of-pipeline curation decision (ops.lm.curation_verdicts):
    exact-dup → Gopher gate → classifier → bigram-LM threshold composed
    with first-failing-stage reasons — the quality twin of
    `dedup_verdicts`. Each component keeps its own scalable plan; the
    composition is per-doc equi-joins."""
    from timeseriesfuser_spark.ops import lm as LM

    return LM.curation_verdicts(
        _t(spark, sf_dir, "documents"), lm_min_avg_ppm=_CUR_LM_MIN
    )


_SHARD_BYTES = 65_536


@register(
    "byte_shards",
    oracle=f"""
    WITH b AS (SELECT doc_id, CAST(COALESCE(length(text), 0) AS BIGINT)
                 AS n_bytes
               FROM documents),
    o AS (SELECT doc_id, n_bytes,
                 CAST(coalesce(sum(n_bytes) OVER (
                     ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS start_offset
          FROM b)
    SELECT doc_id, n_bytes, start_offset,
           CAST(start_offset // {_SHARD_BYTES} AS BIGINT) AS shard,
           CAST(start_offset % {_SHARD_BYTES} AS BIGINT) AS shard_offset
    FROM o
    """,
)
def q_byte_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset-style shard assignment (ops.packing.byte_shards):
    ~64 KiB shards cut over the byte prefix sum in doc order, each object
    whole in the shard holding its first byte. The prefix sum is the
    two-pass range-bucketed scheme (no global-order window); the SQL twin
    is the plain window cumsum."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        # NULL text = zero bytes, still a position in the shard order
        F.coalesce(F.length("text"), F.lit(0)).cast("long").alias("n_bytes"),
    )
    return P.byte_shards(docs, _SHARD_BYTES)


@register(
    "leakage_split",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_minhash_sql()}),
    edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION ALL
        SELECT id_b, id_a FROM pairs
    ),
    reach(id, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.v, reach.r FROM edges e JOIN reach ON reach.id = e.u
    ),
    comp AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
    h AS (SELECT doc_id, CAST(cluster_id AS BIGINT) AS group_id,
                 {_sql_hash64("concat('split0:', CAST(cluster_id AS VARCHAR))")}
                   % 1000000 AS hp
          FROM comp)
    SELECT doc_id, group_id,
           CASE WHEN hp < 100000 THEN 'test'
                WHEN hp < 200000 THEN 'val'
                ELSE 'train' END AS split
    FROM h
    """,
)
def q_leakage_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split (ops.sampling.leakage_safe_split
    over near-dup clusters): the split verdict hashes the doc's CLUSTER,
    so near-duplicates can never straddle train and test — the eval-
    contamination guard a pretraining pipeline runs after dedup."""
    from timeseriesfuser_spark.ops.sampling import leakage_safe_split

    docs = _t(spark, sf_dir, "documents")
    clusters = D.neardup_clusters(
        docs, num_hashes=_NH, bands=_NB, threshold=_MT
    )
    return leakage_safe_split(
        docs,
        clusters,
        id_col="doc_id",
        group_id_col="cluster_id",
        splits=(("test", 0.10), ("val", 0.10), ("train", 0.80)),
        seed="split0",
    )


_FIXN = 5


@register(
    "fixed_n_sample",
    oracle=f"""
    WITH h AS (
        SELECT doc_id, source,
               {_sql_hash64("'fixed0' || ':' || source || ':' || CAST(doc_id AS VARCHAR)")}
                 % 1000000 AS hp
        FROM documents),
    r AS (SELECT doc_id, source,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY hp, doc_id) AS rn
          FROM h)
    SELECT doc_id, source, CAST(rn AS BIGINT) AS sample_rank
    FROM r WHERE rn <= {_FIXN}
    """,
)
def q_fixed_n_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-budget eval-set sampling (ops.sampling.stratified_fixed_n):
    exactly min(5, |stratum|) docs per source by deterministic md5 rank —
    Bernoulli sampling only hits a size in expectation; benchmark sets
    need exact budgets. One per-stratum ranking window."""
    from timeseriesfuser_spark.ops.sampling import stratified_fixed_n

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return stratified_fixed_n(
        docs, _FIXN, strata_col="source", id_col="doc_id", seed="fixed0"
    )


@register(
    "shard_manifest",
    oracle="""
    WITH b AS (SELECT doc_id,
                      CAST(COALESCE(octet_length(encode(text)), 0) AS BIGINT)
                        AS nb,
                      sha256(COALESCE(text, '')) AS dsha
               FROM documents),
    o AS (SELECT doc_id, nb, dsha,
                 CAST(coalesce(sum(nb) OVER (
                     ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS start_offset
          FROM b)
    SELECT CAST(start_offset // 65536 AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(nb) AS BIGINT) AS n_bytes,
           sha256(string_agg(dsha, '' ORDER BY doc_id)) AS content_sha256
    FROM o
    GROUP BY 1
    """,
)
def q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verifiable shard manifest (ops.packing.shard_manifest): per
    64 KiB byte-shard of the documents layout, the doc count, byte
    total, and the order-sensitive content fingerprint (sha256 over the
    per-doc sha256 digests in doc order) — what
    sinks.export_training_shards writes next to the shard files, here
    computed standalone so a consumer can audit an export against the
    current corpus. sha256 + hex strings only: engine-reproducible."""
    from timeseriesfuser_spark.ops.packing import shard_manifest

    return shard_manifest(
        _t(spark, sf_dir, "documents"), 65536, order_col="doc_id"
    )


@register(
    "lineitem_expectations",
    oracle="""
    WITH n AS (SELECT CAST(count(*) AS BIGINT) AS nr FROM lineitem),
    rows_r AS (
        SELECT 'shipdate_not_null' AS rule, n.nr AS n_rows,
               CAST((SELECT count(*) FROM lineitem WHERE l_shipdate IS NULL)
                    AS BIGINT) AS n_violations FROM n
        UNION ALL
        SELECT 'qty_1_to_50', n.nr,
               CAST((SELECT count(*) FROM lineitem
                     WHERE l_quantity IS NOT NULL
                       AND (l_quantity < 1 OR l_quantity > 50)) AS BIGINT)
        FROM n
        UNION ALL
        SELECT 'returnflag_domain', n.nr,
               CAST((SELECT count(*) FROM lineitem
                     WHERE l_returnflag IS NOT NULL
                       AND l_returnflag NOT IN ('A', 'N', 'R')) AS BIGINT)
        FROM n
        UNION ALL
        SELECT 'discount_le_tax_plus_half', n.nr,
               CAST((SELECT count(*) FROM lineitem
                     WHERE NOT COALESCE(l_discount <= l_tax + 0.5, FALSE))
                    AS BIGINT)
        FROM n
        UNION ALL
        SELECT 'orderkey_line_unique',
               (SELECT CAST(sum(c) AS BIGINT) FROM
                 (SELECT count(*) AS c FROM lineitem
                  GROUP BY l_orderkey, l_linenumber)),
               (SELECT CAST(sum(c - 1) AS BIGINT) FROM
                 (SELECT count(*) AS c FROM lineitem
                  GROUP BY l_orderkey, l_linenumber))
    )
    SELECT rule, n_rows, n_violations,
           CAST(n_violations * 1000000 // n_rows AS BIGINT) AS violation_ppm,
           n_violations = 0 AS passed
    FROM rows_r
    """,
)
def q_lineitem_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate (ops.expect.check_expectations):
    five rules over lineitem — not-null, numeric range, accepted values,
    a cross-column SQL expression, and key uniqueness — checked in ONE
    conditional-sum aggregation pass (plus the inherent key shuffle for
    uniqueness). The uniqueness rule REALLY fails on the synthetic data
    ((orderkey, linenumber) is non-unique) — the report shows it, which
    is the point of a gate."""
    from timeseriesfuser_spark.ops.expect import check_expectations

    return check_expectations(
        _t(spark, sf_dir, "lineitem"),
        [
            {"name": "shipdate_not_null", "type": "not_null",
             "col": "l_shipdate"},
            {"name": "qty_1_to_50", "type": "range", "col": "l_quantity",
             "lo": 1, "hi": 50},
            {"name": "returnflag_domain", "type": "accepted_values",
             "col": "l_returnflag", "values": ["A", "N", "R"]},
            {"name": "discount_le_tax_plus_half", "type": "expression",
             "expr": "l_discount <= l_tax + 0.5"},
            {"name": "orderkey_line_unique", "type": "unique",
             "cols": ["l_orderkey", "l_linenumber"]},
        ],
    )


@register(
    "weighted_sample",
    oracle=f"""
    WITH s AS (
        SELECT doc_id, source, n_chars,
               {_sql_hash64("CAST(doc_id AS VARCHAR)")} % 1000000
                   AS hash_ppm,
               -- weight = least(1.0, n_chars/2000): SAME double chain as
               -- the Spark side (w*base_rate*1e6 then round then clamp)
               least(CAST(1000000 AS BIGINT),
                     greatest(CAST(0 AS BIGINT),
                              CAST(round(least(1.0, CAST(n_chars AS DOUBLE)
                                               / 2000) * 1.0 * 1000000)
                                   AS BIGINT))) AS rate_ppm
        FROM documents
        WHERE n_chars IS NOT NULL AND doc_id IS NOT NULL
    )
    SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(hash_ppm AS BIGINT) AS hash_ppm, rate_ppm
    FROM s WHERE hash_ppm < rate_ppm
    """,
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted Bernoulli sampling (ops.sampling.weighted_sample):
    keep probability = clamp(weight, 0, 1) with weight = min(1,
    n_chars/2000) — long docs kept with certainty, short ones
    down-sampled in proportion. md5(doc_id)-derived verdict: nested in
    the weight, stable under corpus growth, zero shuffle."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    ).withColumn(
        "__w", F.least(F.lit(1.0), F.col("n_chars").cast("double") / 2000)
    )
    out = SA.weighted_sample(docs, "__w", "doc_id")
    return out.select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("n_chars"),
        "hash_ppm", "rate_ppm",
    )


@register(
    "balanced_sample_docs",
    # Rates are exact integers computed in SQL (min_count*1e6 // count);
    # the keep rule is stratified_sample's null-propagating || hash. The
    # class is a derived 60/30/10 split (the raw sources are perfectly
    # uniform on this corpus — balancing would be a no-op).
    oracle=f"""
    WITH base AS (SELECT doc_id,
                         CASE WHEN doc_id % 10 < 6 THEN 'major'
                              WHEN doc_id % 10 < 9 THEN 'mid'
                              ELSE 'minor' END AS klass
                  FROM documents WHERE doc_id IS NOT NULL),
    cnt AS (SELECT klass AS st, count(*) AS n FROM base GROUP BY klass),
    mn AS (SELECT min(n) AS m FROM cnt),
    rates AS (SELECT st, m * 1000000 // n AS rate_ppm
              FROM cnt CROSS JOIN mn)
    SELECT b.doc_id, b.klass,
           {_sql_hash64("b.klass || ':' || CAST(b.doc_id AS VARCHAR)")}
               % 1000000 AS hash_ppm,
           CAST(r.rate_ppm AS BIGINT) AS rate_ppm
    FROM base b JOIN rates r ON r.st = b.klass
    WHERE {_sql_hash64("b.klass || ':' || CAST(b.doc_id AS VARCHAR)")}
              % 1000000 < r.rate_ppm
    """,
)
def q_balanced_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced corpus downsampling (ops.sampling.balanced_sample):
    a derived 60/30/10 class split Bernoulli-thinned to the smallest
    class's expected size with exact in-plan integer rates (no driver
    collect, no float rounding) and the reproducible md5 keep rule. One
    counts aggregate broadcast back; the corpus never reshuffles."""
    from timeseriesfuser_spark.ops.sampling import balanced_sample

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 10 < 6, "major")
        .when(F.col("doc_id") % 10 < 9, "mid")
        .otherwise("minor")
        .alias("klass"),
    )
    out = balanced_sample(docs, strata_col="klass", id_col="doc_id")
    return out.select("doc_id", "klass", "hash_ppm", "rate_ppm")
