"""Embedding similarity family: brute-force and IVF top-k, SRP/JL
projections, SemDeDup, quantization, PQ codes, semantic search, recall.

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


# Quantized embedding (DuckDB twin of ops.similarity.quantized, scale 1000).
_QV = "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"


@register(
    "embedding_clusters",
    oracle=f"""
    WITH q AS (SELECT vec_id, {_QV} AS v FROM embeddings),
    c AS (SELECT vec_id AS cid, v AS cv FROM q WHERE vec_id < 8),
    d AS (
        SELECT q.vec_id, c.cid,
               CAST(list_aggregate(
                   [(q.v[i]-c.cv[i])*(q.v[i]-c.cv[i]) FOR i IN range(1, len(q.v)+1)],
                   'sum') AS BIGINT) AS d2
        FROM q, c
    ),
    m AS (SELECT vec_id, min(d2 * 16 + cid) AS mk FROM d GROUP BY vec_id),
    a AS (SELECT vec_id, CAST(mk % 16 AS BIGINT) AS cluster_id,
                 CAST(mk // 16 AS BIGINT) AS d2 FROM m)
    SELECT cluster_id,
           CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(min(vec_id) AS BIGINT) AS min_vec_id,
           CAST(max(vec_id) AS BIGINT) AS max_vec_id,
           CAST(sum(d2) AS BIGINT) AS sum_d2
    FROM a GROUP BY cluster_id
    """,
)
def q_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact nearest-centroid clustering rollup
    (ops.similarity.assign_to_centroids): the 8 lowest-id vectors act as
    centroids; every vector is assigned by integer squared-L2 on quantized
    embeddings (ties → lowest centroid id), centroids broadcast so the
    corpus never shuffles. Per-cluster size, id range, and exact total
    distortion."""
    emb = _t(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8)
    a = S.assign_to_centroids(emb, cents)
    return a.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.min("id").alias("min_vec_id"),
        F.max("id").alias("max_vec_id"),
        F.sum("d2").alias("sum_d2"),
    )


# --------------------------------------------------------------------------- #
# Similarity search (embeddings)
# --------------------------------------------------------------------------- #

_DOT = "list_aggregate([qa.v[i] * qb.v[i] FOR i IN range(1, len(qa.v) + 1)], 'sum')"
_NORM = "list_aggregate([x * x FOR x IN v], 'sum')"


@register(
    "similarity_topk",
    oracle=f"""
    WITH vecs AS (SELECT vec_id, {_QV} AS v FROM embeddings),
    nv AS (SELECT vec_id, v, {_NORM} AS n FROM vecs),
    q AS (SELECT vec_id AS query_id, v, n FROM nv WHERE vec_id < 10),
    pairs AS (
        SELECT qa.query_id, qb.vec_id AS neighbor_id,
               CASE WHEN qa.n > 0 AND qb.n > 0
                    THEN round(CAST({_DOT} AS DOUBLE) / (sqrt(qa.n) * sqrt(qb.n)), 6)
                    ELSE 0.0 END AS cosine
        FROM q qa JOIN nv qb ON qa.query_id != qb.vec_id
    )
    SELECT query_id, neighbor_id, cosine, rn AS rank
    FROM (
        SELECT query_id, neighbor_id, cosine,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, neighbor_id) AS rn
        FROM pairs
    ) WHERE rn <= 5
    """,
)
def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-k (broadcast query side): the ANN
    correctness baseline. Integer-quantized dot/norms → engine-exact."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    out = S.cosine_topk(emb, queries, k=5, id_col="vec_id", vec_col="embedding")
    return out.withColumn("rank", F.col("rank").cast("long"))


_NC, _NP = 16, 4


def _ivf_oracle_sql(query_pred: str, k: int) -> str:
    """IVF top-k oracle, parametrized by the query-vector predicate and k
    (shared by similarity_ivf and the semantic_search composition so the
    two can't drift)."""
    return f"""
    WITH vecs AS (SELECT vec_id, {_QV} AS v FROM embeddings),
    nv AS (SELECT vec_id, v, {_NORM} AS n FROM vecs),
    cents AS (SELECT vec_id AS centroid_id, v AS cv, n AS cn FROM nv
              ORDER BY vec_id LIMIT {_NC}),
    c_assign AS (
        SELECT vec_id AS neighbor_id, v, n, centroid_id
        FROM (
            SELECT nv.vec_id, nv.v, nv.n, cents.centroid_id,
                   row_number() OVER (
                       PARTITION BY nv.vec_id
                       ORDER BY CASE WHEN cents.cn > 0 AND nv.n > 0
                                     THEN CAST(list_aggregate([nv.v[i] * cents.cv[i] FOR i IN range(1, len(nv.v) + 1)], 'sum') AS DOUBLE)
                                          / (sqrt(nv.n) * sqrt(cents.cn))
                                     ELSE 0.0 END DESC, cents.centroid_id) AS rk
            FROM nv CROSS JOIN cents
        ) WHERE rk <= 1
    ),
    q_probe AS (
        SELECT vec_id AS query_id, v, n, centroid_id
        FROM (
            SELECT nv.vec_id, nv.v, nv.n, cents.centroid_id,
                   row_number() OVER (
                       PARTITION BY nv.vec_id
                       ORDER BY CASE WHEN cents.cn > 0 AND nv.n > 0
                                     THEN CAST(list_aggregate([nv.v[i] * cents.cv[i] FOR i IN range(1, len(nv.v) + 1)], 'sum') AS DOUBLE)
                                          / (sqrt(nv.n) * sqrt(cents.cn))
                                     ELSE 0.0 END DESC, cents.centroid_id) AS rk
            FROM nv CROSS JOIN cents
            WHERE {query_pred}
        ) WHERE rk <= {_NP}
    ),
    pairs AS (
        SELECT DISTINCT qa.query_id, qb.neighbor_id,
               CASE WHEN qa.n > 0 AND qb.n > 0
                    THEN round(CAST(list_aggregate([qa.v[i] * qb.v[i] FOR i IN range(1, len(qa.v) + 1)], 'sum') AS DOUBLE)
                               / (sqrt(qa.n) * sqrt(qb.n)), 6)
                    ELSE 0.0 END AS cosine
        FROM q_probe qa JOIN c_assign qb USING (centroid_id)
        WHERE qa.query_id != qb.neighbor_id
    )
    SELECT query_id, neighbor_id, cosine, rn AS rank
    FROM (
        SELECT query_id, neighbor_id, cosine,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, neighbor_id) AS rn
        FROM pairs
    ) WHERE rn <= {k}
    """


@register("similarity_ivf", oracle=_ivf_oracle_sql("nv.vec_id < 10", 5))
def q_similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-partitioned approximate top-k: probe nprobe nearest inverted
    lists only — the corpus-side work drops by ~nprobe/n_centroids."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    out = S.ivf_cosine_topk(
        emb, queries, k=5, n_centroids=_NC, nprobe=_NP,
        id_col="vec_id", vec_col="embedding",
    )
    return out.withColumn("rank", F.col("rank").cast("long"))


_NDT = 0.25


@register(
    "embedding_neardup",
    oracle=f"""
    WITH vecs AS (SELECT vec_id, label, {_QV} AS v FROM embeddings),
    nv AS (SELECT vec_id, label, v, {_NORM} AS n FROM vecs)
    SELECT qa.vec_id AS id_a, qb.vec_id AS id_b,
           CAST(qa.label AS BIGINT) AS label,
           round(CAST(list_aggregate([qa.v[i] * qb.v[i] FOR i IN range(1, len(qa.v) + 1)], 'sum') AS DOUBLE)
                 / (sqrt(qa.n) * sqrt(qb.n)), 6) AS cosine
    FROM nv qa JOIN nv qb ON qa.label = qb.label AND qa.vec_id < qb.vec_id
    WHERE qa.n > 0 AND qb.n > 0
      AND round(CAST(list_aggregate([qa.v[i] * qb.v[i] FOR i IN range(1, len(qa.v) + 1)], 'sum') AS DOUBLE)
                / (sqrt(qa.n) * sqrt(qb.n)), 6) >= {_NDT}
    """,
)
def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked on `label` (the cluster
    assignment) so the pair space is per-block, not corpus² — via
    ``ops.similarity.blocked_cosine_pairs``.

    ``max_block=None`` here, NOT the ops default: the registered DuckDB
    oracle is exact all-pairs-per-block, and the default-on split guard
    would silently (WARNING log only) drop cross-sub-block pairs on
    exactly the hot-block corpora it targets, breaking oracle parity at
    scale (ADVICE r11). The guard remains the right default for the
    *ops* API — this contract query opts out so "registered exact"
    stays exact against its oracle at every scale factor."""
    from timeseriesfuser_spark.ops.util import spread_small_input

    emb = spread_small_input(_t(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("label").cast("long").alias("label"), "embedding"
    )
    return S.blocked_cosine_pairs(
        emb, block_col="label", threshold=_NDT, max_block=None
    )


_SRP_P = 16


@register(
    "srp_signatures",
    oracle=f"""
    WITH vecs AS (SELECT vec_id, {_QV} AS v FROM embeddings),
    planes AS (
        SELECT CAST(p AS INT) AS p,
               [({_sql_hash64("p || ':' || i")} % 2001) - 1000
                FOR i IN range(0, 64)] AS parr
        FROM range({_SRP_P}) t(p)
    )
    SELECT vecs.vec_id AS id,
           CAST(sum(CASE WHEN list_aggregate(
                       [vecs.v[i] * planes.parr[i] FOR i IN range(1, len(vecs.v) + 1)],
                       'sum') >= 0
                    THEN (CAST(1 AS BIGINT) << planes.p) ELSE 0 END) AS BIGINT) AS sh
    FROM vecs CROSS JOIN planes
    GROUP BY vecs.vec_id
    """,
)
def q_srp_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed-random-projection LSH bit signatures over the embedding
    column (ops.similarity.srp_signatures): the deterministic md5-derived
    hyperplanes make the 16-bit sketch reproducible in ANSI SQL — the
    blocking key for srp_neardup_pairs, the embedding near-dup scale path."""
    return S.srp_signatures(_t(spark, sf_dir, "embeddings"), planes=_SRP_P)


@register(
    "rp_projection",
    # Same md5-derived planes as srp_signatures, but keeping the integer
    # dot products (JL compression) instead of their signs; serialized to
    # a string because the harness canonicalizer can't hash lists.
    oracle=f"""
    WITH vecs AS (SELECT vec_id, {_QV} AS v FROM embeddings),
    planes AS (
        SELECT CAST(p AS INT) AS p,
               [({_sql_hash64("p || ':' || i")} % 2001) - 1000
                FOR i IN range(0, 64)] AS parr
        FROM range(16) t(p)
    ),
    dots AS (
        SELECT vecs.vec_id, planes.p,
               CAST(list_aggregate(
                   [vecs.v[i] * planes.parr[i] FOR i IN range(1, len(vecs.v) + 1)],
                   'sum') AS BIGINT) AS c
        FROM vecs CROSS JOIN planes
    )
    SELECT vec_id, array_to_string(list(c ORDER BY p), ',') AS proj
    FROM dots GROUP BY vec_id
    """,
)
def q_rp_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-projection embedding compression (ops.similarity.rp_project):
    16 integer dot products per vector against the deterministic
    md5-derived hyperplanes — the JL-style coarse representation for
    compressed-space ANN/clustering."""
    out = S.rp_project(_t(spark, sf_dir, "embeddings"), out_dim=16)
    return out.select(
        F.col("id").alias("vec_id"),
        F.concat_ws(",", F.transform("proj", lambda x: x.cast("string"))).alias(
            "proj"
        ),
    )


_SEM_TAU = 0.3


@register(
    "semantic_dedup",
    oracle=f"""
    WITH q AS (SELECT vec_id, {_QV} AS v FROM embeddings),
    nv AS (SELECT vec_id, v, {_NORM} AS n FROM q),
    c AS (SELECT vec_id AS cid, v AS cv FROM q WHERE vec_id < 8),
    d AS (
        SELECT nv.vec_id, c.cid,
               CAST(list_aggregate(
                   [(nv.v[i]-c.cv[i])*(nv.v[i]-c.cv[i]) FOR i IN range(1, len(nv.v)+1)],
                   'sum') AS BIGINT) AS d2
        FROM nv, c
    ),
    m AS (SELECT vec_id, CAST(min(d2 * 16 + cid) % 16 AS BIGINT) AS cl
          FROM d GROUP BY vec_id),
    wv AS (SELECT m.vec_id, m.cl, nv.v, nv.n FROM m JOIN nv USING (vec_id)),
    p AS (
        SELECT qa.cl AS cluster_id, qa.vec_id AS keep_id, qb.vec_id AS drop_id,
               CASE WHEN qa.n > 0 AND qb.n > 0
                    THEN round(CAST({_DOT} AS DOUBLE)
                               / (sqrt(qa.n) * sqrt(qb.n)), 6)
                    ELSE 0.0 END AS cosine
        FROM wv qa JOIN wv qb ON qa.cl = qb.cl AND qa.vec_id < qb.vec_id
    )
    SELECT cluster_id, keep_id, drop_id, cosine FROM p
    WHERE cosine >= {_SEM_TAU}
    """,
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs
    (ops.similarity.semantic_dedup_pairs): exact-integer nearest-centroid
    blocking (8 lowest-id vectors as centroids), then pairwise quantized
    cosine ONLY within each cluster — never corpus^2. Survivor = lower id.

    ``max_block=None`` (not the ops-API "auto" cap): the oracle is exact
    all-pairs-per-cluster, so the hot-block split guard must not engage
    for the registered query (ADVICE r11) — see q_embedding_neardup."""
    emb = _t(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8)
    return S.semantic_dedup_pairs(emb, cents, threshold=_SEM_TAU, max_block=None)


@register(
    "embedding_quantize",
    oracle=f"""
    WITH q AS (SELECT vec_id, {_QV} AS v FROM embeddings),
    w AS (SELECT vec_id, v,
                 list_max(list_transform(v, x -> abs(x))) AS amax FROM q),
    e AS (SELECT vec_id, amax, len(v) AS nd,
                 CASE WHEN amax > 0
                      THEN list_transform(v, x ->
                          CAST(round((CAST(x AS DOUBLE) * 127.0) / amax) AS BIGINT))
                      ELSE list_transform(v, x -> CAST(0 AS BIGINT))
                 END AS q8
          FROM w)
    SELECT vec_id,
           CAST(nd AS BIGINT) AS n_dims,
           CAST(amax AS BIGINT) AS amax_q,
           CAST(list_aggregate(q8, 'sum') AS BIGINT) AS sum_q8,
           CAST(list_aggregate([x*x FOR x IN q8], 'sum') AS BIGINT) AS sum_sq_q8,
           CAST(len(list_filter(q8, x -> abs(x) = 127)) AS BIGINT) AS n_saturated,
           array_to_string(q8, ',') AS q8_csv
    FROM e
    """,
)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization
    (ops.similarity.quantize_int8): the billion-scale ANN storage format.
    Exact-int amax over the scale-quantized vector, one double divide +
    round per element → oracle-exact. Pure projection, zero shuffle."""
    return S.quantize_int8(_t(spark, sf_dir, "embeddings"))


# m=8 x 7-bit codes (pq_k=128): measured recall@5 0.364 vs 0.192 for the
# old (4, 16) grid at the SAME probe budget (NC=16, NP=4, sf0.01, 250
# exact pairs) -- still a 36x compression of the 64-dim float vectors.
# iters stays 2: 5 Lloyd rounds measured no better (training converged).
_PQ_M, _PQ_K, _PQ_DSUB = 8, 128, 8
_PQ_ITERS = 2


def _pq_trained_cb_ctes(iters: int, src: str = "nv") -> str:
    """CTE chain training the per-subspace PQ codebooks with ``iters``
    deterministic integer Lloyd iterations — the SQL twin of
    ops.similarity.pq_train_codebooks, bit-for-bit: init = the k
    lowest-id subvectors (code = id rank), assignment = exact integer
    squared-L2 argmin (ties → lowest code), update = element-wise
    floor(sum / count) in BIGINT (the _fdiv floor idiom with a COLUMN
    divisor — DuckDB BIGINT // truncates toward zero, Python // floors).
    Empty entries keep their previous value. Requires a ``{src}``
    (vec_id, v) CTE in scope; defines ``cb`` (code, sub, csv)."""
    d2 = (
        "CAST(list_aggregate([(e.sv[t] - c.csv[t]) * (e.sv[t] - c.csv[t]) "
        "FOR t IN range(1, len(e.sv) + 1)], 'sum') AS BIGINT)"
    )
    fdiv_sn = "((s - (((s % n) + n) % n)) // n)"
    parts = [
        f"pqseeds AS (SELECT v, row_number() OVER (ORDER BY vec_id) - 1 AS code"
        f" FROM {src} ORDER BY vec_id LIMIT {_PQ_K})",
        f"pqcb0 AS (SELECT code, unnest([struct_pack(sub := j,"
        f" csv := v[j*{_PQ_DSUB}+1:(j+1)*{_PQ_DSUB}])"
        f" FOR j IN range(0, {_PQ_M})], recursive := true) FROM pqseeds)",
        f"pqex AS (SELECT vec_id, unnest([struct_pack(sub := j,"
        f" sv := v[j*{_PQ_DSUB}+1:(j+1)*{_PQ_DSUB}])"
        f" FOR j IN range(0, {_PQ_M})], recursive := true) FROM {src})",
    ]
    for i in range(1, iters + 1):
        prev = f"pqcb{i - 1}"
        parts.append(
            f"pqa{i} AS (SELECT sub, code, sv FROM ("
            f"SELECT e.vec_id, e.sub, e.sv, c.code,"
            f" row_number() OVER (PARTITION BY e.vec_id, e.sub"
            f" ORDER BY {d2}, c.code) AS rn"
            f" FROM pqex e JOIN {prev} c ON e.sub = c.sub) WHERE rn = 1)"
        )
        parts.append(
            f"pqs{i} AS (SELECT sub, code, pos,"
            f" CAST(sum(sv[pos]) AS BIGINT) AS s, count(*) AS n"
            f" FROM pqa{i}, range(1, {_PQ_DSUB} + 1) t(pos)"
            f" GROUP BY sub, code, pos)"
        )
        parts.append(
            f"pqcb{i} AS (SELECT c0.code, c0.sub, coalesce(u.csv, c0.csv) AS csv"
            f" FROM {prev} c0 LEFT JOIN (SELECT sub, code,"
            f" list({fdiv_sn} ORDER BY pos) AS csv"
            f" FROM pqs{i} GROUP BY sub, code) u"
            f" ON u.sub = c0.sub AND u.code = c0.code)"
        )
    parts.append(f"cb AS (SELECT code, sub, csv FROM pqcb{iters})")
    return ",\n    ".join(parts)


@register(
    "pq_codes",
    oracle=f"""
    WITH q AS (SELECT vec_id, {_QV} AS v FROM embeddings),
    {_pq_trained_cb_ctes(_PQ_ITERS, src="q")},
    ex AS (SELECT vec_id,
                  unnest([struct_pack(sub := j,
                                      sv := v[j*{_PQ_DSUB}+1:(j+1)*{_PQ_DSUB}])
                          FOR j IN range(0, {_PQ_M})], recursive := true)
           FROM q),
    d AS (SELECT e.vec_id, e.sub, cb.code,
                 CAST(list_aggregate(
                     [(e.sv[i] - cb.csv[i]) * (e.sv[i] - cb.csv[i])
                      FOR i IN range(1, len(e.sv) + 1)], 'sum') AS BIGINT) AS d2
          FROM ex e JOIN cb ON e.sub = cb.sub),
    best AS (SELECT vec_id, sub, code, d2,
                    row_number() OVER (PARTITION BY vec_id, sub
                                       ORDER BY d2, code) AS rn
             FROM d)
    SELECT vec_id,
           array_to_string(list(CAST(code AS VARCHAR) ORDER BY sub), '-') AS pq,
           CAST(sum(d2) AS BIGINT) AS sq_err
    FROM best WHERE rn = 1 GROUP BY vec_id
    """,
)
def q_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codes (ops.similarity.pq_codes): 64-dim
    vectors → 4 subspaces × 16-entry TRAINED codebooks
    (ops.similarity.pq_train_codebooks — deterministic integer Lloyd,
    2 iterations, oracle-unrolled). The broadcast-codebook
    plan: corpus fans out ×4, probes 16 entries, never shuffles on a
    data key."""
    emb = _t(spark, sf_dir, "embeddings")
    cbs = S.pq_train_codebooks(emb, m=_PQ_M, k=_PQ_K, iters=_PQ_ITERS)
    return S.pq_codes(emb, m=_PQ_M, k=_PQ_K, codebooks=cbs)


@register(
    "semantic_search",
    oracle=f"""
    WITH ann AS ({_ivf_oracle_sql("nv.vec_id < 5", 3)})
    SELECT t.query_id, t.neighbor_id, t.cosine, CAST(t.rank AS BIGINT) AS rank,
           d.lang, d.source,
           CAST(length(d.text) AS BIGINT) AS n_chars
    FROM ann t JOIN documents d ON d.doc_id = t.neighbor_id
    """,
)
def q_semantic_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end retrieval composition on the SCALE path: IVF top-3
    neighbors per query vector (probe nprobe inverted lists — never the
    Q·C brute-force product; recall vs exact is tracked by `ann_recall`),
    then the neighbor ids broadcast-joined back to `documents` for display
    metadata — the RAG serving shape (ANN hit → metadata hydrate). The
    oracle embeds the shared IVF component oracle so the composition
    can't drift from `similarity_ivf`. `similarity_topk` remains the
    labeled exactness baseline."""
    emb = _t(spark, sf_dir, "embeddings")
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id"),
        "lang",
        "source",
        F.length("text").cast("long").alias("n_chars"),
    )
    queries = emb.filter(F.col("vec_id") < 5)
    hits = S.ivf_cosine_topk(
        emb, queries, k=3, n_centroids=_NC, nprobe=_NP,
        id_col="vec_id", vec_col="embedding",
    ).withColumn("rank", F.col("rank").cast("long"))
    return hits.join(docs, hits["neighbor_id"] == docs["doc_id"]).drop("doc_id")


@register(
    "ann_recall",
    # The oracle EMBEDS the exact and IVF oracles as CTEs (the
    # curation_verdicts pattern), so the recall measurement can never
    # drift from the two operators it grades.
    oracle=f"""
    WITH ex AS ({ORACLES["similarity_topk"]}),
    ap AS ({ORACLES["similarity_ivf"]}),
    hits AS (SELECT ex.query_id, count(*) AS c
             FROM ex JOIN ap ON ex.query_id = ap.query_id
                            AND ex.neighbor_id = ap.neighbor_id
             GROUP BY ex.query_id),
    base AS (SELECT query_id, count(*) AS n FROM ex GROUP BY query_id)
    SELECT base.query_id,
           CAST(n AS BIGINT) AS n_exact,
           CAST(coalesce(c, 0) AS BIGINT) AS n_hit,
           CAST(coalesce(c, 0) * 1000000 // n AS BIGINT) AS recall_ppm
    FROM base LEFT JOIN hits USING (query_id)
    """,
)
def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality measurement: per-query recall@5 of the IVF index
    against the exact brute-force top-k — the metric every approximate
    similarity deployment tracks before trusting the fast path. One
    equi-join of two k-bounded relations + two tiny aggs; both inputs
    are the already-registered deterministic operators."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = S.cosine_topk(
        emb, queries, k=5, id_col="vec_id", vec_col="embedding"
    ).select("query_id", "neighbor_id")
    approx = S.ivf_cosine_topk(
        emb, queries, k=5, n_centroids=_NC, nprobe=_NP,
        id_col="vec_id", vec_col="embedding",
    ).select("query_id", "neighbor_id")
    hits = (
        exact.join(approx, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    base = exact.groupBy("query_id").agg(F.count(F.lit(1)).alias("__n"))
    return base.join(hits, "query_id", "left").select(
        "query_id",
        F.col("__n").cast("long").alias("n_exact"),
        F.coalesce("__c", F.lit(0)).cast("long").alias("n_hit"),
        F.expr("coalesce(__c, 0) * 1000000 DIV __n").cast("long").alias(
            "recall_ppm"
        ),
    )


# ---------------------------------------------------------------------------
# round 7: cross-corpus (bitext-style) blocked nearest-neighbor mining
# ---------------------------------------------------------------------------


@register(
    "bitext_mining",
    oracle=f"""
    WITH vecs AS (SELECT e.vec_id, e.label, d.lang, {_QV} AS v
                  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id),
    nv AS (SELECT vec_id, label, lang, v, {_NORM} AS n FROM vecs),
    pairs AS (
        SELECT qa.vec_id AS query_id, qb.vec_id AS match_id,
               CAST(qa.label AS BIGINT) AS block,
               CASE WHEN qa.n > 0 AND qb.n > 0
                    THEN round(CAST({_DOT} AS DOUBLE)
                               / (sqrt(qa.n) * sqrt(qb.n)), 6)
                    ELSE 0.0 END AS cosine
        FROM nv qa JOIN nv qb ON qa.label = qb.label
        WHERE qa.lang = 'de' AND qb.lang = 'en'
    ),
    rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                        ORDER BY cosine DESC, match_id)
                       AS rnk
           FROM pairs)
    SELECT query_id, match_id, block, cosine, CAST(rnk AS BIGINT) AS rank
    FROM rk WHERE rnk <= 1
    """,
)
def q_bitext_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-lingual nearest-neighbor mining (ops.similarity.bitext_mine):
    for each German document, its best English match by embedding cosine,
    candidates blocked on the precomputed cluster label (Σ|A_b|·|B_b|
    pairs, never |A|·|B|) — the bitext/alignment primitive of a
    multilingual curation pipeline."""
    from timeseriesfuser_spark.ops.similarity import bitext_mine

    emb = _t(spark, sf_dir, "embeddings")
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    tagged = emb.join(
        F.broadcast(docs), emb.vec_id == docs.doc_id
    ).select("vec_id", "label", "embedding", "lang")
    de = tagged.filter(F.col("lang") == "de")
    en = tagged.filter(F.col("lang") == "en")
    out = bitext_mine(de, en, k=1)
    return out.withColumn("block", F.col("block").cast("long"))


def _ivf_pq_oracle_sql(query_pred: str, k: int) -> str:
    """IVF-ADC top-k oracle (shared by ivf_pq_search and pq_recall so the
    recall audit can't drift from the index it grades): cosine centroid
    routing (the similarity_ivf CTE shape), integer-argmin PQ codes (the
    pq_codes CTE shape), exact integer ADC table-lookup sums."""
    route = """
        SELECT nv.vec_id, cents.centroid_id,
               row_number() OVER (
                   PARTITION BY nv.vec_id
                   ORDER BY CASE WHEN cents.cn > 0 AND nv.n > 0
                                 THEN CAST(list_aggregate([nv.v[i] * cents.cv[i] FOR i IN range(1, len(nv.v) + 1)], 'sum') AS DOUBLE)
                                      / (sqrt(nv.n) * sqrt(cents.cn))
                                 ELSE 0.0 END DESC, cents.centroid_id) AS rk
        FROM nv CROSS JOIN cents"""
    sub_of = (
        f"unnest([struct_pack(sub := j, sv := v[j*{_PQ_DSUB}+1:(j+1)*{_PQ_DSUB}])"
        f" FOR j IN range(0, {_PQ_M})], recursive := true)"
    )
    return f"""
    WITH vecs AS (SELECT vec_id, {_QV} AS v FROM embeddings),
    nv AS (SELECT vec_id, v, {_NORM} AS n FROM vecs),
    cents AS (SELECT vec_id AS centroid_id, v AS cv, n AS cn FROM nv
              ORDER BY vec_id LIMIT {_NC}),
    c_assign AS (SELECT vec_id AS neighbor_id, centroid_id
                 FROM ({route}) WHERE rk <= 1),
    q_probe AS (SELECT vec_id AS query_id, centroid_id
                FROM ({route} WHERE {query_pred}) WHERE rk <= {_NP}),
    {_pq_trained_cb_ctes(_PQ_ITERS, src="nv")},
    cex AS (SELECT a.neighbor_id, a.centroid_id, {sub_of}
            FROM c_assign a JOIN nv ON nv.vec_id = a.neighbor_id),
    cd AS (SELECT neighbor_id, centroid_id, sub, code,
                  row_number() OVER (PARTITION BY neighbor_id, sub
                                     ORDER BY d2, code) AS rn
           FROM (SELECT e.neighbor_id, e.centroid_id, e.sub, cb.code,
                        CAST(list_aggregate(
                            [(e.sv[i] - cb.csv[i]) * (e.sv[i] - cb.csv[i])
                             FOR i IN range(1, len(e.sv) + 1)], 'sum') AS BIGINT) AS d2
                 FROM cex e JOIN cb ON e.sub = cb.sub)),
    codes AS (SELECT neighbor_id, centroid_id, sub, code FROM cd WHERE rn = 1),
    qex AS (SELECT nv.vec_id AS query_id, {sub_of}
            FROM nv WHERE {query_pred}),
    adc AS (SELECT e.query_id, e.sub, cb.code,
                   CAST(list_aggregate(
                       [(e.sv[i] - cb.csv[i]) * (e.sv[i] - cb.csv[i])
                        FOR i IN range(1, len(e.sv) + 1)], 'sum') AS BIGINT) AS qd2
            FROM qex e JOIN cb ON e.sub = cb.sub),
    cand AS (SELECT p.query_id, c.neighbor_id, c.sub, c.code
             FROM q_probe p JOIN codes c USING (centroid_id)
             WHERE p.query_id != c.neighbor_id),
    s AS (SELECT query_id, neighbor_id, sum(qd2) AS adc_d2
          FROM cand JOIN adc USING (query_id, sub, code)
          GROUP BY query_id, neighbor_id)
    SELECT query_id, neighbor_id, CAST(adc_d2 AS BIGINT) AS adc_d2,
           rn AS rank
    FROM (SELECT query_id, neighbor_id, adc_d2,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY adc_d2, neighbor_id) AS rn
          FROM s)
    WHERE rn <= {k}
    """


@register("ivf_pq_search", oracle=_ivf_pq_oracle_sql("nv.vec_id < 10", 5))
def q_ivf_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-ADC search (ops.similarity.ivf_pq_topk): probe nprobe inverted
    lists, score candidates by exact-integer PQ asymmetric distance (the
    m-term codebook table-lookup sum) — the billion-vector serving shape
    where the corpus is m bytes per vector and never shuffles on a data
    key. Trained sub-codebooks (pq_train_codebooks, 2 integer-Lloyd
    iterations, oracle-unrolled) — measured +35-40% relative recall@5
    over the lowest-id seed stub at the same probe budget."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    cbs = S.pq_train_codebooks(emb, m=_PQ_M, k=_PQ_K, iters=_PQ_ITERS)
    return S.ivf_pq_topk(
        emb, queries, k=5, n_centroids=_NC, nprobe=_NP, m=_PQ_M, pq_k=_PQ_K,
        id_col="vec_id", vec_col="embedding", codebooks=cbs,
    )


@register(
    "pq_recall",
    # Embeds the exact and IVF-ADC oracles as CTEs (the ann_recall
    # pattern) so the audit can't drift from the operators it grades.
    oracle=f"""
    WITH ex AS ({ORACLES["similarity_topk"]}),
    ap AS ({_ivf_pq_oracle_sql("nv.vec_id < 10", 5)}),
    hits AS (SELECT ex.query_id, count(*) AS c
             FROM ex JOIN ap ON ex.query_id = ap.query_id
                            AND ex.neighbor_id = ap.neighbor_id
             GROUP BY ex.query_id),
    base AS (SELECT query_id, count(*) AS n FROM ex GROUP BY query_id)
    SELECT base.query_id,
           CAST(n AS BIGINT) AS n_exact,
           CAST(coalesce(c, 0) AS BIGINT) AS n_hit,
           CAST(coalesce(c, 0) * 1000000 // n AS BIGINT) AS recall_ppm
    FROM base LEFT JOIN hits USING (query_id)
    """,
)
def q_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the IVF-ADC index vs exact brute-force top-k — the
    compression-loss audit PQ deployments run before shipping a codebook
    (ADC distances are approximate even within the probed lists, so this
    is a strictly harder test than ann_recall's IVF-only routing loss)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = S.cosine_topk(
        emb, queries, k=5, id_col="vec_id", vec_col="embedding"
    ).select("query_id", "neighbor_id")
    cbs = S.pq_train_codebooks(emb, m=_PQ_M, k=_PQ_K, iters=_PQ_ITERS)
    approx = S.ivf_pq_topk(
        emb, queries, k=5, n_centroids=_NC, nprobe=_NP, m=_PQ_M, pq_k=_PQ_K,
        id_col="vec_id", vec_col="embedding", codebooks=cbs,
    ).select("query_id", "neighbor_id")
    hits = (
        exact.join(approx, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    base = exact.groupBy("query_id").agg(F.count(F.lit(1)).alias("__n"))
    return base.join(hits, "query_id", "left").select(
        "query_id",
        F.col("__n").cast("long").alias("n_exact"),
        F.coalesce("__c", F.lit(0)).cast("long").alias("n_hit"),
        F.expr("coalesce(__c, 0) * 1000000 DIV __n").cast("long").alias(
            "recall_ppm"
        ),
    )


@register(
    "hybrid_search_rrf",
    # Embeds the exact and IVF-ADC ranking oracles as CTEs (the
    # pq_recall pattern) so the fusion can't drift from the rankers it
    # combines. Scores in exact integer nano-units: 1e9 // (60 + rank),
    # every operand positive so DuckDB // and Spark DIV agree.
    oracle=f"""
    WITH ex AS ({{SIM_TOPK}}),
    ap AS ({_ivf_pq_oracle_sql("nv.vec_id < 10", 5)}),
    u AS (SELECT query_id, neighbor_id AS item_id,
                 1000000000 // (60 + CAST(rank AS BIGINT)) AS s FROM ex
          UNION ALL
          SELECT query_id, neighbor_id,
                 1000000000 // (60 + CAST(rank AS BIGINT)) FROM ap),
    agg AS (SELECT query_id, item_id, sum(s) AS rrf_score,
                   count(*) AS n_lists
            FROM u GROUP BY 1, 2)
    SELECT query_id, item_id,
           CAST(rrf_score AS BIGINT) AS rrf_score,
           CAST(n_lists AS BIGINT) AS n_lists,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY rrf_score DESC, item_id)
                AS BIGINT) AS rank
    FROM agg
    """.replace("{SIM_TOPK}", ORACLES["similarity_topk"]),
)
def q_hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two retrieval lists per query
    (ops.similarity.rrf_fuse): exact cosine top-5 + trained IVF-ADC
    top-5, fused by Σ 1e9 DIV (60 + rank) in exact integer nano-units —
    the calibration-free hybrid-search combiner. The fusion unions two
    k-bounded relations and aggregates on (query, item); the corpora
    are never touched again."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = S.cosine_topk(emb, queries, k=5)
    cbs = S.pq_train_codebooks(emb, m=_PQ_M, k=_PQ_K, iters=_PQ_ITERS)
    approx = S.ivf_pq_topk(
        emb, queries, k=5, n_centroids=_NC, nprobe=_NP, m=_PQ_M, pq_k=_PQ_K,
        codebooks=cbs,
    )
    return S.rrf_fuse([exact, approx], k=60)


@register(
    "embedding_sim_histogram",
    # Same quantized dot/norm/round(…,6) chain as similarity_topk (the
    # proven bit-identical float surface); block sampling via the
    # engine-portable md5 hash — pair kept iff both endpoints share one
    # of 8 md5 blocks.
    oracle="""
    WITH vecs AS (SELECT vec_id,
                         list_transform(embedding,
                             x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
                  FROM embeddings),
    nv AS (SELECT vec_id, v,
                  list_aggregate([x * x FOR x IN v], 'sum') AS n,
                  CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))
                       AS BIGINT) % 8 AS bk
           FROM vecs),
    pairs AS (
        SELECT CASE WHEN a.n > 0 AND b.n > 0
                    THEN round(CAST(list_aggregate(
                             [a.v[i] * b.v[i] FOR i IN range(1, len(a.v) + 1)],
                             'sum') AS DOUBLE) / (sqrt(a.n) * sqrt(b.n)), 6)
                    ELSE 0.0 END AS cosine
        FROM nv a JOIN nv b ON a.bk = b.bk AND a.vec_id < b.vec_id),
    c AS (SELECT CAST(floor(cosine * 20) AS BIGINT) AS bin,
                 count(*) AS n_pairs
          FROM pairs GROUP BY 1),
    t AS (SELECT sum(n_pairs) AS tot FROM c)
    SELECT bin, CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(n_pairs * 1000000 // tot AS BIGINT) AS share_ppm
    FROM c CROSS JOIN t
    """,
)
def q_embedding_sim_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-geometry diagnostic (ops.similarity.embedding_sim_histogram):
    histogram of pairwise cosines over a deterministic 1/8 md5-block
    pair sample — the profile that calibrates near-dup thresholds and
    ANN recall targets. Scored volume is n²/blocks, never the full pair
    space; the block count is the scale knob."""
    return S.embedding_sim_histogram(_t(spark, sf_dir, "embeddings"))


def _matryoshka_exact_sql(vexpr: str) -> str:
    return f"""
    WITH vecs AS (SELECT vec_id,
                         list_transform({vexpr},
                             x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
                  FROM embeddings),
    nv AS (SELECT vec_id, v,
                  list_aggregate([x * x FOR x IN v], 'sum') AS n FROM vecs),
    q AS (SELECT vec_id AS query_id, v, n FROM nv WHERE vec_id < 10),
    pairs AS (
        SELECT qa.query_id, qb.vec_id AS neighbor_id,
               CASE WHEN qa.n > 0 AND qb.n > 0
                    THEN round(CAST(list_aggregate(
                        [qa.v[i] * qb.v[i] FOR i IN range(1, len(qa.v) + 1)],
                        'sum') AS DOUBLE) / (sqrt(qa.n) * sqrt(qb.n)), 6)
                    ELSE 0.0 END AS cosine
        FROM q qa JOIN nv qb ON qa.query_id != qb.vec_id)
    SELECT query_id, neighbor_id
    FROM (SELECT query_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, neighbor_id) AS rn
          FROM pairs)
    WHERE rn <= 5
    """


@register(
    "matryoshka_recall",
    # Both rankings embed the exact-topk oracle — full 64-dim vs the
    # first-32-dims truncation (the Matryoshka deployment question:
    # how much recall does halving the vector cost?).
    oracle=f"""
    WITH ex AS ({_matryoshka_exact_sql("embedding")}),
    tr AS ({_matryoshka_exact_sql("embedding[1:32]")}),
    hits AS (SELECT ex.query_id, count(*) AS c
             FROM ex JOIN tr ON tr.query_id = ex.query_id
                            AND tr.neighbor_id = ex.neighbor_id
             GROUP BY ex.query_id),
    base AS (SELECT query_id, count(*) AS n FROM ex GROUP BY query_id)
    SELECT base.query_id,
           CAST(n AS BIGINT) AS n_exact,
           CAST(COALESCE(c, 0) AS BIGINT) AS n_hit,
           CAST(COALESCE(c, 0) * 1000000 // n AS BIGINT) AS recall_ppm
    FROM base LEFT JOIN hits ON hits.query_id = base.query_id
    """,
)
def q_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation audit: per-query recall@5 of exact search
    over the FIRST 32 of 64 embedding dims vs the full-dim exact top-k
    — the measurement behind serving truncated (MRL-style) embeddings
    at half the memory/compute. Two k-bounded rankings, one equi-join;
    the truncation is a zero-copy array slice on both engines."""
    emb = _t(spark, sf_dir, "embeddings")
    trunc = emb.select(
        "vec_id", F.slice("embedding", 1, 32).alias("embedding")
    )
    q_full = emb.filter(F.col("vec_id") < 10)
    q_tr = trunc.filter(F.col("vec_id") < 10)
    exact = S.cosine_topk(emb, q_full, k=5).select("query_id", "neighbor_id")
    tr = S.cosine_topk(trunc, q_tr, k=5).select("query_id", "neighbor_id")
    hits = (
        exact.join(tr, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    base = exact.groupBy("query_id").agg(F.count(F.lit(1)).alias("__n"))
    return base.join(hits, "query_id", "left").select(
        "query_id",
        F.col("__n").cast("long").alias("n_exact"),
        F.coalesce("__c", F.lit(0)).cast("long").alias("n_hit"),
        F.expr("coalesce(__c, 0) * 1000000 DIV __n").cast("long").alias(
            "recall_ppm"
        ),
    )


@register(
    "embedding_drift_halves",
    # cos(mean_a, mean_b) == cos(sum_a, sum_b): no division before the
    # final double chain; per-dimension sums exact in HUGEINT.
    oracle="""
    WITH q AS (SELECT vec_id,
                      list_transform(embedding,
                          x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))
                          AS v
               FROM embeddings WHERE embedding IS NOT NULL),
    ex AS (SELECT vec_id, i, v[i] AS x
           FROM q, unnest(range(1, len(v) + 1)) AS u(i)),
    sa AS (SELECT i, sum(CAST(x AS HUGEINT)) AS s_a FROM ex
           WHERE vec_id % 2 = 0 GROUP BY i),
    sb AS (SELECT i, sum(CAST(x AS HUGEINT)) AS s_b FROM ex
           WHERE vec_id % 2 = 1 GROUP BY i),
    agg AS (SELECT count(*) AS dim,
                   sum(s_a * s_b) AS dot,
                   sum(s_a * s_a) AS na,
                   sum(s_b * s_b) AS nb
            FROM sa JOIN sb USING (i)),
    cnt AS (SELECT count(CASE WHEN vec_id % 2 = 0 THEN 1 END) AS n_a,
                   count(CASE WHEN vec_id % 2 = 1 THEN 1 END) AS n_b
            FROM q)
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(dim AS BIGINT) AS dim,
           CASE WHEN na > 0 AND nb > 0
                THEN round(CAST(dot AS DOUBLE)
                           / (sqrt(CAST(na AS DOUBLE))
                              * sqrt(CAST(nb AS DOUBLE))), 6)
           END AS cosine
    FROM agg CROSS JOIN cnt
    """,
)
def q_embedding_drift_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic drift monitor (ops.similarity.embedding_drift): cosine
    between the mean embeddings of the even- and odd-id corpus halves
    (the old-vs-new-ingest proxy on this table). Per-dimension exact
    integer sums — cos(mean, mean) == cos(sum, sum), so no division
    exists before the single double chain."""
    emb = _t(spark, sf_dir, "embeddings")
    return S.embedding_drift(
        emb.filter(F.col("vec_id") % 2 == 0),
        emb.filter(F.col("vec_id") % 2 == 1),
    )
