"""Similarity search over embedding columns (``array<float>``).

Two paths:

- :func:`cosine_topk` — brute-force exact top-k: broadcast the (small)
  query set against the corpus; per-pair cosine via JVM higher-order
  functions (``zip_with`` + ``aggregate``), rank with a per-query window.
  O(|queries|·|corpus|) — the correctness baseline and fine whenever the
  query side broadcasts.
- :func:`ivf_cosine_topk` — the scale path: IVF-style partitioning. Vectors
  are assigned to their nearest centroid (inverted lists); a query probes
  only its ``nprobe`` nearest lists. Corpus-side work drops by
  ~nprobe/n_centroids; recall is approximate.

Determinism contract (what makes a SQL oracle byte-exact): embeddings are
quantized to integers (``round(x*scale)``), so dot products and norms are
*integer* sums — order-independent and engine-independent. The final
``dot/(sqrt(na)*sqrt(nb))`` is a fixed sequence of correctly-rounded IEEE
ops on exact integers, hence bit-identical everywhere. Floating-point
accumulation (whose value depends on reduction order) never occurs.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timeseriesfuser_spark.ops.util import spread_small_input


def quantized(vec: Column, scale: int = 1000) -> Column:
    """array<float> → array<long> via round(x*scale)."""
    return F.transform(vec, lambda x: F.round(x.cast("double") * scale).cast("long"))


def _sq_norm(qvec: Column) -> Column:
    return F.aggregate(qvec, F.lit(0).cast("long"), lambda acc, x: acc + x * x)


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
    round_to: Optional[int] = 6,
) -> DataFrame:
    """Exact top-``k`` neighbors per query vector by quantized cosine.

    Output: (query_id, neighbor_id, cosine, rank). Self-matches (same id)
    excluded. Ties broken by neighbor id — fully deterministic.
    The query side is broadcast: no shuffle of the corpus.
    """
    c = spread_small_input(corpus).select(
        F.col(id_col).alias("neighbor_id"), quantized(F.col(vec_col), scale).alias("__cv")
    ).withColumn("__cn", _sq_norm(F.col("__cv")))
    q = queries.select(
        F.col(id_col).alias("query_id"), quantized(F.col(vec_col), scale).alias("__qv")
    ).withColumn("__qn", _sq_norm(F.col("__qv")))

    dot = _dot(F.col("__qv"), F.col("__cv"))
    cos = F.when(
        (F.col("__qn") > 0) & (F.col("__cn") > 0),
        dot.cast("double") / (F.sqrt(F.col("__qn")) * F.sqrt(F.col("__cn"))),
    ).otherwise(F.lit(0.0))
    if round_to is not None:
        cos = F.round(cos, round_to)

    pairs = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cos)
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _assign_nearest(q: DataFrame, centroids: list) -> DataFrame:
    """Add column ``c``: index of the nearest centroid by cosine (ties →
    lowest index), via a broadcast centroid join + ``min_by``.

    Scales in k×dim: the centroid table is broadcast DATA (one row per
    centroid), not inlined literal expressions — k=256, dim=768 is ~1.5 MB
    broadcast and a plain 256-way nested-loop probe per row, where
    literal-array codegen would generate megabytes of Java source.
    ``q`` must have columns (id, v array<long>, n long).
    """
    spark = q.sparkSession
    cents = spark.createDataFrame(
        [(i, [float(x) for x in c], float(sum(x * x for x in c)))
         for i, c in enumerate(centroids)],
        "c int, __ctv array<double>, __ctn double",
    )
    dot = F.aggregate(
        F.zip_with(F.col("v").cast("array<double>"), F.col("__ctv"),
                   lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = F.when(
        (F.col("n") > 0) & (F.col("__ctn") > 0),
        dot / (F.sqrt(F.col("n").cast("double")) * F.sqrt(F.col("__ctn"))),
    ).otherwise(F.lit(0.0))
    return (
        q.join(F.broadcast(cents))
        .withColumn("__ccos", cos)
        .groupBy("id")
        .agg(
            F.first("v").alias("v"),
            F.first("n").alias("n"),
            # lexicographic min of (-cos, c): highest cosine, ties → lowest
            # centroid index — matches a strict argmax scanned in index order
            F.min_by("c", F.struct((-F.col("__ccos")).alias("nc"),
                                   F.col("c").alias("ci"))).alias("c"),
        )
    )


def kmeans_fit(
    df: DataFrame,
    k: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> list:
    """Deterministic distributed k-means (Lloyd) over quantized vectors.

    - init: the ``k`` lowest-id vectors (reproducible, no RNG);
    - assign: nearest centroid by cosine via a broadcast centroid join
      (:func:`_assign_nearest` — scales to k=256, dim=768 where literal
      centroid expressions would blow up codegen); ties break to the
      lowest index;
    - update: per-cluster element sums via ``posexplode`` → one
      partial-aggregated groupBy per iteration; k×dim sums collected to
      the driver (fixed size, not data-proportional).

    Returns the centroid list for :func:`ivf_cosine_topk`'s ``centroids``
    parameter. Empty clusters keep their previous centroid.
    """
    q = df.select(
        F.col(id_col).alias("id"), quantized(F.col(vec_col), scale).alias("v")
    ).withColumn("n", _sq_norm(F.col("v")))
    init = [
        [float(x) for x in r["v"]]
        for r in q.orderBy("id").limit(k).collect()
    ]
    centroids = init
    dim = len(init[0])
    for _ in range(iters):
        assigned = _assign_nearest(q, centroids)
        # integer element sums (exact, order-independent) + counts
        sums = (
            assigned.select("c", F.posexplode("v").alias("pos", "x"))
            .groupBy("c", "pos")
            .agg(F.sum("x").alias("s"))
        )
        cnts = {r["c"]: r["cnt"] for r in
                assigned.groupBy("c").agg(F.count(F.lit(1)).alias("cnt")).collect()}
        acc = {}
        for r in sums.collect():
            acc.setdefault(r["c"], [0] * dim)[r["pos"]] = r["s"]
        centroids = [
            [acc[i][d] / cnts[i] for d in range(dim)]
            if i in cnts
            else centroids[i]
            for i in range(k)
        ]
    return centroids


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
    centroids: Optional[list] = None,
) -> DataFrame:
    """Approximate top-k: probe only the ``nprobe`` nearest inverted lists.

    ``centroids``: a fitted centroid list (e.g. from :func:`kmeans_fit`).
    When omitted, a deterministic stub (the ``n_centroids`` lowest-id
    vectors) is used so results are reproducible without a training job —
    the plan shape is identical either way.
    """
    if centroids is not None:
        spark = corpus.sparkSession
        cents = spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
            "centroid_id int, __ctv array<double>",
        ).withColumn(
            "__ctn",
            F.aggregate(F.col("__ctv"), F.lit(0.0), lambda a, x: a + x * x),
        )
    else:
        cents = (
            corpus.orderBy(F.col(id_col))
            .limit(n_centroids)
            .select(
                F.col(id_col).alias("centroid_id"),
                quantized(F.col(vec_col), scale).alias("__ctv"),
            )
            .withColumn("__ctn", _sq_norm(F.col("__ctv")))
        )

    def nearest(df: DataFrame, idname: str, vecname: str, keep: int) -> DataFrame:
        if centroids is not None:
            # double centroids: float dot (exact — quantized products stay
            # far below 2^53)
            dot = F.aggregate(
                F.zip_with(
                    F.col(vecname).cast("array<double>"),
                    F.col("__ctv"),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        else:
            dot = _dot(F.col(vecname), F.col("__ctv")).cast("double")
        cos = F.when(
            (F.col("__ctn") > 0) & (F.col("__n") > 0),
            dot / (F.sqrt(F.col("__n")) * F.sqrt(F.col("__ctn"))),
        ).otherwise(F.lit(0.0))
        w = Window.partitionBy(idname).orderBy(F.desc("__ccos"), F.asc("centroid_id"))
        return (
            df.join(F.broadcast(cents))
            .withColumn("__ccos", cos)
            .withColumn("__crk", F.row_number().over(w))
            .filter(F.col("__crk") <= keep)
            .drop("__ccos", "__crk", "__ctv", "__ctn")
        )

    c = spread_small_input(corpus).select(
        F.col(id_col).alias("neighbor_id"), quantized(F.col(vec_col), scale).alias("__cv")
    ).withColumn("__n", _sq_norm(F.col("__cv")))
    c_assigned = nearest(c, "neighbor_id", "__cv", 1).withColumnRenamed("__n", "__cn")

    q = queries.select(
        F.col(id_col).alias("query_id"), quantized(F.col(vec_col), scale).alias("__qv")
    ).withColumn("__n", _sq_norm(F.col("__qv")))
    q_probed = nearest(q, "query_id", "__qv", nprobe).withColumnRenamed("__n", "__qn")

    dot = _dot(F.col("__qv"), F.col("__cv"))
    cos = F.round(
        F.when(
            (F.col("__qn") > 0) & (F.col("__cn") > 0),
            dot.cast("double") / (F.sqrt(F.col("__qn")) * F.sqrt(F.col("__cn"))),
        ).otherwise(F.lit(0.0)),
        6,
    )
    pairs = (
        c_assigned.join(F.broadcast(q_probed), "centroid_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cos)
        .select("query_id", "neighbor_id", "cosine")
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
