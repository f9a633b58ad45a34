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


def _best_centroid_expr(vec: Column, norm: Column, centroids: list) -> Column:
    """Index of the nearest centroid (max cosine; ties → lowest index) as a
    single JVM expression over literal centroid arrays — no join, no
    shuffle, evaluated inside codegen per row."""
    best_idx = F.lit(0)
    best_cos = F.lit(float("-inf"))
    for i, c in enumerate(centroids):
        carr = F.array(*[F.lit(float(x)) for x in c])
        cn = sum(float(x) * float(x) for x in c)
        dot = F.aggregate(
            F.zip_with(vec.cast("array<double>"), carr, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        cos = F.when(
            (norm > 0) & (F.lit(cn) > 0),
            dot / (F.sqrt(norm.cast("double")) * F.lit(cn**0.5)),
        ).otherwise(F.lit(0.0))
        better = cos > best_cos
        best_idx = F.when(better, F.lit(i)).otherwise(best_idx)
        best_cos = F.when(better, cos).otherwise(best_cos)
    return best_idx


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
    - assign: nearest centroid by cosine via literal-centroid expressions
      (codegen, no shuffle); ties break to the lowest index;
    - update: per-cluster mean — one partial-aggregated groupBy per
      iteration; k x dim doubles collected to the driver (tiny).

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
        assigned = q.withColumn(
            "c", _best_centroid_expr(F.col("v"), F.col("n"), centroids)
        )
        sums = assigned.groupBy("c").agg(
            F.count(F.lit(1)).alias("cnt"),
            *[
                F.sum(F.col("v")[i]).alias(f"s{i}")
                for i in range(dim)
            ],
        )
        got = {r["c"]: r for r in sums.collect()}
        centroids = [
            [got[i][f"s{d}"] / got[i]["cnt"] for d in range(dim)]
            if i in got
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
