"""Graph & entity resolution: fuzzy matching, canonical ids, PageRank.

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



_FUZZY_SQL = """
    WITH p AS (SELECT p_partkey, p_name, p_brand, p_type FROM part)
    SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
           a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS distance
    FROM p a JOIN p b
      ON a.p_brand = b.p_brand AND a.p_type = b.p_type
     AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 2
"""


@register("fuzzy_part_matches", oracle=_FUZZY_SQL)
def q_fuzzy_part_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy entity matching (ops.entity.fuzzy_match_pairs): parts
    sharing (brand, type) whose names are <=2 Levenshtein edits apart.
    One equi-join shuffle on the blocking key; the length-difference lower
    bound prunes before the edit-distance kernel runs."""
    from timeseriesfuser_spark.ops.entity import fuzzy_match_pairs

    return fuzzy_match_pairs(
        _t(spark, sf_dir, "part"),
        id_col="p_partkey",
        name_col="p_name",
        block_cols=("p_brand", "p_type"),
        max_distance=2,
    )


@register(
    "part_canonical_ids",
    oracle=f"""
    WITH RECURSIVE pr AS ({_FUZZY_SQL}),
    edges AS (
        SELECT id_a AS u, id_b AS v FROM pr
        UNION ALL
        SELECT id_b, id_a FROM pr
    ),
    reach(id, r) AS (
        SELECT p_partkey, p_partkey FROM part
        UNION
        SELECT e.v, reach.r FROM edges e JOIN reach ON reach.id = e.u
    )
    SELECT CAST(id AS BIGINT) AS id, CAST(min(r) AS BIGINT) AS canonical_id
    FROM reach GROUP BY id
    """,
)
def q_part_canonical_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end-to-end (ops.entity.canonical_entities): fuzzy
    match pairs -> connected components (edge-subgraph min-label
    propagation) -> every part mapped to its group's canonical (minimum)
    id; unmatched parts map to themselves."""
    from timeseriesfuser_spark.ops.entity import canonical_entities, fuzzy_match_pairs

    part = _t(spark, sf_dir, "part")
    pairs = fuzzy_match_pairs(
        part,
        id_col="p_partkey",
        name_col="p_name",
        block_cols=("p_brand", "p_type"),
        max_distance=2,
    )
    return canonical_entities(pairs, part, id_col="p_partkey")


def _pagerank_oracle() -> str:
    from timeseriesfuser_spark.ops.graph import pagerank_oracle_sql

    inner = pagerank_oracle_sql(
        _minhash_sql(),
        "SELECT doc_id AS id FROM documents",
        iterations=3,
        damping_ppm=850_000,
    )
    return f"SELECT id AS doc_id, rank FROM ({inner})"


@register("doc_pagerank", oracle=_pagerank_oracle())
def q_doc_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer fixed-point PageRank (ops.graph.pagerank) over the
    symmetrized MinHash-LSH near-dup graph: 3 damped iterations, ppm
    arithmetic (integer DIV only) so the ranks are engine-reproducible.
    Per iteration one edge-equi-join + one dst hash-agg — the canonical
    distributed PageRank shape; lineage cut per round. Docs central to
    big near-dup families score high (canonical-pick heuristic)."""
    from timeseriesfuser_spark.ops.graph import pagerank

    docs = _t(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs, num_hashes=_NH, bands=_NB, threshold=_MT)
    ranks = pagerank(
        pairs,
        directed=False,
        iterations=3,
        damping_ppm=850_000,
        all_ids=docs.select("doc_id"),
    )
    return ranks.select(F.col("id").alias("doc_id"), "rank")


@register(
    "copurchase_triangles",
    oracle="""
    WITH op AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
    ),
    e AS (
        SELECT DISTINCT a.p AS u, b.p AS v
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
    ),
    deg AS (
        SELECT n, count(*) AS d
        FROM (SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e)
        GROUP BY n
    ),
    o AS (
        SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v)
                    THEN e.u ELSE e.v END AS a,
               CASE WHEN (du.d, e.u) < (dv.d, e.v)
                    THEN e.v ELSE e.u END AS b
        FROM e
        JOIN deg du ON du.n = e.u
        JOIN deg dv ON dv.n = e.v
    ),
    w AS (SELECT e1.a, e1.b, e2.b AS c
          FROM o e1 JOIN o e2 ON e1.b = e2.a),
    tri AS (SELECT w.a, w.b, w.c
            FROM w JOIN o ON o.a = w.a AND o.b = w.c),
    nodes AS (SELECT unnest([a, b, c]) AS id FROM tri)
    SELECT id, CAST(count(*) AS BIGINT) AS n_triangles
    FROM nodes GROUP BY id
    """,
)
def q_copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle participation per part over the co-purchase graph
    (ops.graph.triangle_counts): parts are linked when they share an
    order; triangles are counted exactly once via degree-ordered
    orientation (Suri–Vassilvitskii — out-degree bounded O(√E), the
    scheme that keeps the wedge join hub-safe at 100 TB). All counts
    BIGINT, no float surface."""
    from timeseriesfuser_spark.ops.graph import build_edges, triangle_counts

    li = _t(spark, sf_dir, "lineitem")
    # cache=False: the driver runs each query standalone — the lazy plan
    # is identical to the pre-r10 inline build. Multi-op pipelines share
    # one materialized build via build_edges(cache=True).
    return triangle_counts(build_edges(li, cache=False))


def _reach_oracle() -> str:
    from timeseriesfuser_spark.ops.graph import shortest_hops_oracle_sql

    op = (
        "SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem "
        "WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL"
    )
    inner = shortest_hops_oracle_sql(
        f"WITH op AS ({op}) SELECT DISTINCT a.p AS id_a, b.p AS id_b "
        f"FROM op a JOIN op b ON a.o = b.o AND a.p < b.p",
        f"WITH op AS ({op}) SELECT p FROM (SELECT DISTINCT p FROM op) "
        f"ORDER BY p LIMIT 3",
        directed=False,
        max_hops=2,
    )
    return (
        f"SELECT CAST(id AS BIGINT) AS part_id, hops FROM ({inner})"
    )


@register("copurchase_reach_2hop", oracle=_reach_oracle())
def q_copurchase_reach_2hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS (ops.graph.shortest_hops): exact shortest hop
    distance from the 3 smallest part ids over the co-purchase graph,
    bounded at 2 hops — the recommendation-radius / blast-radius shape
    (recursive CTE in ANSI SQL; level-synchronous frontier joins with
    per-level lineage cuts on Spark). The DuckDB oracle is a genuine
    WITH RECURSIVE — the first in the registry."""
    from timeseriesfuser_spark.ops.graph import build_edges, shortest_hops

    li = _t(spark, sf_dir, "lineitem")
    op = li.filter(
        F.col("l_orderkey").isNotNull() & F.col("l_partkey").isNotNull()
    ).select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    edges = build_edges(li, cache=False)
    seeds = op.select("p").distinct().orderBy("p").limit(3)
    reach = shortest_hops(edges, seeds, directed=False, max_hops=2)
    return reach.select(F.col("id").cast("long").alias("part_id"), "hops")


_KC_K, _KC_ROUNDS = 4, 3


def _kcore_oracle() -> str:
    """Unrolled k-core peeling rounds (the pagerank fixed-iteration CTE
    convention): s0 = symmetrized distinct co-purchase edges; each round
    keeps edges whose BOTH endpoints have current degree >= k. Early
    exit in the op is result-identical (a fixpoint round is identity)."""
    parts = [
        """op AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
    und AS (
        SELECT DISTINCT a.p AS u, b.p AS v
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
    s0 AS (SELECT u AS src, v AS dst FROM und
           UNION SELECT v AS src, u AS dst FROM und)"""
    ]
    for r in range(1, _KC_ROUNDS + 1):
        prev = f"s{r - 1}"
        parts.append(
            f"k{r} AS (SELECT src AS n FROM (SELECT src, count(*) AS c"
            f" FROM {prev} GROUP BY src) WHERE c >= {_KC_K})"
        )
        parts.append(
            f"s{r} AS (SELECT s.src, s.dst FROM {prev} s"
            f" JOIN k{r} a ON s.src = a.n JOIN k{r} b ON s.dst = b.n)"
        )
    final = (
        f"SELECT src AS id, CAST(count(*) AS BIGINT) AS degree"
        f" FROM s{_KC_ROUNDS} GROUP BY src"
    )
    return "WITH " + ",\n    ".join(parts) + "\n    " + final


@register("copurchase_kcore", oracle=_kcore_oracle())
def q_copurchase_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-round k-core of the co-purchase graph
    (ops.graph.kcore_peel, k=4, 3 rounds): the dense-substructure
    extractor — per round one degree hash-agg + two semi joins with a
    lineage cut, early-exiting at the fixpoint (result-identical).
    All-BIGINT output; oracle unrolls the same rounds."""
    from timeseriesfuser_spark.ops.graph import build_edges, kcore_peel

    li = _t(spark, sf_dir, "lineitem")
    return kcore_peel(build_edges(li, cache=False), _KC_K, rounds=_KC_ROUNDS)


_LP_MINSUP, _LP_MINCN, _LP_TOPN = 2, 2, 5


@register(
    "copurchase_link_predict",
    oracle=f"""
    WITH op AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
    e AS (
        SELECT a.p AS a, b.p AS b
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2 HAVING count(*) >= {_LP_MINSUP}),
    adj AS (SELECT a AS n, b AS v FROM e
            UNION ALL SELECT b AS n, a AS v FROM e),
    deg AS (SELECT n, count(*) AS c FROM adj GROUP BY n),
    cn AS (
        SELECT w1.v AS x, w2.v AS y, count(*) AS common
        FROM adj w1 JOIN adj w2 ON w1.n = w2.n AND w1.v < w2.v
        GROUP BY 1, 2 HAVING count(*) >= {_LP_MINCN}),
    cand AS (
        SELECT cn.x, cn.y, cn.common FROM cn
        LEFT JOIN e ON cn.x = e.a AND cn.y = e.b
        WHERE e.a IS NULL),
    sc AS (
        SELECT x, y, common, da.c AS deg_a, db.c AS deg_b,
               common * 1000000 // (da.c + db.c - common) AS j,
               row_number() OVER (PARTITION BY x
                                  ORDER BY common DESC, y) AS rk
        FROM cand JOIN deg da ON da.n = x JOIN deg db ON db.n = y)
    SELECT CAST(x AS BIGINT) AS node_a, CAST(y AS BIGINT) AS node_b,
           CAST(common AS BIGINT) AS common,
           CAST(deg_a AS BIGINT) AS deg_a, CAST(deg_b AS BIGINT) AS deg_b,
           CAST(j AS BIGINT) AS jaccard_ppm
    FROM sc WHERE rk <= {_LP_TOPN}
    """,
)
def q_copurchase_link_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor/Jaccard link prediction on the (minsup ≥ 2)
    co-purchase part graph (ops.graph.link_predict_cn): non-adjacent
    part pairs sharing ≥ 2 co-purchase neighbors, top 5 predictions per
    part — the recommender primitive. Wedge-join candidate generation
    (Σ deg(n)², never |V|²), exact-integer Jaccard ppm."""
    from timeseriesfuser_spark.ops.graph import link_predict_cn

    li = _t(spark, sf_dir, "lineitem")
    op = li.filter(
        F.col("l_orderkey").isNotNull() & F.col("l_partkey").isNotNull()
    ).select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    edges = (
        op.alias("a")
        .join(op.alias("b"),
              (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("id_a"), F.col("b.p").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= _LP_MINSUP)
        .select("id_a", "id_b")
    )
    return link_predict_cn(
        edges, src_col="id_a", dst_col="id_b",
        min_common=_LP_MINCN, top_n=_LP_TOPN,
    ).select(
        F.col("node_a").cast("long").alias("node_a"),
        F.col("node_b").cast("long").alias("node_b"),
        "common", "deg_a", "deg_b", "jaccard_ppm",
    )


_HITS_EDGES = """
    SELECT DISTINCT o.o_custkey AS src, l.l_partkey AS dst
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_custkey IS NOT NULL AND l.l_partkey IS NOT NULL
"""

from timeseriesfuser_spark.ops.graph import hits_oracle_sql as _hits_oracle_sql


@register("purchase_hits", oracle=_hits_oracle_sql(_HITS_EDGES, iterations=2))
def q_purchase_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer fixed-point HITS (ops.graph.hits_scores) over the
    customer→part purchase bipartite graph: 2 mutual hub/authority
    updates with ppm max-normalization — broad buyers are hubs, parts
    bought by broad buyers are authorities. All-integer arithmetic (the
    pagerank contract), so the unrolled CTE oracle matches bit for bit;
    per half-iteration one edge join + one hash-agg."""
    from timeseriesfuser_spark.ops.graph import hits_scores

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, li["l_orderkey"] == orders["o_orderkey"])
        .filter(
            F.col("o_custkey").isNotNull() & F.col("l_partkey").isNotNull()
        )
        .select(
            F.col("o_custkey").alias("src"), F.col("l_partkey").alias("dst")
        )
        .distinct()
    )
    return hits_scores(edges, src_col="src", dst_col="dst", iterations=2)


@register(
    "copurchase_clustering",
    # Same degree-ordered-orientation triangle CTEs as
    # copurchase_triangles, extended with the degree relation and the
    # exact cc_ppm = 2·tri·1e6 // (d·(d−1)) division.
    oracle="""
    WITH op AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
    ),
    e AS (
        SELECT DISTINCT a.p AS u, b.p AS v
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
    ),
    deg AS (
        SELECT n, count(*) AS d
        FROM (SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e)
        GROUP BY n
    ),
    o AS (
        SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v)
                    THEN e.u ELSE e.v END AS a,
               CASE WHEN (du.d, e.u) < (dv.d, e.v)
                    THEN e.v ELSE e.u END AS b
        FROM e
        JOIN deg du ON du.n = e.u
        JOIN deg dv ON dv.n = e.v
    ),
    w AS (SELECT e1.a, e1.b, e2.b AS c
          FROM o e1 JOIN o e2 ON e1.b = e2.a),
    tri AS (SELECT w.a, w.b, w.c
            FROM w JOIN o ON o.a = w.a AND o.b = w.c),
    tcnt AS (SELECT id, count(*) AS nt
             FROM (SELECT unnest([a, b, c]) AS id FROM tri) GROUP BY id)
    SELECT deg.n AS id,
           CAST(d AS BIGINT) AS degree,
           CAST(COALESCE(nt, 0) AS BIGINT) AS n_triangles,
           CAST(CASE WHEN d >= 2
                     THEN 2 * COALESCE(nt, 0) * 1000000 // (d * (d - 1))
                     ELSE 0 END AS BIGINT) AS cc_ppm
    FROM deg LEFT JOIN tcnt ON tcnt.id = deg.n
    """,
)
def q_copurchase_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per part over the co-purchase graph
    (ops.graph.clustering_coefficients): exact ppm neighborhood density
    — separates parts inside tight co-purchase cliques from hubs that
    merely bridge unrelated baskets. Triangle counts via the hub-safe
    degree-ordered orientation; one extra degree aggregation."""
    from timeseriesfuser_spark.ops.graph import build_edges, clustering_coefficients

    li = _t(spark, sf_dir, "lineitem")
    return clustering_coefficients(build_edges(li, cache=False))


@register(
    "copurchase_assortativity",
    # Newman assortativity: Pearson of endpoint degrees over BOTH
    # orientations of every canonical edge; exact HUGEINT sums, one
    # double chain.
    oracle="""
    WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                FROM lineitem
                WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
    e AS (SELECT DISTINCT a.p AS u, b.p AS v
          FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
    deg AS (SELECT n, count(*) AS d
            FROM (SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e)
            GROUP BY n),
    orient AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
    paired AS (SELECT du.d AS dx, dv.d AS dy
               FROM orient
               JOIN deg du ON du.n = orient.u
               JOIN deg dv ON dv.n = orient.v),
    agg AS (SELECT count(*) AS m,
                   sum(CAST(dx AS HUGEINT)) AS sx,
                   sum(CAST(dy AS HUGEINT)) AS sy,
                   sum(CAST(dx AS HUGEINT) * dy) AS sxy,
                   sum(CAST(dx AS HUGEINT) * dx) AS sxx,
                   sum(CAST(dy AS HUGEINT) * dy) AS syy
            FROM paired)
    SELECT CAST(m // 2 AS BIGINT) AS n_edges,
           CASE WHEN m >= 2 AND m * sxx - sx * sx > 0
                     AND m * syy - sy * sy > 0
                THEN round(CAST(m * sxy - sx * sy AS DOUBLE)
                           / (sqrt(CAST(m * sxx - sx * sx AS DOUBLE))
                              * sqrt(CAST(m * syy - sy * sy AS DOUBLE))), 6)
           END AS rho
    FROM agg
    """,
)
def q_copurchase_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the co-purchase graph
    (ops.graph.degree_assortativity): do high-degree parts co-purchase
    with other hubs or with leaves? Exact integer degree sums over both
    edge orientations, one double chain — the one-number topology
    fingerprint beside clustering coefficients."""
    from timeseriesfuser_spark.ops.graph import build_edges, degree_assortativity

    li = _t(spark, sf_dir, "lineitem")
    return degree_assortativity(build_edges(li, cache=False))


@register(
    "copurchase_graph_profile",
    # One-row topology fingerprint off the SHARED edge relation
    # (ops.graph.build_edges): node/edge counts, exact triangle total
    # (per-node participation sum DIV 3 — each triangle touches 3
    # nodes), max degree. The oracle re-derives the same degree-ordered
    # triangle orientation as the copurchase_triangles oracle.
    oracle="""
    WITH op AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
    ),
    e AS (
        SELECT DISTINCT a.p AS u, b.p AS v
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
    ),
    deg AS (
        SELECT n, count(*) AS d
        FROM (SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e)
        GROUP BY n
    ),
    o AS (
        SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v)
                    THEN e.u ELSE e.v END AS a,
               CASE WHEN (du.d, e.u) < (dv.d, e.v)
                    THEN e.v ELSE e.u END AS b
        FROM e
        JOIN deg du ON du.n = e.u
        JOIN deg dv ON dv.n = e.v
    ),
    w AS (SELECT e1.a, e1.b, e2.b AS c
          FROM o e1 JOIN o e2 ON e1.b = e2.a),
    tri AS (SELECT w.a, w.b, w.c
            FROM w JOIN o ON o.a = w.a AND o.b = w.c)
    SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT count(*) FROM tri) AS BIGINT) AS total_triangles,
           CAST((SELECT max(d) FROM deg) AS BIGINT) AS max_degree
    """,
)
def q_copurchase_graph_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph profile off ONE shared edge build (ops.graph.build_edges,
    cache=True — the r10 shared-relation path, driver-certified): the
    persisted co-purchase edge list feeds three consumers (edge count,
    degree profile, triangle counter) without re-deriving the
    two-distinct build per branch — the pattern the 10M-row SCALE cells
    measure (build 8.4 s once vs per-op rebuilds)."""
    from timeseriesfuser_spark.ops.graph import build_edges, triangle_counts

    li = _t(spark, sf_dir, "lineitem")
    edges = build_edges(li)  # persisted + materialized: 3 consumers below
    n_edges = edges.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    deg = (
        edges.select(F.col("id_a").alias("n"))
        .unionByName(edges.select(F.col("id_b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    nodes = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.max("d").cast("long").alias("max_degree"),
    )
    tri = triangle_counts(edges).agg(
        F.expr("sum(n_triangles) DIV 3").cast("long").alias("total_triangles")
    )
    return (
        nodes.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(tri))
        .select("n_nodes", "n_edges", "total_triangles", "max_degree")
    )
