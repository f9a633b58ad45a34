"""Round-16 registry additions: TPC-DS Q88-shape plan quality and the
shared-edges graph profile."""

from pyspark.sql import Row, functions as F


def test_q88_single_scan(spark):
    """The Q88 collapse's whole point: eight band counts must read the
    input ONCE (the real TPC-DS query runs eight self-joined scalar
    subqueries = eight scans)."""
    from timeseriesfuser_spark.contract.tpcds import q_tpcds_q88_hour_bands

    plan = q_tpcds_q88_hour_bands(
        spark, "/root/testdata/sf0.001"
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan


def test_q88_band_values(spark):
    from timeseriesfuser_spark.contract.tpcds import q_tpcds_q88_hour_bands

    row = q_tpcds_q88_hour_bands(spark, "/root/testdata/sf0.001").collect()[0]
    # all 8 bands present, integer, non-negative; corpus spans years so
    # every hour band is populated
    vals = [row[f"h{h}"] for h in range(8, 16)]
    assert all(isinstance(v, int) and v > 0 for v in vals)


def test_graph_profile_small_graph(spark):
    """Hand-checkable graph: orders {1:(a,b,c), 2:(b,c,d)} → edges
    {ab,ac,bc,bd,cd}, degrees a2 b3 c3 d2, ONE triangle (abc — bcd
    needs bd∧cd∧bc: present! → 2 triangles: abc, bcd)."""
    from timeseriesfuser_spark.ops.graph import build_edges, triangle_counts

    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "c"), (2, "b"), (2, "c"), (2, "d")],
        "g bigint, i string",
    )
    edges = build_edges(df, group_col="g", item_col="i", cache=False)
    got = sorted(map(tuple, edges.collect()))
    assert got == [("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d")]
    tri_sum = (
        triangle_counts(edges, cache=False)
        .agg(F.sum("n_triangles")).collect()[0][0]
    )
    assert tri_sum == 6  # 2 triangles × 3 nodes


def test_graph_profile_contract_consistency(spark):
    """The profile row agrees with the standalone family queries on the
    same sf0.001 corpus."""
    from timeseriesfuser_spark.contract.graph import (
        q_copurchase_graph_profile,
        q_copurchase_triangles,
    )
    from timeseriesfuser_spark.ops.util import cache_scope

    sf = "/root/testdata/sf0.001"
    with cache_scope():
        prof = q_copurchase_graph_profile(spark, sf).collect()[0]
        tri_sum = (
            q_copurchase_triangles(spark, sf)
            .agg(F.sum("n_triangles")).collect()[0][0]
        )
    assert prof["total_triangles"] == tri_sum // 3
    assert prof["n_nodes"] > 0 and prof["n_edges"] > 0
    assert prof["max_degree"] >= 1


def test_band_keys_sql_bit_identical_to_column_build(spark):
    """The SQL-string band-key expression (one py4j round-trip) must be
    bit-identical to the original Column-API composition (kept here as
    the reference: _double_hash_structs/_minhash_col)."""
    from timeseriesfuser_spark.ops.dedup import (
        _band_keys_col,
        _double_hash_structs,
        _minhash_col,
        shingle_array,
    )

    nh, nb = 32, 8
    r = nh // nb

    def column_build(shs_col):
        def keys(hs):
            return F.array(
                *[
                    F.md5(
                        F.concat_ws(
                            ",", *[_minhash_col(hs, b * r + j) for j in range(r)]
                        )
                    )
                    for b in range(nb)
                ]
            )

        return F.element_at(
            F.transform(F.array(_double_hash_structs(shs_col)), keys), 1
        )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = docs.select(
        F.col("doc_id").alias("id"), shingle_array("text", 3).alias("shs")
    ).filter(F.size("shs") > 0)
    old = {r_["id"]: r_["k"] for r_ in base.select(
        "id", column_build(F.col("shs")).alias("k")).collect()}
    new = {r_["id"]: r_["k"] for r_ in base.select(
        "id", _band_keys_col("shs", nh, nb).alias("k")).collect()}
    assert old == new and len(old) > 100


def test_simhash_vote_sql_bit_identical_to_column_build(spark):
    """Same pin for the simhash per-row vote path: the op's SQL-string
    signature equals the original Column build."""
    from timeseriesfuser_spark.ops.dedup import token_hashes

    bits = 48
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    def sig_struct(hs):
        cnt = F.size(hs)
        out = F.lit(0).cast("long")
        for i in range(bits):
            s_i = F.aggregate(
                hs, F.lit(0).cast("long"),
                lambda acc, h: acc + F.shiftright(h, i).bitwiseAND(F.lit(1)),
            )
            out = out + F.when(2 * s_i > cnt, F.lit(1 << i)).otherwise(F.lit(0))
        return F.struct(out.alias("sh"), cnt.alias("nt"))

    ref = {
        r_["id"]: r_["__sc"]["sh"]
        for r_ in docs.select(
            F.col("doc_id").alias("id"),
            F.element_at(
                F.transform(F.array(token_hashes("text")), sig_struct), 1
            ).alias("__sc"),
        ).collect()
    }
    # End-to-end pair output is covered by test_entry_oracle; this pins
    # the LAYOUT premise by rebuilding the op's exact SQL text (kept in
    # sync with simhash_pairs' inline builder) against the Column ref:
    from timeseriesfuser_spark.ops import text as _text

    word_re = _text.WORD_RE.replace("'", "''")
    hs_sql = (
        "transform(array_distinct(regexp_extract_all("
        "lower(`text`), '" + word_re + "', 0)), "
        "t -> CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT))"
    )
    vote_sql = " + ".join(
        f"(CASE WHEN 2 * aggregate(x, 0L, (acc, h) -> "
        f"acc + (shiftright(h, {i}) & 1)) > size(x) "
        f"THEN {1 << i}L ELSE 0L END)"
        for i in range(bits)
    )
    sig_sql = (
        f"element_at(transform(array({hs_sql}), x -> named_struct("
        f"'sh', CAST({vote_sql} AS BIGINT), 'nt', size(x))), 1)"
    )
    got = {
        r_["id"]: r_["__sc"]["sh"]
        for r_ in docs.select(
            F.col("doc_id").alias("id"), F.expr(sig_sql).alias("__sc")
        ).collect()
    }
    assert ref == got and len(ref) > 100
