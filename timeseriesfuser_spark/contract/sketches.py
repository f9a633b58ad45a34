"""Mergeable sketches over the event stream: Count-Min heavy-hitter
counts and HyperLogLog distinct — fixed-size relations a 100 TB pipeline
keeps instead of exact per-key state.

Split-module addition (round 7); registers into the shared QUERIES /
ORACLES like every family module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timeseriesfuser_spark.contract._base import (  # noqa: F401
    ORACLES,
    QUERIES,
    _events,
    _t,
    register,
)

_CMS_D, _CMS_W = 4, 256
_HLL_P = 8
_HLL_M = 1 << _HLL_P
# alpha computed in PYTHON and inlined as the same literal on both sides:
# DuckDB would evaluate 0.7213/(1.0+1.079/m) in DECIMAL, Spark in DOUBLE.
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)

# 60-bit md5 hash of user_id under integer seed s (the md5_hash64 twin)
def _h(s: str, col: str = "user_id") -> str:
    return (
        "CAST(concat('0x', substr(md5(concat('" + s + "', chr(31), "
        f"CAST({col} AS VARCHAR))), 1, 15)) AS BIGINT)"
    )


@register(
    "cms_user_counts",
    oracle=f"""
    WITH ev AS (SELECT user_id FROM events),
    hh AS (SELECT user_id, d,
                  CAST(concat('0x', substr(md5(concat(CAST(d AS VARCHAR),
                       chr(31), CAST(user_id AS VARCHAR))), 1, 15))
                       AS BIGINT) % {_CMS_W} AS col
           FROM ev CROSS JOIN (SELECT unnest(range({_CMS_D})) AS d)),
    cells AS (SELECT d, col, count(*) AS cnt FROM hh GROUP BY d, col),
    probe AS (SELECT DISTINCT user_id, d, col FROM hh),
    est AS (SELECT user_id, min(cnt) AS cms_n
            FROM probe JOIN cells USING (d, col) GROUP BY user_id),
    exact AS (SELECT user_id, count(*) AS exact_n FROM ev GROUP BY user_id)
    SELECT e.user_id,
           CAST(e.exact_n AS BIGINT) AS exact_n,
           CAST(est.cms_n AS BIGINT) AS cms_n,
           est.cms_n >= e.exact_n AS never_undercounts
    FROM exact e JOIN est USING (user_id)
    """,
)
def q_cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch accuracy audit (ops.sketches.countmin_sketch /
    countmin_estimate): build a {d}x{w} CMS over user activity, point-
    query every user, and emit estimate vs exact — the one-sided error
    guarantee (never undercounts) is part of the checked output. The
    sketch is a fixed {d}x{w} relation: map-side combinable, mergeable
    across shards, broadcastable for probes."""
    from timeseriesfuser_spark.ops.sketches import (
        countmin_estimate,
        countmin_sketch,
    )

    ev = _events(spark, sf_dir).select("user_id")
    sk = countmin_sketch(ev, "user_id", depth=_CMS_D, width=_CMS_W)
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_n"))
    est = countmin_estimate(
        sk, exact.select("user_id"), "user_id", depth=_CMS_D, width=_CMS_W
    ).withColumnRenamed("key", "user_id")
    return exact.join(est, "user_id").select(
        "user_id",
        F.col("exact_n").cast("long").alias("exact_n"),
        F.col("cms_n").cast("long").alias("cms_n"),
        (F.col("cms_n") >= F.col("exact_n")).alias("never_undercounts"),
    )


q_cms_user_counts.__doc__ = q_cms_user_counts.__doc__.replace(
    "{d}", str(_CMS_D)).replace("{w}", str(_CMS_W))


@register(
    "hll_distinct_users",
    oracle=f"""
    WITH ev AS (SELECT user_id FROM events WHERE user_id IS NOT NULL),
    h AS (SELECT {_h('99')} AS hv FROM ev),
    rb AS (SELECT hv % {_HLL_M} AS bucket, hv >> {_HLL_P} AS w FROM h),
    rr AS (SELECT bucket,
                  CASE WHEN w > 0 THEN {60 - _HLL_P} + 1 - length(bin(w))
                       ELSE {60 - _HLL_P + 1} END AS rho
           FROM rb),
    regs AS (SELECT bucket, max(rho) AS register FROM rr GROUP BY bucket),
    agg AS (SELECT count(*) AS n_buckets_hit, max(register) AS max_register
            FROM regs),
    s AS (SELECT a.n_buckets_hit, a.max_register,
                 sum(1::HUGEINT << CAST(a.max_register - r.register AS INT))
                   AS hit_sum
          FROM regs r CROSS JOIN agg a
          GROUP BY a.n_buckets_hit, a.max_register),
    tot AS (SELECT n_buckets_hit, max_register,
                   hit_sum + ({_HLL_M} - n_buckets_hit)::HUGEINT
                             * (1::HUGEINT << CAST(max_register AS INT))
                     AS sum_scaled
            FROM s)
    SELECT CAST(n_buckets_hit AS BIGINT) AS n_buckets_hit,
           CAST(sum_scaled AS DOUBLE) AS sum_scaled,
           CAST(max_register AS BIGINT) AS max_register,
           round(CAST({_HLL_ALPHA!r} AS DOUBLE)
                 * CAST({float(_HLL_M)!r} AS DOUBLE)
                 * CAST({float(_HLL_M)!r} AS DOUBLE)
                 * (CAST(2.0 AS DOUBLE) ** CAST(max_register AS INT))
                 / CAST(sum_scaled AS DOUBLE), 4) AS estimate,
           (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM ev)
             AS exact_distinct
    FROM tot
    """,
)
def q_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog raw-estimate audit (ops.sketches.hll_registers /
    hll_estimate): 2^{p} registers over distinct users, the exact-integer
    scaled harmonic sum (decimal — no float accumulation), the raw
    estimate (IEEE *,/ chain only; ln()-based bias corrections are
    deliberately outside the oracle-checked surface), and the exact
    distinct for comparison. The register relation is the mergeable
    fixed-size state a streaming distinct keeps per window."""
    from timeseriesfuser_spark.ops.sketches import hll_estimate, hll_registers

    ev = _events(spark, sf_dir).filter(F.col("user_id").isNotNull())
    regs = hll_registers(ev.select("user_id"), "user_id", p=_HLL_P)
    est = hll_estimate(regs, p=_HLL_P)
    exact = ev.agg(
        F.countDistinct("user_id").cast("long").alias("exact_distinct")
    )
    return est.crossJoin(F.broadcast(exact)).select(
        "n_buckets_hit",
        F.col("sum_scaled").cast("double").alias("sum_scaled"),
        "max_register",
        "estimate",
        "exact_distinct",
    )


q_hll_distinct_users.__doc__ = q_hll_distinct_users.__doc__.replace(
    "{p}", str(_HLL_P))


@register(
    "histogram_quantiles",
    oracle="""
    WITH h AS (
        SELECT CASE WHEN v < 0.0 THEN CAST(-1 AS BIGINT)
                    WHEN v >= 400.0 THEN CAST(256 AS BIGINT)
                    ELSE least(CAST(floor((v - 0.0) * 256 / 400.0) AS BIGINT),
                               CAST(255 AS BIGINT)) END AS bin,
               CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT CAST(value AS DOUBLE) AS v FROM events
              WHERE value IS NOT NULL)
        GROUP BY 1
    ),
    c AS (
        SELECT bin, cnt,
               sum(cnt) OVER (ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               COALESCE(sum(cnt) OVER (ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   CAST(0 AS BIGINT)) AS cum_before
        FROM h
    ),
    t AS (SELECT max(cum) AS total FROM c),
    qs AS (SELECT unnest([0.5, 0.9, 0.99]) AS q)
    SELECT qs.q AS q, c.bin AS bin,
           least(greatest(
               0.0 + (CAST(least(greatest(c.bin, CAST(0 AS BIGINT)),
                                 CAST(255 AS BIGINT)) AS DOUBLE)
                      + (qs.q * CAST(t.total AS DOUBLE)
                         - CAST(c.cum_before AS DOUBLE))
                        / CAST(c.cnt AS DOUBLE)) * 1.5625,
               0.0), 400.0) AS estimate
    FROM c, t, qs
    WHERE CAST(c.cum AS DOUBLE) >= qs.q * CAST(t.total AS DOUBLE)
      AND CAST(c.cum_before AS DOUBLE) < qs.q * CAST(t.total AS DOUBLE)
    """,
)
def q_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of events.value from a 256-bin histogram sketch over
    [0, 400): the mergeable, fixed-size alternative to approx_percentile
    (whose t-digest is not engine-portable). Every arithmetic step is an
    integer cumsum or a fixed-order IEEE chain — the estimate is
    bit-identical to the SQL twin."""
    from timeseriesfuser_spark.ops.sketches import (
        histogram_quantiles,
        histogram_sketch,
    )

    ev = _events(spark, sf_dir)
    sk = histogram_sketch(ev, "value", lo=0.0, hi=400.0, bins=256)
    return histogram_quantiles(sk, [0.5, 0.9, 0.99], lo=0.0, hi=400.0, bins=256)


_BLOOM_M = 65536
_BLOOM_K = 3


@register(
    "bloom_join_prefilter",
    oracle=f"""
    WITH keys AS (
        SELECT DISTINCT o_orderkey FROM orders
        WHERE o_orderpriority = '1-URGENT'
    ),
    bits AS (
        SELECT DISTINCT
            CAST(concat('0x', substr(md5(concat(CAST(700 + s.i AS VARCHAR),
                 chr(31), CAST(k.o_orderkey AS VARCHAR))), 1, 15))
                 AS BIGINT) % {_BLOOM_M} AS bit
        FROM keys k CROSS JOIN (SELECT unnest(range({_BLOOM_K})) AS i) s
    ),
    pk AS (SELECT DISTINCT l_orderkey FROM lineitem),
    -- membership depends only on the key: decide once per DISTINCT key,
    -- then count the fact rows carrying a passing key ((orderkey,
    -- linenumber) is NOT unique in the synthetic lineitem, so grouping
    -- fact rows by that pair would merge rows and undercount)
    passk AS (
        SELECT pk.l_orderkey
        FROM pk
        CROSS JOIN (SELECT unnest(range({_BLOOM_K})) AS i) s
        JOIN bits b
          ON CAST(concat('0x', substr(md5(concat(CAST(700 + s.i AS VARCHAR),
               chr(31), CAST(pk.l_orderkey AS VARCHAR))), 1, 15))
               AS BIGINT) % {_BLOOM_M} = b.bit
        GROUP BY pk.l_orderkey
        HAVING count(*) = {_BLOOM_K}
    ),
    hits AS (
        SELECT l.l_orderkey FROM lineitem l
        JOIN passk ON l.l_orderkey = passk.l_orderkey
    )
    SELECT CAST((SELECT count(*) FROM hits) AS BIGINT) AS n_pass,
           CAST((SELECT count(*) FROM lineitem l
                 JOIN keys k ON l.l_orderkey = k.o_orderkey) AS BIGINT)
               AS n_true,
           CAST((SELECT count(*) FROM hits) AS BIGINT)
             - CAST((SELECT count(*) FROM lineitem l
                     JOIN keys k ON l.l_orderkey = k.o_orderkey) AS BIGINT)
               AS false_pos
    """,
)
def q_bloom_join_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom pre-filter audit (ops.sketches.bloom_bits/bloom_prefilter):
    build a {m}-bit / {k}-hash filter over the urgent-order keys,
    pre-filter lineitem through it, and emit pass/true/false-positive
    counts — the one-sided guarantee (false_pos >= 0, never a dropped
    true match) is part of the checked output. The bit relation is
    bounded and broadcast; the probe side is k broadcast semi joins."""
    from timeseriesfuser_spark.ops.sketches import bloom_bits, bloom_prefilter

    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey").distinct()
    li = _t(spark, sf_dir, "lineitem")
    bits = bloom_bits(o, "o_orderkey", m_bits=_BLOOM_M, k=_BLOOM_K)
    passed = bloom_prefilter(
        li, bits, "l_orderkey", m_bits=_BLOOM_M, k=_BLOOM_K
    )
    n_pass = passed.agg(F.count(F.lit(1)).cast("long").alias("n_pass"))
    n_true = (
        li.join(o, li.l_orderkey == o.o_orderkey, "left_semi")
        .agg(F.count(F.lit(1)).cast("long").alias("n_true"))
    )
    return n_pass.crossJoin(F.broadcast(n_true)).select(
        "n_pass",
        "n_true",
        (F.col("n_pass") - F.col("n_true")).cast("long").alias("false_pos"),
    )


q_bloom_join_prefilter.__doc__ = q_bloom_join_prefilter.__doc__.replace(
    "{m}", str(_BLOOM_M)).replace("{k}", str(_BLOOM_K))


@register(
    "hll_distinct_by_type",
    oracle=f"""
    WITH ev AS (SELECT event_type, user_id FROM events
                WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
    h AS (SELECT event_type, {_h('99')} AS hv FROM ev),
    rb AS (SELECT event_type, hv % {_HLL_M} AS bucket,
                  hv >> {_HLL_P} AS w FROM h),
    rr AS (SELECT event_type, bucket,
                  CASE WHEN w > 0 THEN {60 - _HLL_P} + 1 - length(bin(w))
                       ELSE {60 - _HLL_P + 1} END AS rho
           FROM rb),
    regs AS (SELECT event_type, bucket, max(rho) AS register
             FROM rr GROUP BY event_type, bucket),
    agg AS (SELECT event_type, count(*) AS n_buckets_hit,
                   max(register) AS max_register
            FROM regs GROUP BY event_type),
    s AS (SELECT r.event_type, a.n_buckets_hit, a.max_register,
                 sum(1::HUGEINT << CAST(a.max_register - r.register AS INT))
                   AS hit_sum
          FROM regs r JOIN agg a ON r.event_type = a.event_type
          GROUP BY r.event_type, a.n_buckets_hit, a.max_register),
    tot AS (SELECT event_type, n_buckets_hit, max_register,
                   hit_sum + ({_HLL_M} - n_buckets_hit)::HUGEINT
                             * (1::HUGEINT << CAST(max_register AS INT))
                     AS sum_scaled
            FROM s),
    exact AS (SELECT event_type, count(DISTINCT user_id) AS exact_distinct
              FROM ev GROUP BY event_type)
    SELECT t.event_type,
           CAST(t.n_buckets_hit AS BIGINT) AS n_buckets_hit,
           CAST(t.max_register AS BIGINT) AS max_register,
           round(CAST({_HLL_ALPHA!r} AS DOUBLE)
                 * CAST({float(_HLL_M)!r} AS DOUBLE)
                 * CAST({float(_HLL_M)!r} AS DOUBLE)
                 * (CAST(2.0 AS DOUBLE) ** CAST(t.max_register AS INT))
                 / CAST(t.sum_scaled AS DOUBLE), 4) AS estimate,
           CAST(e.exact_distinct AS BIGINT) AS exact_distinct
    FROM tot t JOIN exact e ON t.event_type = e.event_type
    """,
)
def q_hll_distinct_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED HyperLogLog (ops.sketches.hll_registers/hll_estimate with
    group_cols): per-event-type distinct users from per-group register
    arrays — the per-dimension dashboard sketch, #groups × 2^p state,
    one aggregation pass + one #groups-bounded join. Exact distinct per
    group rides along for the accuracy audit."""
    from timeseriesfuser_spark.ops.sketches import hll_estimate, hll_registers

    ev = _events(spark, sf_dir).filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    regs = hll_registers(
        ev.select("event_type", "user_id"), "user_id",
        p=_HLL_P, group_cols=["event_type"],
    )
    est = hll_estimate(regs, p=_HLL_P, group_cols=["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_distinct")
    )
    return est.join(exact, "event_type").select(
        "event_type", "n_buckets_hit", "max_register", "estimate",
        "exact_distinct",
    )


@register(
    "quantiles_by_type",
    oracle="""
    WITH h AS (
        SELECT event_type,
               CASE WHEN v < 0.0 THEN CAST(-1 AS BIGINT)
                    WHEN v >= 400.0 THEN CAST(256 AS BIGINT)
                    ELSE least(CAST(floor((v - 0.0) * 256 / 400.0) AS BIGINT),
                               CAST(255 AS BIGINT)) END AS bin,
               CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT event_type, CAST(value AS DOUBLE) AS v FROM events
              WHERE value IS NOT NULL AND event_type IS NOT NULL)
        GROUP BY 1, 2
    ),
    c AS (
        SELECT event_type, bin, cnt,
               sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               COALESCE(sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   CAST(0 AS BIGINT)) AS cum_before
        FROM h
    ),
    t AS (SELECT event_type, max(cum) AS total FROM c GROUP BY event_type),
    qs AS (SELECT unnest([0.5, 0.9]) AS q)
    SELECT c.event_type, qs.q AS q, c.bin AS bin,
           least(greatest(
               0.0 + (CAST(least(greatest(c.bin, CAST(0 AS BIGINT)),
                                 CAST(255 AS BIGINT)) AS DOUBLE)
                      + (qs.q * CAST(t.total AS DOUBLE)
                         - CAST(c.cum_before AS DOUBLE))
                        / CAST(c.cnt AS DOUBLE)) * 1.5625,
               0.0), 400.0) AS estimate
    FROM c JOIN t ON c.event_type = t.event_type
    CROSS JOIN qs
    WHERE CAST(c.cum AS DOUBLE) >= qs.q * CAST(t.total AS DOUBLE)
      AND CAST(c.cum_before AS DOUBLE) < qs.q * CAST(t.total AS DOUBLE)
    """,
)
def q_quantiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group quantiles from GROUPED histogram sketches
    (ops.sketches.histogram_sketch/histogram_quantiles with group_cols):
    p50/p90 of events.value per event_type, #groups × (bins+2) state,
    the cumsum window partitioned by the group — never a global
    single-partition pass."""
    from timeseriesfuser_spark.ops.sketches import (
        histogram_quantiles,
        histogram_sketch,
    )

    ev = _events(spark, sf_dir).filter(F.col("event_type").isNotNull())
    sk = histogram_sketch(
        ev, "value", lo=0.0, hi=400.0, bins=256, group_cols=["event_type"]
    )
    return histogram_quantiles(
        sk, [0.5, 0.9], lo=0.0, hi=400.0, bins=256,
        group_cols=["event_type"],
    )


@register(
    "cms_counts_by_type",
    oracle=f"""
    WITH ev AS (SELECT event_type, user_id FROM events
                WHERE event_type IS NOT NULL),
    hh AS (SELECT event_type, user_id, d,
                  CAST(concat('0x', substr(md5(concat(CAST(d AS VARCHAR),
                       chr(31), CAST(user_id AS VARCHAR))), 1, 15))
                       AS BIGINT) % {_CMS_W} AS col
           FROM ev CROSS JOIN (SELECT unnest(range({_CMS_D})) AS d)),
    cells AS (SELECT event_type, d, col, count(*) AS cnt
              FROM hh GROUP BY event_type, d, col),
    probe AS (SELECT DISTINCT event_type, user_id, d, col FROM hh),
    est AS (SELECT p.event_type, p.user_id, min(c.cnt) AS cms_n
            FROM probe p JOIN cells c
              ON p.event_type = c.event_type AND p.d = c.d AND p.col = c.col
            GROUP BY p.event_type, p.user_id),
    exact AS (SELECT event_type, user_id, count(*) AS exact_n
              FROM ev GROUP BY event_type, user_id)
    SELECT e.event_type, e.user_id,
           CAST(e.exact_n AS BIGINT) AS exact_n,
           CAST(est.cms_n AS BIGINT) AS cms_n,
           est.cms_n >= e.exact_n AS never_undercounts
    FROM exact e JOIN est
      ON e.event_type = est.event_type AND e.user_id = est.user_id
    """,
)
def q_cms_counts_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED Count-Min (ops.sketches.countmin_sketch/countmin_estimate
    with group_cols): per-event-type user activity counts from per-group
    {d}x{w} sketches — #groups × depth × width state, each key answered
    from its own group's counters, exact counts riding along for the
    one-sided-error audit."""
    from timeseriesfuser_spark.ops.sketches import (
        countmin_estimate,
        countmin_sketch,
    )

    ev = _events(spark, sf_dir).filter(
        F.col("event_type").isNotNull()
    ).select("event_type", "user_id")
    sk = countmin_sketch(
        ev, "user_id", depth=_CMS_D, width=_CMS_W, group_cols=["event_type"]
    )
    exact = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("exact_n")
    )
    est = countmin_estimate(
        sk,
        exact.select("event_type", "user_id"),
        "user_id",
        depth=_CMS_D,
        width=_CMS_W,
        group_cols=["event_type"],
    ).withColumnRenamed("key", "user_id")
    return exact.join(est, ["event_type", "user_id"]).select(
        "event_type",
        "user_id",
        F.col("exact_n").cast("long").alias("exact_n"),
        F.col("cms_n").cast("long").alias("cms_n"),
        (F.col("cms_n") >= F.col("exact_n")).alias("never_undercounts"),
    )


q_cms_counts_by_type.__doc__ = q_cms_counts_by_type.__doc__.replace(
    "{d}", str(_CMS_D)).replace("{w}", str(_CMS_W))


@register(
    "bloom_prefilter_by_type",
    oracle=f"""
    WITH ev AS (SELECT event_type, user_id FROM events
                WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
    keys AS (SELECT DISTINCT event_type, user_id FROM events
             WHERE event_type IS NOT NULL AND user_id IS NOT NULL
               AND value >= 300.0),
    bits AS (
        SELECT DISTINCT k.event_type,
            CAST(concat('0x', substr(md5(concat(CAST(700 + s.i AS VARCHAR),
                 chr(31), CAST(k.user_id AS VARCHAR))), 1, 15))
                 AS BIGINT) % {_BLOOM_M} AS bit
        FROM keys k CROSS JOIN (SELECT unnest(range({_BLOOM_K})) AS i) s
    ),
    -- membership depends only on (group, key): decide once per DISTINCT
    -- pair, then count the fact rows carrying a passing pair
    pk AS (SELECT DISTINCT event_type, user_id FROM ev),
    passk AS (
        SELECT pk.event_type, pk.user_id
        FROM pk
        CROSS JOIN (SELECT unnest(range({_BLOOM_K})) AS i) s
        JOIN bits b
          ON b.event_type = pk.event_type
         AND CAST(concat('0x', substr(md5(concat(CAST(700 + s.i AS VARCHAR),
               chr(31), CAST(pk.user_id AS VARCHAR))), 1, 15))
               AS BIGINT) % {_BLOOM_M} = b.bit
        GROUP BY pk.event_type, pk.user_id
        HAVING count(*) = {_BLOOM_K}
    ),
    np AS (SELECT e.event_type, count(*) AS n_pass
           FROM ev e JOIN passk p
             ON e.event_type = p.event_type AND e.user_id = p.user_id
           GROUP BY e.event_type),
    nt AS (SELECT e.event_type, count(*) AS n_true
           FROM ev e JOIN keys k
             ON e.event_type = k.event_type AND e.user_id = k.user_id
           GROUP BY e.event_type),
    base AS (SELECT DISTINCT event_type FROM ev)
    SELECT b.event_type,
           CAST(COALESCE(np.n_pass, 0) AS BIGINT) AS n_pass,
           CAST(COALESCE(nt.n_true, 0) AS BIGINT) AS n_true,
           CAST(COALESCE(np.n_pass, 0) - COALESCE(nt.n_true, 0) AS BIGINT)
               AS false_pos
    FROM base b
    LEFT JOIN np ON b.event_type = np.event_type
    LEFT JOIN nt ON b.event_type = nt.event_type
    """,
)
def q_bloom_prefilter_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED Bloom pre-filter (ops.sketches.bloom_bits/bloom_prefilter
    with group_cols): one independent filter per event_type over its
    high-value users, each fact row tested against ITS OWN group's bits —
    per-partition join pruning, the lakehouse idiom for per-day/per-source
    bit relations. Output = per-type pass/true/false-positive counts; the
    one-sided guarantee (false_pos >= 0) and group isolation (membership
    in another type's key set does not leak) are both checked."""
    from timeseriesfuser_spark.ops.sketches import bloom_bits, bloom_prefilter

    ev = _events(spark, sf_dir).filter(
        F.col("event_type").isNotNull() & F.col("user_id").isNotNull()
    ).select("event_type", "user_id", "value")
    keys = (
        ev.filter(F.col("value") >= 300.0)
        .select("event_type", "user_id").distinct()
    )
    fact = ev.select("event_type", "user_id")
    bits = bloom_bits(
        keys, "user_id", m_bits=_BLOOM_M, k=_BLOOM_K,
        group_cols=["event_type"],
    )
    passed = bloom_prefilter(
        fact, bits, "user_id", m_bits=_BLOOM_M, k=_BLOOM_K,
        group_cols=["event_type"],
    )
    np_ = passed.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_pass")
    )
    nt = fact.join(keys, ["event_type", "user_id"], "left_semi").groupBy(
        "event_type"
    ).agg(F.count(F.lit(1)).cast("long").alias("n_true"))
    base = fact.select("event_type").distinct()
    return (
        base.join(np_, "event_type", "left")
        .join(nt, "event_type", "left")
        .select(
            "event_type",
            F.coalesce("n_pass", F.lit(0)).cast("long").alias("n_pass"),
            F.coalesce("n_true", F.lit(0)).cast("long").alias("n_true"),
            (
                F.coalesce("n_pass", F.lit(0))
                - F.coalesce("n_true", F.lit(0))
            ).cast("long").alias("false_pos"),
        )
    )


@register(
    "streaming_hll_by_type",
    oracle=f"""
    WITH ev AS (
        SELECT event_type, user_id FROM events
        WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    ),
    h AS (SELECT event_type, {_h('99')} AS hv FROM ev),
    rb AS (SELECT event_type, hv % {_HLL_M} AS bucket,
                  hv >> {_HLL_P} AS w FROM h),
    rr AS (SELECT event_type, bucket,
                  CASE WHEN w > 0 THEN {60 - _HLL_P} + 1 - length(bin(w))
                       ELSE {60 - _HLL_P + 1} END AS rho
           FROM rb)
    SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
           CAST(max(rho) AS BIGINT) AS register
    FROM rr GROUP BY event_type, bucket
    """,
)
def q_streaming_hll_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming grouped HyperLogLog registers driven THROUGH
    the driver harness (streaming.hll_stream): availableNow file stream
    → per-event-type register MAX → COMPLETE-mode memory sink. Because
    the register relation is merge-closed bounded state (max is
    idempotent, 2^p rows per group), the final complete-mode table
    equals the batch registers of the same rows EXACTLY — no watermark
    or emission contract needed, the simplest possible streaming/batch
    parity. Oracle: the batch register SQL grouped by type."""
    import shutil
    import tempfile
    import uuid

    from timeseriesfuser_spark.streaming import hll_stream

    schema = _t(spark, sf_dir, "events").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ev = stream.select("event_type", "user_id").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    regs = hll_stream(ev, "user_id", p=_HLL_P, group_cols=["event_type"])
    name = f"shll_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="tsf_ckpt_")
    q = None
    try:
        q = (
            regs.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            raise TimeoutError(
                "streaming_hll_by_type: query still running after 300s"
            )
        if q.exception() is not None:
            raise q.exception()
        sink = spark.table(name)
        out = spark.createDataFrame(sink.collect(), sink.schema)
        return out.select(
            "event_type",
            F.col("bucket").cast("long").alias("bucket"),
            F.col("register").cast("long").alias("register"),
        )
    finally:
        if q is not None and q.isActive:
            q.stop()
        try:
            spark.catalog.dropTempView(name)
        except Exception:
            pass
        shutil.rmtree(ckpt, ignore_errors=True)
