"""Deterministic corpus sampling for dataset mixing: hash-based stratified
sampling and domain-mixing rate computation.

These are the two halves of the "data mixture" step of a pretraining
pipeline: decide a per-source sampling rate from target mixture weights
(``mixing_weights``), then apply it reproducibly (``stratified_sample``).

Scale design: ``stratified_sample`` is a pure projection + filter — no
shuffle, no state, embarrassingly parallel at any size, and the keep/drop
decision for a row never changes as the corpus grows (hash of the row's own
identity, not a running count). ``mixing_weights`` aggregates to one row per
stratum (map-side partial agg) and all subsequent arithmetic runs on that
stratum-count-sized relation.

Determinism: the sample decision is ``md5``-derived (see
``ops.dedup.md5_hash64``) and every emitted ratio is a fixed short chain of
IEEE double ops on exact integer inputs — reproducible bit-for-bit in any
engine with md5, which is what makes the DuckDB oracles possible.
"""

from __future__ import annotations

from typing import Dict, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timeseriesfuser_spark.ops.dedup import md5_hash64
from timeseriesfuser_spark.ops.text import tokens_col

PPM = 1_000_000


def stratified_sample(
    df: DataFrame,
    rates: Dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    keep_only: bool = True,
) -> DataFrame:
    """Reproducible per-stratum Bernoulli sampling.

    A row is kept iff ``md5(stratum:id) mod 1e6 < rate_ppm(stratum)`` —
    the standard hash-based sampler: deterministic across runs/engines
    (unlike ``df.sample``), stable under corpus growth (a row's verdict
    depends only on its own identity), and *nested*: the rate-0.3 sample
    is a strict subset of the rate-0.6 sample, so mixture rates can be
    tuned without resampling everything.

    ``rates`` maps stratum value → keep probability in [0, 1]; strata not
    listed get ``default_rate``. Emits ``hash_ppm``/``rate_ppm`` alongside
    the input columns; ``keep_only=False`` returns all rows plus a ``keep``
    flag instead of filtering.
    """
    rate_ppm = F.lit(int(round(default_rate * PPM)))
    for value, rate in sorted(rates.items()):
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate for {value!r} not in [0, 1]: {rate}")
        rate_ppm = F.when(
            F.col(strata_col) == value, F.lit(int(round(rate * PPM)))
        ).otherwise(rate_ppm)
    # Null-PROPAGATING concat (not concat_ws, which silently skips NULL
    # args and hashes every null-id row of a stratum identically): a row
    # without an identity has no sampling hash and is excluded — the
    # DuckDB twin uses the equally null-propagating || operator.
    h = md5_hash64(
        F.concat(F.col(strata_col), F.lit(":"), F.col(id_col).cast("string"))
    )
    out = df.withColumns(
        {
            "hash_ppm": F.pmod(h, F.lit(PPM)).cast("long"),
            "rate_ppm": rate_ppm.cast("long"),
        }
    )
    keep = F.col("hash_ppm") < F.col("rate_ppm")
    if keep_only:
        return out.filter(keep)
    return out.withColumn("keep", keep)


def mixing_weights(
    df: DataFrame,
    weight_shares: Dict[str, int],
    strata_col: str = "source",
    text_col: str = "text",
    default_share: int = 0,
) -> DataFrame:
    """Per-stratum sampling rates that realize a target mixture by token
    share — the "domain reweighting" step (the arithmetic behind e.g. The
    Pile / DoReMi-style fixed mixtures, minus the learned part).

    ``weight_shares`` gives integer target shares k_s (relative weights;
    only ratios matter). With T_s = stratum token count and K = Σ k_s over
    strata present, the largest downsample-only total is
    ``tstar = min_s(T_s·K / k_s)``; each stratum then keeps
    ``rate_s = k_s·tstar / (K·T_s)`` of its tokens (==1 for the binding
    stratum). Emits per stratum: ``total_tokens``, ``share`` (k_s),
    ``target_weight``, ``capacity``, ``sample_rate``, ``expected_tokens``.

    Integer token counts and shares; every double is a fixed chain on
    exact ints (one product then one division), so the output is
    engine-reproducible. Strata with share 0 get rate 0 and don't bound
    ``tstar``.
    """
    share = F.lit(int(default_share))
    for value, k in sorted(weight_shares.items()):
        if k < 0:
            raise ValueError(f"share for {value!r} negative: {k}")
        share = F.when(F.col(strata_col) == value, F.lit(int(k))).otherwise(share)
    per = (
        df.select(
            F.col(strata_col).alias("stratum"),
            share.alias("share"),
            F.size(tokens_col(F.col(text_col))).cast("long").alias("__nt"),
        )
        .groupBy("stratum", "share")
        .agg(F.sum("__nt").alias("total_tokens"))
    )
    tot = per.agg(F.sum("share").cast("long").alias("__K"))
    per = per.crossJoin(F.broadcast(tot))
    capacity = F.when(
        F.col("share") > 0,
        (F.col("total_tokens") * F.col("__K")).cast("double")
        / F.col("share").cast("double"),
    )
    per = per.withColumn("capacity", capacity)
    tstar = per.agg(F.min("capacity").alias("__tstar"))
    per = per.crossJoin(F.broadcast(tstar))
    rate = F.when(F.col("share") > 0,
        (F.col("share").cast("double") * F.col("__tstar"))
        / (F.col("__K") * F.col("total_tokens")).cast("double"),
    ).otherwise(F.lit(0.0))
    return per.select(
        F.col("stratum").alias(strata_col),
        "total_tokens",
        "share",
        (F.col("share").cast("double") / F.col("__K").cast("double")).alias(
            "target_weight"
        ),
        "capacity",
        rate.alias("sample_rate"),
        (rate * F.col("total_tokens").cast("double")).alias("expected_tokens"),
    )


def leakage_safe_split(
    df: DataFrame,
    groups: DataFrame,
    *,
    id_col: str = "doc_id",
    group_id_col: str = "cluster_id",
    splits: Sequence = (("test", 0.10), ("val", 0.10), ("train", 0.80)),
    seed: str = "split0",
) -> DataFrame:
    """Group-aware train/val/test assignment: the split decision is a hash
    of the row's GROUP (near-dup cluster, canonical entity, domain …), so
    every member of a group lands in the same split — the guard against
    the classic eval-leakage failure where a near-duplicate of a training
    document sits in the test set.

    ``groups`` is an (id, group_id) relation (e.g. ``neardup_clusters`` or
    ``canonical_entities`` output); rows absent from it form singleton
    groups keyed by their own id. ``splits`` is an ordered sequence of
    (name, fraction) covering the unit interval; a group goes to the first
    split whose cumulative ppm bound exceeds ``md5(seed:group) % 1e6``.

    Output: (id, group_id, split). Scale: one equi-join on the id plus a
    projection — the verdict depends only on the group key, so it is
    stable under corpus growth and identical on every engine with md5.
    """
    splits = list(splits)
    if not splits:
        raise ValueError("splits must be non-empty")
    fracs = [f for _, f in splits]
    if any(f < 0 for f in fracs) or abs(sum(fracs) - 1.0) > 1e-9:
        raise ValueError(f"split fractions must be >= 0 and sum to 1: {fracs}")
    g = groups.select(
        F.col(id_col).alias("__id"), F.col(group_id_col).alias("group_id")
    )
    # Keep the id's own type: casting to long would NULL out string ids,
    # silently un-grouping the whole corpus.
    joined = df.select(F.col(id_col).alias("__id")).join(g, "__id", "left")
    group_key = F.coalesce(F.col("group_id"), F.col("__id"))
    h = F.pmod(
        md5_hash64(F.concat(F.lit(seed), F.lit(":"), group_key.cast("string"))),
        F.lit(PPM),
    )
    cum = 0
    expr = None
    for name, frac in splits[:-1]:
        cum += int(round(frac * PPM))
        cond = h < F.lit(cum)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last_name = splits[-1][0]
    split = F.lit(last_name) if expr is None else expr.otherwise(F.lit(last_name))
    return joined.select(
        F.col("__id").alias(id_col),
        group_key.cast(dict(joined.dtypes)["__id"]).alias("group_id"),
        split.alias("split"),
    )


def epoch_shuffle(
    df: DataFrame,
    n_shards: int = 8,
    seed: str = "epoch0",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic training-epoch shuffle + shard assignment: every row
    gets a pseudorandom 60-bit rank (md5 of ``seed:id``) and a shard
    (``rank % n_shards``). Reading each shard ordered by ``rank`` yields a
    reproducible global permutation — change ``seed`` per epoch for a fresh
    one; no RNG state, no driver coordination.

    Output: (id, shard, rank). Pure projection, NO shuffle: the expensive
    part of "shuffling" a 100 TB corpus is the shard-partitioned write
    (``df.repartition(n_shards, 'shard')`` + sortWithinPartitions('rank')),
    which this op deliberately leaves to the sink so the assignment itself
    stays free.
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    rank = md5_hash64(
        F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string"))
    )
    return df.select(
        F.col(id_col),
        (rank % n_shards).cast("long").alias("shard"),
        rank.alias("rank"),
    )


def stratified_fixed_n(
    df: DataFrame,
    n_per_stratum: int,
    *,
    strata_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "fixed0",
) -> DataFrame:
    """Deterministic FIXED-SIZE sample: exactly ``min(n, |stratum|)`` rows
    per stratum — the eval-set builder (Bernoulli sampling only hits a
    target size in expectation; benchmarks need exact budgets).

    Rows rank by ``md5(seed:stratum:id)`` within their stratum (total
    order, tie-broken by id) and the top ``n_per_stratum`` survive.
    Reproducible across runs/engines; changing ``seed`` redraws.

    Scale: one window per stratum — per-task work is bounded by the
    stratum's size, so a hot stratum bounds the critical path; at
    extreme skew pre-filter with :func:`stratified_sample` at a rate a
    few × the target fraction, then rank the survivors.
    """
    from pyspark.sql.window import Window

    if n_per_stratum <= 0:
        raise ValueError("n_per_stratum must be positive")
    h = F.pmod(
        md5_hash64(
            F.concat(
                F.lit(seed), F.lit(":"), F.col(strata_col), F.lit(":"),
                F.col(id_col).cast("string"),
            )
        ),
        F.lit(PPM),
    )
    ranked = df.withColumn("__h", h)
    w = Window.partitionBy(strata_col).orderBy("__h", id_col)
    return (
        ranked.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= int(n_per_stratum))
        .drop("__h")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    id_col: str = "doc_id",
    *,
    base_rate: float = 1.0,
    keep_only: bool = True,
) -> DataFrame:
    """Quality-weighted Bernoulli sampling: keep each row with
    probability ``clamp(weight × base_rate, 0, 1)`` — the standard
    curation move that keeps high-scoring documents with certainty and
    down-samples the tail in proportion to its score (Llama/CCNet-style
    quality buckets collapse to this with a step-function weight).

    Same contract as :func:`stratified_sample`: the verdict is
    ``md5(id) mod 1e6 < round(weight·base_rate·1e6)`` — deterministic
    across runs/engines, stable under corpus growth, and NESTED in the
    weight (raising a row's weight can only flip it drop→keep), so
    re-scoring never churns the kept set arbitrarily. Rows with NULL
    weight or NULL id are dropped (no identity / no score → no sample).

    Scale: pure projection + filter, zero shuffle at any size. Emits
    ``hash_ppm``/``rate_ppm``; ``keep_only=False`` adds ``keep`` instead
    of filtering. Determinism note: ``weight·base_rate·1e6`` is a fixed
    chain of IEEE double ops — an oracle must spell the SAME expression
    (a mathematically-equal rearrangement may round differently).
    """
    if base_rate < 0:
        raise ValueError(f"base_rate must be >= 0: {base_rate}")
    w = F.col(weight_col).cast("double") * F.lit(float(base_rate)) * PPM
    rate = F.least(
        F.lit(PPM).cast("long"),
        F.greatest(F.lit(0).cast("long"), F.round(w).cast("long")),
    )
    h = F.pmod(md5_hash64(F.col(id_col).cast("string")), F.lit(PPM))
    out = df.filter(
        F.col(weight_col).isNotNull() & F.col(id_col).isNotNull()
    ).withColumns(
        {"hash_ppm": h.cast("long"), "rate_ppm": rate.cast("long")}
    )
    keep = F.col("hash_ppm") < F.col("rate_ppm")
    if keep_only:
        return out.filter(keep)
    return out.withColumn("keep", keep)


def balanced_sample(
    df: DataFrame,
    *,
    strata_col: str = "source",
    id_col: str = "doc_id",
    keep_only: bool = True,
) -> DataFrame:
    """Class-balanced downsampling: every stratum is Bernoulli-sampled
    at ``rate_ppm = min_stratum_count·1e6 DIV stratum_count``, so all
    classes converge to the smallest class's expected size — the
    training-data rebalancer (majority classes thinned, the minority
    kept whole: its rate is exactly 1e6).

    Rates are computed IN-PLAN as exact integers (one stratum count
    aggregate + a broadcast 1-row min — no driver collect, no float
    rounding to diverge between engines), and the keep rule is
    :func:`stratified_sample`'s reproducible hash Bernoulli
    (``md5(stratum:id) mod 1e6 < rate_ppm`` — deterministic, nested,
    growth-stable). Rows with a NULL stratum or NULL id are excluded
    (no class / no sampling identity).

    Output: input columns + (hash_ppm, rate_ppm), filtered to kept rows
    (``keep_only=False`` adds a ``keep`` flag instead). Scale: one
    hash-agg for counts (broadcast back) + one projection — the corpus
    never reshuffles.
    """
    base = df.filter(
        F.col(strata_col).isNotNull() & F.col(id_col).isNotNull()
    )
    cnt = base.groupBy(F.col(strata_col).alias("__st")).agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    mn = cnt.agg(F.min("__n").alias("__mn"))
    rates = cnt.crossJoin(F.broadcast(mn)).select(
        "__st",
        F.expr(f"__mn * {PPM} DIV __n").cast("long").alias("rate_ppm"),
    )
    h = md5_hash64(
        F.concat(F.col(strata_col), F.lit(":"), F.col(id_col).cast("string"))
    )
    out = (
        base.join(
            F.broadcast(rates), base[strata_col] == rates["__st"]
        )
        .drop("__st")
        .withColumn("hash_ppm", F.pmod(h, F.lit(PPM)).cast("long"))
    )
    if keep_only:
        return out.filter(F.col("hash_ppm") < F.col("rate_ppm"))
    return out.withColumn("keep", F.col("hash_ppm") < F.col("rate_ppm"))
