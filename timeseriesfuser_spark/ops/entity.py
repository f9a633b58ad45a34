"""Entity resolution: blocked fuzzy matching over a name-like column.

The classic record-linkage shape — never all-pairs. Candidate pairs come
from an equi-join on caller-chosen *blocking keys* (brand+category, zip
code, sorted-token signature, …); the expensive string distance runs only
inside blocks, and a cheap length-difference guard prunes before the
distance is computed (levenshtein(a, b) >= abs(len(a) - len(b)), so pairs
whose lengths differ by more than the threshold can never match).

Scale design: one shuffle on the blocking key; per-block cost is
|block|², so blocking keys must be chosen (or refined — add a length
band, a phonetic code, a first-token column) until the hottest block is
bounded. ``key_skew_report`` over the blocking key is the pre-flight
check; the join itself is a plain sort-merge equi-join AQE can skew-split.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_match_pairs(
    df: DataFrame,
    *,
    id_col: str,
    name_col: str,
    block_cols: Sequence[str],
    max_distance: int = 2,
) -> DataFrame:
    """Within-block fuzzy duplicate pairs: rows sharing all ``block_cols``
    whose ``name_col`` values are within ``max_distance`` Levenshtein edits
    (and not identical ids). Emits (id_a, id_b, name_a, name_b, distance)
    with id_a < id_b — each unordered pair once.

    The length-difference lower bound is applied as part of the join
    condition so the O(len²) edit-distance kernel never runs on pairs it
    cannot accept.
    """
    block_cols = list(block_cols)
    if not block_cols:
        raise ValueError("block_cols must be non-empty (all-pairs is banned)")
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(name_col).alias("name_a"),
        *[F.col(c).alias(f"__bk{i}") for i, c in enumerate(block_cols)],
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(name_col).alias("name_b"),
        *[F.col(c).alias(f"__bk{i}") for i, c in enumerate(block_cols)],
    )
    bk = [f"__bk{i}" for i in range(len(block_cols))]
    d = int(max_distance)
    pairs = a.join(b, on=bk).filter(
        (F.col("id_a") < F.col("id_b"))
        & (
            F.abs(F.length("name_a") - F.length("name_b")) <= d
        )
    )
    return (
        pairs.withColumn("distance", F.levenshtein("name_a", "name_b"))
        .filter(F.col("distance") <= d)
        .select(
            "id_a",
            "id_b",
            "name_a",
            "name_b",
            F.col("distance").cast("long").alias("distance"),
        )
    )


def canonical_entities(
    pairs: DataFrame,
    entities: DataFrame,
    *,
    id_col: str,
) -> DataFrame:
    """Resolve match pairs to canonical entity ids via the shared
    connected-components machinery: every matched group collapses to its
    minimum id; unmatched rows are their own canonical entity.

    Output: (id, canonical_id). The component computation iterates over
    the *edge subgraph only* (pairs are usually a tiny fraction of the
    entity table), exactly like near-dup clustering.
    """
    from timeseriesfuser_spark.ops.dedup import connected_components

    ids = entities.select(F.col(id_col).alias("id"))
    comp = connected_components(pairs, all_ids=ids)  # (id, cluster_id)
    return comp.select(
        "id",
        F.col("cluster_id").cast(dict(ids.dtypes)["id"]).alias("canonical_id"),
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    *,
    id_col: str = "id",
    sort_col: str = "name",
    window: int = 3,
    max_edits: int | None = None,
    num_buckets=None,
) -> DataFrame:
    """Sorted-neighborhood entity-resolution blocking (Hernández &
    Stolfo): records sorted by a blocking key; every pair within
    ``window`` positions of each other is a candidate — the classic
    complement to equi-key blocking (``fuzzy_match_pairs``' deletion
    neighborhoods catch typos; sorted neighborhoods catch prefix drift
    like 'ACME Corp' / 'ACME Corporation' that shares no small edit).

    Scale: ranks come from the two-pass range-bucketed
    :func:`~timeseriesfuser_spark.ops.scale.exact_global_rank` (never a
    single-task global window), and the neighbor join is an EQUI-join:
    each row lands in rank-block ``rank DIV window`` and its successor
    block, so any pair within ``window`` positions shares a block —
    2× fan-out, |Δrank| filtered inside the join, never a rank-range
    theta join. Candidate volume is exactly n·window.

    Rows with a NULL ``sort_col`` are excluded (they have no sort
    position). Output (id_a, id_b, rank_a, rank_b) ordered pairs with
    rank_a < rank_b; with ``max_edits`` set, candidates are verified
    with codegen ``levenshtein`` and an ``edit_distance`` column is
    appended.
    """
    from timeseriesfuser_spark.ops.scale import exact_global_rank

    if window < 1:
        raise ValueError(f"window must be >= 1: {window}")
    base = df.filter(F.col(sort_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.col(sort_col).alias("__s")
    )
    # the range bucketer needs a NUMERIC first order column: the first 7
    # bytes of the (NUL-padded) UTF-8 key as a big-endian integer are
    # order-consistent with binary string order (s1 < s2 ⇒ bk1 <= bk2),
    # so ranking by (__bk, __s, id) is the same total order as (__s, id)
    # and ties of __bk never straddle buckets.
    base = base.withColumn(
        "__bk",
        F.conv(
            F.hex(
                F.substring(
                    F.encode(F.rpad(F.col("__s"), 7, "\u0000"), "UTF-8"), 1, 7
                )
            ),
            16,
            10,
        ).cast("long"),
    )
    ranked = exact_global_rank(
        base, ["__bk", "__s", "id"], num_buckets=num_buckets, rank_col="__rk"
    )
    w = int(window)
    # asymmetric blocking, each pair meets EXACTLY once (no distinct, no
    # election): the lower-rank side joins from its own block AND its
    # successor block; the higher-rank side sits only in its own block.
    # For any pair with 0 < Δrank <= w, rb DIV w is either ra DIV w or
    # ra DIV w + 1 — one of a's two keys, never both.
    a = ranked.select(
        "id", "__s", "__rk",
        F.explode(
            F.array(
                F.expr(f"__rk DIV {w}"), F.expr(f"__rk DIV {w} + 1")
            )
        ).alias("__b"),
    ).alias("a")
    b = ranked.select(
        "id", "__s", "__rk", F.expr(f"__rk DIV {w}").alias("__b")
    ).alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.__b") == F.col("b.__b"))
            & (F.col("a.__rk") < F.col("b.__rk"))
            & (F.col("b.__rk") - F.col("a.__rk") <= w),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.__rk").alias("rank_a"),
            F.col("b.__rk").alias("rank_b"),
            F.col("a.__s").alias("__sa"),
            F.col("b.__s").alias("__sb"),
        )
    )
    if max_edits is None:
        return cand.select("id_a", "id_b", "rank_a", "rank_b")
    return (
        cand.withColumn(
            "edit_distance", F.levenshtein("__sa", "__sb").cast("long")
        )
        .filter(F.col("edit_distance") <= int(max_edits))
        .select("id_a", "id_b", "rank_a", "rank_b", "edit_distance")
    )
