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
