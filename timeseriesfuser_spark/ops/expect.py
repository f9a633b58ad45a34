"""Declarative data-quality expectations: a rule list checked in ONE
aggregation pass over the relation (plus one bounded pass per uniqueness
rule), emitting a per-rule violations report — the contract a pipeline
gates a 100 TB load on before publishing it.

Row-level rules (not_null / range / accepted_values / regex / custom
expression) compile to conditional-sum aggregates of a single scan:
adding a rule adds a counter, never a pass. Uniqueness is inherently a
shuffle on the key; its report row comes from a two-level aggregate
(duplicate groups, then counts), map-side combinable.

All counts are exact integers; violation_ppm is one integer division —
oracle-exact.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["check_expectations"]


def _row_violation(rule: Mapping) -> Column:
    """Boolean column: does this row VIOLATE the rule? NULLs violate
    not_null; for the other row rules NULL passes (pair with a not_null
    rule to forbid them) — the usual expectations-library convention."""
    kind = rule["type"]
    if kind == "not_null":
        return F.col(rule["col"]).isNull()
    if kind == "range":
        c = F.col(rule["col"])
        v = F.lit(False)
        if "lo" in rule:
            v = v | (c < rule["lo"])
        if "hi" in rule:
            v = v | (c > rule["hi"])
        return c.isNotNull() & v
    if kind == "accepted_values":
        c = F.col(rule["col"])
        return c.isNotNull() & ~c.isin(*rule["values"])
    if kind == "regex":
        c = F.col(rule["col"])
        return c.isNotNull() & ~c.rlike(rule["pattern"])
    if kind == "expression":
        # rule["expr"]: SQL boolean that must HOLD; NULL counts as a
        # violation (unknown is not a pass)
        return ~F.coalesce(F.expr(rule["expr"]), F.lit(False))
    raise ValueError(f"unknown expectation type: {kind!r}")


def check_expectations(
    df: DataFrame, rules: Sequence[Mapping]
) -> DataFrame:
    """Check ``rules`` against ``df`` → one report row per rule:
    (rule, n_rows, n_violations, violation_ppm, passed).

    Rule dicts: ``{"name", "type", ...}`` with type ∈ not_null | range
    (lo/hi) | accepted_values (values) | regex (pattern) | expression
    (expr, SQL boolean that must hold) | unique (cols: row count in
    excess of one per distinct key counts as violations).
    """
    if not rules:
        raise ValueError("need at least one rule")
    import re

    for r in rules:
        # names are spliced into a stack() selectExpr — restrict them so
        # a quote can't break out of the SQL literal
        if not re.fullmatch(r"[A-Za-z0-9_\-.]+", str(r.get("name", ""))):
            raise ValueError(
                f"rule name must be [A-Za-z0-9_-.]+: {r.get('name')!r}"
            )
    row_rules = [r for r in rules if r["type"] != "unique"]
    uniq_rules = [r for r in rules if r["type"] == "unique"]

    reports: list[DataFrame] = []
    if row_rules:
        agg = df.agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            *[
                F.sum(_row_violation(r).cast("long"))
                .cast("long")
                .alias(f"__v{i}")
                for i, r in enumerate(row_rules)
            ],
        )
        stacked = ", ".join(
            f"'{r['name']}', __v{i}" for i, r in enumerate(row_rules)
        )
        reports.append(
            agg.selectExpr(
                "__n",
                f"stack({len(row_rules)}, {stacked}) AS (rule, n_violations)",
            ).select(
                "rule",
                F.col("__n").alias("n_rows"),
                # empty relation: conditional sums are NULL, counts 0
                F.coalesce("n_violations", F.lit(0).cast("long")).alias(
                    "n_violations"
                ),
            )
        )
    for r in uniq_rules:
        keys = list(r["cols"])
        per_key = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__c"))
        reports.append(
            per_key.agg(
                F.lit(r["name"]).alias("rule"),
                F.coalesce(F.sum("__c"), F.lit(0)).cast("long").alias("n_rows"),
                F.coalesce(F.sum(F.col("__c") - 1), F.lit(0))
                .cast("long")
                .alias("n_violations"),
            )
        )
    out = reports[0]
    for rep in reports[1:]:
        out = out.unionByName(rep)
    return out.select(
        "rule",
        "n_rows",
        "n_violations",
        # n_rows = 0 (empty relation): no rows, no violations -> 0 ppm.
        # when-guarded, not coalesced: ANSI DIV 0 THROWS, it isn't NULL
        # decimal(38,0) for the multiply: >~9.2e12 violating rows would
        # overflow int64 * 1e6 and ANSI Spark throws (ADVICE r5)
        F.when(
            F.col("n_rows") > 0,
            F.expr(
                "CAST(n_violations AS DECIMAL(38,0)) * 1000000"
                " DIV CAST(n_rows AS DECIMAL(38,0))"
            ),
        ).otherwise(F.lit(0)).cast("long").alias("violation_ppm"),
        (F.col("n_violations") == 0).alias("passed"),
    )


def k_anonymity(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int,
    *,
    sensitive_col: str | None = None,
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination — the
    re-identification screen a dataset needs before publication: every
    equivalence class (distinct quasi-identifier tuple, NULLs grouped
    like values) with its population ``n`` and ``at_risk = n < k``.

    With ``sensitive_col`` set, also reports ``l_distinct`` (distinct
    sensitive values inside the class, NULL counted as a value via a
    presence-tagged pair) — the l-diversity companion: a k-anonymous
    class with l_distinct = 1 still leaks the attribute.

    Scale: one hash aggregation on the quasi columns (+ one
    count-distinct Expand when ``sensitive_col`` is set); the output is
    class-count-bounded, never row-bounded."""
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    if sensitive_col is not None:
        aggs.append(
            F.countDistinct(
                F.struct(
                    F.col(sensitive_col).isNull().alias("__isnull"),
                    F.col(sensitive_col).alias("__v"),
                )
            ).cast("long").alias("l_distinct")
        )
    out = df.groupBy(*quasi_cols).agg(*aggs)
    return out.withColumn("at_risk", (F.col("n") < k).cast("long"))


def fd_violations(
    df: DataFrame,
    determinant_cols: Sequence[str],
    dependent_col: str,
) -> DataFrame:
    """Approximate-functional-dependency audit: does ``determinant_cols``
    → ``dependent_col`` hold, and where does it break? For every
    determinant tuple: the number of distinct dependent values, the
    majority value (ties broken by value text — deterministic), and the
    violation count (rows disagreeing with the majority) — the
    data-quality primitive behind "one SKU should map to one brand" /
    "one source should have one language" checks, and the repair
    suggestion (the majority) in the same pass.

    NULL dependents count as a value (a determinant mapping to NULL and
    'en' is a real violation); NULL determinant tuples form their own
    class, like any groupBy.

    Output: (determinant_cols…, n_rows, n_distinct, majority_value
    (string), n_violations, violation_ppm). Scale: one
    (determinant, dependent) hash-agg, then one min_by-on-struct
    aggregate over that grain — both map-side combinable; output
    bounded by distinct determinant tuples.
    """
    dets = list(determinant_cols)
    if not dets:
        raise ValueError("determinant_cols must be non-empty")
    dv = F.coalesce(F.col(dependent_col).cast("string"), F.lit("\x00"))
    grain = df.groupBy(*dets, dv.alias("__v")).agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    out = grain.groupBy(*dets).agg(
        F.sum("__c").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.max("__c").alias("__maxc"),
        # majority = (count desc, value asc) in ONE aggregate: min_by on
        # struct(-count, value) — no second consumer of the grain
        # relation (Catalyst would re-execute it per consumer)
        F.min_by(
            "__v", F.struct((-F.col("__c")).alias("nc"), F.col("__v"))
        ).alias("majority_value"),
    )
    return (
        out.withColumn(
            "n_violations", (F.col("n_rows") - F.col("__maxc")).cast("long")
        )
        .withColumn(
            "violation_ppm",
            F.expr("n_violations * 1000000 DIV n_rows").cast("long"),
        )
        .select(
            *dets, "n_rows", "n_distinct", "majority_value",
            "n_violations", "violation_ppm",
        )
    )
