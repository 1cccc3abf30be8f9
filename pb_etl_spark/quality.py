"""Declarative data-quality constraints (the dbt-tests / Delta
CHECK-constraint surface for flat datasets): a rule set compiles into ONE
validation scan that reports per-rule violation counts, plus an optional
referential-integrity anti-join per foreign key.

Scale: all row-level rules ride a single pass (each rule is a SUM of a
0/1 expression — map-side combinable, no shuffle beyond the final 1-row
agg); each FK rule is one anti-join that shuffles only the key column.
Failing fast on a 100 TB load means running ALL rules in that one pass,
not one scan per rule.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """A named row-level predicate that every row must satisfy."""

    name: str
    predicate: Column  # True = row passes


def check_rules(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Validate all rules in one scan. Returns (rule, n_violations,
    n_rows) — one output row per rule, long-format via a post-agg
    explode (the wide 1-row aggregate is driver-free)."""
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for r in rules:
        aggs.append(
            F.sum((~F.coalesce(r.predicate, F.lit(False))).cast("long")).alias(
                f"__viol_{r.name}"
            )
        )
    wide = df.agg(*aggs)
    packed = F.array(
        *[
            F.struct(
                F.lit(r.name).alias("rule"),
                F.col(f"__viol_{r.name}").alias("n_violations"),
                F.col("__rows").alias("n_rows"),
            )
            for r in rules
        ]
    )
    return wide.select(F.explode(packed).alias("c")).select(
        "c.rule", "c.n_violations", "c.n_rows"
    )


def check_foreign_key(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """Orphaned-key report: child rows whose key has no parent (NULL keys
    are exempt, as in SQL FK semantics). One anti-join on the key."""
    orphans = (
        child.filter(F.col(child_key).isNotNull())
        .join(
            parent.select(F.col(parent_key).alias(child_key)).distinct(),
            child_key,
            "left_anti",
        )
    )
    return orphans.groupBy(F.col(child_key).alias("orphan_key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
