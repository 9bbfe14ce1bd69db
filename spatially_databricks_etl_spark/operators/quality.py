"""Data-quality expectations: declarative row rules with quarantine.

The public pattern (Delta Live Tables expectations, Great
Expectations) re-expressed as plain DataFrame algebra; the reference's
only quality step is a manual `SELECT *` read-back (`Spatially ETL
test.py:249-250`).

Each rule is (name → boolean Column). ``apply_expectations`` tags
every row with the array of rule names it violates — one projection,
codegen'd, no UDF — so the pass/quarantine split and the per-rule
violation counts are all single-scan derivatives. At 100 TB nothing
here shuffles except the (tiny) summary aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

VIOLATIONS_COL = "_violations"


def apply_expectations(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Tag each row with the names of the rules it FAILS (empty array
    = clean). Null rule results count as failures (ANSI-safe: an
    unevaluable predicate is not a pass)."""
    tags = F.array_compact(
        F.array(
            *[
                F.when(F.coalesce(cond, F.lit(False)), None).otherwise(F.lit(name))
                for name, cond in rules.items()
            ]
        )
    )
    return df.withColumn(VIOLATIONS_COL, tags)


def split_quarantine(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """(clean_rows, quarantined_rows) — quarantined rows keep the
    violation tags for triage; clean rows drop the helper column."""
    tagged = apply_expectations(df, rules)
    clean = tagged.filter(F.size(VIOLATIONS_COL) == 0).drop(VIOLATIONS_COL)
    bad = tagged.filter(F.size(VIOLATIONS_COL) > 0)
    return clean, bad


def expectation_summary(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Per-rule violation counts + total rows, one scan: explode the
    violation tags and count, then cross-join the scalar total (both
    sides of the join are single-row/tiny aggregates)."""
    tagged = apply_expectations(df, rules).select(VIOLATIONS_COL)
    per_rule = (
        tagged.select(F.explode(VIOLATIONS_COL).alias("rule"))
        .groupBy("rule")
        .agg(F.count(F.lit(1)).alias("n_violations"))
    )
    total = tagged.agg(F.count(F.lit(1)).alias("n_rows"))
    return per_rule.crossJoin(total)
