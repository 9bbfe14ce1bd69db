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


def fd_violations(df: DataFrame, fds: list[tuple[str, str]]) -> DataFrame:
    """Functional-dependency audit: for each candidate FD lhs → rhs,
    report how badly the table violates it — the schema-discovery /
    constraint-validation member of the quality family (expectations
    cover ROW predicates; FDs are the cross-row invariants a data
    contract states: "one supplier per part", "one currency per
    account"). Per FD, emits one row:

      (lhs, rhs, n_groups, n_violating_groups, n_violating_rows,
       max_rhs_distinct)

    where a group is a distinct lhs value (null lhs/rhs rows are
    dropped first — SQL's UNIQUE-constraint null semantics), a group
    violates when it maps to >1 distinct rhs, n_violating_rows counts
    the rows inside violating groups (the triage workload), and
    max_rhs_distinct is the worst fan-out. The FD HOLDS iff
    n_violating_groups = 0. All outputs are exact longs.

    Scale shape: per FD, one groupBy(lhs) hash aggregate with an
    EXACT count(distinct rhs) — the distinct runs inside the same
    shuffle (expand + two-phase agg), never on the driver — followed
    by a re-aggregation of the per-group frame to a single row. The
    audit for k FDs is a union of k such one-row aggregates; each FD
    scans the data once (Spark's scan reuse dedupes the file reads
    when the plans share the source).
    """
    outs = []
    for lhs, rhs in fds:
        groups = (
            df.filter(F.col(lhs).isNotNull() & F.col(rhs).isNotNull())
            .groupBy(F.col(lhs).alias("__lhs"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("__rows"),
                F.countDistinct(F.col(rhs)).cast("long").alias("__nd"),
            )
        )
        outs.append(
            groups.agg(
                F.count(F.lit(1)).cast("long").alias("n_groups"),
                # coalesce: sum over ZERO groups (empty input) is SQL
                # NULL, but "no violations" is the honest audit answer
                F.coalesce(
                    F.sum(F.when(F.col("__nd") > 1, 1).otherwise(0)), F.lit(0)
                )
                .cast("long")
                .alias("n_violating_groups"),
                F.coalesce(
                    F.sum(F.when(F.col("__nd") > 1, F.col("__rows")).otherwise(0)),
                    F.lit(0),
                )
                .cast("long")
                .alias("n_violating_rows"),
                F.max("__nd").cast("long").alias("max_rhs_distinct"),
            ).select(
                F.lit(lhs).alias("lhs"),
                F.lit(rhs).alias("rhs"),
                "n_groups",
                "n_violating_groups",
                "n_violating_rows",
                "max_rhs_distinct",
            )
        )
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result


def candidate_keys(df: DataFrame, cols: list[str]) -> DataFrame:
    """Key-discovery profiler: for each candidate column, report the
    exact uniqueness facts a schema auditor needs — the single-column
    complement of :func:`fd_violations` (an FD audit presumes a lhs;
    this finds them). Per column, one row:

      (col_name, n_rows, n_nonnull, n_distinct, is_unique_key)

    where is_unique_key is true iff every row carries a distinct
    non-null value (n_distinct = n_nonnull = n_rows) — the SQL
    PRIMARY KEY test. All counts are exact longs.

    Scale shape: ONE aggregate over one scan — Spark plans the k
    count(distinct) columns as a single Expand (k+1 copies tagged by
    grouping id) feeding a two-phase hash aggregate, so the data
    moves through one shuffle regardless of how many candidates are
    audited; nothing driver-side. Expand multiplies the MAP-side rows
    by k+1, which is the honest cost of exact multi-column
    distinct-counting — callers auditing very wide tables should
    batch the candidate list.
    """
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).cast("long").alias(f"__nn_{c}"))
        aggs.append(F.countDistinct(F.col(c)).cast("long").alias(f"__nd_{c}"))
    row = df.agg(*aggs)
    outs = [
        row.select(
            F.lit(c).alias("col_name"),
            F.col("__n").alias("n_rows"),
            F.col(f"__nn_{c}").alias("n_nonnull"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            (
                (F.col(f"__nd_{c}") == F.col("__n"))
                & (F.col(f"__nn_{c}") == F.col("__n"))
            ).alias("is_unique_key"),
        )
        for c in cols
    ]
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def benford_audit(
    df: DataFrame, *, value_col: str, value_decimals: int = 0
) -> DataFrame:
    """Benford's-law first-digit audit: compare the leading-digit
    distribution of a positive measure against the Benford expectation
    P(d) = log10(1 + 1/d) — the classic fabricated/synthetic-data
    screen for naturally-spanning quantities (amounts, populations,
    counts). Per digit d ∈ 1..9:

      (digit, n_observed, n_total, p_obs_e6, p_benford_e6,
       chi2_contrib_e6)

    with chi2_contrib = (n_d − n·P(d))² / (n·P(d)) — large totals mean
    even small deviations are significant, which is the intended
    reading. Digits with zero observations still emit a row (their
    contribution is n·P(d), the full missing mass).

    Determinism: the value scales to an exact decimal(38,0) integer
    (``value_decimals``, the :func:`fd_violations` family's contract)
    and the leading digit comes from the INTEGER's string form — never
    from float log10, whose exactness at powers of ten is a
    per-libm gamble. Expected probabilities are ln((d+1)/d)/ln(10)
    in a pinned op order; every emitted double is one or two libm
    calls plus IEEE arithmetic away from exact longs, e6-floored.

    Scale shape: ONE groupBy(digit) hash aggregate over the data
    (map-side combine, ≤9 groups); the expectation join rides a
    9-row literal frame and the total a one-row broadcast.
    """
    scale = F.lit(float(10**value_decimals))
    scaled = F.floor(F.col(value_col).cast("double") * scale + F.lit(0.5)).cast(
        "decimal(38,0)"
    )
    digits = (
        df.filter(F.col(value_col).isNotNull())
        .select(scaled.alias("__s"))
        .filter(F.col("__s") > 0)
        .select(
            F.substring(F.col("__s").cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
    )
    counts = digits.groupBy("digit").agg(
        F.count(F.lit(1)).cast("long").alias("n_observed")
    )
    spark = df.sparkSession
    all_digits = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    total = counts.agg(
        F.coalesce(F.sum("n_observed"), F.lit(0)).cast("long").alias("n_total")
    )
    out = (
        all_digits.join(counts, "digit", "left")
        .withColumn("n_observed", F.coalesce(F.col("n_observed"), F.lit(0)))
        .crossJoin(F.broadcast(total))
    )
    d = F.col("digit").cast("double")
    p_ben = F.log((d + F.lit(1.0)) / d) / F.log(F.lit(10.0))
    n = F.col("n_total").cast("double")
    p_obs = F.col("n_observed").cast("double") / n
    expected = n * p_ben
    diff = F.col("n_observed").cast("double") - expected
    chi2 = (diff * diff) / expected
    e6 = F.lit(1000000.0)
    half = F.lit(0.5)
    return out.select(
        "digit",
        "n_observed",
        "n_total",
        F.when(F.col("n_total") > 0, F.floor(p_obs * e6 + half).cast("long"))
        .alias("p_obs_e6"),
        F.floor(p_ben * e6 + half).cast("long").alias("p_benford_e6"),
        F.when(F.col("n_total") > 0, F.floor(chi2 * e6 + half).cast("long"))
        .alias("chi2_contrib_e6"),
    )
