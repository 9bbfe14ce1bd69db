"""Sketch operators: sub-linear summaries for 100 TB-scale profiling
(north-star extension; the reference has no aggregation surface at
all, SURVEY.md §2b).

Sketches are THE scale tool for "how many distinct / how frequent /
roughly which quantile" questions: fixed-size state, one pass,
mergeable across partitions (the merge is what makes them cluster-
native — partial sketches combine associatively, so the shuffle
carries kilobytes, not keys). All built on Spark's native sketch
aggregates (JVM-side, codegen'd): HyperLogLog++, Apache-Datasketches
HLL, count-min, and t-digest-style approximate percentiles.

Accuracy contracts are probabilistic, so there are no SQL oracles;
tests assert relative-error bounds against exact recomputation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def approx_distinct(df: DataFrame, col: str, *group_by: str, rsd: float = 0.02) -> DataFrame:
    """HyperLogLog++ distinct count (``approx_count_distinct``) with a
    target relative standard deviation. State is O(1/rsd²) bytes per
    group regardless of cardinality — vs a full shuffle+dedup for the
    exact count."""
    agg = F.approx_count_distinct(col, rsd=rsd).alias(f"approx_distinct_{col}")
    return df.groupBy(*group_by).agg(agg) if group_by else df.agg(agg)


def hll_sketch_column(col: Column | str, *, lg_k: int = 12) -> Column:
    """Mergeable Datasketches HLL binary sketch. Persist per-partition
    /-day sketches and union them later (``hll_union_agg``) — distinct
    counts over arbitrary date ranges without rescanning raw data."""
    return F.hll_sketch_agg(col, F.lit(lg_k))


def hll_estimate(sketch_col: Column | str) -> Column:
    return F.hll_sketch_estimate(sketch_col)


def frequency_sketch(
    col: Column | str, *, eps: float = 0.001, confidence: float = 0.99, seed: int = 42
) -> Column:
    """Count-min sketch binary: answers point frequency queries with
    additive error ≤ eps·N at the given confidence, in O(1/eps·ln(1/δ))
    space. The sketches merge across partitions/time windows."""
    c = F.col(col) if isinstance(col, str) else col
    return F.count_min_sketch(c, F.lit(eps), F.lit(confidence), F.lit(seed))


def approx_quantiles(
    df: DataFrame, col: str, probabilities: list[float], *group_by: str, accuracy: int = 10000
) -> DataFrame:
    """Streaming-mergeable approximate percentiles
    (``percentile_approx``): rank error ≤ 1/accuracy. The exact
    ``F.percentile`` needs all values per group; this needs O(accuracy)
    state — the right default at 100 TB."""
    agg = F.percentile_approx(col, probabilities, accuracy).alias("approx_quantiles")
    return df.groupBy(*group_by).agg(agg) if group_by else df.agg(agg)


def distinct_over_union(df: DataFrame, col: str, part_col: str, *, lg_k: int = 12) -> DataFrame:
    """The merge pattern end-to-end: per-partition HLL sketches →
    union-merge → one estimate. Demonstrates that pre-aggregated
    sketches compose: build once per ingest batch, answer
    distinct-count queries over any batch subset later."""
    per_part = df.groupBy(part_col).agg(hll_sketch_column(col, lg_k=lg_k).alias("sk"))
    return per_part.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias(f"distinct_{col}")
    )


def cms_estimate(spark, sketch_bytes: bytes, item) -> int:
    """Point-frequency estimate from a serialized count-min sketch
    (driver-side read of the distributed aggregate — the sketch is
    kilobytes however large the data was). Uses the public
    ``org.apache.spark.util.sketch.CountMinSketch`` API; Spark exposes
    no SQL estimate function as of 4.1."""
    bis = spark._jvm.java.io.ByteArrayInputStream(bytes(sketch_bytes))
    cms = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bis)
    return int(cms.estimateCount(item))
