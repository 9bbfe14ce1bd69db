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


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    *,
    capacity: int = 50,
    threshold_fraction: float | None = None,
) -> DataFrame:
    """EXACT heavy hitters (keys with frequency > a fraction of all
    rows) in two passes — the classic Misra–Gries candidate pass plus
    an exact counting pass — without ever shuffling a full
    per-key count table.

    Pass 1 runs a Misra–Gries summary of ``capacity`` counters inside
    each partition (Arrow-batched ``mapInPandas``; batch updates use
    the mergeable-summaries combine: add the batch's value counts,
    then subtract the (capacity+1)-th largest counter, which preserves
    the undercount bound ≤ n_p/(capacity+1) — Agarwal et al.,
    "Mergeable Summaries", PODS'12). Any key with global count
    > N/(capacity+1) must exceed the local bound in at least one
    partition (pigeonhole), so the union of partition summaries is a
    guaranteed superset of the true heavy hitters. Pass 2 exactly
    counts ONLY the candidates (broadcast semi-join — the candidate
    set is ≤ capacity·num_partitions rows by construction) and applies
    the exact threshold, so the result is exactly
    ``SELECT key, count(*) … HAVING count(*) > N·f`` — false
    candidates are filtered, true hitters are never missed.

    ``threshold_fraction`` defaults to 1/(capacity+1), its minimum
    sound value; larger values are allowed (stricter filter), smaller
    ones would void the no-miss guarantee and raise.

    Scale shape: pass 1 is map-only (no shuffle; O(capacity) state per
    task); per-partition totals ride along in the summary frame so N
    needs no extra scan. Pass 2 is one map-side semi-join against the
    broadcast candidates + one aggregation on the (tiny) surviving key
    set. Compare the naive ``groupBy(key).count().filter(...)``: at
    100 TB with ~billions of distinct keys that shuffles the full key
    space; this shuffles only candidate rows.

    Returns (key_col, n_rows, share) sorted nowhere (order it at the
    call site). Null keys are ignored (count toward nothing).
    """
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    min_fraction = 1.0 / (capacity + 1)
    if threshold_fraction is None:
        threshold_fraction = min_fraction
    elif threshold_fraction < min_fraction - 1e-12:
        raise ValueError(
            f"threshold_fraction {threshold_fraction} below 1/(capacity+1) "
            f"= {min_fraction:.6f}: Misra-Gries with capacity {capacity} "
            "cannot guarantee recall at that threshold; raise capacity"
        )

    from pyspark.sql.types import BooleanType, LongType, StructField, StructType

    key_field = df.schema[key_col]
    summary_schema = StructType(
        [
            StructField(key_col, key_field.dataType, True),
            StructField("__pn", LongType(), True),
            StructField("__is_total", BooleanType(), False),
        ]
    )

    cap = capacity
    kc = key_col

    def mg_partition(batches):
        import pandas as pd

        counters: dict = {}
        n = 0
        for pdf in batches:
            col = pdf[kc].dropna()
            n += int(len(col))
            for v, c in col.value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > cap:
                # mergeable-summaries combine: subtract the
                # (cap+1)-th largest counter, drop non-positive
                sub = sorted(counters.values(), reverse=True)[cap]
                counters = {v: c - sub for v, c in counters.items() if c > sub}
        yield pd.DataFrame(
            {
                kc: list(counters.keys()) + [None],
                "__pn": [None] * len(counters) + [n],
                "__is_total": [False] * len(counters) + [True],
            }
        )

    from spatially_databricks_etl_spark.caching import register_persists

    # The summary is bounded at (capacity+1)·num_partitions rows by
    # construction. It feeds two branches of the final plan (N and the
    # candidate keys), so persist it — without this the map-only MG
    # pass (the full scan of df) would execute once per branch. The
    # candidate set never transits the driver: N rides along as a
    # broadcast one-row frame and the candidates stay a DataFrame in a
    # broadcast semi-join, so the operator is fully distributed — at
    # 100 TB with ~1e5 tasks the ~capacity·tasks candidate rows move
    # executor-to-executor, never through the driver.
    summary = df.select(kc).mapInPandas(mg_partition, schema=summary_schema).persist()
    totals = summary.filter(F.col("__is_total")).agg(
        F.coalesce(F.sum("__pn"), F.lit(0)).alias("__total")
    )
    # no distinct: a left-semi build side tolerates duplicate keys
    # (the broadcast hash table dedups implicitly), and dropping it
    # saves an Exchange on the summary frame
    candidates = summary.filter(~F.col("__is_total")).select(kc)
    counts = (
        df.join(F.broadcast(candidates), on=kc, how="left_semi")
        .groupBy(kc)
        .agg(F.count("*").alias("n_rows"))
    )
    result = (
        counts.crossJoin(F.broadcast(totals))
        .filter(F.col("n_rows") > F.lit(threshold_fraction) * F.col("__total"))
        .select(
            kc,
            F.col("n_rows").cast("long").alias("n_rows"),
            (F.col("n_rows") / F.col("__total").cast("double")).alias("share"),
        )
    )
    return register_persists(result, [summary])
