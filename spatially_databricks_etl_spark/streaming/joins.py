"""Stream-stream joins (Structured Streaming interval join).

The flagship stateful-join capability: two unbounded streams joined on
an equi-key plus an event-time interval, with watermarks on BOTH sides
so the join state is provably bounded (rows outside the interval +
watermark horizon are evicted). The reference is pure batch and has no
join at all (SURVEY.md §2b).

Scale notes: each micro-batch shuffles both sides by the join key into
the state store; state per key holds only rows young enough to still
match (watermark + interval bound), so memory is O(rate × window), not
O(stream length). The SAME builder serves batch frames — where the
interval join is just a join with a time-range predicate — which is
what the DuckDB oracle checks; stream-vs-batch parity is the
Structured Streaming contract tested in tests/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Rows of ``right`` that occur in ``(left_ts, left_ts + within]``
    for the same ``key``. Column names for the two timestamp columns
    must already be disambiguated by the caller (rename before the
    join — self-joins share lineage otherwise).

    On streaming inputs both sides get event-time watermarks (state
    eviction); on batch inputs the identical condition runs as a plain
    equi+range join, which Catalyst executes as a hash join on the key
    with the range as a post-filter.
    """
    cond = (
        (F.col(right_ts) > F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"interval {within}"))
    )
    if left.isStreaming or right.isStreaming:
        from spatially_databricks_etl_spark.streaming.windows import ensure_event_time

        left = ensure_event_time(left, left_ts).withWatermark(left_ts, watermark)
        right = ensure_event_time(right, right_ts).withWatermark(right_ts, watermark)
    return left.join(right, on=key, how="inner").filter(cond)
