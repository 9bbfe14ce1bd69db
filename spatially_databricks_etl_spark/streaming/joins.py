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
    how: str = "inner",
) -> DataFrame:
    """Rows of ``right`` that occur in ``(left_ts, left_ts + within]``
    for the same ``key``. Column names for the two timestamp columns
    must already be disambiguated by the caller (rename before the
    join — self-joins share lineage otherwise).

    On streaming inputs both sides get event-time watermarks (state
    eviction); on batch inputs the identical condition runs as a plain
    equi+range join, which Catalyst executes as a hash join on the key
    with the range as a post-filter.

    ``how`` extends to ``left_outer`` / ``right_outer`` / ``full_outer``
    (the audit/attribution shape: clicks that never converted). For
    OUTER stream-stream joins the interval condition must live in the
    JOIN condition, not a post-filter — a filter after an outer join
    would silently drop the null-padded rows — so the condition moves
    inside the join for every mode, and Structured Streaming emits an
    unmatched row only once the watermark proves no future match can
    arrive: null-padded results trail the watermark delay, and rows
    still inside the horizon when the query stops are withheld (the
    documented engine contract, pinned by the outer-join test).
    """
    allowed = {"inner", "left_outer", "right_outer", "full_outer"}
    if how not in allowed:
        raise ValueError(f"interval_join: how must be one of {sorted(allowed)}")
    if left.isStreaming or right.isStreaming:
        from spatially_databricks_etl_spark.streaming.windows import ensure_event_time

        left = ensure_event_time(left, left_ts).withWatermark(left_ts, watermark)
        right = ensure_event_time(right, right_ts).withWatermark(right_ts, watermark)
    # alias-qualified references: both sides may share lineage (e.g.
    # two filters of one source), which makes bare attribute refs
    # ambiguous under the self-join check
    lcols, rcols = left.columns, right.columns
    la, ra = left.alias("__ij_l"), right.alias("__ij_r")
    lc = lambda c: F.col(f"__ij_l.{c}")  # noqa: E731
    rc = lambda c: F.col(f"__ij_r.{c}")  # noqa: E731
    cond = (
        (lc(key) == rc(key))
        & (rc(right_ts) > lc(left_ts))
        & (rc(right_ts) <= lc(left_ts) + F.expr(f"interval {within}"))
    )
    joined = la.join(ra, on=cond, how=how)
    # collapse the duplicated key column (null-safe for outer modes)
    return joined.select(
        F.coalesce(lc(key), rc(key)).alias(key),
        *[lc(c) for c in lcols if c != key],
        *[rc(c) for c in rcols if c != key],
    )


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    *,
    on: str,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment join: attach a dimension frame's
    columns to every stream row — the bread-and-butter production
    shape (events × user profile, clicks × campaign metadata).

    Structured Streaming supports stream-static joins only with the
    STREAM on the left for outer/semi/anti shapes, so ``how`` is
    restricted to ``inner``/``left``/``left_semi``/``left_anti`` and
    the dim must be a batch frame (a streaming dim needs
    :func:`interval_join` and watermarked state instead). The dim is
    broadcast by default — per micro-batch the join is then map-only
    on the stream side, no stream shuffle; pass
    ``broadcast_dim=False`` for a big dim (shuffled hash join per
    batch; at that size consider snapshotting the dim to a bucketed
    table co-bucketed with the stream's shuffle instead).

    Slowly-changing dims: the static side's DATA is re-read every
    micro-batch, but a file source's file LISTING is resolved when
    the query starts — so an overwritten dim directory is only
    guaranteed to be picked up by a RESTARTED query (the checkpoint
    carries offsets, not the dim). The restart-refresh contract is
    pinned by test; for intra-query dim refresh use a Delta/catalog
    table, whose snapshot resolves per batch.
    """
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti"}
    if how not in allowed:
        raise ValueError(
            f"stream_static_enrich: how must be one of {sorted(allowed)} "
            "(stream-static joins require the stream on the left)"
        )
    if dim.isStreaming:
        raise ValueError(
            "stream_static_enrich: dim must be a static (batch) frame — "
            "for stream-stream joins use interval_join"
        )
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on=on, how=how)
