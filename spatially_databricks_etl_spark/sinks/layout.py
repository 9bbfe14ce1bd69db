"""Write-side data layout: range-sorted and Z-ordered parquet
(north-star extension; the reference's only write is an unpartitioned,
unsorted Delta CTAS, `Spatially ETL test.py:236-245` — no clustering,
no skipping story).

At 100 TB the cheapest scan is the one that never reads the file:
parquet footers carry per-column min/max, and both Spark's scan and
any warehouse engine skip files/row-groups whose range can't match a
predicate. That only works if the WRITE clusters values — an unsorted
write smears every value range across every file and min/max skipping
degenerates to "read everything". Two layouts:

- :func:`write_range_sorted`: global range partition + in-file sort on
  the hot filter column(s). Best single-column pruning (files own
  disjoint ranges — verified by test against the parquet footers).
- :func:`zorder_value` / :func:`write_zordered`: bit-interleaved
  Z-value over 2+ numeric columns, then range-sort by it. Trades a
  little per-column tightness for locality on EVERY interleaved
  column — the standard multi-dimensional clustering compromise when
  queries filter on several independent columns.

Both are plain writes — no table format required; with Delta in the
session the same frames feed `OPTIMIZE ZORDER BY` instead.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    *,
    num_files: int = 0,
    mode: str = "overwrite",
) -> None:
    """Range-repartition by ``sort_cols`` (sampled range boundaries →
    each output file owns a disjoint value range) and sort within
    files (tight row-group min/max). ``num_files=0`` keeps the
    session's shuffle parallelism."""
    parts = (
        df.repartitionByRange(num_files, *sort_cols)
        if num_files > 0
        else df.repartitionByRange(*sort_cols)
    )
    parts.sortWithinPartitions(*sort_cols).write.mode(mode).parquet(path)


def zorder_value(*cols: Column | str, bits: int = 16) -> Column:
    """Z-order (Morton) value: interleave the top ``bits`` bits of
    each column's 0..2^bits-1 rank-space value. Callers pass columns
    ALREADY scaled to that space (e.g. via ``F.ntile`` or an affine
    rescale); interleaving is pure bit arithmetic — codegen'd, no UDF.
    With k columns the result uses k·bits bits (≤ 63 enforced)."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    k = len(cs)
    if k < 2:
        raise ValueError("zorder_value needs >= 2 columns")
    if k * bits > 63:
        raise ValueError(f"{k} cols x {bits} bits exceeds a signed 64-bit value")
    z = F.lit(0).cast("long")
    for b in range(bits):
        for j, c in enumerate(cs):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * k + j))
    return z


def rank_space(col: Column | str, lo: Column | float, hi: Column | float, *, bits: int = 16) -> Column:
    """Affine rescale of a numeric column into the 0..2^bits-1 Z-order
    rank space (clamped; degenerate lo==hi maps to 0)."""
    c = F.col(col) if isinstance(col, str) else col
    lo_c = F.lit(lo) if not isinstance(lo, Column) else lo
    hi_c = F.lit(hi) if not isinstance(hi, Column) else hi
    span = hi_c - lo_c
    top = (1 << bits) - 1
    scaled = F.when(
        span > 0,
        F.least(
            F.lit(top),
            F.greatest(F.lit(0), F.floor((c - lo_c) / span * top).cast("long")),
        ),
    ).otherwise(F.lit(0).cast("long"))
    return scaled


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    *,
    bits: int = 16,
    num_files: int = 0,
    mode: str = "overwrite",
) -> None:
    """Cluster ``df`` by the Z-value of ``zorder_cols`` (numeric) and
    write parquet. Column ranges for rank-space scaling come from one
    cheap min/max aggregate (driver-side O(cols))."""
    stats = df.agg(
        *[F.min(c).alias(f"__lo_{c}") for c in zorder_cols],
        *[F.max(c).alias(f"__hi_{c}") for c in zorder_cols],
    ).collect()[0]
    ranked = [
        rank_space(c, float(stats[f"__lo_{c}"]), float(stats[f"__hi_{c}"]), bits=bits)
        for c in zorder_cols
    ]
    z = zorder_value(*ranked, bits=bits)
    zdf = df.withColumn("__z", z)
    parts = (
        zdf.repartitionByRange(num_files, "__z")
        if num_files > 0
        else zdf.repartitionByRange("__z")
    )
    parts.sortWithinPartitions("__z").drop("__z").write.mode(mode).parquet(path)


def write_bucketed(
    df,
    table: str,
    *,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] = (),
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Write a managed table hash-bucketed (and optionally sorted) on
    its dominant join/aggregation key. Two tables bucketed on the same
    key with the same bucket count join WITHOUT ANY Exchange — the
    bucket layout IS the shuffle, paid once at write time instead of
    once per query (pinned by tests/test_layout.py, which asserts a
    zero-Exchange sort-merge join plan).

    This is the missing half of the reference's unsorted CTAS
    (`Spatially ETL test.py:237`): at 100 TB, bucketing the fact
    tables on their join key (e.g. orderkey) converts every repeated
    fact-fact join and groupBy on that key from a full-data shuffle
    into a local merge, and bucket pruning serves point lookups.
    ``sort_cols`` additionally orders rows within each bucket file so
    the sort phase of a sort-merge join is also free.

    Note Spark's bucket layout is Spark-native (hash = Murmur3 on the
    bucket columns): Hive/Trino readers see plain files; only Spark
    planners exploit the co-location.
    """
    if num_buckets < 1:
        raise ValueError(f"num_buckets must be >= 1, got {num_buckets}")
    if not bucket_cols:
        raise ValueError("bucket_cols must be non-empty")
    w = df.write.format(fmt).mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def compact_files(
    spark,
    src_path: str,
    dest_path: str,
    *,
    target_mb: int = 128,
    sort_cols: Sequence[str] = (),
    fmt: str = "parquet",
) -> int:
    """Compact a small-file directory into ~``target_mb`` output files
    (returns the file count written). The small-file problem is the
    classic slow killer of streaming/incremental sinks: a micro-batch
    or per-partition append leaves thousands of KB-sized files, and
    every later scan pays a task + footer read per file. Compaction is
    one read → repartition → write; with ``sort_cols`` the rewrite
    also restores range-clustering (pairs with ``write_range_sorted``
    min/max skipping).

    Sizing uses the source's actual on-disk bytes via the Hadoop
    FileSystem API, so it works on any supported filesystem, not just
    local paths. Writes to a NEW directory — atomic swap/rename is the
    caller's (or the table format's) job; an in-place overwrite that
    dies mid-write loses data, so this API refuses to model it.

    At 100 TB this runs per-partition (compact yesterday's partition
    after the last append), not whole-table; the operator is
    deliberately path-scoped for that reason.
    """
    if target_mb < 1:
        raise ValueError(f"target_mb must be >= 1, got {target_mb}")
    jvm = spark._jvm
    jsc = spark._jsc
    conf = jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = path.getFileSystem(conf)
    size_bytes = fs.getContentSummary(path).getLength()
    n_files = max(1, -(-int(size_bytes) // (target_mb * 1024 * 1024)))
    df = spark.read.format(fmt).load(src_path)
    if sort_cols:
        out = df.repartitionByRange(n_files, *[F.col(c) for c in sort_cols])
        out = out.sortWithinPartitions(*sort_cols)
    else:
        out = df.repartition(n_files)
    out.write.format(fmt).mode("error").save(dest_path)
    return n_files


def write_similarity_clustered(
    df: DataFrame,
    path: str,
    *,
    text_col: str = "text",
    num_files: int = 0,
    mode: str = "overwrite",
) -> None:
    """Write text rows ordered by their 64-bit SimHash so near-
    duplicate / same-boilerplate documents land ADJACENT inside row
    groups. General-purpose parquet compression (zstd/snappy) is
    window-local: it only exploits redundancy it can see within the
    compression block, so a corpus whose near-dups are scattered
    compresses each copy from scratch while a similarity-clustered
    order lets every repeated phrase after the first compress to a
    back-reference. Same rows, same schema, same query results —
    only the physical order changes, paid once at write (one
    range-exchange + in-file sort on a single long column).

    SimHash (not MinHash bands) because its Hamming-space locality is
    monotone under integer ordering of the high bits: documents
    sharing their top-k simhash bits sort together without any
    banding tables. The effect compounds at 100 TB: storage, scan
    time, and shuffle-spill all shrink by the compression delta, and
    the row-group min/max on the simhash column double as a crude
    near-dup pruning index.
    """
    from spatially_databricks_etl_spark.operators.dedup import simhash

    keyed = df.withColumn("__simhash", simhash(F.col(text_col)))
    parts = (
        keyed.repartitionByRange(num_files, "__simhash")
        if num_files > 0
        else keyed.repartitionByRange("__simhash")
    )
    (
        parts.sortWithinPartitions("__simhash")
        .drop("__simhash")
        .write.mode(mode)
        .parquet(path)
    )


def shard_by_size(
    df: DataFrame,
    *,
    id_col: str,
    size_col: str,
    n_shards: int,
) -> DataFrame:
    """Balanced output-shard assignment by size — the write-planning
    stage ahead of a sharded training-data export (every shard should
    cost a downstream reader the same: token-balanced shards keep
    data-parallel trainer steps in lockstep; byte-balanced shards keep
    object-store reads even). Classic LPT-flavored snake packing,
    determinized: rows order globally by (size DESC, id ASC); rank r
    goes to shard ``r % n`` on even blocks ``r div n`` and to the
    mirrored shard on odd blocks (boustrophedon), so each full block
    hands every shard exactly one row and consecutive blocks cancel
    each other's within-block skew. Shard totals stay within one
    max-row-size of each other for size-sorted input — the bound the
    snake buys over plain round-robin.

    Returns (id_col, size, shard) — shard in [0, n_shards).

    Scale shape: NO single-partition window. The global order is a
    range Exchange (repartitionByRange + sortWithinPartitions — the
    same machinery as a distributed ORDER BY); global ranks are
    per-partition row_numbers plus partition offsets from a
    #partitions-row count manifest (bounded metadata, the classic
    distributed-ranking construction). The only data-sized movement
    is the one range shuffle. The oracle replays the identical
    assignment with a plain ROW_NUMBER — the result depends only on
    the total order, not on how it was computed."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    from spatially_databricks_etl_spark.operators.relational import (
        distributed_row_number,
    )

    src = df.select(
        F.col(id_col).alias("__id"), F.col(size_col).cast("long").alias("size")
    )
    ranked = distributed_row_number(
        src, [F.desc("size"), F.asc("__id")], rank_col="__rk"
    )
    n = int(n_shards)
    shard = F.expr(
        f"CAST(CASE WHEN (__rk div {n}) % 2 = 0 THEN __rk % {n} "
        f"ELSE {n} - 1 - (__rk % {n}) END AS BIGINT)"
    )
    return ranked.select(
        F.col("__id").alias(id_col), "size", shard.alias("shard")
    )
