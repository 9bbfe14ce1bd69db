"""Data-layout writes: the parquet footers must PROVE skippability —
disjoint per-file ranges after a range-sorted write, and tighter
per-file spans on every interleaved column after a Z-ordered write.
These read the footers with pyarrow, not Spark, so the assertion is
about what ANY engine can skip, not about one plan."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from spatially_databricks_etl_spark.session import load_table
from spatially_databricks_etl_spark.sinks.layout import (
    write_range_sorted,
    write_zordered,
    zorder_value,
)
from tests.conftest import SF_DIR


def _file_ranges(path: str, col: str) -> list[tuple]:
    out = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or st.min is None:
                continue
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if lo is not None:
            out.append((lo, hi))
    return out


def test_range_sorted_write_produces_disjoint_file_ranges(spark, tmp_path):
    li = load_table(spark, SF_DIR, "lineitem")
    path = str(tmp_path / "li_sorted")
    write_range_sorted(li, path, ["l_shipdate"], num_files=8)

    ranges = sorted(_file_ranges(path, "l_shipdate"))
    assert len(ranges) >= 4
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges: {hi1} > {lo2}"

    # a narrow predicate must qualify only a strict minority of files
    lo_all, hi_all = ranges[0][0], ranges[-1][1]
    probe = ranges[0][1]  # a value inside the first file's range
    qualifying = [r for r in ranges if r[0] <= probe <= r[1]]
    assert len(qualifying) <= 2, "narrow predicate should prune most files"


def test_zordered_write_tightens_both_columns(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").select("user_id", "value", "event_type")
    path = str(tmp_path / "ev_z")
    write_zordered(ev, path, ["user_id", "value"], bits=12, num_files=8)

    stats = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).collect()[0]
    glob_span = {
        "user_id": float(stats[1] - stats[0]),
        "value": float(stats[3] - stats[2]),
    }
    for col in ("user_id", "value"):
        ranges = _file_ranges(path, col)
        assert len(ranges) >= 4
        mean_span = sum(float(hi - lo) for lo, hi in ranges) / len(ranges)
        # interleaving trades per-column tightness for locality on ALL
        # columns — every column's average file span must still be
        # clearly below the global span (unsorted writes sit at ~1.0)
        assert mean_span < 0.8 * glob_span[col], (col, mean_span, glob_span[col])


def test_zorder_value_validates_inputs(spark):
    import pytest

    with pytest.raises(ValueError, match=">= 2"):
        zorder_value("a")
    with pytest.raises(ValueError, match="64-bit"):
        zorder_value("a", "b", "c", "d", bits=16)


def test_bucketed_tables_join_without_exchange(spark):
    """Two tables bucketed on the same key must sort-merge join with
    ZERO Exchange in the plan (the write-time layout replaces the
    shuffle), and the result must equal the plain join."""
    from spatially_databricks_etl_spark.plans.explain import explain_str
    from spatially_databricks_etl_spark.sinks.layout import write_bucketed

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    write_bucketed(li, "bkt_li", bucket_cols=["l_orderkey"], num_buckets=8,
                   sort_cols=["l_orderkey"])
    write_bucketed(orders, "bkt_orders", bucket_cols=["o_orderkey"], num_buckets=8,
                   sort_cols=["o_orderkey"])
    try:
        bl = spark.table("bkt_li")
        bo = spark.table("bkt_orders")
        with_conf = {
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        }
        old = {k: spark.conf.get(k, None) for k in with_conf}
        for k, v in with_conf.items():
            spark.conf.set(k, v)
        try:
            joined = bl.join(bo, bl.l_orderkey == bo.o_orderkey).groupBy(
                "o_orderkey"
            ).agg(F.sum("l_quantity").alias("q"))
            plan = explain_str(joined)
            assert "SortMergeJoin" in plan, plan
            assert "Exchange" not in plan, plan
            # correctness vs the unbucketed join
            expect = (
                li.join(orders, li.l_orderkey == orders.o_orderkey)
                .groupBy("o_orderkey")
                .agg(F.sum("l_quantity").alias("q"))
            )
            got = {(r.o_orderkey, round(r.q, 6)) for r in joined.collect()}
            want = {(r.o_orderkey, round(r.q, 6)) for r in expect.collect()}
            assert got == want
        finally:
            for k, v in old.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_li")
        spark.sql("DROP TABLE IF EXISTS bkt_orders")


def test_write_bucketed_validates_params(spark):
    import pytest as _pytest

    from spatially_databricks_etl_spark.sinks.layout import write_bucketed

    df = spark.range(3)
    with _pytest.raises(ValueError, match="num_buckets"):
        write_bucketed(df, "t", bucket_cols=["id"], num_buckets=0)
    with _pytest.raises(ValueError, match="bucket_cols"):
        write_bucketed(df, "t", bucket_cols=[], num_buckets=4)


def test_compact_files_reduces_count_and_preserves_rows(spark, tmp_path):
    from spatially_databricks_etl_spark.sinks.layout import compact_files

    src = str(tmp_path / "small_files")
    dest = str(tmp_path / "compacted")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    li.repartition(64).write.parquet(src)
    import glob

    assert len(glob.glob(f"{src}/part-*")) == 64
    n = compact_files(spark, src, dest, target_mb=128, sort_cols=["l_orderkey"])
    out_files = glob.glob(f"{dest}/part-*")
    assert len(out_files) == n <= 4
    before = spark.read.parquet(src).groupBy().agg(
        F.count("*").alias("c"), F.sum("l_quantity").alias("s")
    ).collect()[0]
    after = spark.read.parquet(dest).groupBy().agg(
        F.count("*").alias("c"), F.sum("l_quantity").alias("s")
    ).collect()[0]
    assert (before.c, round(before.s, 6)) == (after.c, round(after.s, 6))


def test_compact_files_refuses_overwrite_and_bad_target(spark, tmp_path):
    import pytest as _pytest

    from spatially_databricks_etl_spark.sinks.layout import compact_files

    src = str(tmp_path / "src2")
    spark.range(10).write.parquet(src)
    with _pytest.raises(ValueError, match="target_mb"):
        compact_files(spark, src, str(tmp_path / "d"), target_mb=0)
    dest = str(tmp_path / "dest2")
    compact_files(spark, src, dest)
    with _pytest.raises(Exception):
        compact_files(spark, src, dest)  # mode("error"): no silent clobber


def test_similarity_clustered_write_compresses_better(spark, tmp_path):
    """Same rows written in similarity order must compress at least as
    well as a similarity-hostile order (near-dups round-robin
    scattered), and the content must round-trip identically. The
    fixture documents carry organic near-dup groups, so the clustered
    order has real redundancy to exploit."""
    import os

    from spatially_databricks_etl_spark.sinks.layout import (
        write_similarity_clustered,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")

    def tree_bytes(p):
        return sum(
            os.path.getsize(os.path.join(root, f))
            for root, _, files in os.walk(p)
            for f in files
            if f.endswith(".parquet")
        )

    clustered = str(tmp_path / "clustered")
    scattered = str(tmp_path / "scattered")
    write_similarity_clustered(docs, clustered, num_files=2)
    # hostile order: hash-scatter so near-dup twins land apart
    (
        docs.withColumn("__r", F.xxhash64("doc_id"))
        .repartitionByRange(2, "__r")
        .sortWithinPartitions("__r")
        .drop("__r")
        .write.mode("overwrite")
        .parquet(scattered)
    )
    got = {(r["doc_id"], r["text"]) for r in spark.read.parquet(clustered).collect()}
    want = {(r["doc_id"], r["text"]) for r in docs.collect()}
    assert got == want
    cb, sb = tree_bytes(clustered), tree_bytes(scattered)
    assert cb <= sb, f"clustered {cb} > scattered {sb}"


def test_versioned_table_time_travel_diff_and_vacuum(spark, tmp_path):
    """Versioned-table contract: each write publishes an immutable
    snapshot behind a manifest flip; reads resolve latest or any
    pinned version; versioned_diff equals snapshot_diff over the same
    two frames; vacuum drops old snapshots physically and pinned reads
    of them fail loudly while latest keeps working."""
    import pytest

    from spatially_databricks_etl_spark.operators.relational import snapshot_diff
    from spatially_databricks_etl_spark.sinks.versioned import (
        versioned_diff,
        versioned_read,
        versioned_vacuum,
        versioned_write,
    )

    path = str(tmp_path / "vt")
    v1_df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k int, name string, amt double"
    )
    v2_df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 25.0), (4, "d", 40.0)], "k int, name string, amt double"
    )
    assert versioned_write(v1_df, path) == 1
    assert versioned_write(v2_df, path) == 2

    assert {tuple(r) for r in versioned_read(spark, path).collect()} == {
        tuple(r) for r in v2_df.collect()
    }
    assert {tuple(r) for r in versioned_read(spark, path, version=1).collect()} == {
        tuple(r) for r in v1_df.collect()
    }

    got = {
        (r["k"], r["op"])
        for r in versioned_diff(
            spark, path, key_cols=["k"], from_version=1, to_version=2
        ).collect()
    }
    want = {
        (r["k"], r["op"])
        for r in snapshot_diff(v1_df, v2_df, key_cols=["k"]).collect()
    }
    assert got == want == {(2, "U"), (3, "D"), (4, "I")}

    v3_df = v2_df.withColumn("amt", v2_df["amt"] * 2)
    assert versioned_write(v3_df, path) == 3
    dropped = versioned_vacuum(spark, path, keep_last=2)
    assert dropped == [1]
    with pytest.raises(ValueError, match="vacuumed"):
        versioned_read(spark, path, version=1)
    assert versioned_read(spark, path, version=2).count() == 3
    assert versioned_read(spark, path).count() == 3

    with pytest.raises(ValueError, match="no manifest"):
        versioned_read(spark, str(tmp_path / "missing"))


def test_versioned_write_concurrent_writer_fails_loudly(spark, tmp_path, monkeypatch):
    """Optimistic-concurrency contract (VERDICT r10 item 5): when a
    second writer commits between this writer's manifest read and its
    commit point, the loser raises ConcurrentWriteError instead of
    silently clobbering the winner — and the winner's snapshot and
    pointer are untouched. Also pins the fs-level arbiter (an already-
    existing target snapshot directory fails the commit even when the
    manifest check passes) and vacuum's orphaned-staging cleanup."""
    import os

    import pytest

    import spatially_databricks_etl_spark.sinks.versioned as V

    path = str(tmp_path / "vt_race")
    v1_df = spark.createDataFrame([(1, "a")], "k int, name string")
    assert V.versioned_write(v1_df, path) == 1

    # interleaving: the loser's initial manifest read happened BEFORE
    # the winner committed v=1 — simulate by making the first
    # _read_manifest call return the stale (empty) state
    real = V._read_manifest
    calls = {"n": 0}

    def stale_first(s, p):
        calls["n"] += 1
        if calls["n"] == 1:
            return {"version": 0, "versions": []}
        return real(s, p)

    monkeypatch.setattr(V, "_read_manifest", stale_first)
    loser_df = spark.createDataFrame([(9, "z")], "k int, name string")
    with pytest.raises(V.ConcurrentWriteError, match="version moved"):
        V.versioned_write(loser_df, path)
    monkeypatch.setattr(V, "_read_manifest", real)

    # winner untouched, loser's staging removed
    assert {tuple(r) for r in V.versioned_read(spark, path).collect()} == {(1, "a")}
    snaps = os.path.join(path, "_snapshots")
    assert not [n for n in os.listdir(snaps) if n.startswith(".staging-")]

    # fs-level arbiter: target snapshot dir already exists (a racer in
    # the final window, manifest not yet flipped) -> loud failure
    os.makedirs(os.path.join(snaps, "v=2"))
    with pytest.raises(V.ConcurrentWriteError):
        V.versioned_write(loser_df, path)
    os.rmdir(os.path.join(snaps, "v=2"))

    # a subsequent clean write commits normally...
    assert V.versioned_write(loser_df, path) == 2
    assert {tuple(r) for r in V.versioned_read(spark, path).collect()} == {(9, "z")}

    # ...and vacuum clears an orphaned staging directory a crashed
    # writer left behind — but ONLY past the grace period: a FRESH
    # .staging-* is a live writer mid-stage (ADVICE r11)
    orphan = os.path.join(snaps, ".staging-deadbeef")
    os.makedirs(orphan)
    V.versioned_vacuum(spark, path, keep_last=2)
    assert os.path.isdir(orphan), "fresh staging must survive vacuum"
    os.utime(orphan, (1, 1))  # backdate: now a crash orphan
    V.versioned_vacuum(spark, path, keep_last=2)
    assert not [n for n in os.listdir(snaps) if n.startswith(".staging-")]


def test_versioned_vacuum_never_eats_concurrent_commit(spark, tmp_path):
    """ADVICE r11: vacuum racing a writer must not delete a snapshot
    that committed (or is mid-commit: renamed to ``v=N``, manifest
    flip pending) after vacuum's entry manifest read, and its final
    manifest rewrite must not erase a commit that landed mid-vacuum.
    Simulated at the fs level: a ``v=N+1`` directory NEWER than the
    entry manifest — fresh → survives either way (grace period);
    listed in a manifest re-read → survives regardless of age;
    unlisted AND past the grace period → crashed-commit orphan,
    removed."""
    import os

    import spatially_databricks_etl_spark.sinks.versioned as V

    path = str(tmp_path / "vt_vacrace")
    for i in range(3):
        V.versioned_write(
            spark.createDataFrame([(i, "x")], "k int, name string"), path
        )
    snaps = os.path.join(path, "_snapshots")

    # a concurrent writer renamed its staging to v=4 but has not yet
    # flipped the manifest (entry manifest: version=3, versions=[1,2,3])
    inflight = os.path.join(snaps, "v=4")
    os.makedirs(inflight)
    dropped = V.versioned_vacuum(spark, path, keep_last=1)
    assert dropped == [1, 2]
    assert os.path.isdir(inflight), "fresh in-flight commit must survive"

    # the writer completes: manifest now lists v=4 — vacuum must keep
    # the directory even when it is old, and keep it in the manifest
    os.utime(inflight, (1, 1))
    m = V._read_manifest(spark, path)
    V._write_manifest(
        spark, path, {"version": 4, "versions": sorted({*m["versions"], 4})}
    )
    V.versioned_vacuum(spark, path, keep_last=1)
    assert os.path.isdir(inflight)
    m2 = V._read_manifest(spark, path)
    assert m2["version"] == 4 and 4 in m2["versions"]

    # a stale UNLISTED v-dir older than the grace period is the
    # crashed rename->flip orphan — that one goes
    orphan = os.path.join(snaps, "v=9")
    os.makedirs(orphan)
    os.utime(orphan, (1, 1))
    V.versioned_vacuum(spark, path, keep_last=1)
    assert not os.path.isdir(orphan)
    # ...while a FRESH unlisted one (mid-commit right now) stays
    fresh = os.path.join(snaps, "v=10")
    os.makedirs(fresh)
    V.versioned_vacuum(spark, path, keep_last=1)
    assert os.path.isdir(fresh)


def test_retry_versioned_write_loser_loop(spark, tmp_path, monkeypatch):
    """retry_versioned_write re-invokes on ConcurrentWriteError with a
    FRESH manifest read each time (the loser's staging was removed),
    and propagates after the retry budget."""
    import pytest

    import spatially_databricks_etl_spark.sinks.versioned as V

    path = str(tmp_path / "vt_retry")
    df = spark.createDataFrame([(1, "a")], "k int, name string")
    assert V.versioned_write(df, path) == 1

    real = V._read_manifest
    fails = {"n": 2}

    def stale_sometimes(s_, p_):
        m = real(s_, p_)
        if fails["n"] > 0 and m is not None:
            fails["n"] -= 1
            return {"version": int(m["version"]) - 1, "versions": m["versions"]}
        return m

    # every ENTRY read is stale twice -> two losses, then a clean win
    monkeypatch.setattr(V, "_read_manifest", stale_sometimes)
    assert V.retry_versioned_write(df, path, retries=3) == 2
    monkeypatch.setattr(V, "_read_manifest", real)
    assert V.versioned_read(spark, path).count() == 1

    def always_lose(df_, path_):
        raise V.ConcurrentWriteError("contended")

    monkeypatch.setattr(V, "versioned_write", always_lose)
    with pytest.raises(V.ConcurrentWriteError):
        V.retry_versioned_write(df, path, retries=2)


def test_shard_by_size_snake_replay_and_balance(spark):
    """shard_by_size ≡ a Python snake-packing replay on the
    (size DESC, id ASC) order; shard token totals stay tight (within
    one max row size); every row assigned exactly once; n_shards=1
    degenerates to all-zero."""
    from spatially_databricks_etl_spark.sinks.layout import shard_by_size

    rows = [(i, 7 + (i * 137) % 500) for i in range(997)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    n = 8
    got = {
        r["doc_id"]: (r["size"], r["shard"])
        for r in shard_by_size(
            df, id_col="doc_id", size_col="n_tok", n_shards=n
        ).collect()
    }
    ordered = sorted(rows, key=lambda t: (-t[1], t[0]))
    want = {}
    for rk, (did, sz) in enumerate(ordered):
        off = rk % n
        want[did] = (sz, off if (rk // n) % 2 == 0 else n - 1 - off)
    assert got == want
    totals = [0] * n
    for sz, sh in got.values():
        totals[sh] += sz
    assert max(totals) - min(totals) <= max(sz for _, sz in rows)

    one = shard_by_size(df, id_col="doc_id", size_col="n_tok", n_shards=1)
    assert {r["shard"] for r in one.collect()} == {0}


def test_shard_by_size_distributed_rank_consistency(spark):
    """The distributed ranking (range Exchange + offset manifest) must
    produce a PERMUTATION of 0..N-1 ranks — i.e. each (block, offset)
    pair is hit exactly once — even with heavy duplicate sizes, where
    only the id tiebreak orders rows."""
    from spatially_databricks_etl_spark.sinks.layout import shard_by_size

    df = spark.range(0, 4096).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).alias("sz")
    )
    out = shard_by_size(df, id_col="doc_id", size_col="sz", n_shards=7)
    counts = {r["shard"]: r["n"] for r in out.groupBy("shard").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == set(range(7))
    # 4096 = 7*585 + 1: six shards get 585, one gets 586
    assert sorted(counts.values()) == [585] * 6 + [586]


def test_partitioned_index_writes_avoid_small_file_storms(spark, tmp_path):
    """Guide §6: every partitioned index write repartitions by the
    partition column first, so a directory holds one writer-task file
    group — not one file per upstream task (the 32-task local input
    would otherwise fan a tasks×dirs storm into every directory)."""
    from spatially_databricks_etl_spark.operators.dedup import minhash_write_index
    from spatially_databricks_etl_spark.operators.similarity import ivf_write_index

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("the quick brown fox jumps over the lazy dog number "),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    mh = str(tmp_path / "mh_idx")
    minhash_write_index(docs, mh, hash_buckets=8)
    checked = 0
    for store in ("bands", "shingles"):
        for d in glob.glob(f"{mh}/{store}/__*b=*"):
            files = glob.glob(f"{d}/*.parquet")
            assert len(files) <= 2, (d, len(files))
            checked += 1
    assert checked >= 8  # both stores actually produced directories

    vecs = spark.range(256).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 17).cast("float"), (F.col("id") % 5).cast("float")
        ).alias("embedding"),
    ).repartition(16)
    iv = str(tmp_path / "ivf_idx")
    ivf_write_index(vecs, iv, centroids=[[0.0, 1.0], [16.0, 2.0]])
    cells = glob.glob(f"{iv}/__cell=*")
    assert cells
    for d in cells:
        files = glob.glob(f"{d}/*.parquet")
        assert len(files) <= 2, (d, len(files))
