"""Sources (csv/json/REST-paginated) and Structured Streaming tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from spatially_databricks_etl_spark.session import load_table
from spatially_databricks_etl_spark.sources.files import read_csv, read_json
from spatially_databricks_etl_spark.sources.rest import fetch_paginated_to_df
from spatially_databricks_etl_spark.streaming.windows import (
    session_window_agg,
    stream_dedup,
    tumbling_window_agg,
)


def test_read_csv_all_string_parity(spark, tmp_path):
    # reference parity: header-only read → every column string
    p = tmp_path / "data.csv"
    p.write_text("a,b\n1,x\n2,y\n")
    df = read_csv(spark, str(p))
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["string", "string"]
    assert df.count() == 2


def test_read_csv_explicit_schema(spark, tmp_path):
    p = tmp_path / "data2.csv"
    p.write_text("a,b\n1,x\n~,y\n")  # '~' sentinel → null on typed read
    df = read_csv(spark, str(p), schema="a int, b string")
    rows = {r["b"]: r["a"] for r in df.collect()}
    assert rows == {"x": 1, "y": None}


def test_read_json_lines(spark, tmp_path):
    p = tmp_path / "data.jsonl"
    p.write_text('{"k": 1, "geo": {"lat": 1.5}}\n{"k": 2, "geo": {"lat": 2.5}}\n')
    df = read_json(spark, str(p), schema="k long, geo struct<lat:double>")
    assert df.select(F.sum("geo.lat")).collect()[0][0] == 4.0


def test_fetch_paginated_distributed(spark):
    # fake Socrata API: 25 records in pages of 10
    def fake_fetch(base_url, limit, offset):
        n = min(limit, 25 - offset)
        return [{"id": offset + i, "v": f"r{offset + i}"} for i in range(n)]

    df = fetch_paginated_to_df(
        spark,
        "http://fake",
        limit=10,
        total_records=25,
        schema="id long, v string",
        fetch_page=fake_fetch,
    )
    rows = df.collect()
    assert len(rows) == 25
    assert {r["id"] for r in rows} == set(range(25))


def test_fetch_paginated_failure_surfaces(spark):
    def bad_fetch(base_url, limit, offset):
        raise RuntimeError("boom")

    df = fetch_paginated_to_df(
        spark, "http://fake", limit=10, total_records=10,
        schema="id long", fetch_page=bad_fetch,
    )
    with pytest.raises(Exception, match="boom"):
        df.collect()


def test_tumbling_window_stream_matches_batch(spark, tmp_path):
    # batch-parity contract: the SAME builder over readStream must
    # produce the same rows as over the batch frame
    ev = load_table(spark, SF_DIR, "events")
    src = str(tmp_path / "stream_src")
    ev.write.parquet(src)
    batch_out = {tuple(r) for r in tumbling_window_agg(ev).collect()}

    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 2).parquet(src)
    )
    agg = tumbling_window_agg(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_out = {tuple(r) for r in spark.sql("select * from tumbling_test").collect()}
    assert stream_out == batch_out


def test_session_window_batch(spark):
    ev = load_table(spark, SF_DIR, "events")
    out = session_window_agg(ev, gap="30 minutes", key_col="user_id")
    assert out.count() > 0
    # sessions for one user must not overlap
    rows = sorted(
        out.filter(F.col("user_id") == 1).collect(), key=lambda r: r["session_start"]
    )
    for a, b in zip(rows, rows[1:]):
        assert a["session_end"] <= b["session_start"]


def test_stream_dedup_batch_path(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b")], ["event_id", "v"]
    ).withColumn("ts", F.current_timestamp())
    out = stream_dedup(df, ["event_id"])
    assert out.count() == 2


def test_stateful_running_totals_stream_matches_batch(spark, tmp_path):
    from spatially_databricks_etl_spark.streaming.stateful import (
        running_totals_stateful,
    )

    ev = load_table(spark, SF_DIR, "events")
    src = str(tmp_path / "stateful_src")
    ev.write.parquet(src)
    batch_out = {tuple(r) for r in running_totals_stateful(ev).collect()}

    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 2).parquet(src)
    )
    out = running_totals_stateful(stream)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("stateful_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode emits one row per key per micro-batch; running
    # totals are monotone, so the max-n_events row per key is the
    # final state — must equal the batch agg (order-independent)
    final = {}
    for r in spark.sql("select * from stateful_totals").collect():
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur[1]:
            final[r["user_id"]] = (r["user_id"], r["n_events"], round(r["sum_value"], 4))
    assert set(final.values()) == batch_out


def test_foreach_batch_writer(spark, tmp_path):
    from spatially_databricks_etl_spark.streaming.stateful import foreach_batch_writer

    ev = load_table(spark, SF_DIR, "events").limit(50)
    src = str(tmp_path / "fb_src")
    sink = str(tmp_path / "fb_sink")
    ev.write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        stream.writeStream.foreachBatch(foreach_batch_writer(sink))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(sink)
    assert got.count() == ev.count()
    assert "__batch_id" in got.columns


def test_foreach_batch_writer_replay_is_idempotent(spark, tmp_path):
    """Re-running the same batch_id (a post-failure replay) must
    REPLACE that batch's partition, not append a duplicate copy."""
    from spatially_databricks_etl_spark.streaming.stateful import foreach_batch_writer

    sink = str(tmp_path / "fb_idem")
    write = foreach_batch_writer(sink)
    b0 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    b1 = spark.createDataFrame([(3, "c")], "id long, v string")
    write(b0, 0)
    write(b1, 1)
    write(b0, 0)  # replay of batch 0
    got = spark.read.parquet(sink)
    assert got.count() == 3
    assert sorted(r["id"] for r in got.collect()) == [1, 2, 3]


def test_watermark_drops_late_data(spark, tmp_path):
    """Late rows behind the watermark must be excluded from finalized
    windows (append mode emits only watermark-closed windows)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    on_time = [(1, base + dt.timedelta(hours=h), "a", 1.0) for h in range(6)]
    more = [(2, base + dt.timedelta(hours=6), "a", 1.0)]
    # hours late relative to the max event time seen two batches prior
    late = [(99, base + dt.timedelta(minutes=30), "a", 100.0)]
    schema = "event_id long, ts timestamp, event_type string, value double"
    src = str(tmp_path / "late_src")
    # one file per micro-batch; the watermark computed from a batch
    # takes effect one batch later, so the late row goes in batch 3
    spark.createDataFrame(on_time, schema).coalesce(1).write.parquet(src + "/b1")
    spark.createDataFrame(more, schema).coalesce(1).write.parquet(src + "/b2")
    spark.createDataFrame(late, schema).coalesce(1).write.parquet(src + "/b3")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b*")
    )
    agg = tumbling_window_agg(stream, window_duration="1 hour", watermark="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("late_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from late_test").collect()
    first_window = [r for r in rows if r["window_start"] == base]
    # the late value=100 row lands in the first window only if it was
    # admitted; watermark (max_ts - 1h = 04:00) must have dropped it
    assert all(r["sum_value"] == 1.0 for r in first_window)


def test_stream_dedup_within_watermark_real_stream(spark, tmp_path):
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, base, "a", 1.0),
        (1, base + dt.timedelta(minutes=5), "a", 1.0),  # dup key, in-watermark
        (2, base + dt.timedelta(minutes=10), "b", 2.0),
    ]
    schema = "event_id long, ts timestamp, event_type string, value double"
    src = str(tmp_path / "dd_src")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    out = stream_dedup(stream, ["event_id"], watermark="1 hour")
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("dd_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["event_id"] for r in spark.sql("select * from dd_test").collect())
    assert got == [1, 2]


def test_user_features_tws_stream_matches_batch(spark, tmp_path):
    # the transformWithState driver worker speaks protobuf to the JVM;
    # without the protobuf package only the batch path is runnable
    pytest.importorskip("google.protobuf")
    from spatially_databricks_etl_spark.streaming.stateful import (
        user_features_stateful,
    )

    ev = load_table(spark, SF_DIR, "events")
    src = str(tmp_path / "tws_src")
    ev.write.parquet(src)
    batch_out = {tuple(r) for r in user_features_stateful(ev).collect()}

    # transformWithState requires the RocksDB state store provider
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(src)
        )
        out = user_features_stateful(stream)
        assert out.isStreaming
        q = (
            out.writeStream.format("memory")
            .queryName("tws_features")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    final = {}
    for r in spark.sql("select * from tws_features").collect():
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur[1]:
            final[r["user_id"]] = (
                r["user_id"],
                r["n_events"],
                round(r["sum_value"], 4),
                round(r["max_value"], 4),
                round(r["min_value"], 4),
            )
    assert set(final.values()) == batch_out


def test_user_features_batch_path(spark):
    from spatially_databricks_etl_spark.streaming.stateful import (
        user_features_stateful,
    )

    ev = load_table(spark, SF_DIR, "events")
    out = {r["user_id"]: r for r in user_features_stateful(ev).collect()}
    exact = {
        r["user_id"]: r
        for r in ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("s"),
            F.round(F.max("value"), 4).alias("mx"),
            F.round(F.min("value"), 4).alias("mn"),
        )
        .collect()
    }
    assert set(out) == set(exact)
    for k, r in out.items():
        e = exact[k]
        assert (r["n_events"], r["sum_value"], r["max_value"], r["min_value"]) == (
            e["n"], e["s"], e["mx"], e["mn"]
        )


def test_read_orc_roundtrip(spark, tmp_path):
    from spatially_databricks_etl_spark.sources.files import read_orc

    src = load_table(spark, SF_DIR, "nation")
    p = str(tmp_path / "nation_orc")
    src.write.orc(p)
    back = read_orc(spark, p)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in src.collect()}
    # pruning contract: explicit schema narrows the scan
    two = read_orc(spark, p, schema="n_nationkey bigint, n_name string")
    assert two.columns == ["n_nationkey", "n_name"]


def test_read_text_lines_and_whole(spark, tmp_path):
    from spatially_databricks_etl_spark.sources.files import read_text

    p = tmp_path / "docs"
    p.mkdir()
    (p / "a.txt").write_text("line1\nline2\n")
    (p / "b.txt").write_text("solo\n")
    lines = read_text(spark, str(p))
    assert sorted(r["value"] for r in lines.collect()) == ["line1", "line2", "solo"]
    whole = read_text(spark, str(p), whole_text=True)
    assert sorted(r["value"] for r in whole.collect()) == ["line1\nline2\n", "solo\n"]


def test_read_xml_roundtrip(spark, tmp_path):
    """Spark 4's native XML source: schema-explicit read returns the
    written rows (attributes and nested elements both land), and the
    schemaless read infers the same values."""
    from spatially_databricks_etl_spark.sources.files import read_xml

    df = spark.createDataFrame(
        [(1, "alpha", 1.5), (2, "<&beta>", -2.0)], "id long, name string, score double"
    )
    p = str(tmp_path / "xmlsrc")
    (
        df.write.format("xml")
        .option("rootTag", "rows")
        .option("rowTag", "row")
        .save(p)
    )
    got = read_xml(
        spark, p, row_tag="row", schema="id long, name string, score double"
    )
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in df.collect()}
    inferred = read_xml(spark, p, row_tag="row")
    assert {(r["id"], r["name"]) for r in inferred.collect()} == {
        (1, "alpha"),
        (2, "<&beta>"),
    }


def test_read_binary_files(spark, tmp_path):
    from spatially_databricks_etl_spark.sources.files import read_binary_files

    p = tmp_path / "blobs"
    p.mkdir()
    (p / "x.bin").write_bytes(b"\x00\x01\x02")
    (p / "y.txt").write_bytes(b"hello")
    df = read_binary_files(spark, str(p))
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {"x.bin", "y.txt"}
    assert bytes(rows["x.bin"]["content"]) == b"\x00\x01\x02"
    assert rows["y.txt"]["length"] == 5
    only_bin = read_binary_files(spark, str(p), glob="*.bin")
    assert only_bin.count() == 1


def test_interval_join_stream_matches_batch(spark, tmp_path):
    """Stream-stream interval join with watermarks on both sides must
    emit exactly the batch join's pairs once all files are processed
    (availableNow drains the source; append mode emits joined rows as
    the watermark passes)."""
    from spatially_databricks_etl_spark.streaming.joins import interval_join

    ev = load_table(spark, SF_DIR, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("l_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("r_ts")
    )
    batch = {
        (r["user_id"], r["click_id"], r["purchase_id"])
        for r in interval_join(
            clicks, purchases, key="user_id", within="1 hour"
        ).collect()
    }

    lsrc, rsrc = str(tmp_path / "ij_left"), str(tmp_path / "ij_right")
    clicks.write.parquet(lsrc)
    purchases.write.parquet(rsrc)
    ls = spark.readStream.schema(clicks.schema).option("maxFilesPerTrigger", 2).parquet(lsrc)
    rs = spark.readStream.schema(purchases.schema).option("maxFilesPerTrigger", 2).parquet(rsrc)
    out = interval_join(ls, rs, key="user_id", within="1 hour", watermark="2 hours")
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("ij_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["click_id"], r["purchase_id"])
        for r in spark.sql("select user_id, click_id, purchase_id from ij_test").collect()
    }
    assert got == batch


def test_load_table_normalizes_events_ts_to_ltz(spark):
    """events.ts must come back as TimestampType regardless of the
    fixture's physical encoding (nanos-long or TIMESTAMP_NTZ) — a
    watermark on an NTZ column hard-fails, and the failure only shows
    up in streaming paths, so pin the batch contract here."""
    from pyspark.sql.types import TimestampType

    ev = load_table(spark, SF_DIR, "events")
    assert isinstance(ev.schema["ts"].dataType, TimestampType)
    # and the streaming builders accept an NTZ frame anyway
    from spatially_databricks_etl_spark.streaming.windows import ensure_event_time

    ntz = ev.select(F.col("ts").cast("timestamp_ntz").alias("ts"), "event_type", "value")
    fixed = ensure_event_time(ntz, "ts")
    assert isinstance(fixed.schema["ts"].dataType, TimestampType)


def test_foreach_batch_writer_rejects_non_file_formats():
    """Formats that ignore per-write partitionOverwriteMode would turn
    every replay into a full-sink truncate — reject them loudly."""
    import pytest
    from spatially_databricks_etl_spark.streaming.stateful import foreach_batch_writer

    with pytest.raises(ValueError, match="dynamic partition overwrite"):
        foreach_batch_writer("/tmp/x", fmt="jdbc")
    with pytest.raises(ValueError, match="keyed-upsert"):
        foreach_batch_writer("/tmp/x", fmt="delta")


def test_latest_state_stream_matches_batch_under_out_of_order(spark, tmp_path):
    """The streaming CDC state must converge to latest-BY-SEQ per
    entity even when changes ARRIVE out of order across micro-batches
    (file order is not seq order here), including tombstones."""
    from spatially_databricks_etl_spark.streaming.stateful import (
        latest_state_stateful,
    )

    rows = [
        # entity 1: arrival order I(seq 1) -> U(seq 3) -> stale U(seq 2)
        (1, 1, "I", "O", 10.0),
        (1, 3, "U", "F", 30.0),
        (1, 2, "U", "O", 20.0),   # late, must NOT win
        # entity 2: delete arrives before a stale insert
        (2, 9, "D", None, None),
        (2, 4, "I", "O", 4.0),    # late, must NOT resurrect
        # entity 3: single insert
        (3, 5, "I", "P", 5.0),
    ]
    log = spark.createDataFrame(
        rows, "entity_id: bigint, seq: bigint, op: string, status: string, amount: double"
    )
    batch_out = {tuple(r) for r in latest_state_stateful(log).collect()}
    assert batch_out == {
        (1, 3, "U", "F", 30.0),
        (2, 9, "D", None, None),
        (3, 5, "I", "P", 5.0),
    }

    src = str(tmp_path / "cdc_src")
    # one file per row, written in ARRIVAL order; maxFilesPerTrigger=1
    # forces one change per micro-batch in that order
    for i, r in enumerate(rows):
        spark.createDataFrame([r], log.schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(log.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = latest_state_stateful(stream)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("cdc_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    final = {}
    for r in spark.sql("select * from cdc_state").collect():
        cur = final.get(r["entity_id"])
        if cur is None or r["last_seq"] > cur[1]:
            final[r["entity_id"]] = tuple(r)
    assert set(final.values()) == batch_out


def test_streaming_incremental_rollup_end_to_end(spark, tmp_path):
    """Stream micro-batches -> partial_aggregate -> idempotent
    batch_id-partitioned partial store -> merge-on-read rollup. The
    merged rollup must equal the one-shot batch recompute after >=2
    real micro-batches, and must be UNCHANGED after a replayed
    (duplicate batch_id, identical content) micro-batch — the
    checkpoint-recovery contract the __batch_id overwrite encodes."""
    from spatially_databricks_etl_spark.operators.relational import partial_aggregate
    from spatially_databricks_etl_spark.streaming.stateful import (
        incremental_rollup_sink,
        read_merged_rollup,
    )

    keys = ["event_type"]
    measures = {
        "n_events": ("*", "count"),
        "sum_value": ("value", "sum"),
        "max_value": ("value", "max"),
    }
    merges = {"n_events": "count", "sum_value": "sum", "max_value": "max"}

    ev = load_table(spark, SF_DIR, "events").select("event_type", "value")
    src = str(tmp_path / "roll_src")
    sink = str(tmp_path / "roll_sink")
    ev.repartition(3).write.parquet(src)

    # capture each micro-batch's raw rows so the replay below can
    # reproduce Spark's recovery contract: same batch_id, same content
    seen: list[tuple[int, list]] = []
    inner = incremental_rollup_sink(sink, keys=keys, measures=measures)

    def capture(batch_df, batch_id):
        seen.append((batch_id, batch_df.collect()))
        inner(batch_df, batch_id)

    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = stream.writeStream.foreachBatch(capture).trigger(availableNow=True).start()
    q.awaitTermination(120)

    parts = spark.read.parquet(sink)
    n_batches = parts.select("__batch_id").distinct().count()
    assert n_batches >= 2, f"expected >=2 micro-batches, got {n_batches}"
    assert len(seen) == n_batches

    def rollup_dict(df):
        return {
            r["event_type"]: (r["n_events"], r["sum_value"], r["max_value"])
            for r in df.collect()
        }

    expected = rollup_dict(partial_aggregate(ev, keys=keys, measures=measures))
    merged = rollup_dict(read_merged_rollup(spark, sink, keys=keys, merges=merges))
    assert set(merged) == set(expected)
    for k, (n, s, m) in expected.items():
        gn, gs, gm = merged[k]
        assert gn == n
        assert gs == pytest.approx(s, rel=1e-9)
        assert gm == m

    # replay the LAST micro-batch verbatim: the partial store must
    # overwrite that batch's partition, leaving the rollup identical
    bid, rows = seen[-1]
    replay_df = spark.createDataFrame(rows, schema=ev.schema)
    inner(replay_df, bid)
    after = rollup_dict(read_merged_rollup(spark, sink, keys=keys, merges=merges))
    assert set(after) == set(expected)
    for k, (n, s, m) in expected.items():
        gn, gs, gm = after[k]
        assert gn == n
        assert gs == pytest.approx(s, rel=1e-9)
        assert gm == m


def test_stateful_checkpoint_restart_state_continuity(spark, tmp_path):
    """The failure-recovery contract a production stream depends on:
    STOP a stateful ``applyInPandasWithState`` query, RESTART it from
    the same checkpoint directory, and the recovered run must (a)
    resume batch ids where the first run stopped instead of
    reprocessing phase-1 files, (b) carry the per-key state across
    the restart (running totals keep counting from phase-1 values —
    every user is split across BOTH phases, so a state wipe would
    undercount every key), (c) leave phase-1 sink partitions
    byte-identical, and (d) converge to exactly the uninterrupted
    batch aggregate over all the data."""
    from pyspark.sql.window import Window

    from spatially_databricks_etl_spark.streaming.stateful import (
        foreach_batch_writer,
        running_totals_stateful,
    )

    ev = load_table(spark, SF_DIR, "events").select("user_id", "value")
    # split EVERY user's events across the two phases (odd/even event
    # rank per user), so state continuity is load-bearing for every key
    w = Window.partitionBy("user_id").orderBy("value")
    ranked = ev.withColumn("__rn", F.row_number().over(w))
    t1 = ranked.filter(F.col("__rn") % 2 == 1).drop("__rn")
    t2 = ranked.filter(F.col("__rn") % 2 == 0).drop("__rn")
    assert t1.select("user_id").distinct().count() > 0
    assert t2.select("user_id").distinct().count() > 0

    src = str(tmp_path / "ckpt_src")
    sink = str(tmp_path / "ckpt_sink")
    cp = str(tmp_path / "ckpt_cp")
    t1.repartition(2).write.parquet(src)

    def run_until_drained():
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            running_totals_stateful(stream)
            .writeStream.foreachBatch(foreach_batch_writer(sink))
            .outputMode("update")
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_until_drained()  # phase 1: totals over t1 only
    phase1 = spark.read.parquet(sink).collect()
    phase1_batches = {r["__batch_id"] for r in phase1}
    assert len(phase1_batches) >= 2, "expected >=2 phase-1 micro-batches"
    phase1_rows = {
        (r["user_id"], r["n_events"], round(r["sum_value"], 4), r["__batch_id"])
        for r in phase1
    }

    # land phase-2 files, then RESTART from the same checkpoint
    t2.repartition(2).write.mode("append").parquet(src)
    run_until_drained()

    after = spark.read.parquet(sink).collect()
    after_batches = {r["__batch_id"] for r in after}
    # (a) restart resumed the offset/commit log: new batch ids only
    new_batches = after_batches - phase1_batches
    assert new_batches, "restart processed no new micro-batches"
    assert min(new_batches) > max(phase1_batches)
    # (c) phase-1 partitions untouched by the restarted run
    assert {
        (r["user_id"], r["n_events"], round(r["sum_value"], 4), r["__batch_id"])
        for r in after
        if r["__batch_id"] in phase1_batches
    } == phase1_rows
    # (b)+(d) state carried across the restart: the max-n_events row
    # per key (update mode, monotone totals) equals the uninterrupted
    # batch aggregate over ALL events — a wiped state would undercount
    # every user, since each has events in both phases
    final = {}
    for r in after:
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur[1]:
            final[r["user_id"]] = (
                r["user_id"],
                r["n_events"],
                round(r["sum_value"], 4),
            )
    batch_out = {tuple(r) for r in running_totals_stateful(ev).collect()}
    assert set(final.values()) == batch_out


def test_drift_monitor_sink_scores_each_batch_against_fixed_reference(
    spark, tmp_path
):
    """Streaming drift monitor: every micro-batch lands exactly one
    PSI row computed against the FIXED reference bins (per-batch
    recompute with the same span must agree), and a replayed batch
    overwrites its own partition leaving the monitor history
    unchanged."""
    from spatially_databricks_etl_spark.operators.profile import drift_psi
    from spatially_databricks_etl_spark.streaming.stateful import drift_monitor_sink

    ev = load_table(spark, SF_DIR, "events").select("value")
    ref = ev.limit(400)
    src = str(tmp_path / "dm_src")
    sink = str(tmp_path / "dm_sink")
    ev.repartition(3).write.parquet(src)

    seen: list[tuple[int, list]] = []
    inner = drift_monitor_sink(sink, ref, col="value", bins=8)

    def capture(batch_df, batch_id):
        seen.append((batch_id, batch_df.collect()))
        inner(batch_df, batch_id)

    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = stream.writeStream.foreachBatch(capture).trigger(availableNow=True).start()
    q.awaitTermination(120)

    rows = spark.read.parquet(sink).collect()
    assert len(rows) == len(seen) >= 2
    span_row = ref.agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    ).first()
    span = (span_row["lo"], span_row["hi"])
    by_batch = {r["__batch_id"]: r["psi"] for r in rows}
    nrows_by_batch = {r["__batch_id"]: r["n_rows"] for r in rows}
    for bid, batch_rows in seen:
        batch_df = spark.createDataFrame(batch_rows, schema=ev.schema)
        want = sum(
            r["psi_contrib"]
            for r in drift_psi(ref, batch_df, col="value", bins=8, span=span).collect()
        )
        assert abs(by_batch[bid] - want) < 1e-9, (bid, by_batch[bid], want)
        # n_rows is the batch's actual non-null value count, not a
        # bin count (the round-7 docstring/value mismatch)
        want_n = sum(1 for r in batch_rows if r["value"] is not None)
        assert nrows_by_batch[bid] == want_n, (bid, nrows_by_batch[bid], want_n)

    # replay the last batch verbatim: history must be unchanged
    bid, batch_rows = seen[-1]
    inner(spark.createDataFrame(batch_rows, schema=ev.schema), bid)
    after = {r["__batch_id"]: r["psi"] for r in spark.read.parquet(sink).collect()}
    assert after.keys() == by_batch.keys()
    for k in by_batch:
        assert abs(after[k] - by_batch[k]) < 1e-12


def test_drift_monitor_sink_quantile_mode_pins_reference_deciles(spark, tmp_path):
    """Quantile-mode streaming drift monitor: every micro-batch's PSI
    must equal a per-batch recompute against the SAME pinned
    reference-decile edges — the canonical-PSI analog of the pinned
    min/max span contract."""
    from spatially_databricks_etl_spark.operators.profile import (
        drift_psi,
        exact_quantiles_select,
    )
    from spatially_databricks_etl_spark.streaming.stateful import drift_monitor_sink

    ev = load_table(spark, SF_DIR, "events").select("value")
    ref = ev.limit(400)
    src = str(tmp_path / "dmq_src")
    sink = str(tmp_path / "dmq_sink")
    ev.repartition(3).write.parquet(src)

    seen: list[tuple[int, list]] = []
    inner = drift_monitor_sink(sink, ref, col="value", bins=8, binning="quantile")

    def capture(batch_df, batch_id):
        seen.append((batch_id, batch_df.collect()))
        inner(batch_df, batch_id)

    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = stream.writeStream.foreachBatch(capture).trigger(availableNow=True).start()
    q.awaitTermination(120)

    rows = spark.read.parquet(sink).collect()
    assert len(rows) == len(seen) >= 2
    edges = exact_quantiles_select(
        ref.selectExpr("cast(value as double) as value"),
        "value",
        [i / 8 for i in range(1, 8)],
    )
    by_batch = {r["__batch_id"]: r["psi"] for r in rows}
    for bid, batch_rows in seen:
        batch_df = spark.createDataFrame(batch_rows, schema=ev.schema)
        want = sum(
            r["psi_contrib"]
            for r in drift_psi(
                ref, batch_df, col="value", bins=8, binning="quantile", edges=edges
            ).collect()
        )
        assert abs(by_batch[bid] - want) < 1e-9, (bid, by_batch[bid], want)


def test_drift_monitor_sink_emits_ks_matching_batch_operator(spark, tmp_path):
    """The sink's per-micro-batch ``ks`` must equal the batch
    :func:`drift_ks` statistic (max |ΔCDF|) computed on the SAME
    pinned reference-decile edges and split — by construction they
    share one binned-counts frame, so the equality is exact, not
    approximate. Replaying a batch must leave the ks history
    unchanged (idempotent batch_id partition overwrite)."""
    from spatially_databricks_etl_spark.operators.profile import (
        drift_ks,
        drift_wasserstein,
        exact_quantiles_select,
    )
    from spatially_databricks_etl_spark.streaming.stateful import drift_monitor_sink

    ev = load_table(spark, SF_DIR, "events").select("value")
    ref = ev.limit(400)
    src = str(tmp_path / "dmk_src")
    sink = str(tmp_path / "dmk_sink")
    ev.repartition(3).write.parquet(src)

    seen: list[tuple[int, list]] = []
    inner = drift_monitor_sink(sink, ref, col="value", bins=8, binning="quantile")

    def capture(batch_df, batch_id):
        seen.append((batch_id, batch_df.collect()))
        inner(batch_df, batch_id)

    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = stream.writeStream.foreachBatch(capture).trigger(availableNow=True).start()
    q.awaitTermination(120)

    rows = spark.read.parquet(sink).collect()
    assert len(rows) == len(seen) >= 2
    edges = exact_quantiles_select(
        ref.selectExpr("cast(value as double) as value"),
        "value",
        [i / 8 for i in range(1, 8)],
    )
    ks_by_batch = {r["__batch_id"]: r["ks"] for r in rows}
    emd_by_batch = {r["__batch_id"]: r["emd"] for r in rows}
    for bid, batch_rows in seen:
        batch_df = spark.createDataFrame(batch_rows, schema=ev.schema)
        want = max(
            r["ks_contrib"]
            for r in drift_ks(
                ref, batch_df, col="value", bins=8, binning="quantile", edges=edges
            ).collect()
        )
        assert ks_by_batch[bid] == want, (bid, ks_by_batch[bid], want)
        assert 0.0 <= ks_by_batch[bid] <= 1.0
        # emd must equal the batch drift_wasserstein statistic on the
        # SAME pinned edges (shared binned counts → exact equality up
        # to the sum's float associativity)
        want_emd = sum(
            r["w1_contrib"]
            for r in drift_wasserstein(
                ref, batch_df, col="value", bins=8, binning="quantile", edges=edges
            ).collect()
        )
        assert abs(emd_by_batch[bid] - want_emd) < 1e-9, (
            bid,
            emd_by_batch[bid],
            want_emd,
        )
        assert emd_by_batch[bid] >= 0.0

    # replay the last batch verbatim: ks/emd history must be unchanged
    bid, batch_rows = seen[-1]
    inner(spark.createDataFrame(batch_rows, schema=ev.schema), bid)
    after_rows = spark.read.parquet(sink).collect()
    assert {r["__batch_id"]: r["ks"] for r in after_rows} == ks_by_batch
    assert {r["__batch_id"]: r["emd"] for r in after_rows} == emd_by_batch


def test_drift_monitor_sink_categorical_matches_batch_chi2(spark, tmp_path):
    """Categorical streaming drift monitor: every micro-batch lands
    one (chi2, n_rows, n_categories) row equal to the batch
    drift_chi2 recompute against the same fixed reference (exact —
    shared counts-derived arithmetic), an EMPTY batch lands an honest
    null-statistic row rather than NaN, and replay is idempotent."""
    from spatially_databricks_etl_spark.operators.profile import drift_chi2
    from spatially_databricks_etl_spark.streaming.stateful import (
        drift_monitor_sink_categorical,
    )

    ev = load_table(spark, SF_DIR, "events").select("event_type")
    ref = ev.limit(400)
    src = str(tmp_path / "dmc_src")
    sink = str(tmp_path / "dmc_sink")
    ev.repartition(3).write.parquet(src)

    seen: list[tuple[int, list]] = []
    inner = drift_monitor_sink_categorical(sink, ref, col="event_type")

    def capture(batch_df, batch_id):
        seen.append((batch_id, batch_df.collect()))
        inner(batch_df, batch_id)

    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = stream.writeStream.foreachBatch(capture).trigger(availableNow=True).start()
    q.awaitTermination(120)

    rows = {r["__batch_id"]: r for r in spark.read.parquet(sink).collect()}
    assert len(rows) == len(seen) >= 2
    for bid, batch_rows in seen:
        batch_df = spark.createDataFrame(batch_rows, schema=ev.schema)
        got = rows[bid]
        scored = drift_chi2(ref, batch_df, col="event_type").collect()
        want_chi2 = sum(r["chi2_contrib"] for r in scored)
        assert got["chi2"] == want_chi2, (bid, got["chi2"], want_chi2)
        assert got["n_rows"] == sum(
            1 for r in batch_rows if r["event_type"] is not None
        )
        assert got["n_categories"] == len(scored)

    # an empty batch lands (null, 0, 0), not NaN arithmetic
    empty_bid = max(rows) + 1
    inner(spark.createDataFrame([], schema=ev.schema), empty_bid)
    after = {r["__batch_id"]: r for r in spark.read.parquet(sink).collect()}
    assert after[empty_bid]["chi2"] is None
    assert after[empty_bid]["n_rows"] == 0

    # replay the last real batch verbatim: history unchanged
    bid, batch_rows = seen[-1]
    inner(spark.createDataFrame(batch_rows, schema=ev.schema), bid)
    final = {r["__batch_id"]: r["chi2"] for r in spark.read.parquet(sink).collect()}
    assert final[bid] == rows[bid]["chi2"]
    assert final.keys() == after.keys()


def test_stream_static_enrich_and_dim_refresh_on_restart(spark, tmp_path):
    """Stream-static enrichment: (a) every stream row picks up its
    dim columns (left join keeps dim-less rows with nulls), (b) the
    per-batch result matches the batch join, and (c) an OVERWRITTEN
    dim is picked up by a restarted query from the same checkpoint —
    the documented slowly-changing-dim refresh contract."""
    from spatially_databricks_etl_spark.streaming.joins import stream_static_enrich

    ev = load_table(spark, SF_DIR, "events").select("user_id", "value").limit(200)
    users = [r["user_id"] for r in ev.select("user_id").distinct().collect()]
    known, unknown = users[: len(users) // 2], users[len(users) // 2 :]
    assert known and unknown

    src, dim_path, sink, cp = (
        str(tmp_path / p) for p in ("ss_src", "ss_dim", "ss_sink", "ss_cp")
    )
    ev.repartition(2).write.parquet(src)
    dim_v1 = spark.createDataFrame([(u, "tier_v1") for u in known], "user_id long, tier string")
    dim_v1.write.parquet(dim_path)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="stream on the left"):
        stream_static_enrich(ev, dim_v1, on="user_id", how="right")
    with _pytest.raises(ValueError, match="static"):
        stream_static_enrich(
            ev,
            spark.readStream.schema(ev.schema).parquet(src),
            on="user_id",
        )

    def run_once():
        stream = spark.readStream.schema(ev.schema).parquet(src)
        dim = spark.read.parquet(dim_path)
        out = stream_static_enrich(stream, dim, on="user_id", how="left")
        q = (
            out.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    got = spark.read.parquet(sink)
    want = {
        (r["user_id"], round(r["value"], 6), r["tier"])
        for r in ev.join(F.broadcast(dim_v1), "user_id", "left").collect()
    }
    assert {
        (r["user_id"], round(r["value"], 6), r["tier"]) for r in got.collect()
    } == want
    # dim-less rows survive with null tier
    assert any(t is None for (_, _, t) in want)

    # overwrite the dim, land new stream files, RESTART from the same
    # checkpoint: only the new files are processed, against the NEW dim
    dim_v2 = spark.createDataFrame(
        [(u, "tier_v2") for u in users], "user_id long, tier string"
    )
    dim_v2.write.mode("overwrite").parquet(dim_path)
    more = ev.limit(50)
    more.repartition(1).write.mode("append").parquet(src)
    before = spark.read.parquet(sink).count()
    run_once()
    after = spark.read.parquet(sink)
    new_rows = after.count() - before
    assert new_rows == 50, f"restart should process exactly the new file, got {new_rows}"
    tiers = {r["tier"] for r in after.collect()}
    assert "tier_v2" in tiers, "restarted query must see the overwritten dim"


def test_interval_join_left_outer_emits_unmatched_after_watermark(spark, tmp_path):
    """Stream-stream LEFT OUTER interval join: a click with no
    purchase inside its interval must emit null-padded — but only
    after the watermark proves no future match can arrive. A later
    watermark-pusher batch on both sides closes the horizon; rows
    still inside the horizon at query stop stay withheld (engine
    contract). Also checks the matched pair emits exactly once and
    the batch path returns the identical row set."""
    import datetime as dt

    from spatially_databricks_etl_spark.streaming.joins import interval_join

    t0 = dt.datetime(2024, 1, 1, 0, 0)

    def mk(rows, cols):
        return spark.createDataFrame(rows, cols)

    old_clicks = mk(
        [(1, 10, t0), (2, 20, t0)], "user_id long, click_id long, l_ts timestamp"
    )
    old_purch = mk(
        [(1, 100, t0 + dt.timedelta(minutes=30))],
        "user_id long, purchase_id long, r_ts timestamp",
    )
    push_clicks = mk(
        [(99, 90, t0 + dt.timedelta(hours=10))],
        "user_id long, click_id long, l_ts timestamp",
    )
    push_purch = mk(
        [(99, 900, t0 + dt.timedelta(hours=10, minutes=1))],
        "user_id long, purchase_id long, r_ts timestamp",
    )

    lsrc, rsrc = str(tmp_path / "loj_left"), str(tmp_path / "loj_right")
    old_clicks.write.parquet(lsrc)
    old_purch.write.parquet(rsrc)
    # second write = later mtime = later micro-batch (oldest-first file
    # ordering), so the pusher advances the watermark AFTER the old
    # rows are in state
    push_clicks.write.mode("append").parquet(lsrc)
    push_purch.write.mode("append").parquet(rsrc)

    ls = (
        spark.readStream.schema(old_clicks.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(lsrc)
    )
    rs = (
        spark.readStream.schema(old_purch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(rsrc)
    )
    out = interval_join(
        ls, rs, key="user_id", within="1 hour", watermark="1 hour", how="left_outer"
    )
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("loj_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["click_id"], r["purchase_id"])
        for r in spark.sql(
            "select user_id, click_id, purchase_id from loj_test"
        ).collect()
    }
    assert (1, 10, 100) in got, got          # matched pair
    assert (2, 20, None) in got, got         # unmatched click, null-padded
    assert (1, 10, None) not in got, got     # matched left never null-pads

    # batch path: identical semantics as a plain outer join
    batch = {
        (r["user_id"], r["click_id"], r["purchase_id"])
        for r in interval_join(
            old_clicks.unionByName(push_clicks),
            old_purch.unionByName(push_purch),
            key="user_id",
            within="1 hour",
            how="left_outer",
        ).collect()
    }
    assert (2, 20, None) in batch and (1, 10, 100) in batch


def test_quality_monitor_sink_per_rule_rows_and_replay(spark, tmp_path):
    """Streaming data-quality monitor: every micro-batch lands one row
    PER RULE (including clean rules — the heartbeat contract) whose
    counts equal a batch recompute over the same rows, and a replayed
    batch overwrites its own partition leaving history unchanged."""
    from spatially_databricks_etl_spark.streaming.stateful import (
        quality_monitor_sink,
    )

    ev = load_table(spark, SF_DIR, "events").select("value", "event_type")
    src = str(tmp_path / "qm_src")
    sink = str(tmp_path / "qm_sink")
    ev.repartition(3).write.parquet(src)

    rules = {
        "value_nonnull": F.col("value").isNotNull(),
        "value_small": F.col("value") < F.lit(50.0),
        "known_type": F.col("event_type").isin("click", "view", "purchase",
                                               "signup", "error"),
    }
    seen: list[tuple[int, list]] = []
    inner = quality_monitor_sink(sink, rules)

    def capture(batch_df, batch_id):
        seen.append((batch_id, batch_df.collect()))
        inner(batch_df, batch_id)

    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = stream.writeStream.foreachBatch(capture).trigger(availableNow=True).start()
    q.awaitTermination(120)

    rows = spark.read.parquet(sink).collect()
    assert len(seen) >= 2
    # one row per rule per batch — clean rules included
    assert len(rows) == 3 * len(seen)
    got = {(r["__batch_id"], r["rule"]): (r["n_violations"], r["n_rows"]) for r in rows}
    for bid, batch_rows in seen:
        n = len(batch_rows)
        want_nonnull = sum(1 for r in batch_rows if r["value"] is None)
        want_small = sum(
            1 for r in batch_rows if r["value"] is None or not r["value"] < 50.0
        )
        assert got[(bid, "value_nonnull")] == (want_nonnull, n)
        assert got[(bid, "value_small")] == (want_small, n)
        # the fixture's event_type enum is closed: clean-rule heartbeat
        assert got[(bid, "known_type")] == (0, n)

    # verbatim replay of the last batch: history unchanged
    bid, batch_rows = seen[-1]
    inner(spark.createDataFrame(batch_rows, schema=ev.schema), bid)
    after = {
        (r["__batch_id"], r["rule"]): (r["n_violations"], r["n_rows"])
        for r in spark.read.parquet(sink).collect()
    }
    assert after == got

    # an EMPTY micro-batch still heartbeats (rule, 0, 0) — a NULL sum
    # over zero rows must coalesce to the documented n_violations = 0
    empty_bid = max(b for b, _ in seen) + 1
    inner(spark.createDataFrame([], schema=ev.schema), empty_bid)
    empty_rows = {
        r["rule"]: (r["n_violations"], r["n_rows"])
        for r in spark.read.parquet(sink).collect()
        if r["__batch_id"] == empty_bid
    }
    assert empty_rows == {name: (0, 0) for name in rules}


def test_heavy_hitters_monitor_sink_matches_batch_and_replays(spark, tmp_path):
    """Streaming heavy-hitters monitor: every micro-batch's sink rows
    (minus the null-key heartbeat) must equal the batch heavy_hitters
    operator run over the same rows — same exact-count two-pass
    semantics — the heartbeat must carry the batch row count, and a
    replayed batch must overwrite its own partition leaving history
    unchanged. A skewed key is planted in the source so at least one
    batch has a real hitter."""
    from spatially_databricks_etl_spark.operators.sketches import heavy_hitters
    from spatially_databricks_etl_spark.streaming.stateful import (
        heavy_hitters_monitor_sink,
    )

    ev = load_table(spark, SF_DIR, "events").select("event_id", "event_type")
    # plant a dominating key so hitters exist at threshold 1/4
    skew = spark.range(400).select(
        (F.col("id") + 1_000_000).alias("event_id"),
        F.lit("hotkey").alias("event_type"),
    )
    src = str(tmp_path / "hh_src")
    sink = str(tmp_path / "hh_sink")
    ev.unionByName(skew).repartition(3).write.parquet(src)

    seen: list[tuple[int, list]] = []
    inner = heavy_hitters_monitor_sink(
        sink, "event_type", capacity=3, threshold_fraction=0.25
    )

    def capture(batch_df, batch_id):
        seen.append((batch_id, batch_df.collect()))
        inner(batch_df, batch_id)

    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = stream.writeStream.foreachBatch(capture).trigger(availableNow=True).start()
    q.awaitTermination(120)

    rows = spark.read.parquet(sink).collect()
    assert len(seen) >= 2
    got: dict[int, dict] = {}
    beats: dict[int, int] = {}
    for r in rows:
        if r["event_type"] is None:
            assert r["share"] is None
            beats[r["__batch_id"]] = r["n_rows"]
        else:
            got.setdefault(r["__batch_id"], {})[r["event_type"]] = (
                r["n_rows"],
                round(r["share"], 12),
            )
    any_hitter = False
    for bid, batch_rows in seen:
        # heartbeat per batch with the batch's row count
        assert beats[bid] == len(batch_rows)
        # sink hitters == batch operator over the same rows
        bdf = spark.createDataFrame(batch_rows, schema=ev.schema)
        want = {
            r["event_type"]: (r["n_rows"], round(r["share"], 12))
            for r in heavy_hitters(
                bdf, "event_type", capacity=3, threshold_fraction=0.25
            ).collect()
        }
        assert got.get(bid, {}) == want, bid
        any_hitter = any_hitter or bool(want)
    assert any_hitter  # the planted skew surfaced somewhere

    # verbatim replay of the last batch: history unchanged
    bid, batch_rows = seen[-1]
    inner(spark.createDataFrame(batch_rows, schema=ev.schema), bid)
    after = spark.read.parquet(sink).collect()
    assert sorted(map(tuple, after), key=repr) == sorted(map(tuple, rows), key=repr)

    # an EMPTY micro-batch still heartbeats (null, 0, null)
    empty_bid = max(b for b, _ in seen) + 1
    inner(spark.createDataFrame([], schema=ev.schema), empty_bid)
    empty = [
        r
        for r in spark.read.parquet(sink).collect()
        if r["__batch_id"] == empty_bid
    ]
    assert len(empty) == 1 and empty[0]["event_type"] is None
    assert empty[0]["n_rows"] == 0 and empty[0]["share"] is None


def test_seasonal_monitor_sink_matches_independent_recompute(spark, tmp_path):
    """Streaming seasonal-anomaly monitor: every micro-batch's sink
    rows must equal an INDEPENDENT pure-Python recompute — reference
    profiled to per-(key, hour-of-day) median/MAD of the exact scaled
    hourly sums, each batch bucket scored 0.6745·(y − med)/MAD with
    the same IEEE op order — including the MAD=0 → null-z degenerate
    and e6 floors. Replay overwrites in place."""
    import statistics
    from collections import defaultdict
    from math import floor

    from spatially_databricks_etl_spark.streaming.stateful import (
        seasonal_monitor_sink,
    )

    ev = load_table(spark, SF_DIR, "events").select("ts", "event_type", "value")
    ref = ev.limit(2000)
    src = str(tmp_path / "sm_src")
    sink = str(tmp_path / "sm_sink")
    ev.repartition(3).write.parquet(src)

    seen: list[tuple[int, list]] = []
    inner = seasonal_monitor_sink(sink, ref, key_cols=["event_type"])

    def capture(batch_df, batch_id):
        seen.append((batch_id, batch_df.collect()))
        inner(batch_df, batch_id)

    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = stream.writeStream.foreachBatch(capture).trigger(availableNow=True).start()
    q.awaitTermination(120)

    # independent reference profile in plain Python
    def bucket_sums(rows):
        acc: dict = defaultdict(int)
        for r in rows:
            if r["ts"] is None or r["value"] is None:
                continue
            b = r["ts"].replace(minute=0, second=0, microsecond=0)
            acc[(r["event_type"], b)] += floor(r["value"] * 100 + 0.5)
        return {k: v / 100 for k, v in acc.items()}

    ref_sums = bucket_sums(ref.collect())
    by_phase: dict = defaultdict(list)
    for (k, b), y in ref_sums.items():
        by_phase[(k, b.hour)].append(y)
    prof = {}
    for kp, ys in by_phase.items():
        med = statistics.median(ys)
        mad = statistics.median([abs(y - med) for y in ys])
        prof[kp] = (med, mad)

    rows = spark.read.parquet(sink).collect()
    got = {
        (r["__batch_id"], r["event_type"], r["bucket"]): (
            r["y"],
            r["z_e6"],
            r["is_anomaly"],
        )
        for r in rows
    }
    assert len(seen) >= 2 and len(got) == len(rows)
    n_checked = 0
    for bid, batch_rows in seen:
        for (k, b), y in bucket_sums(batch_rows).items():
            stats = prof.get((k, b.hour))
            if stats is None or stats[1] == 0.0:
                want = (y, None, None)
            else:
                med, mad = stats
                z = 0.6745 * (y - med) / mad
                want = (y, floor(z * 1000000.0 + 0.5), abs(z) > 3.5)
            assert got[(bid, k, b)] == want, (bid, k, b, got[(bid, k, b)], want)
            n_checked += 1
    assert n_checked == len(rows)

    # verbatim replay of the last batch: history unchanged
    bid, batch_rows = seen[-1]
    inner(spark.createDataFrame(batch_rows, schema=ev.schema), bid)
    after = {
        (r["__batch_id"], r["event_type"], r["bucket"]): (
            r["y"],
            r["z_e6"],
            r["is_anomaly"],
        )
        for r in spark.read.parquet(sink).collect()
    }
    assert after == got


def test_index_ingest_sink_streams_into_simhash_exactly_once(spark, tmp_path):
    """Streaming ingest into the NEW persisted SimHash index through
    index_ingest_sink: base build + micro-batch appends must search
    exactly like one full build (append ≡ rebuild), a replayed batch
    is SKIPPED via the ingest log, and the UPSERT route
    (simhash_upsert_index — same (batch_df, path) signature) also
    composes, converging to the same results even when re-delivered."""
    from spatially_databricks_etl_spark.operators.dedup import (
        simhash_append_index,
        simhash_search_index,
        simhash_upsert_index,
        simhash_write_index,
    )
    from spatially_databricks_etl_spark.streaming.stateful import index_ingest_sink

    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .filter("doc_id < 30")
    )
    base = docs.filter("doc_id < 15")
    rest = docs.filter("doc_id >= 15")
    probes = docs.filter("doc_id < 3").select(
        (F.col("doc_id") + 900).alias("doc_id"), "text"
    )

    live = str(tmp_path / "sh_stream")
    simhash_write_index(base, live)
    src = str(tmp_path / "sh_src")
    rest.repartition(3).write.parquet(src)
    seen: list[tuple[int, list]] = []
    inner = index_ingest_sink(live, simhash_append_index)

    def capture(batch_df, batch_id):
        seen.append((batch_id, batch_df.collect()))
        inner(batch_df, batch_id)

    stream = (
        spark.readStream.schema(rest.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = stream.writeStream.foreachBatch(capture).trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert len(seen) >= 2

    full = str(tmp_path / "sh_full")
    simhash_write_index(docs, full)
    got = sorted(
        map(tuple, simhash_search_index(probes, live, max_hamming=3).collect())
    )
    want = sorted(
        map(tuple, simhash_search_index(probes, full, max_hamming=3).collect())
    )
    assert got == want and len(got) > 0

    # replayed batch: log unchanged, results unchanged
    log_before = spark.read.parquet(f"{live}/_ingest_log").count()
    bid, batch_rows = seen[-1]
    inner(spark.createDataFrame(batch_rows, schema=rest.schema), bid)
    assert spark.read.parquet(f"{live}/_ingest_log").count() == log_before
    after = sorted(
        map(tuple, simhash_search_index(probes, live, max_hamming=3).collect())
    )
    assert after == want

    # upsert route: crash-window re-delivery (log row missing) still
    # converges — upsert replaces its own batch with identical content
    up = index_ingest_sink(live, simhash_upsert_index)
    up(spark.createDataFrame(batch_rows, schema=rest.schema), bid + 1000)
    up(spark.createDataFrame(batch_rows, schema=rest.schema), bid + 1001)
    again = sorted(
        map(tuple, simhash_search_index(probes, live, max_hamming=3).collect())
    )
    assert again == want


def test_index_ingest_sink_streams_into_ivf_exactly_once(spark, tmp_path):
    """Streaming ingest into a persisted IVF index: a base build plus
    micro-batch appends through index_ingest_sink must search exactly
    like one full build (the append ≡ rebuild identity), and a
    replayed batch must be SKIPPED via the ingest log — search results
    and log rows unchanged."""
    from spatially_databricks_etl_spark.operators.similarity import (
        ivf_append_index,
        ivf_build,
        ivf_search_index,
        ivf_write_index,
    )
    from spatially_databricks_etl_spark.streaming.stateful import index_ingest_sink

    emb = load_table(spark, SF_DIR, "embeddings")
    base = emb.filter("vec_id < 150")
    rest = emb.filter("vec_id >= 150")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = ivf_build(emb, n_centroids=8, kmeans_iters=1)

    live = str(tmp_path / "ivf_stream")
    ivf_write_index(base, live, centroids=cents)

    src = str(tmp_path / "ivf_src")
    rest.repartition(3).write.parquet(src)
    seen: list[tuple[int, list]] = []
    inner = index_ingest_sink(live, ivf_append_index)

    def capture(batch_df, batch_id):
        seen.append((batch_id, batch_df.collect()))
        inner(batch_df, batch_id)

    stream = (
        spark.readStream.schema(rest.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = stream.writeStream.foreachBatch(capture).trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert len(seen) >= 2

    full = str(tmp_path / "ivf_full")
    ivf_write_index(emb, full, centroids=cents)
    got = sorted(map(tuple, ivf_search_index(queries, live, k=10, nprobe=3).collect()))
    want = sorted(map(tuple, ivf_search_index(queries, full, k=10, nprobe=3).collect()))
    assert got == want and len(got) > 0

    # the log holds one row per delivered batch; a replay is a no-op
    log_before = spark.read.parquet(f"{live}/_ingest_log").count()
    bid, batch_rows = seen[-1]
    inner(spark.createDataFrame(batch_rows, schema=rest.schema), bid)
    assert spark.read.parquet(f"{live}/_ingest_log").count() == log_before
    after = sorted(map(tuple, ivf_search_index(queries, live, k=10, nprobe=3).collect()))
    assert after == want


def test_index_ingest_sink_streams_into_lsh_exactly_once(spark, tmp_path):
    """Streaming ingest into a persisted LSH index (the last-but-one
    unpinned index family, VERDICT r13 item 7): a base build plus
    micro-batch appends through index_ingest_sink must search exactly
    like one full build (hyperplanes re-derive from the sidecar seed,
    bucketing is per-vector, so append ≡ rebuild), and a replayed
    batch must be SKIPPED via the ingest log — search results and log
    rows unchanged."""
    from spatially_databricks_etl_spark.operators.similarity import (
        lsh_append_index,
        lsh_search_index,
        lsh_write_index,
    )
    from spatially_databricks_etl_spark.streaming.stateful import index_ingest_sink

    emb = load_table(spark, SF_DIR, "embeddings")
    base = emb.filter("vec_id < 150")
    rest = emb.filter("vec_id >= 150")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    live = str(tmp_path / "lsh_stream")
    lsh_write_index(base, live, planes=6)

    src = str(tmp_path / "lsh_src")
    rest.repartition(3).write.parquet(src)
    seen: list[tuple[int, list]] = []
    inner = index_ingest_sink(live, lsh_append_index)

    def capture(batch_df, batch_id):
        seen.append((batch_id, batch_df.collect()))
        inner(batch_df, batch_id)

    stream = (
        spark.readStream.schema(rest.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream.writeStream.foreachBatch(capture).trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert len(seen) >= 2

    full = str(tmp_path / "lsh_full")
    lsh_write_index(emb, full, planes=6)
    got = sorted(map(tuple, lsh_search_index(queries, live, k=10).collect()))
    want = sorted(map(tuple, lsh_search_index(queries, full, k=10).collect()))
    assert got == want and len(got) > 0

    # the log holds one row per delivered batch; a replay is a no-op
    log_before = spark.read.parquet(f"{live}/_ingest_log").count()
    bid, batch_rows = seen[-1]
    inner(spark.createDataFrame(batch_rows, schema=rest.schema), bid)
    assert spark.read.parquet(f"{live}/_ingest_log").count() == log_before
    after = sorted(map(tuple, lsh_search_index(queries, live, k=10).collect()))
    assert after == want


def test_index_ingest_sink_streams_into_ivfpq_exactly_once(spark, tmp_path):
    """Streaming ingest into a persisted IVF-PQ index (the last
    unpinned index family, VERDICT r13 item 7): micro-batch appends
    encode with the sidecar's PINNED centroids + codebooks, so
    append ≡ rebuild under fixed models; a replayed batch is skipped
    via the ingest log."""
    from spatially_databricks_etl_spark.operators.embeddings import pq_train
    from spatially_databricks_etl_spark.operators.similarity import (
        ivf_build,
        ivfpq_append_index,
        ivfpq_search_index,
        ivfpq_write_index,
    )
    from spatially_databricks_etl_spark.streaming.stateful import index_ingest_sink

    emb = load_table(spark, SF_DIR, "embeddings")
    base = emb.filter("vec_id < 150")
    rest = emb.filter("vec_id >= 150")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = ivf_build(base, n_centroids=4, kmeans_iters=1)
    cb = pq_train(base, m=8, k=8, kmeans_iters=1)

    live = str(tmp_path / "ivfpq_stream")
    ivfpq_write_index(base, live, centroids=cents, codebooks=cb)

    src = str(tmp_path / "ivfpq_src")
    rest.repartition(3).write.parquet(src)
    seen: list[tuple[int, list]] = []
    inner = index_ingest_sink(live, ivfpq_append_index)

    def capture(batch_df, batch_id):
        seen.append((batch_id, batch_df.collect()))
        inner(batch_df, batch_id)

    stream = (
        spark.readStream.schema(rest.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream.writeStream.foreachBatch(capture).trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert len(seen) >= 2

    full = str(tmp_path / "ivfpq_full_rt")
    ivfpq_write_index(emb, full, centroids=cents, codebooks=cb)
    got = sorted(
        map(tuple, ivfpq_search_index(queries, live, k=10, nprobe=2).collect())
    )
    want = sorted(
        map(tuple, ivfpq_search_index(queries, full, k=10, nprobe=2).collect())
    )
    assert got == want and len(got) > 0

    # the log holds one row per delivered batch; a replay is a no-op
    log_before = spark.read.parquet(f"{live}/_ingest_log").count()
    bid, batch_rows = seen[-1]
    inner(spark.createDataFrame(batch_rows, schema=rest.schema), bid)
    assert spark.read.parquet(f"{live}/_ingest_log").count() == log_before
    after = sorted(
        map(tuple, ivfpq_search_index(queries, live, k=10, nprobe=2).collect())
    )
    assert after == want


def test_index_ingest_sink_bm25_replay_skipped(spark, tmp_path):
    """The same sink wraps the BM25 appender: two batches land, a
    replayed batch is skipped (postings, df AND the meta totals would
    all double otherwise), an empty batch logs without touching the
    index, and the final index equals a full rebuild."""
    import json

    from spatially_databricks_etl_spark.operators.retrieval import (
        bm25_append_index,
        bm25_search_index,
        bm25_write_index,
    )
    from spatially_databricks_etl_spark.streaming.stateful import index_ingest_sink

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    b0 = docs.filter("doc_id % 3 = 0")
    b1 = docs.filter("doc_id % 3 = 1")
    b2 = docs.filter("doc_id % 3 = 2")
    live = str(tmp_path / "bm25_stream")
    bm25_write_index(b0, live)
    sink = index_ingest_sink(live, bm25_append_index)
    sink(b1, 0)
    sink(b2, 1)
    sink(b1, 0)  # replay: must be skipped
    sink(spark.createDataFrame([], "doc_id long, text string"), 2)  # empty: log only

    full = str(tmp_path / "bm25_full2")
    bm25_write_index(docs, full)
    qs = spark.createDataFrame(
        [(1, "spark window join"), (2, "fast hash scan")], "query_id int, query string"
    )
    got = sorted(map(tuple, bm25_search_index(qs, live, k=10, quantize=6).collect()))
    want = sorted(map(tuple, bm25_search_index(qs, full, k=10, quantize=6).collect()))
    assert got == want and len(got) > 0
    m_live = json.loads(
        spark.read.json(f"{live}/_bm25_meta").collect()[0]["bm25_meta_json"]
    )
    m_full = json.loads(
        spark.read.json(f"{full}/_bm25_meta").collect()[0]["bm25_meta_json"]
    )
    # the ingest-generation counter is the one legitimate difference
    # (two appends happened vs none); every stats field matches
    assert m_live.pop("gen") == 2 and m_full.pop("gen") == 0
    assert m_live == m_full
    assert spark.read.parquet(f"{live}/_ingest_log").count() == 3


def test_index_ingest_sink_streams_into_bm25_upsert_converges(spark, tmp_path):
    """Streaming-ingest composition for BM25 (round-12 verdict item 6,
    mirroring the SimHash pin): a REAL readStream drives foreachBatch →
    index_ingest_sink(bm25_append_index) micro-batch appends onto a
    base build, and search must equal ONE full rebuild (append ≡
    rebuild). Then the UPSERT route (bm25_upsert_index — same
    (batch_df, path) signature) composes through the sink: a
    crash-window re-delivery (new batch id, identical content) still
    converges to the same search results — generation-based
    replacement makes re-delivery idempotent for search."""
    from spatially_databricks_etl_spark.operators.retrieval import (
        bm25_append_index,
        bm25_search_index,
        bm25_upsert_index,
        bm25_write_index,
    )
    from spatially_databricks_etl_spark.streaming.stateful import index_ingest_sink

    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .filter("doc_id < 30")
    )
    base = docs.filter("doc_id < 15")
    rest = docs.filter("doc_id >= 15")
    qs = spark.createDataFrame(
        [(1, "spark window join"), (2, "fast hash scan")],
        "query_id int, query string",
    )

    live = str(tmp_path / "bm25_live")
    bm25_write_index(base, live)
    src = str(tmp_path / "bm25_src")
    rest.repartition(3).write.parquet(src)
    seen: list[tuple[int, list]] = []
    inner = index_ingest_sink(live, bm25_append_index)

    def capture(batch_df, batch_id):
        seen.append((batch_id, batch_df.collect()))
        inner(batch_df, batch_id)

    stream = (
        spark.readStream.schema(rest.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream.writeStream.foreachBatch(capture).trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert len(seen) >= 2

    full = str(tmp_path / "bm25_full")
    bm25_write_index(docs, full)
    got = sorted(map(tuple, bm25_search_index(qs, live, k=10, quantize=6).collect()))
    want = sorted(map(tuple, bm25_search_index(qs, full, k=10, quantize=6).collect()))
    assert got == want and len(got) > 0

    # replayed batch through the sink: ingest log unchanged, results
    # unchanged (exactly-once)
    log_before = spark.read.parquet(f"{live}/_ingest_log").count()
    bid, batch_rows = seen[-1]
    inner(spark.createDataFrame(batch_rows, schema=rest.schema), bid)
    assert spark.read.parquet(f"{live}/_ingest_log").count() == log_before
    after = sorted(map(tuple, bm25_search_index(qs, live, k=10, quantize=6).collect()))
    assert after == want

    # upsert route: crash-window re-delivery (log row lost → NEW batch
    # ids, identical content) converges — generation replacement makes
    # the second delivery a no-op for search results
    up = index_ingest_sink(live, bm25_upsert_index)
    up(spark.createDataFrame(batch_rows, schema=rest.schema), bid + 1000)
    up(spark.createDataFrame(batch_rows, schema=rest.schema), bid + 1001)
    again = sorted(map(tuple, bm25_search_index(qs, live, k=10, quantize=6).collect()))
    assert again == want


def test_read_parquet_evolved_aligns_schema_generations(spark, tmp_path):
    """Schema-drift-tolerant scan: two file generations with a type
    change (int -> string id), a dropped column and an added column
    must read as ONE frame aligned to the target schema — try_cast
    nulls the incompatible value instead of an ANSI error, missing
    columns materialize as typed nulls, and extra='keep' appends the
    unexpected column for forensics."""
    from spatially_databricks_etl_spark.sources.files import read_parquet_evolved

    p = str(tmp_path / "evolved")
    spark.createDataFrame(
        [(1, 10.0, "old")], "id int, amount double, legacy string"
    ).write.parquet(p + "/gen1")
    spark.createDataFrame(
        [("x2", 20.0, True)], "id string, amount double, flag boolean"
    ).write.parquet(p + "/gen2")
    # move files into one directory (two generations side by side)
    import glob
    import shutil

    for f in glob.glob(p + "/gen1/*.parquet") + glob.glob(p + "/gen2/*.parquet"):
        shutil.move(f, p)
    shutil.rmtree(p + "/gen1")
    shutil.rmtree(p + "/gen2")

    out = read_parquet_evolved(
        spark, p, "id long, amount double, flag boolean, brand string"
    )
    assert [f.name for f in out.schema.fields] == ["id", "amount", "flag", "brand"]
    rows = sorted(out.collect(), key=lambda r: r["amount"])
    # gen1: id=1 casts to long; flag/brand missing -> nulls
    assert tuple(rows[0]) == (1, 10.0, None, None)
    # gen2: id='x2' fails the long try_cast -> null, flag survives
    assert tuple(rows[1]) == (None, 20.0, True, None)

    kept = read_parquet_evolved(
        spark, p, "id long, amount double", extra="keep"
    )
    assert "legacy" in kept.columns and "flag" in kept.columns
    with pytest.raises(ValueError, match="extra"):
        read_parquet_evolved(spark, p, "id long", extra="wat")


def test_paged_rest_python_datasource(spark):
    """The Spark 4 Python Data Source: registration makes paged
    REST ingest a first-class format — partitioned executor-side
    fetches (one task per page group), user schema honored, and the
    SQL surface (CREATE TEMPORARY VIEW ... USING paged_rest) works.
    The offline synthetic fetcher stands in for HTTP (egress-less
    env); a real deployment points fetch_fn at default_fetch_page."""
    from spatially_databricks_etl_spark.sources.rest import register_paged_rest

    register_paged_rest(spark)
    df = (
        spark.read.format("paged_rest")
        .schema("id long, v string")
        .option("total_records", "25")
        .option("limit", "10")
        .option("pages_per_partition", "1")
        .load()
    )
    rows = df.collect()
    assert sorted(r["id"] for r in rows) == list(range(25))
    assert {r["v"] for r in rows} == {f"r{i}" for i in range(25)}
    # 3 pages, 1 page per partition -> 3 parallel fetch tasks
    parts = df.select(F.spark_partition_id().alias("p")).distinct().count()
    assert parts == 3

    # SQL surface: the source composes with CREATE ... USING
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY VIEW rest_view (id long, v string)
        USING paged_rest
        OPTIONS (total_records '12', `limit` '5')
        """
    )
    assert spark.sql("select count(*) n from rest_view").collect()[0]["n"] == 12

    # a malformed fetch_fn spec fails loudly on read
    bad = (
        spark.read.format("paged_rest")
        .schema("id long, v string")
        .option("total_records", "5")
        .option("fetch_fn", "nodotsep")
        .load()
    )
    with pytest.raises(Exception, match="module:callable"):
        bad.collect()


def test_query_metrics_recorder_captures_lifecycle_and_progress(spark, tmp_path):
    """The StreamingQueryListener recorder must capture started /
    progress / terminated events for a real query, with the progress
    lines' numInputRows summing to the source row count, and detach
    cleanly (no further lines after)."""
    import json
    import time

    from spatially_databricks_etl_spark.streaming.stateful import (
        QueryMetricsRecorder,
    )

    ev = load_table(spark, SF_DIR, "events").select("event_id", "value").limit(300)
    src = str(tmp_path / "qm_src")
    ev.coalesce(3).write.parquet(src)
    n_src = ev.count()

    mpath = str(tmp_path / "qmetrics")
    rec = QueryMetricsRecorder(mpath).attach(spark)
    try:
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            stream.writeStream.format("noop")
            .queryName("qm_test")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # listener events are delivered asynchronously
        for _ in range(40):
            lines = open(f"{mpath}/query_metrics.jsonl").read().splitlines()
            recs = [json.loads(ln) for ln in lines]
            if any(r["event"] == "terminated" for r in recs):
                break
            time.sleep(0.5)
    finally:
        rec.detach(spark)

    events = {r["event"] for r in recs}
    assert {"started", "progress", "terminated"} <= events, events
    progress = [r for r in recs if r["event"] == "progress"]
    assert sum(r["numInputRows"] for r in progress) == n_src
    assert all("batchId" in r and "durationMs" in r for r in progress)


def test_index_ingest_sink_upsert_closes_crash_window(spark, tmp_path):
    """The sink's documented residual at-least-once window (process
    dies between ingest-complete and log-commit, the replay ingests
    the batch AGAIN) converges to exactly-once RESULTS when the
    ingest fn is an UPSERT: the replayed batch replaces itself with
    identical content. Pinned for both index families — IVF (search ≡
    rebuild after a simulated crashed-then-replayed batch) and BM25
    (search + stats ≡ rebuild). A plain appender in the same
    interleaving duplicates content — the reason the docstring
    routes crash-window-sensitive pipelines to the upserts."""
    import json

    from spatially_databricks_etl_spark.operators.retrieval import (
        bm25_search_index,
        bm25_upsert_index,
        bm25_write_index,
    )
    from spatially_databricks_etl_spark.operators.similarity import (
        ivf_build,
        ivf_search_index,
        ivf_upsert_index,
        ivf_write_index,
    )
    from spatially_databricks_etl_spark.streaming.stateful import index_ingest_sink

    # --- IVF ---
    emb = load_table(spark, SF_DIR, "embeddings")
    base = emb.filter("vec_id < 150")
    batch = emb.filter("vec_id >= 150")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = ivf_build(emb, n_centroids=8, kmeans_iters=1)
    live = str(tmp_path / "ivf_crash")
    ivf_write_index(base, live, centroids=cents)
    # crashed attempt: the upsert completed but the log commit never
    # happened...
    ivf_upsert_index(batch, live)
    # ...so the replay finds no log row and ingests the batch AGAIN
    index_ingest_sink(live, ivf_upsert_index)(batch, 0)
    full = str(tmp_path / "ivf_crash_full")
    ivf_write_index(emb, full, centroids=cents)
    got = sorted(map(tuple, ivf_search_index(queries, live, k=10, nprobe=3).collect()))
    want = sorted(map(tuple, ivf_search_index(queries, full, k=10, nprobe=3).collect()))
    assert got == want and len(got) > 0

    # --- BM25 ---
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").limit(60)
    b0 = docs.filter("doc_id % 2 = 0")
    b1 = docs.filter("doc_id % 2 = 1")
    blive = str(tmp_path / "bm25_crash")
    bm25_write_index(b0, blive)
    bm25_upsert_index(b1, blive)  # crashed attempt, no log row
    index_ingest_sink(blive, bm25_upsert_index)(b1, 0)  # replay
    bfull = str(tmp_path / "bm25_crash_full")
    bm25_write_index(docs, bfull)
    qs = spark.createDataFrame(
        [(1, "spark window join"), (2, "fast hash scan")], "query_id int, query string"
    )
    got = sorted(map(tuple, bm25_search_index(qs, blive, k=10, quantize=6).collect()))
    want = sorted(map(tuple, bm25_search_index(qs, bfull, k=10, quantize=6).collect()))
    assert got == want and len(got) > 0
    m_live = json.loads(
        spark.read.json(f"{blive}/_bm25_meta").collect()[0]["bm25_meta_json"]
    )
    m_full = json.loads(
        spark.read.json(f"{bfull}/_bm25_meta").collect()[0]["bm25_meta_json"]
    )
    m_live.pop("gen"), m_full.pop("gen")
    assert m_live == m_full


def test_embedding_quality_monitor_sink_matches_batch_operator(spark, tmp_path):
    """The embedding-hygiene sink's per-micro-batch row must equal
    embedding_quality(batch) EXACTLY (same operator behind the
    idempotent writer — the equality is bitwise on all eight
    columns), and a replayed batch leaves history unchanged."""
    from spatially_databricks_etl_spark.operators.profile import embedding_quality
    from spatially_databricks_etl_spark.streaming.stateful import (
        embedding_quality_monitor_sink,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select("embedding")
    src = str(tmp_path / "eqm_src")
    sink = str(tmp_path / "eqm_sink")
    emb.repartition(3).write.parquet(src)

    seen: list[tuple[int, list]] = []
    inner = embedding_quality_monitor_sink(sink)

    def capture(batch_df, batch_id):
        seen.append((batch_id, batch_df.collect()))
        inner(batch_df, batch_id)

    stream = (
        spark.readStream.schema(emb.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = stream.writeStream.foreachBatch(capture).trigger(availableNow=True).start()
    q.awaitTermination(120)

    cols = [
        "n_rows",
        "n_null_vec",
        "n_empty_vec",
        "n_nonfinite_vec",
        "dim_min",
        "dim_max",
        "n_zero_vec",
        "norm_rms_e6",
    ]
    rows = {r["__batch_id"]: r for r in spark.read.parquet(sink).collect()}
    assert len(rows) == len(seen) >= 2
    for bid, batch_rows in seen:
        batch_df = spark.createDataFrame(batch_rows, schema=emb.schema)
        want = embedding_quality(batch_df).collect()[0]
        got = rows[bid]
        assert tuple(got[c] for c in cols) == tuple(want[c] for c in cols), bid

    # replay: history unchanged
    bid, batch_rows = seen[-1]
    inner(spark.createDataFrame(batch_rows, schema=emb.schema), bid)
    after = {r["__batch_id"]: r for r in spark.read.parquet(sink).collect()}
    assert {k: tuple(v) for k, v in after.items()} == {
        k: tuple(v) for k, v in rows.items()
    }


def test_embedding_drift_monitor_sink_matches_batch_operator(spark, tmp_path):
    """The embedding-drift sink's per-micro-batch row must equal
    drift_embedding(reference, batch) EXACTLY — the sink pins the
    reference's per-dimension exact integer sums at construction and
    replays the same expression tree, so the equality is bitwise on
    the e6 statistics, not approximate. Replaying a batch leaves the
    history unchanged (idempotent batch_id partition overwrite)."""
    from spatially_databricks_etl_spark.operators.profile import drift_embedding
    from spatially_databricks_etl_spark.streaming.stateful import (
        embedding_drift_monitor_sink,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    ref = emb.filter("vec_id < 200").select("embedding")
    rest = emb.filter("vec_id >= 200").select("embedding")
    src = str(tmp_path / "edm_src")
    sink = str(tmp_path / "edm_sink")
    rest.repartition(3).write.parquet(src)

    seen: list[tuple[int, list]] = []
    inner = embedding_drift_monitor_sink(sink, ref)

    def capture(batch_df, batch_id):
        seen.append((batch_id, batch_df.collect()))
        inner(batch_df, batch_id)

    stream = (
        spark.readStream.schema(rest.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = stream.writeStream.foreachBatch(capture).trigger(availableNow=True).start()
    q.awaitTermination(120)

    rows = {r["__batch_id"]: r for r in spark.read.parquet(sink).collect()}
    assert len(rows) == len(seen) >= 2
    for bid, batch_rows in seen:
        batch_df = spark.createDataFrame(batch_rows, schema=rest.schema)
        want = drift_embedding(ref, batch_df).collect()[0]
        got = rows[bid]
        assert (
            got["n_ref"],
            got["n_cur"],
            got["centroid_cos_e6"],
            got["mean_shift_l2_e6"],
        ) == (
            want["n_ref"],
            want["n_cur"],
            want["centroid_cos_e6"],
            want["mean_shift_l2_e6"],
        ), bid
        # same-corpus batches drift little: sanity band, not a tautology
        assert got["centroid_cos_e6"] is not None

    # replay: history unchanged
    bid, batch_rows = seen[-1]
    inner(spark.createDataFrame(batch_rows, schema=rest.schema), bid)
    after = {r["__batch_id"]: r for r in spark.read.parquet(sink).collect()}
    assert {k: tuple(v) for k, v in after.items()} == {
        k: tuple(v) for k, v in rows.items()
    }


def test_read_jsonl_docs_splits_corrupt_lines(spark, tmp_path):
    """Corrupt-tolerant JSONL ingest: good lines parse under the
    explicit schema, truncated/malformed/half-typed lines land in the
    quarantine frame with the raw text preserved, nothing is silently
    dropped, and both frames come from one cached scan."""
    from spatially_databricks_etl_spark.sources.files import read_jsonl_docs

    p = tmp_path / "docs.jsonl"
    lines = [
        '{"doc_id": 1, "text": "alpha"}',
        '{"doc_id": 2, "text": "bravo"}',
        '{"doc_id": 3, "text": "tru',          # truncated mid-string
        "not json at all",                      # garbage
        '{"doc_id": "x4", "text": "typed"}',   # doc_id wrong type
        '{"doc_id": 5, "text": "echo"}',
    ]
    p.write_text("\n".join(lines) + "\n")
    clean, quarantine = read_jsonl_docs(
        spark, str(p), "doc_id long, text string"
    )
    good = {r["doc_id"]: r["text"] for r in clean.collect()}
    assert good == {1: "alpha", 2: "bravo", 5: "echo"}
    bad = {r["_corrupt_record"] for r in quarantine.collect()}
    assert bad == {lines[2], lines[3], lines[4]}
    # complete: every input line accounted for exactly once
    assert clean.count() + quarantine.count() == len(lines)
    # release path: the shared cached scan is registered on both
    # frames and unpersists via the standard idiom (no cached-scan
    # accumulation across repeated ingestion calls)
    from spatially_databricks_etl_spark.caching import (
        release_intermediates,
    )

    cached = getattr(clean, "_spark_graft_persists", [])
    assert len(cached) == 1
    assert cached[0].storageLevel.useMemory
    release_intermediates(clean)
    assert not cached[0].storageLevel.useMemory
    release_intermediates(quarantine)  # safe double-release
