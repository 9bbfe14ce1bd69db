"""End-to-end pipeline replay + plan-shape regression tests.

The plan tests are the scale contract: filters must reach the parquet
scan (PushedFilters), projections must prune the ReadSchema, and the
transform chain must collapse to a single Project (SURVEY.md §4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from spatially_databricks_etl_spark.plans.explain import explain_str
from spatially_databricks_etl_spark.plans.pipeline import (
    filter_gold,
    reference_pipeline,
    transform_events,
)
from spatially_databricks_etl_spark.session import load_table
from spatially_databricks_etl_spark.sinks.writers import save_as_table


def test_reference_pipeline_end_to_end(spark):
    gold = reference_pipeline(spark, SF_DIR)
    rows = gold.count()
    assert rows > 0
    cats = {r["event_category"] for r in gold.select("event_category").distinct().collect()}
    assert "error" not in cats and "ERROR" not in cats
    assert cats <= {"click", "view", "PURCHASE", "SIGNUP"}


def test_pipeline_writes_gold_table(spark):
    gold = reference_pipeline(spark, SF_DIR, gold_table="gold_events_test")
    assert gold.count() > 0
    assert spark.catalog.tableExists("gold_events_test")
    spark.sql("DROP TABLE gold_events_test")


def test_transform_is_single_narrow_stage(spark):
    raw = load_table(spark, SF_DIR, "events")
    out = transform_events(raw)
    optimized = out._jdf.queryExecution().optimizedPlan().toString()
    # the withColumn/rename/select chain must stay a narrow scan→project
    # pipeline: no shuffle, no extra stages. (Catalyst keeps ≤3 Projects
    # because k_value is referenced twice — still one codegen stage.)
    assert "Exchange" not in optimized
    assert optimized.count("Project") <= 3, optimized
    physical = out._jdf.queryExecution().executedPlan().toString()
    assert physical.count("WholeStageCodegen") <= 1


def test_filter_pushdown_reaches_scan(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    q = li.filter(F.col("l_shipdate") <= "1996-01-01").select("l_orderkey", "l_quantity")
    plan = explain_str(q)
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1].split("]")[0]


def test_column_pruning_reaches_scan(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    q = li.select("l_orderkey", "l_quantity")
    plan = explain_str(q)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert read_schema.count(":") <= 3  # struct<a:...,b:...> → 2 fields + struct marker


def test_gold_filter_semantics(spark):
    raw = load_table(spark, SF_DIR, "events")
    gold = filter_gold(transform_events(raw))
    bad = gold.filter(
        (F.col("event_ts") < "2024-01-05") | (F.col("event_ts") >= "2024-01-25")
    ).count()
    assert bad == 0


def test_save_as_table_roundtrip(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    save_as_table(df, "roundtrip_test", mode="overwrite")
    back = spark.table("roundtrip_test")
    assert {tuple(r) for r in back.collect()} == {(1, "a"), (2, "b")}
    spark.sql("DROP TABLE roundtrip_test")


def test_bucketed_join_skips_shuffle(spark):
    """Bucketing is the pay-once shuffle lever: a join of two tables
    bucketed on the join key must contain NO Exchange."""
    from spatially_databricks_etl_spark.sinks.writers import save_bucketed_table

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_orderpriority")
    save_bucketed_table(li, "li_bkt", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    save_bucketed_table(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        "ord_bkt",
        ["l_orderkey"],
        8,
        sort_cols=["l_orderkey"],
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("li_bkt").join(spark.table("ord_bkt"), "l_orderkey")
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "simple"
        )
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # and the result is still correct
        assert joined.count() == li.join(
            orders, li.l_orderkey == orders.o_orderkey
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """A filter on the partition column must become a PartitionFilter
    (scan reads only matching directories), not a data filter."""
    from spatially_databricks_etl_spark.sinks.writers import write_parquet

    ev = load_table(spark, SF_DIR, "events")
    path = str(tmp_path / "ev_part")
    write_parquet(ev, path, partition_by=["event_type"])
    got = spark.read.parquet(path).filter(F.col("event_type") == "click")
    plan = got._sc._jvm.PythonSQLUtils.explainString(
        got._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters: [isnotnull(event_type" in plan or (
        "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1][:120]
    )
    assert got.count() == ev.filter(F.col("event_type") == "click").count()


def test_observed_metrics_no_extra_job(spark):
    from spatially_databricks_etl_spark.plans.pipeline import observed

    ev = load_table(spark, SF_DIR, "events")
    df, obs = observed(
        ev.filter(F.col("value") > 0),
        "gate",
        F.count(F.lit(1)).alias("rows"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )
    n = df.count()  # the one action; metrics ride along
    got = obs.get
    assert got["rows"] == n
    exact = ev.filter(F.col("value") > 0).agg(F.round(F.sum("value"), 4)).collect()[0][0]
    assert abs(got["sum_value"] - exact) < 1e-6


def test_run_pipeline_blob_and_api_dispatch(spark, tmp_path):
    from spatially_databricks_etl_spark.plans.pipeline import run_pipeline
    import pytest as _pytest

    p = tmp_path / "in.csv"
    p.write_text("a,b\n1,x\n2,y\n")
    got = run_pipeline(
        spark,
        {
            "data_source": "BLOB",
            "path": str(p),
            "schema": "a int, b string",
            "transform": lambda df: df.filter(F.col("a") > 1),
            "gold_table": "gold_dispatch_test",
        },
    )
    assert [r["b"] for r in got.collect()] == ["y"]

    def fake_fetch(base_url, limit, offset):
        return [{"id": offset + i} for i in range(min(limit, 7 - offset))]

    api = run_pipeline(
        spark,
        {
            "data_source": "API",
            "base_url": "http://fake",
            "limit": 3,
            "total_records": 7,
            "schema": "id long",
            "fetch_page": fake_fetch,
        },
    )
    assert api.count() == 7

    with _pytest.raises(ValueError, match="unsupported data_source"):
        run_pipeline(spark, {"data_source": "KAFKA"})


def test_configure_object_store_env_secrets(spark, monkeypatch):
    from spatially_databricks_etl_spark.plans.pipeline import configure_object_store
    import pytest as _pytest

    monkeypatch.setenv("SPARK_SECRET_CLIENT_ID", "abc-123")
    configure_object_store(
        spark, {"fs.azure.account.oauth2.client.id.x.dfs.core.windows.net": "env:CLIENT_ID"}
    )
    assert (
        spark.conf.get("fs.azure.account.oauth2.client.id.x.dfs.core.windows.net")
        == "abc-123"
    )
    with _pytest.raises(KeyError):
        configure_object_store(spark, {"k": "env:MISSING_SECRET_XYZ"})


def test_reference_pipeline_global_temp_view_cross_session(spark):
    """The reference's DataFrame→SQL bridge is a GLOBAL temp view
    (createOrReplaceGlobalTempView, Spatially ETL test.py:205): it
    must be queryable as global_temp.<name> from a DIFFERENT
    SparkSession of the same application, where a session-scoped view
    is invisible."""
    gold = reference_pipeline(
        spark, SF_DIR, view_name="gold_global_test", global_view=True
    )
    other = spark.newSession()
    via_other = other.table("global_temp.gold_global_test")
    assert via_other.count() > 0
    # the view holds the TRANSFORMED (pre-filter) frame; replaying the
    # gold filter over it from the other session must reproduce gold
    from spatially_databricks_etl_spark.plans.pipeline import filter_gold

    got = {
        tuple(r)
        for r in filter_gold(via_other).select("event_id").collect()
    }
    want = {tuple(r) for r in gold.select("event_id").collect()}
    assert got == want
    # and the session-scoped default is NOT visible cross-session
    reference_pipeline(spark, SF_DIR, view_name="gold_session_test")
    from pyspark.errors import AnalysisException
    import pytest

    with pytest.raises(AnalysisException):
        other.table("gold_session_test")
    spark.catalog.dropGlobalTempView("gold_global_test")


def test_ctas_provider_branch(spark):
    """save_as_table/ctas pick Delta when the Delta classes are on the
    JVM classpath, else parquet. Pin the WRITTEN table's catalog
    provider to the probe's answer, so this test exercises whichever
    branch is actually live (parquet here; Delta on a Delta cluster)
    instead of asserting dead code."""
    from spatially_databricks_etl_spark.sinks.writers import (
        _delta_available,
        ctas,
        save_as_table,
    )

    expected = "delta" if _delta_available(spark) else "parquet"

    src = reference_pipeline(spark, SF_DIR)
    save_as_table(src.limit(5), "provider_probe_tbl", mode="overwrite")
    desc = {
        r["col_name"]: r["data_type"]
        for r in spark.sql("DESCRIBE TABLE EXTENDED provider_probe_tbl").collect()
    }
    assert desc.get("Provider", "").lower() == expected
    assert spark.table("provider_probe_tbl").count() == 5

    out = ctas(
        spark,
        "provider_probe_ctas",
        "SELECT event_id, event_value FROM provider_probe_tbl",
    )
    desc2 = {
        r["col_name"]: r["data_type"]
        for r in spark.sql("DESCRIBE TABLE EXTENDED provider_probe_ctas").collect()
    }
    assert desc2.get("Provider", "").lower() == expected
    assert out.count() == 5

    # failure path: an invalid select must raise WITHOUT destroying the
    # pre-existing table (the select is analyzed before the DROP)
    import pytest

    with pytest.raises(Exception):
        ctas(spark, "provider_probe_ctas", "SELECT no_such_col FROM provider_probe_tbl")
    assert out.count() == 5, "failed CTAS must leave the old table intact"

    spark.sql("DROP TABLE IF EXISTS provider_probe_tbl")
    spark.sql("DROP TABLE IF EXISTS provider_probe_ctas")
