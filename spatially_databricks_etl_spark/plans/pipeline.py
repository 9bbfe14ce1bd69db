"""Reference-pipeline replay: the full shape of the reference ETL
(`Spatially ETL test.py:131 → 156-205 → 237-245`) over local fixture
data — scan → derive (split/regex/trim/struct/cast/recode) → rename →
project → temp view → filtered select (range + IN + NOT RLIKE).

The reference ran this on a CDC BRFSS CSV; here the `events` fixture
stands in: `props` (a JSON-ish string) plays the role of the
string-encoded `geolocation`, `event_type` plays `datasource` (recode)
and `stratification_category_1` (NOT-RLIKE filter), `ts` plays the
year-range filter. Every operator from SURVEY.md §2a #5-#27 appears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spatially_databricks_etl_spark.functions.scalar import (
    clean_split_part,
    make_struct,
    recode,
    recode_when_contains,
    rename_columns,
    typed_null,
)


def transform_events(df: DataFrame) -> DataFrame:
    """The reference transform chain re-expressed over `events`.

    Mirrors `Spatially ETL test.py:156-202`: noisy-string parse
    (regexp_replace+split+trim, `:156-157`), struct build with typed
    null (`:160-163`), casts (`:170-173`), equality recode (`:174-175`),
    contains recode (`:176-177`), snake-case renames (`:180-185`),
    explicit 12→8 column projection (`:189-202`).

    All pure Column expressions: Catalyst collapses the whole chain to
    one Project over the scan, so at 100 TB this is a single pass.
    """
    # props arrives as '{"k": 87}' — strip {}" and quotes, split on ':',
    # take the value token, trim, cast (the geolocation parse pattern).
    k_value = clean_split_part(
        "props", strip_pattern=r'[{}"]', delimiter=":", index=1, cast="integer"
    )
    df = df.withColumn("k_value", k_value)

    # Struct build with a typed-null field (geolocation struct pattern).
    df = df.withColumn(
        "event_meta",
        make_struct(
            {
                "note": typed_null("string"),
                "k_value": F.col("k_value").cast("double"),
                "magnitude": F.col("value").cast("double"),
            }
        ),
    )

    # Casts (:170-173).
    df = (
        df.withColumn("event_id", F.col("event_id").cast("long"))
        .withColumn("user_id", F.col("user_id").cast("long"))
        .withColumn("value", F.col("value").cast("double"))
    )

    # Equality recode (:174-175) + contains recode (:176-177).
    df = df.withColumn(
        "event_type",
        recode("event_type", {"purchase": "PURCHASE", "signup": "SIGNUP"}),
    )
    df = df.withColumn(
        "interaction_class",
        recode_when_contains("event_type", "click", "Interaction", default=F.lit("Other")),
    )

    # Snake-case-style renames (:180-185).
    df = rename_columns(
        df,
        {
            "event_type": "event_category",
            "value": "event_value",
            "ts": "event_ts",
        },
    )

    # Final explicit projection (:189-202).
    return df.select(
        "event_id",
        "event_ts",
        "user_id",
        "event_category",
        "interaction_class",
        "event_value",
        "k_value",
        "event_meta",
    )


def filter_gold(df: DataFrame) -> DataFrame:
    """The CTAS WHERE clause shape (`Spatially ETL test.py:240-245`):
    range predicate + IN-list + negated case-insensitive RLIKE.

    These are plain Catalyst predicates — at scale they push down to
    the parquet scan (row-group skipping on `event_ts` statistics).
    """
    return df.filter(
        (F.col("event_ts") >= F.lit("2024-01-05 00:00:00"))
        & (F.col("event_ts") < F.lit("2024-01-25 00:00:00"))
        & F.col("event_category").isin("click", "view", "PURCHASE", "SIGNUP")
        & ~F.col("event_category").rlike("(?i)error")
    )


def reference_pipeline(
    spark: SparkSession,
    sf_dir: str,
    *,
    view_name: str = "cleaned_and_transformed_events",
    gold_table: str | None = None,
    global_view: bool = False,
) -> DataFrame:
    """End-to-end replay: scan → transform → register view → filtered
    select (→ optional managed-table sink, the CTAS at `Spatially ETL
    test.py:237-245`). Returns the gold DataFrame.

    ``global_view=True`` registers the DataFrame→SQL bridge as a
    GLOBAL temp view (the reference's actual call —
    ``createOrReplaceGlobalTempView``, `Spatially ETL test.py:205`):
    the view lives in the ``global_temp`` database and is visible to
    every SparkSession in the application (``spark.newSession()``
    included), not just the registering one. The default stays
    session-scoped — global views outlive the session that made them,
    which is a leak hazard in long-lived multi-tenant apps.
    """
    from spatially_databricks_etl_spark.session import load_table

    raw = load_table(spark, sf_dir, "events")
    transformed = transform_events(raw)
    if global_view:
        transformed.createOrReplaceGlobalTempView(view_name)
        gold = filter_gold(spark.table(f"global_temp.{view_name}"))
        if gold_table:
            from spatially_databricks_etl_spark.sinks.writers import save_as_table

            save_as_table(gold, gold_table, mode="overwrite")
            return spark.table(gold_table)
        return gold
    transformed.createOrReplaceTempView(view_name)
    gold = filter_gold(spark.table(view_name))
    if gold_table:
        from spatially_databricks_etl_spark.sinks.writers import save_as_table

        save_as_table(gold, gold_table, mode="overwrite")
        return spark.table(gold_table)
    return gold


def observed(df, name: str, *metrics):
    """Attach Spark Observation metrics to a pipeline stage: row
    counts / invariant aggregates computed DURING the action (no extra
    pass, no extra job — unlike calling ``.count()`` for telemetry,
    which re-executes the plan). Returns (df, observation); read
    ``observation.get`` after the action completes.

    The production use: every curation stage reports rows-in/rows-out
    and sanity aggregates to the pipeline log at zero additional scan
    cost — at 100 TB a telemetry ``count()`` is a second full pass.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    if not metrics:
        metrics = (F.count(F.lit(1)).alias("rows"),)
    return df.observe(obs, *metrics), obs


def configure_object_store(spark, conf: dict, *, secret_env_prefix: str = "SPARK_SECRET_") -> None:
    """Wire object-store auth onto the session (op #29): the local
    substitute for the reference's `dbutils.secrets.get` + five
    `spark.conf.set("fs.azure.account...")` calls (`Spatially ETL
    test.py:76-85`). Values of the form ``env:NAME`` resolve from the
    environment (optionally prefixed) — secrets never live in code or
    config files; on a cluster the same shape carries OAuth
    client-credential settings for abfss/s3a/gs.
    """
    import os

    for key, value in conf.items():
        if isinstance(value, str) and value.startswith("env:"):
            name = value[4:]
            value = os.environ.get(secret_env_prefix + name, os.environ.get(name))
            if value is None:
                raise KeyError(f"secret env var {name!r} not set")
        spark.conf.set(key, value)


def run_pipeline(spark, config: dict):
    """Config-driven end-to-end runner — the reference's widget-driven
    main path (ops #4/#28, `Spatially ETL test.py:38-66,130-135`) as a
    plain dict instead of dbutils widgets.

    config keys: ``data_source`` ("BLOB" | "API"), then per-source:
    BLOB → ``path`` (+ optional ``fs_conf`` for `configure_object_store`);
    API → ``base_url``/``limit``/``total_records``/``schema``
    (+ optional ``fetch_page`` injection for tests). Optional
    ``gold_table`` writes the filtered result (op #25/#26). Unknown
    source raises, matching the reference's fail-fast guard
    (`Spatially ETL test.py:134-135`).
    """
    source = config.get("data_source")
    if source == "BLOB":
        from spatially_databricks_etl_spark.sources.files import read_csv

        if config.get("fs_conf"):
            configure_object_store(spark, config["fs_conf"])
        raw = read_csv(spark, config["path"], schema=config.get("schema"))
    elif source == "API":
        from spatially_databricks_etl_spark.sources.rest import fetch_paginated_to_df

        raw = fetch_paginated_to_df(
            spark,
            config["base_url"],
            limit=config["limit"],
            total_records=config["total_records"],
            schema=config["schema"],
            fetch_page=config.get("fetch_page"),
        )
    else:
        raise ValueError(f"unsupported data_source: {source!r} (expected BLOB or API)")

    transform = config.get("transform", lambda df: df)
    out = transform(raw)
    if config.get("gold_table"):
        from spatially_databricks_etl_spark.sinks.writers import save_as_table

        save_as_table(out, config["gold_table"], mode="overwrite")
        return spark.table(config["gold_table"])
    return out
