"""End-to-end replay of the reference's BLOB (CSV) path on a
BRFSS-shaped dirty fixture — family-A schema from FIXTURES.md §A with
every dirty-data property the reference's inputs carry: '~' sentinels,
parenthesized comma-joined geolocation with stray whitespace,
non-numeric strings in numeric columns, mixed-case 'Total', the
long-form datasource value.

Mirrors `Spatially ETL test.py:131` (header-only all-string read),
`:156-163` (geolocation parse + struct build), `:170-177` (casts +
recodes), `:180-185` (renames), `:189-202` (projection), `:205` (view),
`:237-245` (filtered CTAS), `:249-250` (read-back)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spatially_databricks_etl_spark.functions.scalar import (
    cast_columns,
    clean_split_part,
    make_struct,
    project,
    rename_columns,
    recode,
    recode_when_contains,
    typed_null,
)
from spatially_databricks_etl_spark.sinks.writers import save_as_table
from spatially_databricks_etl_spark.sources.files import read_csv

CSV = """yearstart,yearend,locationabbr,locationdesc,datasource,class,question,data_value_type,data_value,sample_size,geolocation,stratificationcategory1,stratification1
2021,2021,AL,Alabama,Behavioral Risk Factor Surveillance System,Obesity,Percent of adults aged 18 years and older who have obesity,Value,32.3,1500,"( 32.84, -86.63 )",Age (years),18 - 24
2021,2021,CA,California,Behavioral Risk Factor Surveillance System,Obesity,Percent of adults who report consuming fruit,Value,~,~,"(37.63, -120.99)",Total,Total
2019,2019,TX,Texas,Other Source,Nutrition,Number of adults surveyed,Count,28.1,abc,"(31.82,-99.42)",Gender,Female
2021,2021,GU,Guam,Behavioral Risk Factor Surveillance System,Obesity,Percent of adults,Value,30.0,900,"(13.44, 144.79)",Age (years),25 - 34
2021,2021,NY,New York,Behavioral Risk Factor Surveillance System,Obesity,percent question,Value,25.7,2000,"(42.17, -74.95)",TOTAL,total
"""


def test_brfss_blob_path_end_to_end(spark, tmp_path):
    p = tmp_path / "brfss.csv"
    p.write_text(CSV)
    # :131 — header-only read, every column string
    raw = read_csv(spark, str(p))
    assert all(f.dataType.simpleString() == "string" for f in raw.schema.fields)

    # :156-163 — geolocation "(lat, lon)" → struct with typed-null address
    df = raw.withColumn(
        "geolocation",
        make_struct(
            {
                "human_address": typed_null("string"),
                "latitude": clean_split_part("geolocation", index=0, cast="double"),
                "longitude": clean_split_part("geolocation", index=1, cast="double"),
            }
        ),
    )
    # :170-173 — casts; '~'/'abc' must null, not error (ANSI-safe)
    df = cast_columns(
        df, {"yearstart": "int", "yearend": "int", "data_value": "double", "sample_size": "int"}
    )
    # :174-177 — recodes
    df = df.withColumn(
        "datasource",
        recode("datasource", {"Behavioral Risk Factor Surveillance System": "BRFSS"}),
    ).withColumn(
        "data_value_type",
        recode_when_contains("question", "percent", "Percent", default=F.col("data_value_type")),
    )
    # :180-185 — snake-case renames; :189-202 — 12-col projection
    df = rename_columns(
        df,
        {
            "yearstart": "year_start",
            "yearend": "year_end",
            "locationabbr": "location_abbreviation",
            "locationdesc": "location_description",
            "stratificationcategory1": "stratification_category_1",
            "stratification1": "stratification_1",
        },
    )
    gold_cols = [
        "year_start", "year_end", "location_abbreviation", "location_description",
        "datasource", "class", "data_value_type", "data_value", "sample_size",
        "geolocation", "stratification_category_1", "stratification_1",
    ]
    df = project(df, gold_cols)

    # :205 + :237-245 — view + filtered CTAS (range + IN + NOT RLIKE)
    df.createOrReplaceTempView("cleaned_and_transformed_brfss")
    gold = spark.sql(
        """
        SELECT * FROM cleaned_and_transformed_brfss
        WHERE year_start >= 2020 AND year_end <= 2022
          AND location_abbreviation IN ('AL','CA','NY','TX')
          AND stratification_category_1 NOT RLIKE '(?i)total'
        """
    )
    save_as_table(gold, "gold_brfss_test", mode="overwrite")

    # :249-250 — read back and check semantics row by row
    got = {r["location_abbreviation"]: r for r in spark.table("gold_brfss_test").collect()}
    # TX: year 2019 out of range; GU: not in IN-list; CA + NY: Total filtered
    assert set(got) == {"AL"}
    al = got["AL"]
    assert al["datasource"] == "BRFSS"
    assert al["data_value_type"] == "Percent"  # question contains 'Percent...'
    assert al["geolocation"]["human_address"] is None
    assert abs(al["geolocation"]["latitude"] - 32.84) < 1e-9
    assert abs(al["geolocation"]["longitude"] + 86.63) < 1e-9
    assert al["sample_size"] == 1500

    # dirty-value semantics before the filter: '~' and 'abc' → null
    pre = {r["location_abbreviation"]: r for r in df.collect()}
    assert pre["CA"]["data_value"] is None and pre["CA"]["sample_size"] is None
    assert pre["TX"]["sample_size"] is None
    assert pre["NY"]["data_value_type"] == "Percent"  # lowercase 'percent question'
