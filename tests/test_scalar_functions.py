"""Unit tests for the reference's scalar surface (SURVEY.md §2a),
including the dirty-data edge cases the reference itself hits:
'~' sentinels → null on cast, parenthesized geolocation strings with
stray whitespace, mixed-case recodes (FIXTURES.md §A)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spatially_databricks_etl_spark.functions.scalar import (
    cast_columns,
    clean_split_part,
    make_struct,
    recode,
    recode_when_contains,
    rename_columns,
    snake_case_columns,
    struct_cast_fields,
    typed_null,
)


def test_clean_split_part_geolocation(spark):
    # the reference's exact "(lat, lon)" parse, Spatially ETL test.py:156-157
    df = spark.createDataFrame(
        [("(41.5, -72.7)",), ("( 12.0 ,  99.9 )",), (None,)], ["geo"]
    )
    out = df.select(
        clean_split_part("geo", index=0, cast="double").alias("lat"),
        clean_split_part("geo", index=1, cast="double").alias("lon"),
    ).collect()
    assert (out[0]["lat"], out[0]["lon"]) == (41.5, -72.7)
    assert (out[1]["lat"], out[1]["lon"]) == (12.0, 99.9)
    assert out[2]["lat"] is None


def test_cast_null_on_malformed(spark):
    # '~' sentinel (Spatially ETL test.py:148) must become null, not error
    df = spark.createDataFrame([("~", "3.5"), ("2020", "bad")], ["y", "v"])
    out = cast_columns(df, {"y": "integer", "v": "double"}).collect()
    assert out[0]["y"] is None and out[0]["v"] == 3.5
    assert out[1]["y"] == 2020 and out[1]["v"] is None


def test_make_struct_typed_null(spark):
    df = spark.createDataFrame([(1.0, 2.0)], ["lat", "lon"])
    out = df.select(
        make_struct(
            {
                "human_address": typed_null("string"),
                "latitude": F.col("lat"),
                "longitude": F.col("lon"),
            }
        ).alias("geo")
    )
    row = out.collect()[0]["geo"]
    assert row["human_address"] is None
    assert row["latitude"] == 1.0
    field = dict.fromkeys(out.schema["geo"].dataType.fieldNames())
    assert list(field) == ["human_address", "latitude", "longitude"]


def test_struct_cast_fields_withfield(spark):
    # API-branch withField casts, Spatially ETL test.py:165-168
    df = spark.createDataFrame([(("addr", "1.5", "2.5"),)], "geo struct<human_address:string,latitude:string,longitude:string>")
    out = df.select(
        struct_cast_fields("geo", {"latitude": "double", "longitude": "double"}).alias("geo")
    )
    dt = {f.name: f.dataType.simpleString() for f in out.schema["geo"].dataType.fields}
    assert dt == {"human_address": "string", "latitude": "double", "longitude": "double"}
    row = out.collect()[0]["geo"]
    assert row["latitude"] == 1.5 and row["human_address"] == "addr"


def test_recode_equality_and_contains(spark):
    # datasource recode :174-175 and percent recode :176-177
    df = spark.createDataFrame(
        [("Behavioral Risk Factor Surveillance System", "Percent of adults", "Value"),
         ("Other Source", "Number of adults", "Number")],
        ["datasource", "question", "data_value_type"],
    )
    out = df.select(
        recode("datasource", {"Behavioral Risk Factor Surveillance System": "BRFSS"}).alias("ds"),
        recode_when_contains(
            "question", "percent", "Percent", default=F.col("data_value_type")
        ).alias("dvt"),
    ).collect()
    assert out[0]["ds"] == "BRFSS" and out[0]["dvt"] == "Percent"
    assert out[1]["ds"] == "Other Source" and out[1]["dvt"] == "Number"


def test_rename_and_snake_case(spark):
    df = spark.createDataFrame([(1, 2)], ["yearstart", "LocationDesc"])
    out = rename_columns(df, {"yearstart": "year_start"})
    assert "year_start" in out.columns
    out2 = snake_case_columns(df)
    assert out2.columns == ["yearstart", "location_desc"]


def test_haversine_known_distance(spark):
    from pyspark.sql import functions as F

    from spatially_databricks_etl_spark.functions.geo import haversine_km, in_bbox

    # NYC (40.7128, -74.0060) to LA (34.0522, -118.2437): ~3936 km
    df = spark.createDataFrame([(40.7128, -74.0060, 34.0522, -118.2437)],
                               ["lat1", "lon1", "lat2", "lon2"])
    d = df.select(
        haversine_km(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("d")
    ).first()["d"]
    assert abs(d - 3936) < 5
    # zero distance to self; symmetry
    z = df.select(
        haversine_km(F.col("lat1"), F.col("lon1"), F.col("lat1"), F.col("lon1")).alias("z"),
        (haversine_km(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2"))
         - haversine_km(F.col("lat2"), F.col("lon2"), F.col("lat1"), F.col("lon1"))).alias("s"),
    ).first()
    assert z["z"] == 0.0 and abs(z["s"]) < 1e-9
    box = df.select(
        in_bbox(F.col("lat1"), F.col("lon1"), south=40, west=-75, north=41, east=-73).alias("a"),
        in_bbox(F.col("lat2"), F.col("lon2"), south=40, west=-75, north=41, east=-73).alias("b"),
    ).first()
    assert box["a"] is True and box["b"] is False


def test_normalize_text_folds(spark):
    """Typographic + accent folds, lowercase, whitespace collapse;
    plain ASCII passes through; NULL stays NULL; empty stays empty."""
    from spatially_databricks_etl_spark.functions.text import normalize_text

    cases = {
        "Café — “Déjà Vu”": 'cafe - "deja vu"',
        "L’éléphant  naïf": "l'elephant naif",
        "  A\tB\n\nC  ": "a b c",
        "plain ascii stays put": "plain ascii stays put",
        "ÀÇÑÈ àçñè": "acne acne",
        "": "",
    }
    df = spark.createDataFrame([(k,) for k in cases], "t string")
    got = {
        r["t"]: r["n"]
        for r in df.select("t", normalize_text("t").alias("n")).collect()
    }
    assert got == cases
    nul = spark.createDataFrame([(None,)], "t string")
    assert nul.select(normalize_text("t").alias("n")).first()["n"] is None
