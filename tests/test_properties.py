"""Property-based tests (hypothesis): the codegen'd column-expression
implementations must agree with plain-Python reference semantics on
arbitrary inputs — nulls, empties, unicode, single chars."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from spatially_databricks_etl_spark.functions.text import (
    ngrams,
    rolling_fingerprint,
    token_count,
)
from spatially_databricks_etl_spark.operators.dedup import jaccard

TEXT = st.text(
    alphabet=st.characters(codec="ascii", exclude_characters="\x00"), max_size=60
)
SETTINGS = settings(
    max_examples=12,
    deadline=None,
    derandomize=True,  # CI-stable: no fresh random examples per run
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(texts=st.lists(TEXT, min_size=1, max_size=8))
@SETTINGS
def test_char_ngrams_match_python(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = [r["g"] for r in df.select(ngrams("t", 3, character=True).alias("g")).collect()]
    for t, g in zip(texts, got):
        lo = t.lower()
        want = [lo[i : i + 3] for i in range(len(lo) - 2)] if len(lo) >= 3 else []
        assert g == want, (t, g, want)


@given(texts=st.lists(TEXT, min_size=1, max_size=8))
@SETTINGS
def test_rolling_fingerprint_matches_python(spark, texts):
    mod, base = (1 << 31) - 1, 257
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = [
        r["fp"]
        for r in df.select(rolling_fingerprint("t", modulus=mod).alias("fp")).collect()
    ]
    for t, fp in zip(texts, got):
        acc = 0
        for ch in t:
            acc = (acc * base + ord(ch)) % mod
        assert fp == acc, (t, fp, acc)


@given(
    a=st.lists(st.text(alphabet="abcd", min_size=1, max_size=3), max_size=8),
    b=st.lists(st.text(alphabet="abcd", min_size=1, max_size=3), max_size=8),
)
@SETTINGS
def test_jaccard_matches_python_sets(spark, a, b):
    df = spark.createDataFrame([(a, b)], "a array<string>, b array<string>")
    got = df.select(jaccard(F.col("a"), F.col("b")).alias("j")).collect()[0]["j"]
    sa, sb = set(a), set(b)
    want = len(sa & sb) / len(sa | sb) if (sa | sb) else 0.0
    assert abs(got - want) < 1e-9, (a, b, got, want)


@given(texts=st.lists(TEXT, min_size=1, max_size=8))
@SETTINGS
def test_whitespace_token_count_matches_python(spark, texts):
    import re

    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = [
        r["n"]
        for r in df.select(token_count("t", whitespace=True).alias("n")).collect()
    ]
    for t, n in zip(texts, got):
        # reference uses JAVA \s semantics ([ \t\n\x0b\f\r], unlike
        # Python str.split's broader unicode whitespace) and Spark
        # trim() semantics (strips 0x20 only) — the same definitions
        # the DuckDB oracle regexes use
        stripped = t.strip(" ")
        want = len(re.split(r"[ \t\n\x0b\f\r]+", stripped)) if stripped else 0
        assert n == want, (repr(t), n, want)
