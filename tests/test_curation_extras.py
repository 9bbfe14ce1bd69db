"""Tests for the PII / repetition / decontamination curation ops.

Tiny hand-built frames with known-by-construction answers, plus a
plan-shape check that the decontamination probe broadcasts the
benchmark side (the 100 TB-corpus design in curate.decontaminate).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spatially_databricks_etl_spark.functions.text import pii_count, redact_pii
from spatially_databricks_etl_spark.operators.curate import (
    decontaminate,
    repetition_metrics,
)


def test_pii_count_and_redact(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b@x.co and c@y.io, call 555-1234, host 10.0.0.1"),
            (2, "no pii here at all"),
            (3, ""),
        ],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            pii_count("text", "email").alias("e"),
            pii_count("text", "phone").alias("p"),
            pii_count("text", "ip").alias("i"),
            redact_pii("text").alias("red"),
        ).collect()
    }
    assert (rows[1]["e"], rows[1]["p"], rows[1]["i"]) == (2, 1, 1)
    assert rows[1]["red"] == "mail <EMAIL> and <EMAIL>, call <PHONE>, host <IP>"
    assert (rows[2]["e"], rows[2]["p"], rows[2]["i"]) == (0, 0, 0)
    assert rows[2]["red"] == "no pii here at all"
    assert rows[3]["red"] == ""


def test_redact_order_email_before_phone(spark):
    # the digits inside an email local part must not survive as a
    # phone match after email redaction (letter-only tokens guarantee
    # later patterns can't fire inside them)
    df = spark.createDataFrame([("x 555-1234@ex.com y",)], ["text"])
    assert df.select(redact_pii("text").alias("r")).first()["r"] == "x <EMAIL> y"


def test_repetition_metrics_known_values(spark):
    docs = spark.createDataFrame(
        [
            (1, "a a a a"),  # 1 distinct / 4 toks; bigrams: "a a" x3 -> top 1.0
            (2, "w x y z"),  # all distinct; 3 distinct bigrams -> top 1/3
            (3, "solo"),  # one token: no bigrams -> 0.0
            (4, ""),  # empty: both 0.0
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in repetition_metrics(docs).collect()}
    assert out[1]["dup_token_frac"] == 0.75
    assert out[1]["top_bigram_frac"] == 1.0
    assert out[2]["dup_token_frac"] == 0.0
    assert abs(out[2]["top_bigram_frac"] - 1 / 3) < 1e-12
    assert out[3]["dup_token_frac"] == 0.0
    assert out[3]["top_bigram_frac"] == 0.0
    assert out[4]["dup_token_frac"] == 0.0
    assert out[4]["top_bigram_frac"] == 0.0


def test_decontaminate_exact_5gram_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"],
    )
    corpus = spark.createDataFrame(
        [
            # shares "the quick brown fox jumps" and "quick brown fox
            # jumps over" (2 distinct shared 5-grams)
            (1, "see the quick brown fox jumps over fences"),
            (2, "completely unrelated text with many different words"),
            (3, "quick brown fox"),  # <5 tokens of overlap, no 5-gram
        ],
        ["doc_id", "text"],
    )
    out = decontaminate(corpus, bench, n=5)
    rows = {r["doc_id"]: r["n_shared_ngrams"] for r in out.collect()}
    assert rows == {1: 2}


def test_hash_split_deterministic_and_proportional(spark):
    from spatially_databricks_etl_spark.operators.curate import hash_split

    docs = spark.range(20000).toDF("doc_id")
    out = hash_split(docs, salt="s1").groupBy("split").count()
    counts = {r["split"]: r["count"] for r in out.collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 20000 - 0.8) < 0.02
    assert abs(counts["val"] / 20000 - 0.1) < 0.02
    # same key + salt => identical assignment across calls and methods
    a = hash_split(docs, salt="s1").collect()
    b = hash_split(docs, salt="s1").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # different salt reshuffles a nontrivial fraction
    c = dict(
        hash_split(docs, salt="s2").select("doc_id", "split").collect()
    )
    a_map = dict(docs.sparkSession.createDataFrame(a, ["doc_id", "split"]).collect())
    moved = sum(1 for k, v in a_map.items() if c[k] != v)
    assert moved > 1000


def test_merge_upsert_semantics(spark):
    from spatially_databricks_etl_spark.operators.relational import merge_upsert

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["k", "name", "v"]
    )
    source = spark.createDataFrame(
        [(2, "b2", 99.0), (4, "d", 40.0)], ["k", "name", "v"]
    )
    rows = {r["k"]: r for r in merge_upsert(target, source, key_cols=["k"]).collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert (rows[2]["name"], rows[2]["v"]) == ("b2", 99.0)  # updated
    assert rows[4]["name"] == "d"  # inserted
    assert rows[1]["v"] == 10.0  # untouched


def test_pack_sequences_invariants(spark):
    from spatially_databricks_etl_spark.operators.curate import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (7 + (i * 13) % 50))) for i in range(200)],
        ["doc_id", "text"],
    )
    out = pack_sequences(docs, capacity=64, n_shards=4).collect()
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    assert len(out) == 200
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r["doc_id"])
        pos = 0
        for r in rows:
            # replay the concat-and-chunk layout sequentially
            assert r["first_seq"] == pos // 64
            end = pos + r["n_tokens"] - 1
            assert r["last_seq"] == max(pos // 64, end // 64)
            pos += r["n_tokens"]


def test_decontaminate_broadcasts_benchmark(spark):
    bench = spark.createDataFrame([(1, "a b c d e f")], ["doc_id", "text"])
    corpus = spark.createDataFrame([(2, "a b c d e g")], ["doc_id", "text"])
    plan = (
        decontaminate(corpus, bench)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_expectations_split_and_summary(spark):
    from pyspark.sql import functions as F

    from spatially_databricks_etl_spark.operators.quality import (
        expectation_summary,
        split_quarantine,
    )

    df = spark.createDataFrame(
        [(1, 10, "en"), (2, 100, "en"), (3, 100, "xx"), (4, 5, None)],
        ["id", "n", "lang"],
    )
    rules = {
        "big_enough": F.col("n") >= 50,
        "known_lang": F.col("lang").isin("en", "de"),
    }
    clean, bad = split_quarantine(df, rules)
    assert {r["id"] for r in clean.collect()} == {2}
    bad_rows = {r["id"]: set(r["_violations"]) for r in bad.collect()}
    assert bad_rows == {
        1: {"big_enough"},
        3: {"known_lang"},
        4: {"big_enough", "known_lang"},  # null lang counts as failure
    }
    summary = {r["rule"]: (r["n_violations"], r["n_rows"])
               for r in expectation_summary(df, rules).collect()}
    assert summary == {"big_enough": (2, 4), "known_lang": (2, 4)}


def test_chunk_documents_windows(spark):
    from spatially_databricks_etl_spark.operators.curate import chunk_documents

    toks = [f"t{i}" for i in range(10)]
    docs = spark.createDataFrame(
        [(1, " ".join(toks)), (2, "a b"), (3, "")], ["doc_id", "text"]
    )
    out = chunk_documents(docs, chunk_tokens=4, overlap=2)
    rows = sorted(
        ((r["doc_id"], r["chunk_idx"], r["chunk_text"], r["n_chunk_tokens"])
         for r in out.collect())
    )
    # doc1: starts 0,2,4,6,8 -> windows of 4 (tail short)
    assert rows == [
        (1, 0, "t0 t1 t2 t3", 4),
        (1, 1, "t2 t3 t4 t5", 4),
        (1, 2, "t4 t5 t6 t7", 4),
        (1, 3, "t6 t7 t8 t9", 4),
        (1, 4, "t8 t9", 2),
        (2, 0, "a b", 2),
        # doc3 (empty): no chunks
    ]


def test_tfidf_top_terms_known_values(spark):
    import math

    from spatially_databricks_etl_spark.operators.curate import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry durian"),
        ],
        ["doc_id", "text"],
    )
    out = tfidf_top_terms(docs, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for rows in by_doc.values():
        rows.sort(key=lambda r: r["rank"])

    def idf(df):
        return math.log((3 + 1) / (df + 1)) + 1

    # doc1: apple tf=2 df=1 -> 2*idf(1); banana tf=1 df=2
    assert by_doc[1][0]["term"] == "apple"
    assert abs(by_doc[1][0]["score"] - round(2 * idf(1), 4)) < 1e-9
    assert by_doc[1][1]["term"] == "banana"
    # doc3: cherry tf=3 df=2 beats durian tf=1 df=1
    assert [r["term"] for r in by_doc[3]] == ["cherry", "durian"]
    # every doc emits at most k rows with ranks 1..k
    assert all(len(v) <= 2 and [r["rank"] for r in v] == list(range(1, len(v) + 1))
               for v in by_doc.values())


def test_dedup_lines_removes_boilerplate_preserves_order(spark):
    from spatially_databricks_etl_spark.operators.curate import dedup_lines

    rows = [
        (0, "banner\nalpha zero\nmid\nomega zero"),
        (1, "banner\nalpha one\nmid\nomega one"),
        (2, "banner\nalpha two\nomega two"),
        (3, "banner"),  # fully boilerplate -> empty text, row kept
        (4, "solo content"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup_lines(d, max_doc_frequency=2).collect()}

    # 'banner' in 4 docs -> removed everywhere; 'mid' in exactly 2 -> kept
    assert out[0]["text"] == "alpha zero\nmid\nomega zero"
    assert out[1]["text"] == "alpha one\nmid\nomega one"
    assert out[2]["text"] == "alpha two\nomega two"
    assert out[3]["text"] == "" and out[3]["n_removed"] == 1
    assert out[4]["text"] == "solo content" and out[4]["n_removed"] == 0
    assert out[0]["n_removed"] == 1 and len(out) == 5


def test_dedup_lines_min_line_chars_exempts_short_lines(spark):
    from spatially_databricks_etl_spark.operators.curate import dedup_lines

    rows = [(i, f"ok\ncontent {i}") for i in range(5)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup_lines(d, max_doc_frequency=1, min_line_chars=5).collect()}
    # 'ok' (2 chars < 5) is exempt despite df=5; content lines unique
    assert all(out[i]["text"] == f"ok\ncontent {i}" for i in range(5))
    assert all(out[i]["n_removed"] == 0 for i in range(5))


def test_negative_samples_deterministic_and_self_free(spark):
    from spatially_databricks_etl_spark.operators.curate import negative_samples

    d = spark.createDataFrame([(i, f"doc {i}") for i in range(40)], "doc_id long, text string")
    a = negative_samples(d, k=3, bucket_hex_chars=1).collect()
    b = negative_samples(d.repartition(7), k=3, bucket_hex_chars=1).collect()
    sa = {(r["anchor_id"], r["sample_idx"], r["negative_id"]) for r in a}
    sb = {(r["anchor_id"], r["sample_idx"], r["negative_id"]) for r in b}
    assert sa == sb, "sampling must not depend on partitioning"
    assert all(an != n for an, _, n in sa), "anchor must never be its own negative"
    assert all(1 <= j <= 3 for _, j, _ in sa)
    # at most one negative per (anchor, j)
    assert len(sa) == len({(an, j) for an, j, _ in sa})
    # with 16 buckets over 40 docs, almost every probe should land
    assert len(sa) >= 40 * 3 * 0.8


def test_histogram_counts_and_edges(spark):
    from spatially_databricks_etl_spark.operators.profile import histogram

    d = spark.createDataFrame([(float(x),) for x in range(101)], "v double")
    out = {r["bucket"]: r for r in histogram(d, "v", bins=10).collect()}
    assert sum(r["n"] for r in out.values()) == 101
    # x == hi closes the last bucket; interior buckets get 10 each
    assert out[9]["n"] == 11 and all(out[b]["n"] == 10 for b in range(9))
    assert out[0]["lo_edge"] == 0.0 and out[9]["hi_edge"] == 100.0

    import pytest

    with pytest.raises(ValueError, match="hi"):
        histogram(spark.createDataFrame([(1.0,), (1.0,)], "v double"), "v")


def test_corr_matrix_one_pass_matches_pairwise(spark):
    from spatially_databricks_etl_spark.operators.profile import corr_matrix

    rows = [(float(i), float(i) * 2 + 1, float((i * 7) % 5)) for i in range(50)]
    d = spark.createDataFrame(rows, "a double, b double, c double")
    out = {(r["col_a"], r["col_b"]): r["corr"] for r in corr_matrix(d, ["a", "b", "c"]).collect()}
    assert out[("a", "b")] == 1.0  # exact linear relation
    assert len(out) == 3
    want = d.agg(F.round(F.corr("a", "c"), 6)).collect()[0][0]
    assert out[("a", "c")] == want


def test_winsorize_clamps_at_exact_percentiles(spark):
    from spatially_databricks_etl_spark.operators.profile import winsorize

    d = spark.createDataFrame([(float(x),) for x in range(101)], "v double")
    out = winsorize(d, "v", p_lo=0.10, p_hi=0.90, out_col="w").agg(
        F.min("w"), F.max("w"), F.count("*")
    ).collect()[0]
    # exact linear-interp percentiles of 0..100 at 0.1/0.9 are 10 and 90
    assert out[0] == 10.0 and out[1] == 90.0 and out[2] == 101

    import pytest

    with pytest.raises(ValueError, match="p_lo"):
        winsorize(d, "v", p_lo=0.9, p_hi=0.1)


def test_weighted_sample_deterministic_and_weight_sensitive(spark):
    from spatially_databricks_etl_spark.operators.profile import weighted_sample

    rows = [(i, 1.0 if i else 1e9) for i in range(200)]  # doc 0 hugely weighted
    d = spark.createDataFrame(rows, "doc_id long, w double")
    a = {r["doc_id"] for r in weighted_sample(d, weight_col="w", n=20).collect()}
    b = {r["doc_id"] for r in weighted_sample(d.repartition(7), weight_col="w", n=20).collect()}
    assert a == b and len(a) == 20, "draw must not depend on partitioning"
    assert 0 in a, "a ~1e9x weight must be sampled"
    c = {r["doc_id"] for r in weighted_sample(d, weight_col="w", n=20, salt="x").collect()}
    assert c != a, "changing salt must redraw"
    # non-positive weights are excluded
    z = spark.createDataFrame([(1, 0.0), (2, -1.0), (3, 5.0)], "doc_id long, w double")
    got = {r["doc_id"] for r in weighted_sample(z, weight_col="w", n=3).collect()}
    assert got == {3}


def test_weighted_sample_by_group_caps_each_group(spark):
    from spatially_databricks_etl_spark.operators.profile import weighted_sample_by_group

    rows = [(i, ["en", "fr", "de"][i % 3], float(1 + i % 7)) for i in range(60)]
    d = spark.createDataFrame(rows, "doc_id long, lang string, w double")
    out = weighted_sample_by_group(
        d, group_cols=["lang"], weight_col="w", n_per_group=5
    ).collect()
    from collections import Counter

    per = Counter(r["lang"] for r in out)
    assert per == {"en": 5, "fr": 5, "de": 5}
    again = weighted_sample_by_group(
        d.repartition(9), group_cols=["lang"], weight_col="w", n_per_group=5
    ).collect()
    assert {(r["lang"], r["doc_id"]) for r in out} == {
        (r["lang"], r["doc_id"]) for r in again
    }


def test_robust_zscore_resists_outliers(spark):
    from spatially_databricks_etl_spark.operators.profile import robust_zscore

    vals = [float(x) for x in range(1, 100)] + [1e9]  # one wild outlier
    d = spark.createDataFrame([(v,) for v in vals], "v double")
    out = {r["v"]: r["robust_z"] for r in robust_zscore(d, "v").collect()}
    # median/MAD barely move with one outlier: the bulk stays |rz| < 3.5
    bulk = [abs(out[float(x)]) for x in range(1, 100)]
    assert max(bulk) < 3.5
    assert out[1e9] > 1000  # the outlier itself screams

    # degenerate MAD -> null scores, not infinities
    flat = spark.createDataFrame([(1.0,)] * 10 + [(5.0,)], "v double")
    scores = [r["robust_z"] for r in robust_zscore(flat, "v").collect()]
    assert all(s is None for s in scores)


def test_profiling_ops_reject_empty_input(spark):
    import pytest

    from spatially_databricks_etl_spark.operators.profile import (
        histogram,
        robust_zscore,
        winsorize,
    )

    empty = spark.createDataFrame([], "v double")
    for op, pat in (
        (lambda: histogram(empty, "v"), "no non-null"),
        (lambda: winsorize(empty, "v"), "no non-null"),
        (lambda: robust_zscore(empty, "v"), "no non-null"),
    ):
        with pytest.raises(ValueError, match=pat):
            op()


def test_pagerank_ring_is_uniform_and_star_orders_correctly(spark):
    import pytest as _pytest

    from spatially_databricks_etl_spark.operators.curate import pagerank

    # Directed ring: every node has in/out degree 1 -> uniform 1/N is
    # the exact fixed point, reached identically at ANY iteration count.
    n = 8
    ring = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "src: bigint, dst: bigint"
    )
    got = {r.node: r.rank for r in pagerank(ring, iterations=3).collect()}
    assert all(abs(v - 1.0 / n) < 1e-12 for v in got.values()), got

    # Star with a hub->1 back edge: the hub aggregates all leaf mass
    # and forwards it whole to node 1, so 0 and 1 sit strictly above
    # the source-only leaves 2..5, which tie exactly by symmetry.
    star = spark.createDataFrame(
        [(i, 0) for i in range(1, 6)] + [(0, 1)], "src: bigint, dst: bigint"
    )
    ranks = {r.node: r.rank for r in pagerank(star, iterations=10).collect()}
    leaf_vals = {round(v, 12) for k, v in ranks.items() if k not in (0, 1)}
    assert len(leaf_vals) == 1  # symmetric leaves tie exactly
    leaf = next(iter(leaf_vals))
    assert ranks[0] > leaf and ranks[1] > leaf, ranks

    with _pytest.raises(ValueError, match="damping"):
        pagerank(ring, damping=1.5)
    with _pytest.raises(ValueError, match="iterations"):
        pagerank(ring, iterations=0)


def test_exact_quantile_kernels_match_percentile(spark):
    """Both exact-quantile kernels (counts-histogram, distributed
    selection) must reproduce F.percentile / quantile_cont bit-for-bit
    across interior, boundary, and tied-value cases."""
    import pytest as _pytest

    from spatially_databricks_etl_spark.operators.profile import (
        exact_quantile_from_counts,
        exact_quantile_select,
    )
    from tests.conftest import SF_DIR

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    for q in (0.0, 0.25, 0.5, 0.9, 1.0):
        ref = li.agg(F.percentile(F.col("l_extendedprice"), F.lit(q))).first()[0]
        assert abs(exact_quantile_select(li, "l_extendedprice", q) - ref) < 1e-9
        assert abs(exact_quantile_from_counts(li, "l_extendedprice", q) - ref) < 1e-9

    # heavy ties + nulls
    tied = spark.createDataFrame(
        [(v,) for v in [1.0] * 5 + [2.0] * 3 + [9.0] + [None]], "v: double"
    )
    for q in (0.1, 0.5, 0.875):
        ref = tied.agg(F.percentile(F.col("v"), F.lit(q))).first()[0]
        assert abs(exact_quantile_select(tied, "v", q) - ref) < 1e-12
        assert abs(exact_quantile_from_counts(tied, "v", q) - ref) < 1e-12

    empty = spark.createDataFrame([], "v: double")
    with _pytest.raises(ValueError, match="no non-null"):
        exact_quantile_select(empty, "v", 0.5)
    with _pytest.raises(ValueError, match="q must be"):
        exact_quantile_select(tied, "v", 1.5)


def test_histogram_equiheight_balanced_and_tied(spark):
    import pytest as _pytest

    from spatially_databricks_etl_spark.operators.profile import histogram_equiheight

    df = spark.range(1000).selectExpr("CAST(id AS DOUBLE) AS v")
    got = {r.bucket: r.n for r in histogram_equiheight(df, "v", bins=4).collect()}
    # uniform data -> each quartile bucket holds ~250 rows
    assert set(got) == {0, 1, 2, 3}
    assert all(240 <= n <= 260 for n in got.values()), got
    assert sum(got.values()) == 1000

    # constant column: all cutpoints equal -> everything lands in the
    # top bucket (ties go right), nothing is lost
    const = spark.createDataFrame([(5.0,)] * 10, "v: double")
    got_c = {r.bucket: r.n for r in histogram_equiheight(const, "v", bins=4).collect()}
    assert got_c == {3: 10}

    with _pytest.raises(ValueError, match="bins"):
        histogram_equiheight(df, "v", bins=1)


def test_feature_hash_stability_and_range(spark):
    import pytest as _pytest

    from spatially_databricks_etl_spark.operators.curate import feature_hash

    df = spark.createDataFrame(
        [("click", 7), ("view", 8), ("click", None)], "et: string, uid: int"
    )
    out = feature_hash(df, cols=["et", "uid"], dims=32).collect()
    for r in out:
        assert len(r.feature_idx) == 2
        for v in r.feature_idx:
            assert v is None or 0 <= v < 32
    # same value -> same index, across rows and calls
    again = feature_hash(df, cols=["et", "uid"], dims=32).collect()
    assert sorted(map(str, out)) == sorted(map(str, again))
    click_idx = {r.feature_idx[0] for r in out if r.et == "click"}
    assert len(click_idx) == 1
    # null value -> null slot, not a phantom feature
    assert [r.feature_idx[1] for r in out if r.uid is None] == [None]
    with _pytest.raises(ValueError, match="dims"):
        feature_hash(df, cols=["et"], dims=0)


def test_column_profile_single_pass_counts(spark):
    import pytest as _pytest

    from spatially_databricks_etl_spark.operators.profile import column_profile

    df = spark.createDataFrame(
        [(1, "a", None), (2, "a", 5.0), (3, None, 5.0), (3, "b", None)],
        "k: bigint, s: string, v: double",
    )
    got = {r.column: (r.n_rows, r.n_distinct, r.n_nulls) for r in column_profile(df).collect()}
    assert got == {"k": (4, 3, 0), "s": (4, 2, 1), "v": (4, 1, 2)}
    with _pytest.raises(ValueError, match="no columns"):
        column_profile(df, [])
    # single aggregation job: exactly one scan node in the plan
    plan = column_profile(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") <= 1


def test_triangle_count_planted_graph(spark):
    """Planted graph: K4 on {1,2,3,4} (4 triangles) plus a pendant
    path 4-5-6 (0 triangles) plus a disconnected triangle {7,8,9} —
    5 triangles total, 10 edges. Reversed duplicates and self-loops
    must not change the counts."""
    from spatially_databricks_etl_spark.operators.curate import triangle_count

    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = k4 + [(4, 5), (5, 6), (7, 8), (8, 9), (7, 9)]
    noisy = edges + [(b, a) for a, b in edges] + [(1, 1), (5, 5)]
    df = spark.createDataFrame(noisy, "src long, dst long")
    row = triangle_count(df).collect()[0]
    assert row["n_edges"] == 11
    assert row["n_triangles"] == 5


def test_triangle_count_star_has_no_triangles(spark):
    """A star (the degree-skew worst case for naive wedge counting)
    has zero triangles; degree orientation emits no wedges from the
    hub."""
    from spatially_databricks_etl_spark.operators.curate import triangle_count

    star = [(0, i) for i in range(1, 50)]
    df = spark.createDataFrame(star, "src long, dst long")
    row = triangle_count(df).collect()[0]
    assert row["n_edges"] == 49
    assert row["n_triangles"] == 0


def test_resample_interpolate_linear_values(spark):
    """A 3-day gap between observations 10.0 and 50.0 must fill with
    the straight line (20, 30, 40); observed buckets keep their own
    values and is_gap=False."""
    import datetime as dt

    from spatially_databricks_etl_spark.operators.relational import (
        resample_interpolate,
    )

    rows = [
        (1, dt.datetime(2024, 1, 1, 5), 10.0),
        (1, dt.datetime(2024, 1, 5, 9), 50.0),
        (1, dt.datetime(2024, 1, 7, 1), 30.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz, value double")
    out = {
        r["bucket"].day: (r["filled_value"], r["is_gap"])
        for r in resample_interpolate(df).collect()
    }
    assert out[1] == (10.0, False)
    assert out[2] == (20.0, True)
    assert out[3] == (30.0, True)
    assert out[4] == (40.0, True)
    assert out[5] == (50.0, False)
    assert out[6] == (40.0, True)
    assert out[7] == (30.0, False)


def test_ts_anomaly_flags_injected_spike(spark):
    """Injected-anomaly property: a periodic series with small
    deterministic jitter (so residual MAD is small but non-zero) and
    ONE spiked bucket must flag exactly the spike bucket and the
    next period's bucket (the spike inflates its own residual AND
    the next day's forecast), with |z| far above threshold, while no
    clean bucket flags. A perfectly periodic series (every residual
    0 → MAD = 0) must hit the degenerate contract instead: null z,
    nothing flagged. Also pins the no-forecast warm-up (first period
    unscored)."""
    from spatially_databricks_etl_spark.operators.profile import ts_anomaly

    def series(spike: bool):
        rows = []
        for day in range(12):
            for slot, base in enumerate([10.0, 20.0, 30.0, 40.0]):
                # quadratic jitter: varied residual values (a LINEAR ramp
                # yields only two residual values, leaving MAD degenerate)
                v = base + 0.01 * ((day * day * 7 + slot * 13) % 23)
                if spike and day == 6 and slot == 2:
                    v += 500.0
                rows.append((f"2024-03-{day + 1:02d} 0{slot}:00:00", "m", v))
        return spark.createDataFrame(
            rows, "ts_s string, k string, value double"
        ).select(F.col("ts_s").cast("timestamp").alias("ts"), "k", "value")

    out = ts_anomaly(
        series(True), ts_col="ts", value_col="value", key_cols=["k"],
        bucket="hour", period=24, threshold=3.5,
    ).collect()
    # 12 days - 1 day of warm-up = 44 scored buckets
    assert len(out) == 44
    flagged = {(r["bucket"].day, r["bucket"].hour) for r in out if r["is_anomaly"]}
    assert flagged == {(7, 2), (8, 2)}, flagged
    spike = [r for r in out if r["bucket"].day == 7 and r["bucket"].hour == 2][0]
    assert abs(spike["residual"] - 500.0) < 1.0 and spike["z_e6"] > 3_500_000

    # exactly periodic control: drop the jitter → every residual 0 →
    # MAD = 0 → null z, nothing flagged (robust_zscore degenerate)
    const_rows = [
        (f"2024-03-{day + 1:02d} 0{slot}:00:00", "m", base)
        for day in range(12)
        for slot, base in enumerate([10.0, 20.0, 30.0, 40.0])
    ]
    const = spark.createDataFrame(
        const_rows, "ts_s string, k string, value double"
    ).select(F.col("ts_s").cast("timestamp").alias("ts"), "k", "value")
    out2 = ts_anomaly(
        const, ts_col="ts", value_col="value", key_cols=["k"],
        bucket="hour", period=24, threshold=3.5,
    ).collect()
    assert out2 and all(r["z_e6"] is None and r["is_anomaly"] is None for r in out2)


def test_ts_changepoint_locates_injected_level_shift(spark):
    """Injected-changepoint property: a series that steps from level
    10 to level 30 exactly at bucket 61 of 120 must report its
    changepoint at the LAST pre-shift bucket (the centered CUSUM
    |S_t| peaks where the mass-vs-time discrepancy is widest — the
    boundary bucket) with a large statistic; a constant series scores
    exactly 0 (C_t/T = t/n identically); a key under min_buckets is
    dropped."""
    from spatially_databricks_etl_spark.operators.profile import ts_changepoint

    rows = []
    for h in range(120):
        day, hour = divmod(h, 24)
        ts = f"2024-03-{day + 1:02d} {hour:02d}:00:00"
        rows.append((ts, "shift", 10.0 if h < 60 else 30.0))
        rows.append((ts, "flat", 20.0))
    # a key with too few buckets to score
    rows += [(f"2024-03-01 0{h}:00:00", "tiny", 5.0) for h in range(4)]
    df = spark.createDataFrame(
        rows, "ts_s string, k string, value double"
    ).select(F.col("ts_s").cast("timestamp").alias("ts"), "k", "value")

    out = {
        r["k"]: r
        for r in ts_changepoint(
            df, ts_col="ts", value_col="value", key_cols=["k"],
            bucket="hour", min_buckets=8,
        ).collect()
    }
    assert set(out) == {"shift", "flat"}
    sh = out["shift"]
    # |S'_t| = |n*C_t - t*T| peaks at t=60 (the last level-10 bucket):
    # hour index 59 -> 2024-03-03 11:00
    assert (sh["cp_bucket"].day, sh["cp_bucket"].hour) == (3, 11)
    # closed form: n=120, T=1000*(60*10+60*30)=2400_000 scaled? value
    # scale 100: y=1000/3000; T=240000; S'_60 = 120*60000 - 60*240000
    # = 7_200_000 - 14_400_000 -> |.| = 7_200_000
    assert sh["s_abs_max"] == "7200000"  # exact-decimal string (overflow-safe form)
    # D = 7.2e6 / (120*240000) = 0.25
    assert sh["cusum_e6"] == 250_000
    fl = out["flat"]
    assert fl["s_abs_max"] == "0" and fl["cusum_e6"] == 0


def test_ts_anomaly_detrended_flags_spike_not_trend(spark):
    """STL-lite contract (VERDICT r10 item 6): on a series that is
    flat for four days then ramps steadily, the PLAIN seasonal-naive
    form conflates the trend with anomalies — the ramp makes the
    majority residual ~slope, so the genuinely-normal FLAT region
    z-flags wholesale. The DETRENDED form (trailing-6-bucket trend
    subtraction) scores the injected spike enormously while flagging
    NOTHING in the flat-clean or steady-ramp regions; only the
    spike's own contamination neighborhood (its trend-window shadow +
    seasonal echoes) and the ramp-onset transient are allowed."""
    from spatially_databricks_etl_spark.operators.profile import ts_anomaly

    def mk(spike: bool):
        rows = []
        for day in range(12):
            for slot in range(4):
                v = 100.0 + 0.1 * ((day * day * 7 + slot * 13) % 23)
                if day >= 5:
                    v += 20.0 * (day - 4)  # steady ramp from day 5
                if spike and day == 2 and slot == 1:
                    v += 500.0
                rows.append((f"2024-03-{day + 1:02d} 0{slot}:00:00", "m", v))
        return spark.createDataFrame(
            rows, "ts_s string, k string, value double"
        ).select(F.col("ts_s").cast("timestamp").alias("ts"), "k", "value")

    kw = dict(
        ts_col="ts", value_col="value", key_cols=["k"], bucket="hour",
        period=24, threshold=3.5,
    )
    plain = ts_anomaly(mk(True), **kw).collect()
    detr = ts_anomaly(mk(True), **kw, detrend_window=6).collect()

    def flagged(rows):
        return {(r["bucket"].day, r["bucket"].hour) for r in rows if r["is_anomaly"]}

    fp, fd = flagged(plain), flagged(detr)
    # the spike flags in BOTH forms, with a huge detrended z
    assert (3, 1) in fp and (3, 1) in fd
    spike_row = [r for r in detr if (r["bucket"].day, r["bucket"].hour) == (3, 1)][0]
    assert spike_row["z_e6"] > 50_000_000

    # plain conflates: the flat-clean region (days 2-5 = bucket days
    # 2..5, spike and its echo excluded) flags wholesale
    flat_clean = {
        (d, s) for d in (2, 3, 4, 5) for s in range(4)
    } - {(3, 1), (4, 1)}
    assert len(fp & flat_clean) >= 8, sorted(fp)

    # detrended: NOTHING flags in the flat-clean region or in the
    # steady-ramp region (days 9-12); allowed flags are the spike,
    # its trend-window shadow (the 6 observed buckets after it) and
    # their seasonal echoes, and the ramp-onset transient (days 6-8)
    shadow = {(3, 2), (3, 3), (4, 0), (4, 1), (4, 2), (4, 3)}
    echoes = {(d + 1, s) for (d, s) in shadow | {(3, 1)}}
    onset = {(d, s) for d in (6, 7, 8) for s in range(4)}
    allowed = {(3, 1)} | shadow | echoes | onset
    assert fd <= allowed, sorted(fd - allowed)
    steady = {(d, s) for d in (9, 10, 11, 12) for s in range(4)}
    assert not (fd & steady) and not (fd & flat_clean - allowed)

    # control: trend alone (no spike) — detrended flags at most the
    # ramp-onset transient, never the flat or steady regions
    detr_ctl = flagged(ts_anomaly(mk(False), **kw, detrend_window=6).collect())
    assert detr_ctl <= onset, sorted(detr_ctl - onset)


def test_label_propagation_two_communities_and_synchrony(spark):
    """label_propagation hand case: two triangles {0,1,2} and
    {10,11,12} joined by one bridge edge 2–10 resolve to exactly two
    communities after 3 synchronous rounds, and the round-1 labeling
    matches the hand-computed SYNCHRONOUS update (every node reads
    only the PREVIOUS round's labels) with the min-label tie-break —
    the two properties that make the operator SQL-replayable."""
    from spatially_databricks_etl_spark.operators.curate import label_propagation

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12), (2, 10)],
        "src long, dst long",
    )
    got3 = {
        r["node"]: r["community"]
        for r in label_propagation(edges, iterations=3).collect()
    }
    assert got3 == {0: 0, 1: 0, 2: 0, 10: 2, 11: 2, 12: 2}

    got1 = {
        r["node"]: r["community"]
        for r in label_propagation(edges, iterations=1).collect()
    }
    # round 1 from self-labels: each node takes the smallest neighbor
    # label (all neighbor labels distinct -> pure tie-break)
    assert got1 == {0: 1, 1: 0, 2: 0, 10: 2, 11: 10, 12: 10}

    # direction-insensitive: reversing every edge changes nothing
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    got3r = {
        r["node"]: r["community"]
        for r in label_propagation(rev, iterations=3).collect()
    }
    assert got3r == got3


def test_bpe_train_hand_case(spark):
    """bpe_train closed-form hand case: corpus 'low low lower' x2 +
    'new newer' — word freqs low:4, lower:2, new:1, newer:1. The
    round-1 arg-max ties (l,o) vs (o,w) at 6 and breaks to (l,o) by
    the (count DESC, left, right) rule; rounds 2-3 follow by hand."""
    from spatially_databricks_etl_spark.operators.curate import bpe_train

    docs = spark.createDataFrame(
        [(1, "low low lower"), (2, "low low lower"), (3, "new newer")],
        ["doc_id", "text"],
    )
    got = [
        (r["round"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe_train(docs, merges=3).orderBy("round").collect()
    ]
    # freqs: low=4, lower=2, new=1, newer=1
    # r1: lo=6, ow=6, we=3, er=3, ne=2, ew=2 -> tie lo/ow -> (l,o) 6
    # r2 symbols: low->[lo,w], lower->[lo,w,e,r], new->[n,e,w],
    #   newer->[n,e,w,e,r]; pairs: (lo,w)=6, (w,e)=3, (e,r)=3,
    #   (n,e)=2, (e,w)=2 -> (lo,w) 6
    # r3: low->[low], lower->[low,e,r], new/newer unchanged;
    #   pairs: (low,e)=2, (e,r)=3, (n,e)=2, (e,w)=2, (w,e)=1
    #   -> (e,r) 3
    assert got == [(1, "l", "o", 6), (2, "lo", "w", 6), (3, "e", "r", 3)]


def test_bpe_greedy_overlap_and_token_freq(spark):
    """Leftmost-non-overlapping greedy: with pair (a,a), 'aaaa' →
    [aa,aa] and 'aaa' → [aa,a] (the run-parity island rule); verified
    through bpe_token_freq's final symbol table."""
    from spatially_databricks_etl_spark.operators.curate import bpe_token_freq

    docs = spark.createDataFrame([(1, "aaaa aaa aaaa")], ["doc_id", "text"])
    # freqs: aaaa=2, aaa=1. r1 pairs: (a,a)=3*2? -> aaaa has 3
    # adjacent pairs x2 + aaa has 2 -> 8; merge (a,a):
    # aaaa->[aa,aa], aaa->[aa,a]
    got = {
        r["token"]: r["freq"]
        for r in bpe_token_freq(docs, merges=1).collect()
    }
    assert got == {"aa": 5, "a": 1}


def test_bpe_encode_matches_python_replay(spark):
    """bpe_encode ≡ a from-scratch per-word greedy Python replay on a
    mixed corpus, token order preserved across word boundaries;
    docs with no [a-z] words produce no row."""
    import re

    from spatially_databricks_etl_spark.operators.curate import bpe_encode

    rules = [("l", "o"), ("lo", "w"), ("e", "r")]
    texts = {
        1: "Lower lowlands, slower flow!",
        2: "newer hello world",
        3: "12345 --- 678",
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {r["doc_id"]: r["tokens"] for r in bpe_encode(docs, rules).collect()}

    def replay(text):
        toks = []
        for w in re.findall(r"[a-z]+", text.lower()):
            s = list(w)
            for a, b in rules:
                out, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                s = out
            toks.extend(s)
        return toks

    assert got[1] == replay(texts[1])
    assert got[2] == replay(texts[2])
    assert 3 not in got


def test_ts_forecast_hand_case(spark):
    """ts_forecast closed-form hand case: key 'a' has hourly buckets
    at 00:00 (y=10.0), 01:00 (y=20.0), 02:00 (y=16.0) on 2024-01-03.
    With period=3, horizons=4: n=3, slope=(16−10)/(3−1)=3.0; the
    seasonal source for h is last+h−3·⌈h/3⌉ hours → h=1→00:00,
    h=2→01:00, h=3→02:00 (the last bucket), h=4→00:00 again.
    Forecasts: 10+1·3=13, 20+2·3=26, 16+3·3=25, 10+4·3=22. A
    single-bucket key 'b' gets slope 0 → its seasonal-naive value
    verbatim at every horizon whose source exists (period=3 → only
    h=3)."""
    from datetime import datetime

    from spatially_databricks_etl_spark.operators.profile import ts_forecast

    rows = [
        ("a", datetime(2024, 1, 3, 0, 30), 10.0),
        ("a", datetime(2024, 1, 3, 1, 30), 20.0),
        ("a", datetime(2024, 1, 3, 2, 30), 16.0),
        ("b", datetime(2024, 1, 3, 5, 15), 7.5),
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    got = {
        (r["event_type"], r["horizon"]): (r["forecast_ts"], r["forecast_e6"])
        for r in ts_forecast(
            df, key_cols=["event_type"], bucket="hour", period=3, horizons=4
        ).collect()
    }
    assert got[("a", 1)] == (datetime(2024, 1, 3, 3, 0), 13_000000)
    assert got[("a", 2)] == (datetime(2024, 1, 3, 4, 0), 26_000000)
    assert got[("a", 3)] == (datetime(2024, 1, 3, 5, 0), 25_000000)
    assert got[("a", 4)] == (datetime(2024, 1, 3, 6, 0), 22_000000)
    # key 'b': single bucket at 05:00 → only h=3 has a source (05:00
    # itself); slope 0 → forecast = 7.5
    assert got[("b", 3)] == (datetime(2024, 1, 3, 8, 0), 7_500000)
    assert len([k for k in got if k[0] == "b"]) == 1
    assert len(got) == 5


def test_mixture_plan_hand_case(spark):
    """mixture_plan closed-form hand case: corpus a:10 tokens (2
    docs), b:4 tokens (1 doc), plus a domain 'c' in the corpus but
    NOT in the weight table (dropped) and a weighted domain 'd'
    absent from the corpus (no row). Budget 30, weights a:2 b:1 d:1
    (ΣW=4 — static, so d's absence does not reweight a/b):
    a: target 30·2//4=15 > avail 10 → rate 1.5e6, epochs 2;
    b: target 30·1//4=7 > avail 4 → rate 1.75e6, epochs 2."""
    from spatially_databricks_etl_spark.operators.curate import mixture_plan

    docs = spark.createDataFrame(
        [
            ("a", "one two three four five"),
            ("a", "six seven eight nine ten"),
            ("b", "w x y z"),
            ("c", "ignored words here"),
        ],
        ["lang", "text"],
    )
    got = {
        r["group"]: r
        for r in mixture_plan(
            docs, {"a": 2, "b": 1, "d": 1}, group_col="lang", total_tokens=30
        ).collect()
    }
    assert set(got) == {"a", "b"}
    ra, rb = got["a"], got["b"]
    assert (ra["n_docs"], ra["avail_tokens"], ra["target_tokens"]) == (2, 10, 15)
    assert (ra["sample_rate_e6"], ra["epochs"]) == (1_500_000, 2)
    assert (rb["n_docs"], rb["avail_tokens"], rb["target_tokens"]) == (1, 4, 7)
    assert (rb["sample_rate_e6"], rb["epochs"]) == (1_750_000, 2)


def test_bpe_merges_artifact_roundtrip(spark, tmp_path):
    """Save/load round-trip of the trained merge table: encode with
    the loaded rules ≡ encode with the in-memory rules, and a stale
    concurrent saver raises ConcurrentIndexWriteError before writing
    anything (the persisted-index arbitration contract)."""
    import pytest

    from spatially_databricks_etl_spark.operators.curate import (
        bpe_encode,
        bpe_load_merges,
        bpe_save_merges,
        bpe_train,
    )
    from spatially_databricks_etl_spark.operators.indexstore import (
        ConcurrentIndexWriteError,
        begin_index_mutation,
        commit_index_mutation,
    )

    docs = spark.createDataFrame(
        [(1, "low low lower"), (2, "new newer lowest")], ["doc_id", "text"]
    )
    merges = bpe_train(docs, merges=3)
    path = str(tmp_path / "bpe_merges")
    bpe_save_merges(merges, path)
    rules = bpe_load_merges(spark, path)
    assert rules == [
        (r["left_sym"], r["right_sym"])
        for r in merges.orderBy("round").collect()
    ]
    got_loaded = {
        r["doc_id"]: r["tokens"] for r in bpe_encode(docs, rules).collect()
    }
    got_mem = {
        r["doc_id"]: r["tokens"]
        for r in bpe_encode(
            docs,
            [(r["left_sym"], r["right_sym"]) for r in merges.orderBy("round").collect()],
        ).collect()
    }
    assert got_loaded == got_mem

    # stale writer: enters at the pre-save version, loses the claim
    stale = begin_index_mutation(path) - 1
    with pytest.raises(ConcurrentIndexWriteError):
        commit_index_mutation(path, stale)
    # artifact untouched by the loser
    assert bpe_load_merges(spark, path) == rules


def test_bpe_train_encode_matches_separate_route(spark):
    """bpe_train_encode (single-pass: encode from the trainer's final
    symbol table) ≡ bpe_train + bpe_encode (re-apply every rule) on
    the same corpus — merge table and every document's tokens."""
    from spatially_databricks_etl_spark.operators.curate import (
        bpe_encode,
        bpe_train,
        bpe_train_encode,
    )

    docs = spark.createDataFrame(
        [(1, "low low lower"), (2, "new newer lowest"), (3, "NO lowercase?")],
        ["doc_id", "text"],
    )
    m1, enc1 = bpe_train_encode(docs, merges=3)
    m2 = bpe_train(docs, merges=3)
    rules = [
        (r["left_sym"], r["right_sym"]) for r in m2.orderBy("round").collect()
    ]
    enc2 = bpe_encode(docs, rules)
    assert sorted(map(tuple, m1.collect())) == sorted(map(tuple, m2.collect()))
    assert {r["doc_id"]: r["tokens"] for r in enc1.collect()} == {
        r["doc_id"]: r["tokens"] for r in enc2.collect()
    }


def test_wordpiece_train_encode_single_pass_and_persisted_roundtrip(
    spark, tmp_path
):
    """wordpiece_train_encode (single-pass, likelihood rule) ≡
    wordpiece_train + bpe_encode on the same corpus; the persisted
    merge table round-trips through bpe_save_merges/bpe_load_merges
    with the exact fixed-point score column preserved, and the loaded
    rules re-encode identically — the second tokenizer family's full
    production lifecycle."""
    from spatially_databricks_etl_spark.operators.curate import (
        bpe_encode,
        bpe_load_merges,
        bpe_save_merges,
        wordpiece_train,
        wordpiece_train_encode,
    )

    docs = spark.createDataFrame(
        [(1, "low low lower"), (2, "new newer lowest"), (3, "NO lowercase?")],
        ["doc_id", "text"],
    )
    m1, enc1 = wordpiece_train_encode(docs, merges=3)
    m2 = wordpiece_train(docs, merges=3)
    assert sorted(map(tuple, m1.collect())) == sorted(map(tuple, m2.collect()))

    path = str(tmp_path / "wp_merges")
    bpe_save_merges(m1, path)
    saved = spark.read.parquet(path)
    assert "score" in saved.columns  # likelihood scores round-trip
    assert sorted(map(tuple, saved.select(*m1.columns).collect())) == sorted(
        map(tuple, m1.collect())
    )
    rules = bpe_load_merges(spark, path)
    assert rules == [
        (r["left_sym"], r["right_sym"]) for r in m1.orderBy("round").collect()
    ]
    enc2 = bpe_encode(docs, rules)
    assert {r["doc_id"]: r["tokens"] for r in enc1.collect()} == {
        r["doc_id"]: r["tokens"] for r in enc2.collect()
    }


def test_kcore_hand_case(spark):
    """k-core hand case (k=2): a triangle {0,1,2} with two pendant
    tails 2-3-4. Round 1 peels 4 (degree 1); round 2 peels 3 (its
    degree dropped to 1 after 4 left); the triangle survives with
    in-subgraph degree 2 each. Also pins SYNCHRONY: 3 is NOT peeled
    in round 1 (its degree is 2 before 4 leaves), and a chain graph
    empties completely."""
    from spatially_databricks_etl_spark.operators.curate import kcore

    tri_tail = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    got = {
        r["node"]: r["degree"] for r in kcore(tri_tail, k=2, rounds=4).collect()
    }
    assert got == {0: 2, 1: 2, 2: 2}

    # synchrony: after ONE round only 4 is gone -> 3 still present
    got1 = {
        r["node"]: r["degree"] for r in kcore(tri_tail, k=2, rounds=1).collect()
    }
    assert set(got1) == {0, 1, 2, 3}
    assert got1[3] == 1  # 3's surviving degree already reflects 4's removal

    chain = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "src long, dst long")
    assert kcore(chain, k=2, rounds=4).count() == 0


def test_bpe_exhaustion_stops_not_annihilates(spark):
    """When pair counts run out before the requested merge budget,
    training STOPS at the last completed round (classic BPE) instead
    of letting the empty arg-max frame annihilate the symbol table
    through the broadcast cross join (round-12 ADVICE, medium): an
    all-single-char corpus still yields token frequencies, and an
    over-budgeted train+encode still encodes every document."""
    from spatially_databricks_etl_spark.operators.curate import (
        bpe_token_freq,
        bpe_train,
        bpe_train_encode,
    )

    # zero possible pairs: every word is one char -> zero rounds,
    # frequencies intact (previously returned [])
    solo = spark.createDataFrame([(1, "a b c a b a")], ["doc_id", "text"])
    got = {r["token"]: r["freq"] for r in bpe_token_freq(solo, merges=1).collect()}
    assert got == {"a": 3, "b": 2, "c": 1}
    # the merge table is EMPTY with the contract schema
    mt = bpe_train(solo, merges=4)
    assert mt.count() == 0
    assert [f.name for f in mt.schema.fields] == [
        "round",
        "left_sym",
        "right_sym",
        "pair_count",
    ]

    # pairs exhaust after 2 of 3 requested rounds: ab(x2) then cd;
    # encode still returns the document (previously empty frame)
    docs = spark.createDataFrame([(1, "ab ab cd")], ["doc_id", "text"])
    merges_df, enc = bpe_train_encode(docs, merges=3)
    rows = [
        (r["round"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in merges_df.orderBy("round").collect()
    ]
    assert rows == [(1, "a", "b", 2), (2, "c", "d", 1)]
    got_enc = {r["doc_id"]: r["tokens"] for r in enc.collect()}
    assert got_enc == {1: ["ab", "ab", "cd"]}


def _rrs_python_replay(texts, window, stride, min_docs):
    """From-scratch replay of remove_repeated_spans semantics."""
    spans = []  # (doc, pos, span)
    for did in sorted(texts):
        t = texts[did]
        for p in range(1, len(t) - window + 2, stride):
            spans.append((did, p, t[p - 1 : p - 1 + window]))
    by_span = {}
    for did, p, sp in spans:
        by_span.setdefault(sp, []).append((did, p))
    out = {}
    removals = {did: [] for did in texts}
    for sp, occ in by_span.items():
        if len({d for d, _ in occ}) >= min_docs:
            for did, p in sorted(occ)[1:]:
                removals[did].append((p, p + window - 1))
    for did, t in texts.items():
        ivals = sorted(removals[did])
        merged = []
        for s, e in ivals:
            if merged and s <= merged[-1][1] + 1:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        clean, last = [], 0
        for s, e in merged:
            clean.append(t[last : s - 1])
            last = e
        clean.append(t[last:])
        out[did] = ("".join(clean), sum(e - s + 1 for s, e in merged))
    return out


def test_remove_repeated_spans_hand_and_replay(spark):
    """Span removal ≡ a from-scratch Python replay on a corpus with a
    shared boilerplate block, an unaligned repeat, same-doc repeats
    and a short passthrough doc; the canonical (smallest doc, pos)
    occurrence is kept."""
    from spatially_databricks_etl_spark.operators.curate import (
        remove_repeated_spans,
    )

    boiler = "LICENSE HEADER COPYRIGHT 2026 ALL RIGHTS RESERVED END"
    texts = {
        1: boiler + " alpha bravo charlie delta echo foxtrot golf hotel india",
        2: boiler + " juliet kilo lima mike november oscar papa quebec romeo",
        # doc 3: the boiler at an UNALIGNED offset (pos 4 with stride
        # 6) — the documented strided-window miss: no stride-aligned
        # window here matches a stride-aligned window in docs 1/2/4,
        # so doc 3 must pass through UNTOUCHED
        3: "zz " + boiler + " sierra tango uniform victor whiskey xray yankee",
        4: boiler + boiler + " extra tail content here to pad the document out",
        5: "short doc",
    }
    window, stride, min_docs = 18, 6, 2
    got = {
        r["doc_id"]: (r["clean_text"], r["removed_chars"])
        for r in remove_repeated_spans(
            spark.createDataFrame(
                list(texts.items()), "doc_id long, text string"
            ),
            id_col="doc_id",
            text_col="text",
            window=window,
            stride=stride,
            min_docs=min_docs,
        ).collect()
    }
    want = _rrs_python_replay(texts, window, stride, min_docs)
    assert got == want
    # the shared boilerplate really was excised from non-canonical docs
    assert boiler in got[1][0] or boiler in got[4][0]  # one canonical keeper
    assert got[5] == ("short doc", 0)  # short doc passes through
    assert got[2][1] > 0 and got[4][1] > 0  # aligned repeats excised
    assert got[3] == (texts[3], 0)  # unaligned offset: documented miss


def test_remove_repeated_spans_property(spark):
    """Randomized corpora (seeded): Spark result ≡ Python replay, and
    removed_chars == len(text) - len(clean_text) always."""
    import random

    from spatially_databricks_etl_spark.operators.curate import (
        remove_repeated_spans,
    )

    rng = random.Random(13)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    for trial in range(3):
        shared = "".join(rng.choices(vocab, k=rng.randint(8, 14)))
        texts = {}
        for did in range(8):
            body = "".join(rng.choices(vocab, k=rng.randint(5, 30)))
            if rng.random() < 0.6:
                cut = rng.randint(0, len(body))
                body = body[:cut] + shared + body[cut:]
            texts[did] = body
        window, stride = rng.choice([(8, 4), (10, 5), (12, 3)])
        got = {
            r["doc_id"]: (r["clean_text"], r["removed_chars"])
            for r in remove_repeated_spans(
                spark.createDataFrame(
                    list(texts.items()), "doc_id long, text string"
                ),
                id_col="doc_id",
                text_col="text",
                window=window,
                stride=stride,
                min_docs=2,
            ).collect()
        }
        want = _rrs_python_replay(texts, window, stride, 2)
        assert got == want, (trial, window, stride)
        for did, (clean, rem) in got.items():
            assert rem == len(texts[did]) - len(clean)


def test_span_hash_parity_and_8byte_shuffle_keys(spark):
    """span_hash=True (the default, 8-byte xxhash64 keys in the
    corpus-wide shuffle + candidate-sized text re-verify) is
    bit-identical to span_hash=False (text in the shuffle) on both
    span operators, and the hashed plans really do hash: xxhash64
    appears in the optimized plan, and the heavy first aggregate
    groups on the LongType key, not the span string."""
    import random

    from spatially_databricks_etl_spark.operators.curate import (
        remove_repeated_spans,
        repeated_spans,
    )

    rng = random.Random(41)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    shared = "".join(rng.choices(vocab, k=12))
    texts = {}
    for did in range(10):
        body = "".join(rng.choices(vocab, k=rng.randint(6, 28)))
        if rng.random() < 0.7:
            cut = rng.randint(0, len(body))
            body = body[:cut] + shared + body[cut:]
        texts[did] = body
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    kw = dict(id_col="doc_id", text_col="text", window=8, stride=4, min_docs=2)

    det_h = repeated_spans(df, **kw, span_hash=True)
    det_d = repeated_spans(df, **kw, span_hash=False)
    assert sorted(map(tuple, det_h.collect())) == sorted(
        map(tuple, det_d.collect())
    )
    rem_h = remove_repeated_spans(df, **kw, span_hash=True)
    rem_d = remove_repeated_spans(df, **kw, span_hash=False)
    assert sorted(map(tuple, rem_h.collect())) == sorted(
        map(tuple, rem_d.collect())
    )

    for hashed, direct in ((det_h, det_d), (rem_h, rem_d)):
        plan_h = hashed._jdf.queryExecution().optimizedPlan().toString()
        plan_d = direct._jdf.queryExecution().optimizedPlan().toString()
        assert "xxhash64" in plan_h
        assert "xxhash64" not in plan_d
    spark.catalog.clearCache()


def test_mixture_temperature_exact_replay_and_flattening(spark):
    """mixture_temperature ≡ an exact Python replay (sqrt is IEEE
    correctly rounded, everything after is integer arithmetic), and
    √-scaling FLATTENS the mixture: the dominant domain's share drops
    vs proportional, the smallest domain's share rises."""
    import math
    import re

    from spatially_databricks_etl_spark.operators.curate import (
        mixture_temperature,
    )

    texts = [
        ("en", "alpha bravo charlie " * 50),
        ("en", "delta echo foxtrot " * 40),
        ("en", "golf hotel india " * 60),
        ("de", "juliet kilo " * 10),
        ("zh", "lima"),
    ]
    docs = spark.createDataFrame(
        [(i, lang, t) for i, (lang, t) in enumerate(texts)],
        "doc_id long, lang string, text string",
    )
    total_tokens = 9_999
    got = {
        r["group"]: (
            r["n_docs"],
            r["avail_tokens"],
            r["weight_e6"],
            r["target_tokens"],
            r["sample_rate_e6"],
            r["epochs"],
        )
        for r in mixture_temperature(
            docs, group_col="lang", alpha=0.5, total_tokens=total_tokens
        ).collect()
    }

    avail: dict[str, int] = {}
    ndocs: dict[str, int] = {}
    for lang, t in texts:
        n = len(re.findall("[a-z]+", t.lower()))
        avail[lang] = avail.get(lang, 0) + n
        ndocs[lang] = ndocs.get(lang, 0) + 1
    sc = {g: math.floor(math.sqrt(n) * 1_000_000.0) for g, n in avail.items()}
    stot = sum(sc.values())
    want = {}
    for g in avail:
        target = total_tokens * sc[g] // stot
        want[g] = (
            ndocs[g],
            avail[g],
            sc[g] * 1_000_000 // stot,
            target,
            target * 1_000_000 // avail[g],
            (target + avail[g] - 1) // avail[g],
        )
    assert got == want

    # flattening: en dominates proportionally; sqrt shrinks its share
    prop = {g: n / sum(avail.values()) for g, n in avail.items()}
    sqrt_share = {g: sc[g] / stot for g in sc}
    assert sqrt_share["en"] < prop["en"]
    assert sqrt_share["zh"] > prop["zh"]
    # tiny domain oversamples: epochs > 1
    assert got["zh"][5] >= 2


def _wordpiece_python_replay(texts, merges):
    """From-scratch WordPiece trainer: likelihood arg-max with the
    exact fixed-point score, greedy leftmost-non-overlapping apply."""
    import re
    from collections import Counter

    words: Counter = Counter()
    for t in texts:
        for w in re.findall("[a-z]+", t.lower()):
            words[w] += 1
    syms = {w: list(w) for w in words}
    out = []
    for rnd in range(1, merges + 1):
        pc: Counter = Counter()
        uc: Counter = Counter()
        for w, f in words.items():
            s = syms[w]
            for a in s:
                uc[a] += f
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        def score(p):
            return (pc[p] * 10**18) // (uc[p[0]] * uc[p[1]])
        best = min(pc, key=lambda p: (-score(p), -pc[p], p[0], p[1]))
        a, b = best
        out.append((rnd, a, b, pc[best], score(best)))
        for w in syms:
            s, ns, i = syms[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            syms[w] = ns
    return out


def test_wordpiece_train_matches_python_replay(spark):
    """wordpiece_train ≡ the Python likelihood replay, and diverges
    from bpe_train where frequency and likelihood disagree: 'qu'
    co-occurs perfectly (likelihood picks it) while a commoner but
    promiscuous pair wins on raw frequency."""
    from spatially_databricks_etl_spark.operators.curate import (
        bpe_train,
        wordpiece_train,
    )

    texts = [
        "queen quick quilt quote",          # q->u always, u only after q
        "rat rot rut tar tor art " * 3,     # r,t promiscuous but frequent
        "rate rite rote " * 2,
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r["round"], r["left_sym"], r["right_sym"], r["pair_count"], r["score"])
        for r in wordpiece_train(docs, merges=4).orderBy("round").collect()
    ]
    want = _wordpiece_python_replay(texts, 4)
    assert got == want
    # divergence: round-1 picks differ between the two rules
    bpe_first = bpe_train(docs, merges=1).collect()[0]
    assert (got[0][1], got[0][2]) != (
        bpe_first["left_sym"],
        bpe_first["right_sym"],
    )
    # the likelihood rule picks a perfectly-predictive rare pair
    # (c,k occur ONLY as 'ck' in 'quick': score 1e18) over the
    # frequent-but-promiscuous pairs raw frequency would pick
    assert (got[0][1], got[0][2]) == ("c", "k")
    assert got[0][4] == 10**18


def test_stratified_split_exact_counts_and_replay(spark):
    """stratified_split hits floor-boundary counts EXACTLY per group,
    matches a Python replay of the multiplicative-hash permutation,
    is disjoint+complete, and is stable under row-order shuffles."""
    from spatially_databricks_etl_spark.operators.curate import (
        _STRAT_A,
        _STRAT_M,
        stratified_split,
    )

    rows = [(i, ["en", "de", "zh"][i % 3]) for i in range(301)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_split(
        df, id_col="doc_id", group_col="lang", weights=(8, 1, 1), salt=7
    ).collect()
    got = {(r["doc_id"]): (r["lang"], r["split"]) for r in out}
    assert len(got) == 301  # complete, one row per input

    # python replay
    by_g: dict = {}
    for i, g in rows:
        by_g.setdefault(g, []).append(i)
    want = {}
    for g, ids in by_g.items():
        perm = sorted(ids, key=lambda i: (((i + 7) * _STRAT_A) % _STRAT_M, i))
        n = len(perm)
        b1, b2 = n * 8 // 10, n * 9 // 10
        for rn, i in enumerate(perm):
            want[i] = (g, "train" if rn < b1 else "val" if rn < b2 else "test")
    assert got == want

    # exact per-group counts
    from collections import Counter

    for g, ids in by_g.items():
        n = len(ids)
        c = Counter(split for i, (gg, split) in got.items() if gg == g)
        assert c["train"] == n * 8 // 10
        assert c["val"] == n * 9 // 10 - n * 8 // 10
        assert c["test"] == n - n * 9 // 10

    # order-independence: shuffled input → identical assignment
    out2 = stratified_split(
        df.orderBy(F.rand(99)),
        id_col="doc_id",
        group_col="lang",
        weights=(8, 1, 1),
        salt=7,
    ).collect()
    assert {(r["doc_id"]): (r["lang"], r["split"]) for r in out2} == got

    # a different salt permutes assignments
    out3 = stratified_split(
        df, id_col="doc_id", group_col="lang", weights=(8, 1, 1), salt=8
    ).collect()
    moved = sum(
        1 for r in out3 if got[r["doc_id"]][1] != r["split"]
    )
    assert moved > 10


def test_canonicalize_url_cases(spark):
    """URL canonicalization hand cases: tracking params stripped,
    params sorted, scheme/host lowercased, default ports dropped,
    fragments cut, trailing slash folded on non-root paths; non-URLs
    and NULL pass through; non-default ports survive."""
    from spatially_databricks_etl_spark.functions.text import canonicalize_url

    cases = {
        "HTTP://Example.COM:80/Path/?b=2&utm_source=x&a=1#frag":
            "http://example.com/Path?a=1&b=2",
        "https://example.com:443/": "https://example.com/",
        "https://example.com/page/": "https://example.com/page",
        "https://example.com/page?gclid=abc": "https://example.com/page",
        "https://example.com/page?z=1&a=2&fbclid=zz&ref=tw":
            "https://example.com/page?a=2&z=1",
        "http://example.com:8080/x": "http://example.com:8080/x",
        "not a url at all": "not a url at all",
        "https://Example.com/CaseSensitive/Path":
            "https://example.com/CaseSensitive/Path",
    }
    df = spark.createDataFrame([(k,) for k in cases], "url string")
    got = {
        r["url"]: r["c"]
        for r in df.select("url", canonicalize_url("url").alias("c")).collect()
    }
    assert got == cases
    nul = spark.createDataFrame([(None,)], "url string")
    assert nul.select(canonicalize_url("url").alias("c")).first()["c"] is None


def test_dedup_keep_best_longest_survivor(spark):
    """Per-cluster survivor = (score DESC, id ASC): the longest copy
    wins, score ties fall to the smaller id, singletons survive, and
    chained pairs (a-b, b-c) form ONE cluster with one survivor."""
    from spatially_databricks_etl_spark.operators.curate import dedup_keep_best

    docs = spark.createDataFrame(
        [
            (1, 100), (2, 300), (3, 200),   # cluster {1,2,3}: keep 2
            (10, 50), (11, 50),             # cluster {10,11}: tie -> 10
            (99, 10),                       # singleton: kept
        ],
        "doc_id long, n_chars long",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    kept = {
        r["doc_id"]
        for r in dedup_keep_best(docs, pairs, score_col="n_chars").collect()
    }
    assert kept == {2, 10, 99}


def test_ngram_novelty_hand_case(spark):
    """Novelty hand case: a fully-shared doc scores 0, a fully-unique
    doc scores 1e6, a half-shared doc the exact integer ratio; docs
    with < n tokens emit 0 grams and a NULL ratio."""
    from spatially_databricks_etl_spark.operators.curate import ngram_novelty

    docs = spark.createDataFrame(
        [
            (1, "alpha bravo charlie delta"),   # grams: ab c, b c d
            (2, "alpha bravo charlie delta"),   # exact copy -> novelty 0
            (3, "echo foxtrot golf hotel"),     # unique -> 1e6
            (4, "alpha bravo charlie xray"),    # shares 'a b c' only
            (5, "too short"),                   # < 3 tokens -> NULL
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_ngrams"], r["n_novel"], r["novelty_e6"])
        for r in ngram_novelty(docs, n=3).collect()
    }
    assert got[1] == (2, 0, 0)
    assert got[2] == (2, 0, 0)
    assert got[3] == (2, 2, 1_000_000)
    assert got[4] == (2, 1, 500_000)
    assert got[5] == (0, 0, None)


def test_rake_keyphrases_textbook_case(spark):
    """RAKE hand case: the long co-occurring content-word phrase wins
    (the RAKE signature); stopwords and punctuation break candidates;
    scores are the exact deg/freq fixed-point sums."""
    from spatially_databricks_etl_spark.operators.curate import rake_keyphrases

    docs = spark.createDataFrame(
        [
            (
                1,
                "Deep learning of deep neural networks, and the deep"
                " neural network training.",
            )
        ],
        "doc_id long, text string",
    )
    got = [
        (r["rank"], r["phrase"], r["score_e6"])
        for r in rake_keyphrases(docs, top_k=5).orderBy("rank").collect()
    ]
    # word stats: deep f=3 deg=2+3+4=9; learning f=1 deg=2;
    # neural f=2 deg=7; networks f=1 deg=3; network f=1 deg=4;
    # training f=1 deg=4
    # "deep neural network training" = 3e6 + 3.5e6 + 4e6 + 4e6 = 14.5e6
    assert got == [
        (1, "deep neural network training", 14_500_000),
        (2, "deep neural networks", 9_500_000),
        (3, "deep learning", 5_000_000),
    ]


def test_rake_break_set_is_explicit_not_java_slash_s(spark):
    """The tokenizer's whitespace class is the explicit [ \\t\\n\\f\\r],
    not \\s: Java's \\s additionally matches \\x0B (vertical tab) while
    the RE2 oracle's does not. A \\x0B between content words must act
    as a PUNCTUATION break token (one-char non-alpha run) on the
    engine side — same as the oracle — not vanish as whitespace."""
    from spatially_databricks_etl_spark.operators.curate import rake_keyphrases

    docs = spark.createDataFrame(
        [(1, "alpha\x0bbeta gamma delta")], "doc_id long, text string"
    )
    got = [
        (r["phrase"], r["score_e6"])
        for r in rake_keyphrases(docs, top_k=5).orderBy("rank").collect()
    ]
    # \x0b is a break: candidates are {alpha}, {beta gamma delta} —
    # NOT one 4-word phrase. Each word f=1; deg = own phrase length.
    assert got == [
        ("beta gamma delta", 9_000_000),
        ("alpha", 1_000_000),
    ]


def test_chunk_sentences_greedy_and_oversized(spark):
    """Greedy sentence packing: sentences fill a chunk to max_tokens
    then roll over; an oversized single sentence becomes its own
    chunk untruncated; empty docs emit nothing; chunk ids are dense
    0-based per doc and token counts are exact."""
    from spatially_databricks_etl_spark.operators.curate import chunk_sentences

    docs = spark.createDataFrame(
        [
            (1, "one two three. four five! six seven eight nine? ten."),
            (2, "a b c d e f g h. i j. k."),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["chunk"]): (
            r["chunk_text"],
            r["n_sentences"],
            r["n_tokens"],
        )
        for r in chunk_sentences(docs, max_tokens=5).collect()
    }
    assert got == {
        (1, 0): ("one two three four five", 2, 5),
        (1, 1): ("six seven eight nine ten", 2, 5),
        (2, 0): ("a b c d e f g h", 1, 8),   # oversized, own chunk
        (2, 1): ("i j k", 2, 3),
    }


def test_vocab_growth_hand_case(spark):
    """Cumulative distinct-token curve in doc order: counts replay a
    Python scan; n_docs boundaries are floor(k*N/C); monotone
    non-decreasing; order-independent of input row order."""
    from spatially_databricks_etl_spark.operators.curate import vocab_growth

    texts = {1: "a b c", 2: "a b d", 3: "e", 4: "a f g", 5: "h"}
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = [
        (r["checkpoint"], r["n_docs"], r["vocab"])
        for r in vocab_growth(docs, checkpoints=5).orderBy("checkpoint").collect()
    ]
    seen: set = set()
    want = []
    order = sorted(texts)
    for k in range(1, 6):
        nd = k * len(order) // 5
        seen_k: set = set()
        for did in order[:nd]:
            seen_k.update(texts[did].split())
        want.append((k, nd, len(seen_k)))
        seen = seen_k
    assert got == want
    assert all(a[2] <= b[2] for a, b in zip(got, got[1:]))

    shuffled = vocab_growth(
        docs.orderBy(F.rand(7)), checkpoints=5
    ).orderBy("checkpoint").collect()
    assert [(r["checkpoint"], r["n_docs"], r["vocab"]) for r in shuffled] == want


def test_gopher_quality_rules_hand_cases(spark):
    """Each Gopher rule fires on a purpose-built doc and the signal
    columns carry the exact fixed-point values: word-count bounds,
    mean word length, symbol ratio (# + ...), bullet/ellipsis line
    ratios, alpha-word ratio, required-stopword count."""
    from spatially_databricks_etl_spark.operators.curate import gopher_quality

    good = "the quick brown fox and the lazy dog have fun with words " * 5
    docs = spark.createDataFrame(
        [
            (1, good),  # passes everything at min_words=20
            (2, "the and of"),  # too few words
            (3, "the of and " + "### ### ### ### ### " * 4),  # symbols
            (4, "\n".join(["- b u l l e t p o i n t s"] * 10)),  # bullets
            (5, "the of and trailing dots...\nmore dots...\nplain line"),
            (6, ("12345 " * 30) + "the of"),  # numeric words
            (7, "zz " * 40),  # no required stopwords
            (8, ""),  # empty
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in gopher_quality(docs, min_words=20, max_words=1000).collect()
    }
    assert got[1]["keep"] is True
    assert got[2]["keep"] is False and got[2]["n_words"] == 3
    assert got[3]["keep"] is False
    # doc 3: 20 '#' runs of 3 chars each = 60 hash chars, 23 words
    assert got[3]["symbol_ratio_e6"] == (60 * 1_000_000) // 23
    assert got[4]["keep"] is False
    assert got[4]["bullet_ratio_e6"] == 1_000_000
    assert got[5]["ellipsis_ratio_e6"] == (2 * 1_000_000) // 3
    # doc 6: 30 numeric words of 32 total -> alpha ratio 2/32
    assert got[6]["alpha_word_ratio_e6"] == (2 * 1_000_000) // 32
    assert got[6]["keep"] is False
    assert got[7]["n_required_stopwords"] == 0 and got[7]["keep"] is False
    assert got[8]["n_words"] == 0 and got[8]["keep"] is False
    # exact mean word length on doc 2: (3+3+2)*1e6 div 3
    assert got[2]["mean_word_len_e6"] == (8 * 1_000_000) // 3


def test_c4_line_filter_hand_cases(spark):
    """C4 rules: terminal-punctuation + min-words + javascript line
    predicates; lorem-ipsum / brace docs dropped wholesale;
    too-few-kept-lines docs dropped; survivors rebuild in order."""
    from spatially_databricks_etl_spark.operators.curate import c4_line_filter

    l1 = "this line ends with a period and has many words."
    l2 = "does this line have enough words to survive here?"
    l3 = 'quoted line with plenty of words inside it ends well."'
    docs = spark.createDataFrame(
        [
            (1, "\n".join([l1, l2, l3, "short line.", "no terminal punct here"])),
            (2, "\n".join([l1, l2, "now with JavaScript enabled today ok."])),
            (3, l1 + "\nLorem Ipsum dolor sit amet consectetur."),
            (4, l1 + "\nvar x = { a: 1 }."),
            (5, "\n".join([l1, l2])),  # only 2 kept -> too few
            (6, "\n".join([l1, l2, l3, l1])),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in c4_line_filter(docs, min_kept_lines=3).collect()
    }
    # doc 1: l1/l2/l3 survive; the 2-word line and the no-punct line drop
    assert got[1]["dropped"] is False and got[1]["drop_reason"] is None
    assert got[1]["n_lines_kept"] == 3 and got[1]["n_lines_dropped"] == 2
    assert got[1]["clean_text"] == "\n".join([l1, l2, l3])
    # doc 2: the javascript line drops -> only 2 kept -> doc dropped
    assert got[2]["dropped"] is True
    assert got[2]["drop_reason"] == "too_few_lines"
    assert got[2]["clean_text"] is None
    # docs 3/4: banned substrings (lorem ipsum, '{') drop wholesale
    assert got[3]["drop_reason"] == "banned_substring"
    assert got[4]["drop_reason"] == "banned_substring"
    assert got[5]["drop_reason"] == "too_few_lines"
    # doc 6: all four lines survive, order preserved incl. the repeat
    assert got[6]["dropped"] is False
    assert got[6]["clean_text"] == "\n".join([l1, l2, l3, l1])
    assert got[6]["n_lines_kept"] == 4 and got[6]["n_lines_dropped"] == 0


def test_contamination_report_attribution_hand_case(spark):
    """Per-(doc, bench) shared 3-gram counts and exact e6 fractions:
    a doc overlapping two different benchmark items gets TWO rows
    with the right counts; a clean doc is absent; fractions divide by
    the doc's own distinct gram count."""
    from spatially_databricks_etl_spark.operators.curate import (
        contamination_report,
    )

    bench = spark.createDataFrame(
        [(100, "alpha bravo charlie delta"), (200, "echo foxtrot golf hotel")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            # grams: {alpha bravo charlie, bravo charlie delta,
            #         charlie delta echo, delta echo foxtrot,
            #         echo foxtrot golf} -> 2 shared with bench 100,
            #         1 with bench 200; 5 distinct grams total
            (1, "alpha bravo charlie delta echo foxtrot golf"),
            (2, "nothing shared here at all today friends"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["bench_id"]): (r["n_shared"], r["doc_frac_e6"])
        for r in contamination_report(docs, bench, n=3).collect()
    }
    assert got == {
        (1, 100): (2, 400_000),
        (1, 200): (1, 200_000),
    }


def test_soft_dedup_weights_exact_and_pairs_paths(spark):
    """Exact path: text groups weight 1e6 div size with min-id
    cluster ids; pairs path: CC clusters weight the same way and
    unclustered docs keep weight 1e6."""
    from spatially_databricks_etl_spark.operators.curate import (
        soft_dedup_weights,
    )

    docs = spark.createDataFrame(
        [(1, "aaa"), (2, "aaa"), (3, "aaa"), (4, "bbb"), (5, "ccc")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"], r["weight_e6"])
        for r in soft_dedup_weights(docs).collect()
    }
    assert got == {
        1: (1, 3, 333_333),
        2: (1, 3, 333_333),
        3: (1, 3, 333_333),
        4: (4, 1, 1_000_000),
        5: (5, 1, 1_000_000),
    }
    pairs = spark.createDataFrame(
        [(1, 2), (2, 4)], "id_a long, id_b long"
    )
    got_p = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"], r["weight_e6"])
        for r in soft_dedup_weights(docs, pairs).collect()
    }
    assert got_p == {
        1: (1, 3, 333_333),
        2: (1, 3, 333_333),
        4: (1, 3, 333_333),
        3: (3, 1, 1_000_000),
        5: (5, 1, 1_000_000),
    }


def test_domain_quality_rollup_hand_case(spark):
    """Domain gate: a duplicate-heavy domain and a short-doc-heavy
    domain fail their respective rules with exact e6 ratios; a clean
    domain passes."""
    from spatially_databricks_etl_spark.operators.curate import (
        domain_quality_rollup,
    )

    long_a = "x" * 200
    long_b = "y" * 300
    docs = spark.createDataFrame(
        [
            (1, "dup.com", long_a),
            (2, "dup.com", long_a),
            (3, "dup.com", long_a),
            (4, "dup.com", long_b),
            (5, "short.com", "tiny"),
            (6, "short.com", long_a),
            (7, "good.com", long_a),
            (8, "good.com", long_b),
        ],
        "doc_id long, source string, text string",
    )
    got = {
        r["domain"]: r.asDict()
        for r in domain_quality_rollup(
            docs, short_len=100, max_dup_frac_e6=250_000,
            max_short_frac_e6=250_000,
        ).collect()
    }
    d = got["dup.com"]
    assert (d["n_docs"], d["n_unique_texts"]) == (4, 2)
    assert d["dup_frac_e6"] == 500_000 and d["keep"] is False
    assert d["mean_chars_e6"] == ((200 * 3 + 300) * 1_000_000) // 4
    s = got["short.com"]
    assert s["short_frac_e6"] == 500_000 and s["keep"] is False
    g = got["good.com"]
    assert g["dup_frac_e6"] == 0 and g["short_frac_e6"] == 0
    assert g["keep"] is True


def test_tokenizer_fertility_hand_case(spark):
    """Fertility on a two-lang corpus with a controllable merge
    budget: after 1 merge ('lo'+'w'? depends on counts) the per-lang
    token counts follow exactly from the trained symbol table; the
    integer ratios divide exactly."""
    from spatially_databricks_etl_spark.operators.curate import (
        bpe_token_freq,
        tokenizer_fertility,
    )

    docs = spark.createDataFrame(
        [
            (1, "aa", "ab ab ab cd"),
            (2, "zz", "ab cd cd"),
        ],
        "doc_id long, lang string, text string",
    )
    # merges=1: the most frequent pair is ('a','b') with corpus freq 4
    # -> 'ab' becomes 1 token; 'cd' stays 2 tokens ('c','d')
    got = {
        r["lang"]: (
            r["n_words"], r["n_tokens"],
            r["fertility_e6"], r["chars_per_token_e6"],
        )
        for r in tokenizer_fertility(docs, merges=1).collect()
    }
    # aa: words [ab, ab, ab, cd] -> tokens 1+1+1+2 = 5; chars 8
    # zz: words [ab, cd, cd] -> tokens 1+2+2 = 5; chars 6
    assert got == {
        "aa": (4, 5, 1_250_000, 1_600_000),
        "zz": (3, 5, 1_666_666, 1_200_000),
    }
    # cross-check the merged vocabulary really is {ab, c, d}
    toks = {
        r["token"] for r in bpe_token_freq(docs, merges=1).collect()
    }
    assert toks == {"ab", "c", "d"}


def test_random_projection_exact_replay(spark):
    """The ±1 projection replays exactly in Python: e3 quantization,
    integer dot products against the md5-derived sign matrix; the
    matrix itself is deterministic across calls and seeds differ."""
    import math

    from spatially_databricks_etl_spark.operators.embeddings import (
        random_projection,
        random_projection_signs,
    )

    vecs = [
        (1, [0.1, -0.25, 0.33, 1.5]),
        (2, [0.0004, -0.0006, 2.0, -3.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: list(r["proj"])
        for r in random_projection(df, dim=4, out_dim=3, seed=7).collect()
    }
    signs = random_projection_signs(4, 3, seed=7)
    want = {
        vid: [
            sum(int(math.floor(x * 1000 + 0.5)) * s for x, s in zip(v, row))
            for row in signs
        ]
        for vid, v in vecs
    }
    assert got == want
    assert random_projection_signs(4, 3, seed=7) == signs  # stable
    assert random_projection_signs(4, 3, seed=8) != signs  # seed matters
    assert any(s == -1 for row in signs for s in row)
    assert any(s == 1 for row in signs for s in row)


def test_script_profile_hand_cases(spark):
    """Script counts via class-removal length deltas: mixed-script
    docs count each class exactly, fractions exclude whitespace, and
    dominance ties break latin > digit > cyrillic > cjk > other."""
    from spatially_databricks_etl_spark.operators.curate import script_profile

    docs = spark.createDataFrame(
        [
            (1, "hello мир 你好 42!"),
            (2, "привет привет"),
            (3, "你好世界"),
            (4, "12345"),
            (5, "!!!"),
            (6, "ab12"),  # tie latin=digit=2 -> latin wins
            (7, ""),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in script_profile(docs).collect()}
    d1 = got[1]
    # hello=5 latin, мир=3 cyr, 你好=2 cjk, 42=2 digit, !=1 other, 3 spaces
    assert (
        d1["n_latin"], d1["n_digit"], d1["n_cyrillic"], d1["n_cjk"], d1["n_other"]
    ) == (5, 2, 3, 2, 1)
    assert d1["latin_frac_e6"] == (5 * 1_000_000) // 13
    assert d1["dominant"] == "latin"
    assert got[2]["dominant"] == "cyrillic"
    assert got[2]["cyrillic_frac_e6"] == 1_000_000
    assert got[3]["dominant"] == "cjk" and got[3]["cjk_frac_e6"] == 1_000_000
    assert got[4]["dominant"] == "digit"
    assert got[5]["dominant"] == "other" and got[5]["n_other"] == 3
    assert got[6]["dominant"] == "latin"
    assert got[7]["dominant"] == "latin"  # all-zero ties -> first class


def test_split_leakage_audit_flags_only_straddling_pairs(spark):
    """With an explicit pair frame and the deterministic md5 split,
    only pairs whose endpoints land in different buckets survive,
    carrying both split labels and the pair's similarity."""
    from spatially_databricks_etl_spark.operators.curate import (
        hash_split,
        split_leakage_audit,
    )

    docs = spark.createDataFrame(
        [(i, f"document number {i}") for i in range(20)],
        "doc_id long, text string",
    )
    assign = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs, salt="t").select("doc_id", "split").collect()
    }
    # build pairs: (0,1), (2,3), ... and keep the expected answer
    pairs = spark.createDataFrame(
        [(i, i + 1, 0.9) for i in range(0, 19, 2)],
        "id_a long, id_b long, jaccard_sim double",
    )
    got = {
        (r["id_a"], r["id_b"]): (r["split_a"], r["split_b"])
        for r in split_leakage_audit(docs, pairs, salt="t").collect()
    }
    want = {
        (a, a + 1): (assign[a], assign[a + 1])
        for a in range(0, 19, 2)
        if assign[a] != assign[a + 1]
    }
    assert got == want and len(want) > 0


def test_deterministic_shuffle_replay_and_stability(spark):
    """The seeded shuffle order replays exactly in Python (md5 key +
    id tiebreak), positions are a dense 0-based permutation, the same
    seed reproduces the order across calls and partitionings, and a
    different seed yields a different order."""
    import hashlib

    from spatially_databricks_etl_spark.operators.curate import (
        deterministic_shuffle,
    )

    ids = list(range(40))
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: r["position"]
        for r in deterministic_shuffle(docs, seed="s1").collect()
    }
    order = sorted(ids, key=lambda i: (hashlib.md5(f"s1:{i}".encode()).hexdigest(), i))
    want = {i: pos for pos, i in enumerate(order)}
    assert got == want
    again = {
        r["doc_id"]: r["position"]
        for r in deterministic_shuffle(docs.repartition(7), seed="s1").collect()
    }
    assert again == want
    other = {
        r["doc_id"]: r["position"]
        for r in deterministic_shuffle(docs, seed="s2").collect()
    }
    assert other != want and sorted(other.values()) == list(range(40))
