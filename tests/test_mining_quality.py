"""Hand-case tests for the pattern-mining, dependence-profiling and
FD-audit operators (mining.py, profile.mutual_info/grouped_ols,
quality.fd_violations). Every expected value is computed by hand or
with the Python stdlib, never by replaying the operator."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from spatially_databricks_etl_spark.operators.mining import (
    assoc_rules,
    event_transitions,
    frequent_pairs,
)
from spatially_databricks_etl_spark.operators.profile import (
    grouped_ols,
    mutual_info,
)
from spatially_databricks_etl_spark.operators.quality import fd_violations


def _baskets(spark):
    # 4 baskets: {a,b,c}, {a,b}, {a,c}, {b} — by hand:
    #   items: a in 3 baskets, b in 3, c in 2
    #   pairs: (a,b) 2, (a,c) 2, (b,c) 1
    rows = [
        ("b1", "a"), ("b1", "b"), ("b1", "c"),
        ("b2", "a"), ("b2", "b"),
        ("b3", "a"), ("b3", "c"),
        ("b4", "b"),
        ("b4", "b"),  # duplicate (basket, item) row — must dedupe
    ]
    return spark.createDataFrame(rows, ["basket", "item"])


def test_frequent_pairs_hand_counts(spark):
    out = frequent_pairs(
        _baskets(spark),
        basket_col="basket",
        item_col="item",
        min_item_count=1,
        min_pair_count=1,
    )
    got = {(r.item_a, r.item_b): r.pair_n for r in out.collect()}
    assert got == {("a", "b"): 2, ("a", "c"): 2, ("b", "c"): 1}


def test_frequent_pairs_apriori_prune_and_support_floor(spark):
    # min_item_count=3 drops c (2 baskets) BEFORE pairing; only (a,b)
    # survives. min_pair_count=2 keeps it.
    out = frequent_pairs(
        _baskets(spark),
        basket_col="basket",
        item_col="item",
        min_item_count=3,
        min_pair_count=2,
    )
    got = {(r.item_a, r.item_b): r.pair_n for r in out.collect()}
    assert got == {("a", "b"): 2}


def test_frequent_pairs_basket_size_cap(spark):
    # Cap at 2 drops basket b1 entirely: pair counts lose b1's
    # contribution → (a,b) 1, (a,c) 1, (b,c) 0.
    out = frequent_pairs(
        _baskets(spark),
        basket_col="basket",
        item_col="item",
        min_item_count=1,
        min_pair_count=1,
        max_basket_size=2,
    )
    got = {(r.item_a, r.item_b): r.pair_n for r in out.collect()}
    assert got == {("a", "b"): 1, ("a", "c"): 1}


def test_assoc_rules_confidence_and_lift_by_hand(spark):
    out = assoc_rules(
        _baskets(spark),
        basket_col="basket",
        item_col="item",
        min_item_count=1,
        min_pair_count=1,
    )
    rows = {(r.antecedent, r.consequent): r for r in out.collect()}
    # Both directions of each frequent pair.
    assert set(rows) == {
        ("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"), ("b", "c"), ("c", "b"),
    }
    ab = rows[("a", "b")]
    # support 2, n_a=3, n_b=3, n_baskets=4:
    #   conf = 2/3, lift = 2*4/(3*3) = 8/9
    assert ab.support_n == 2 and ab.n_antecedent == 3 and ab.n_consequent == 3
    assert ab.conf_e6 == math.floor(2 / 3 * 1e6 + 0.5)
    assert ab.lift_e6 == math.floor(8 / 9 * 1e6 + 0.5)
    cb = rows[("c", "b")]
    # support 1, n_c=2, n_b=3: conf = 1/2, lift = 4/6
    assert cb.conf_e6 == 500000
    assert cb.lift_e6 == math.floor(4 / 6 * 1e6 + 0.5)


def test_assoc_rules_lift_denominator_survives_item_prune(spark):
    # Pruning item c must NOT change n_baskets (4): a→b lift stays 8/9.
    out = assoc_rules(
        _baskets(spark),
        basket_col="basket",
        item_col="item",
        min_item_count=3,
        min_pair_count=1,
    )
    rows = {(r.antecedent, r.consequent): r for r in out.collect()}
    assert set(rows) == {("a", "b"), ("b", "a")}
    assert rows[("a", "b")].lift_e6 == math.floor(8 / 9 * 1e6 + 0.5)


def test_event_transitions_hand_matrix(spark):
    # u1: A B A B   → AB, BA, AB
    # u2: B B       → BB
    # Tie on ts within u1 is broken by the id column.
    rows = [
        ("u1", 1, 1, "A"),
        ("u1", 1, 2, "B"),
        ("u1", 2, 3, "A"),
        ("u1", 2, 4, "B"),
        ("u2", 1, 5, "B"),
        ("u2", 2, 6, "B"),
    ]
    df = spark.createDataFrame(rows, ["u", "t", "id", "s"])
    out = event_transitions(df, seq_col="u", state_col="s", order_cols=["t", "id"])
    got = {(r.prev_state, r.next_state): (r.n_transitions, r.p_e6) for r in out.collect()}
    assert got == {
        ("A", "B"): (2, 1000000),
        ("B", "A"): (1, 500000),
        ("B", "B"): (1, 500000),
    }


def test_event_transitions_single_event_sequences_emit_nothing(spark):
    df = spark.createDataFrame(
        [("u1", 1, 1, "A"), ("u2", 1, 2, "B")], ["u", "t", "id", "s"]
    )
    out = event_transitions(df, seq_col="u", state_col="s", order_cols=["t", "id"])
    assert out.count() == 0


def test_mutual_info_hand_2x2(spark):
    # Joint counts: (x1,y1)=2 (x1,y2)=1 (x2,y1)=1 (x2,y2)=2, n=6
    rows = (
        [("x1", "y1")] * 2 + [("x1", "y2")] + [("x2", "y1")] + [("x2", "y2")] * 2
    )
    df = spark.createDataFrame(rows, ["a", "b"])
    out = mutual_info(df, col_x="a", col_y="b")
    got = {(r.x, r.y): r for r in out.collect()}
    assert got[("x1", "y1")].n_xy == 2
    # pmi(x1,y1) = ln(2*6 / (3*3)) = ln(4/3)
    pmi = math.log((2 * 6) / (3 * 3))
    assert got[("x1", "y1")].pmi_e6 == math.floor(pmi * 1e6 + 0.5)
    assert got[("x1", "y1")].mi_contrib_e6 == math.floor((2 / 6) * pmi * 1e6 + 0.5)
    # MI total must be >= 0 and equal the hand sum.
    hand = sum(
        (nxy / 6) * math.log(nxy * 6 / (nx * ny))
        for nxy, nx, ny in [(2, 3, 3), (1, 3, 3), (1, 3, 3), (2, 3, 3)]
    )
    got_total = sum(r.mi_contrib_e6 for r in out.collect())
    assert abs(got_total - math.floor(hand * 1e6)) <= 4  # per-cell floor slack


def test_mutual_info_independent_columns_zero_mi(spark):
    # Perfect independence: every (x, y) cell has count 2 = n_x*n_y/n.
    rows = [(x, y) for x in ("p", "q") for y in ("r", "s") for _ in range(2)]
    df = spark.createDataFrame(rows, ["a", "b"])
    out = mutual_info(df, col_x="a", col_y="b")
    assert all(r.mi_contrib_e6 == 0 for r in out.collect())


def test_mutual_info_max_cells_guard(spark):
    df = spark.createDataFrame([(i, i) for i in range(10)], ["a", "b"])
    with pytest.raises(ValueError, match="more than 5"):
        mutual_info(df, col_x="a", col_y="b", max_cells=5)


def test_grouped_ols_exact_line(spark):
    # g1 lies exactly on y = 2x + 3 → slope 2, intercept 3, exactly.
    # g2 has zero x-variance → null slope/intercept.
    rows = [("g1", float(x), 2.0 * x + 3.0) for x in (1, 2, 3, 4)] + [
        ("g2", 5.0, 1.0),
        ("g2", 5.0, 9.0),
    ]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    out = {r.g: r for r in grouped_ols(
        df, group_cols=["g"], x_col="x", y_col="y", x_decimals=0, y_decimals=0
    ).collect()}
    assert out["g1"].n == 4
    assert out["g1"].slope_e6 == 2_000_000
    assert out["g1"].intercept_e6 == 3_000_000
    assert out["g2"].slope_e6 is None and out["g2"].intercept_e6 is None


def test_grouped_ols_decimal_scaling(spark):
    # Money-typed y with 2 decimals: y = 0.5x + 0.25 recovered exactly.
    rows = [("g", float(x), 0.5 * x + 0.25) for x in (2, 4, 6, 8)]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    r = grouped_ols(
        df, group_cols=["g"], x_col="x", y_col="y", x_decimals=0, y_decimals=2
    ).collect()[0]
    assert r.slope_e6 == 500_000
    assert r.intercept_e6 == 250_000


def test_grouped_ols_matches_stdlib_on_noisy_data(spark):
    # Integer-valued noisy points: compare against statistics module.
    import statistics as st

    xs = [1, 2, 3, 4, 5, 6, 7, 8]
    ys = [3, 5, 4, 8, 7, 11, 10, 14]
    df = spark.createDataFrame(
        [("g", float(x), float(y)) for x, y in zip(xs, ys)], ["g", "x", "y"]
    )
    r = grouped_ols(
        df, group_cols=["g"], x_col="x", y_col="y", x_decimals=0, y_decimals=0
    ).collect()[0]
    slope, intercept = st.linear_regression(xs, ys)
    assert abs(r.slope_e6 - slope * 1e6) <= 1
    assert abs(r.intercept_e6 - intercept * 1e6) <= 1


def test_fd_violations_held_and_broken(spark):
    rows = [
        (1, "a", "p"),
        (1, "a", "q"),   # id → c2 violated for id=1 (2 rows inside)
        (2, "b", "p"),
        (3, "b", "p"),
        (None, "x", "y"),  # null lhs dropped
        (4, None, "z"),    # null rhs dropped for (id → c1)
    ]
    df = spark.createDataFrame(rows, ["id", "c1", "c2"])
    out = {(r.lhs, r.rhs): r for r in fd_violations(
        df, fds=[("id", "c1"), ("id", "c2")]
    ).collect()}
    held = out[("id", "c1")]
    # ids 1,2,3 (4 has null rhs... wait: (4, None) drops that ROW only)
    assert held.n_groups == 3 and held.n_violating_groups == 0
    assert held.n_violating_rows == 0 and held.max_rhs_distinct == 1
    broken = out[("id", "c2")]
    assert broken.n_groups == 4
    assert broken.n_violating_groups == 1
    assert broken.n_violating_rows == 2
    assert broken.max_rhs_distinct == 2


def test_fd_violations_null_semantics(spark):
    # A group whose ONLY rows carry null rhs vanishes entirely.
    df = spark.createDataFrame(
        [(1, "a"), (2, None)], ["k", "v"]
    )
    r = fd_violations(df, fds=[("k", "v")]).collect()[0]
    assert r.n_groups == 1 and r.n_violating_groups == 0


def test_collocations_hand_pmi(spark):
    # Corpus: "a b" ×3, "a c" ×1 → tokens: a=4, b=3, c=1, N=8
    # bigrams: (a,b)=3, (a,c)=1
    rows = [("a b",)] * 3 + [("a c",)]
    df = spark.createDataFrame(rows, ["text"]).withColumn(
        "doc_id", F.monotonically_increasing_id()
    )
    from spatially_databricks_etl_spark.operators.mining import collocations

    out = {(r.w1, r.w2): r for r in collocations(
        df, text_col="text", min_pair_count=1
    ).collect()}
    ab = out[("a", "b")]
    assert ab.n_pair == 3 and ab.n_w1 == 4 and ab.n_w2 == 3
    assert ab.pmi_e6 == math.floor(math.log(3 * 8 / (4 * 3)) * 1e6 + 0.5)
    ac = out[("a", "c")]
    assert ac.pmi_e6 == math.floor(math.log(1 * 8 / (4 * 1)) * 1e6 + 0.5)


def test_collocations_lowercases_and_drops_empty_tokens(spark):
    # Double spaces create empty tokens that must NOT break adjacency:
    # "A  b" still yields bigram (a, b).
    df = spark.createDataFrame([("A  b",), ("a b",)], ["text"]).withColumn(
        "doc_id", F.monotonically_increasing_id()
    )
    from spatially_databricks_etl_spark.operators.mining import collocations

    out = collocations(df, text_col="text", min_pair_count=1)
    rows = out.collect()
    assert len(rows) == 1
    assert (rows[0].w1, rows[0].w2, rows[0].n_pair) == ("a", "b", 2)


def test_collocations_no_cross_document_bigrams(spark):
    # Last token of doc 1 and first token of doc 2 must not pair.
    df = spark.createDataFrame([("x y",), ("z w",)], ["text"]).withColumn(
        "doc_id", F.monotonically_increasing_id()
    )
    from spatially_databricks_etl_spark.operators.mining import collocations

    got = {(r.w1, r.w2) for r in collocations(
        df, text_col="text", min_pair_count=1
    ).collect()}
    assert got == {("x", "y"), ("z", "w")}


def test_candidate_keys_hand(spark):
    from spatially_databricks_etl_spark.operators.quality import candidate_keys

    rows = [(1, "a", "x"), (2, "a", None), (3, "b", "y")]
    df = spark.createDataFrame(rows, ["id", "grp", "opt"])
    out = {r.col_name: r for r in candidate_keys(df, ["id", "grp", "opt"]).collect()}
    assert out["id"].is_unique_key is True
    assert (out["id"].n_rows, out["id"].n_nonnull, out["id"].n_distinct) == (3, 3, 3)
    assert out["grp"].is_unique_key is False and out["grp"].n_distinct == 2
    # A null makes a column ineligible even if non-null values are unique.
    assert out["opt"].is_unique_key is False
    assert (out["opt"].n_nonnull, out["opt"].n_distinct) == (2, 2)


def test_repeated_spans_hand_case(spark):
    from spatially_databricks_etl_spark.operators.curate import repeated_spans

    shared = "S" * 10
    rows = [
        (1, shared + "aaaa"),     # len 14: starts 1, 5 (window 10, stride 4)
        (2, shared),              # len 10: start 1 only
        (3, "zzzz" + shared),     # shared misaligned (start 5 hits it)
        (4, "short"),             # < window: contributes nothing
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.span: r for r in repeated_spans(
        df, id_col="doc_id", text_col="text", window=10, stride=4, min_docs=2
    ).collect()}
    assert shared in out
    # docs 1 (start 1), 2 (start 1), 3 (start 5) all emit the shared span
    assert out[shared].n_docs == 3 and out[shared].n_occurrences == 3
    # Nothing else repeats across >= 2 docs.
    assert set(out) == {shared}


def test_repeated_spans_occurrences_vs_docs(spark):
    from spatially_databricks_etl_spark.operators.curate import repeated_spans

    # One doc repeating the span twice at aligned offsets + one other doc:
    # n_occurrences counts windows, n_docs counts documents.
    span = "R" * 8
    rows = [(1, span + span), (2, span)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = repeated_spans(
        df, id_col="doc_id", text_col="text", window=8, stride=8, min_docs=2
    ).collect()
    assert len(out) == 1
    assert out[0].n_docs == 2 and out[0].n_occurrences == 3


def test_repeated_spans_rejects_bad_params(spark):
    from spatially_databricks_etl_spark.operators.curate import repeated_spans

    df = spark.createDataFrame([(1, "abc")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        repeated_spans(df, id_col="doc_id", text_col="text", window=0)


def _journeys(spark):
    # u1: click view PURCHASE click PURCHASE click(trailing)
    #   seg1 touches {click, view}; seg2 touches {click}; trailing uncredited
    # u2: PURCHASE with no touches — uncredited
    rows = [
        ("u1", 1, 1, "click"),
        ("u1", 2, 2, "view"),
        ("u1", 3, 3, "purchase"),
        ("u1", 4, 4, "click"),
        ("u1", 5, 5, "purchase"),
        ("u1", 6, 6, "click"),
        ("u2", 1, 7, "purchase"),
    ]
    return spark.createDataFrame(rows, ["u", "t", "id", "typ"])


def test_attribution_last_and_first_hand(spark):
    from spatially_databricks_etl_spark.operators.mining import attribution

    kw = dict(
        seq_col="u", type_col="typ", order_cols=["t", "id"],
        conversion_type="purchase",
    )
    last = {r.touch_type: r.n_credited for r in attribution(
        _journeys(spark), model="last", **kw
    ).collect()}
    assert last == {"view": 1, "click": 1}
    first = {r.touch_type: r.n_credited for r in attribution(
        _journeys(spark), model="first", **kw
    ).collect()}
    assert first == {"click": 2}


def test_attribution_rejects_unknown_model(spark):
    from spatially_databricks_etl_spark.operators.mining import attribution

    with pytest.raises(ValueError, match="unknown model"):
        attribution(
            _journeys(spark), seq_col="u", type_col="typ",
            order_cols=["t", "id"], conversion_type="purchase",
            model="time_decay",
        )


def test_attribution_linear_hand(spark):
    from spatially_databricks_etl_spark.operators.mining import attribution_linear

    out = {(r.touch_type, r.segment_size): r for r in attribution_linear(
        _journeys(spark), seq_col="u", type_col="typ",
        order_cols=["t", "id"], conversion_type="purchase",
    ).collect()}
    assert out[("click", 2)].n_touches == 1
    assert out[("click", 2)].credit_e6 == 500000
    assert out[("view", 2)].credit_e6 == 500000
    assert out[("click", 1)].credit_e6 == 1000000
    # Total credit = 2 conversions exactly (e6 units).
    assert sum(r.credit_e6 for r in out.values()) == 2_000_000


def test_kmeans_outliers_hand_case(spark):
    from spatially_databricks_etl_spark.operators.embeddings import kmeans_outliers

    cents = [[0.0, 0.0], [10.0, 10.0]]
    rows = [
        (1, [0.0, 1.0]),    # cluster 0, d=1
        (2, [0.0, 2.0]),    # cluster 0, d=4  -> rank 1
        (3, [0.0, 0.0]),    # cluster 0, d=0  -> cut at top_k=2
        (4, [10.0, 11.0]),  # cluster 1, d=1  -> rank 1
        (5, [10.0, 10.0]),  # cluster 1, d=0  -> rank 2
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {(r.cluster, r.rank): (r.vec_id, r.dist2_e6) for r in kmeans_outliers(
        df, cents, top_k=2
    ).collect()}
    assert got == {
        (0, 1): (2, 4_000_000),
        (0, 2): (1, 1_000_000),
        (1, 1): (4, 1_000_000),
        (1, 2): (5, 0),
    }


def test_kmeans_outliers_distance_tie_breaks_to_lower_id(spark):
    from spatially_databricks_etl_spark.operators.embeddings import kmeans_outliers

    rows = [(7, [0.0, 3.0]), (2, [3.0, 0.0]), (9, [0.0, 0.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = [(r.vec_id, r.rank) for r in kmeans_outliers(
        df, [[0.0, 0.0]], top_k=3
    ).orderBy("rank").collect()]
    assert got == [(2, 1), (7, 2), (9, 3)]


def _store_rows(spark, lo, hi):
    return spark.createDataFrame(
        [(float(i), float(i) * 0.25) for i in range(lo, hi)]
        + [(None, None)],  # nulls counted in n_rows, not n_nonnull
        ["qty", "price"],
    )


def test_profile_store_append_equals_rebuild(spark, tmp_path):
    from spatially_databricks_etl_spark.operators.profile import (
        profile_append_store,
        profile_read_store,
        profile_write_store,
    )

    cols = {"qty": 0, "price": 2}
    b1 = _store_rows(spark, 0, 50)
    b2 = _store_rows(spark, 50, 80)

    inc = str(tmp_path / "inc")
    profile_write_store(b1, inc, cols=cols, batch_id="b1")
    profile_append_store(b2, inc, batch_id="b2")

    full = str(tmp_path / "full")
    profile_write_store(b1.unionByName(b2), full, cols=cols, batch_id="all")

    got = {r.col_name: r for r in profile_read_store(spark, inc).collect()}
    want = {r.col_name: r for r in profile_read_store(spark, full).collect()}
    assert got.keys() == want.keys() == {"qty", "price"}
    for c in got:
        g, w = got[c], want[c]
        assert (g.n_rows, g.n_nonnull, g.min_val, g.max_val, g.mean_e6) == (
            w.n_rows, w.n_nonnull, w.min_val, w.max_val, w.mean_e6
        ), c
    assert got["qty"].n_batches == 2 and want["qty"].n_batches == 1
    # Hand check: qty mean over 0..79 = 39.5
    assert got["qty"].mean_e6 == 39_500_000
    assert got["qty"].n_rows == 82 and got["qty"].n_nonnull == 80


def test_profile_store_reingest_is_idempotent(spark, tmp_path):
    from spatially_databricks_etl_spark.operators.profile import (
        profile_append_store,
        profile_read_store,
        profile_write_store,
    )

    path = str(tmp_path / "store")
    profile_write_store(
        _store_rows(spark, 0, 10), path, cols={"qty": 0}, batch_id="b1"
    )
    profile_append_store(_store_rows(spark, 10, 20), path, batch_id="b2")
    before = {r.col_name: r for r in profile_read_store(spark, path).collect()}
    # Replaying batch b2 (same id) must overwrite, not double-count.
    profile_append_store(_store_rows(spark, 10, 20), path, batch_id="b2")
    after = {r.col_name: r for r in profile_read_store(spark, path).collect()}
    assert before["qty"].n_rows == after["qty"].n_rows == 22
    assert before["qty"].mean_e6 == after["qty"].mean_e6 == 9_500_000


def test_profile_store_recreate_truncates_stale_batches(spark, tmp_path):
    """profile_write_store is CREATE semantics: re-creating over an
    existing store truncates stale batch partitions (and any old
    cols/decimals contract) instead of silently merging them."""
    from spatially_databricks_etl_spark.operators.profile import (
        profile_append_store,
        profile_read_store,
        profile_write_store,
    )

    path = str(tmp_path / "store")
    profile_write_store(
        _store_rows(spark, 0, 10), path, cols={"qty": 0, "price": 2},
        batch_id="old1",
    )
    profile_append_store(_store_rows(spark, 10, 20), path, batch_id="old2")
    # Re-create with a NARROWER contract and a fresh batch id: the
    # old1/old2 partitions (and the price column) must be gone.
    profile_write_store(
        _store_rows(spark, 100, 110), path, cols={"qty": 0}, batch_id="b1"
    )
    got = {r.col_name: r for r in profile_read_store(spark, path).collect()}
    assert set(got) == {"qty"}
    assert got["qty"].n_batches == 1
    assert got["qty"].n_rows == 11 and got["qty"].n_nonnull == 10
    assert got["qty"].mean_e6 == 104_500_000


def test_round9_operators_survive_empty_input(spark):
    """Every round-9 operator must return an EMPTY (not crashed)
    result on an empty input frame — the degenerate case a pipeline
    hits on an empty ingest partition."""
    from spatially_databricks_etl_spark.operators.curate import repeated_spans
    from spatially_databricks_etl_spark.operators.embeddings import kmeans_outliers
    from spatially_databricks_etl_spark.operators.mining import (
        assoc_rules,
        attribution,
        attribution_linear,
        collocations,
        event_transitions,
        frequent_pairs,
    )
    from spatially_databricks_etl_spark.operators.profile import (
        grouped_ols,
        mutual_info,
    )
    from spatially_databricks_etl_spark.operators.quality import (
        candidate_keys,
        fd_violations,
    )

    eb = spark.createDataFrame([], "basket string, item string")
    assert frequent_pairs(eb, basket_col="basket", item_col="item").count() == 0
    assert assoc_rules(eb, basket_col="basket", item_col="item").count() == 0

    ee = spark.createDataFrame([], "u string, t long, id long, s string")
    assert event_transitions(
        ee, seq_col="u", state_col="s", order_cols=["t", "id"]
    ).count() == 0
    kw = dict(seq_col="u", type_col="s", order_cols=["t", "id"],
              conversion_type="conv")
    assert attribution(ee, model="last", **kw).count() == 0
    assert attribution_linear(ee, **kw).count() == 0

    ed = spark.createDataFrame([], "doc_id long, text string")
    assert collocations(ed, text_col="text").count() == 0
    assert repeated_spans(ed, id_col="doc_id", text_col="text").count() == 0

    ep = spark.createDataFrame([], "x string, y string")
    assert mutual_info(ep, col_x="x", col_y="y").count() == 0

    eo = spark.createDataFrame([], "g string, x double, y double")
    assert grouped_ols(
        eo, group_cols=["g"], x_col="x", y_col="y", x_decimals=0, y_decimals=0
    ).count() == 0

    ek = spark.createDataFrame([], "id long, v string")
    # fd_violations / candidate_keys emit one summary row per FD/column
    # even on empty input — counts all zero, is_unique_key vacuously true
    fd = fd_violations(ek, fds=[("id", "v")]).collect()
    assert len(fd) == 1 and fd[0].n_groups == 0 and fd[0].n_violating_groups == 0
    ck = {r.col_name: r for r in candidate_keys(ek, ["id", "v"]).collect()}
    assert ck["id"].n_rows == 0 and ck["id"].is_unique_key is True

    ev = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert kmeans_outliers(ev, [[0.0, 0.0]], top_k=3).count() == 0


def test_token_diversity_hand_case(spark):
    from spatially_databricks_etl_spark.operators.curate import token_diversity

    rows = [
        ("s1", 1, "a b a"),      # 3 tokens, 2 distinct
        ("s1", 2, "a  a"),       # 2 tokens (double space), 1 distinct
        ("s2", 3, "x y z"),      # 3 tokens, 3 distinct
        ("s2", 4, ""),           # zero tokens: not counted as a doc
    ]
    df = spark.createDataFrame(rows, ["src", "id", "text"])
    out = {r.group_key: r for r in token_diversity(
        df, group_col="src", id_col="id", text_col="text"
    ).collect()}
    s1 = out["s1"]
    assert (s1.n_docs, s1.n_tokens, s1.n_distinct_tokens) == (2, 5, 2)
    assert s1.ttr_e6 == 400000
    s2 = out["s2"]
    assert (s2.n_docs, s2.n_tokens, s2.n_distinct_tokens) == (1, 3, 3)
    assert s2.ttr_e6 == 1000000


def test_column_entropy_hand_cases(spark):
    from spatially_databricks_etl_spark.operators.profile import column_entropy

    rows = [("a", "u"), ("a", "v"), ("b", "u"), ("b", "v"),
            ("a", None), ("a", "u")]
    df = spark.createDataFrame(rows, ["c_const_ish", "c2"])
    out = {r.col_name: r for r in column_entropy(
        df, ["c_const_ish", "c2"]
    ).collect()}
    # c_const_ish: a=4, b=2, n=6
    p_a, p_b = 4 / 6, 2 / 6
    want = -(p_a) * math.log(p_a) + -(p_b) * math.log(p_b)
    assert out["c_const_ish"].entropy_e6 == math.floor(want * 1e6 + 0.5)
    assert out["c_const_ish"].n_rows == 6
    assert out["c_const_ish"].max_entropy_e6 == math.floor(math.log(2) * 1e6 + 0.5)
    # c2: nulls dropped -> u=3, v=2, n=5
    assert out["c2"].n_rows == 5 and out["c2"].n_distinct == 2


def test_column_entropy_constant_column_is_zero(spark):
    from spatially_databricks_etl_spark.operators.profile import column_entropy

    df = spark.createDataFrame([("k",)] * 7, ["c"])
    r = column_entropy(df, ["c"]).collect()[0]
    assert r.entropy_e6 == 0 and r.n_distinct == 1 and r.max_entropy_e6 == 0


def test_column_entropy_max_values_guard(spark):
    from spatially_databricks_etl_spark.operators.profile import column_entropy

    df = spark.createDataFrame([(i,) for i in range(10)], ["c"])
    with pytest.raises(ValueError, match="more than 4"):
        column_entropy(df, ["c"], max_values=4)


def test_weighted_quantiles_hand_case(spark):
    from spatially_databricks_etl_spark.operators.profile import weighted_quantiles

    # values 1..4 with weights 1,1,2,6 (W=10):
    #   cum: 1->1, 2->2, 3->4, 4->10
    #   p25 (cum>=2.5) -> 3; p50 (cum>=5) -> 4; p10 (cum>=1) -> 1
    rows = [(1.0, 1.0), (2.0, 1.0), (3.0, 2.0), (4.0, 6.0)]
    df = spark.createDataFrame(rows, ["v", "w"])
    got = {r.q_permille: r.value for r in weighted_quantiles(
        df, val_col="v", weight_col="w", qs_permille=[100, 250, 500, 1000]
    ).collect()}
    assert got == {100: 1.0, 250: 3.0, 500: 4.0, 1000: 4.0}


def test_weighted_quantiles_ignores_nonpositive_weights(spark):
    from spatially_databricks_etl_spark.operators.profile import weighted_quantiles

    rows = [(1.0, 0.0), (2.0, -5.0), (3.0, 1.0)]
    df = spark.createDataFrame(rows, ["v", "w"])
    got = weighted_quantiles(
        df, val_col="v", weight_col="w", qs_permille=[500]
    ).collect()
    assert got[0].value == 3.0


def test_weighted_quantiles_rejects_bad_q(spark):
    from spatially_databricks_etl_spark.operators.profile import weighted_quantiles

    df = spark.createDataFrame([(1.0, 1.0)], ["v", "w"])
    with pytest.raises(ValueError):
        weighted_quantiles(df, val_col="v", weight_col="w", qs_permille=[0])
    with pytest.raises(ValueError):
        weighted_quantiles(df, val_col="v", weight_col="w", qs_permille=[])


def test_gini_hand_cases(spark):
    from spatially_databricks_etl_spark.operators.profile import gini_concentration

    # Perfect equality: every group total 5 -> G = 0.
    eq = spark.createDataFrame(
        [(g, 5.0) for g in "abcd"], ["g", "v"]
    )
    r = gini_concentration(eq, group_col="g", value_col="v").collect()[0]
    assert r.gini_e6 == 0 and r.n_groups == 4

    # Total concentration in 1 of 4 groups: G = (n-1)/n = 0.75.
    conc = spark.createDataFrame(
        [("a", 0.0), ("b", 0.0), ("c", 0.0), ("d", 8.0)], ["g", "v"]
    )
    r = gini_concentration(conc, group_col="g", value_col="v").collect()[0]
    assert r.gini_e6 == 750000

    # Known small case: totals [1, 3] -> G = (2*1*1 + 2*2*3 - 3*4)/(2*4)
    #   = (2 + 12 - 12)/8 = 0.25
    two = spark.createDataFrame([("a", 1.0), ("b", 3.0)], ["g", "v"])
    r = gini_concentration(two, group_col="g", value_col="v").collect()[0]
    assert r.gini_e6 == 250000

    # Multi-row groups aggregate before ranking: a = 1+1, b = 2 -> G = 0.
    multi = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("b", 2.0)], ["g", "v"]
    )
    r = gini_concentration(multi, group_col="g", value_col="v").collect()[0]
    assert r.gini_e6 == 0


def test_gini_empty_and_negative(spark):
    from spatially_databricks_etl_spark.operators.profile import gini_concentration

    empty = spark.createDataFrame([], "g string, v double")
    r = gini_concentration(empty, group_col="g", value_col="v").collect()[0]
    assert r.n_groups == 0 and r.gini_e6 is None

    neg = spark.createDataFrame([("a", -1.0), ("b", 3.0)], ["g", "v"])
    r = gini_concentration(neg, group_col="g", value_col="v").collect()[0]
    assert r.gini_e6 is None  # undefined under negative totals


def test_benford_audit_hand_case(spark):
    from spatially_databricks_etl_spark.operators.quality import benford_audit

    # Values with known first digits: 1xx ×3, 2x ×1, 9.x ×1 (digit 9),
    # 0 and negative and null dropped.
    rows = [(100.0,), (150.0,), (199.0,), (25.0,), (9.5,),
            (0.0,), (-3.0,), (None,)]
    df = spark.createDataFrame(rows, ["v"])
    out = {r.digit: r for r in benford_audit(
        df, value_col="v", value_decimals=1
    ).collect()}
    assert len(out) == 9  # every digit emits a row
    assert out[1].n_observed == 3 and out[1].n_total == 5
    assert out[2].n_observed == 1
    assert out[9].n_observed == 1
    assert out[5].n_observed == 0  # zero-count digit still present
    # p_benford for digit 1 = log10(2)
    assert out[1].p_benford_e6 == math.floor(math.log10(2) * 1e6 + 0.5)
    # chi2 contribution replay for digit 1
    p1 = math.log(2.0 / 1.0) / math.log(10.0)
    exp1 = 5 * p1
    want = (3 - exp1) ** 2 / exp1
    assert out[1].chi2_contrib_e6 == math.floor(want * 1e6 + 0.5)


def test_benford_audit_empty_input(spark):
    from spatially_databricks_etl_spark.operators.quality import benford_audit

    df = spark.createDataFrame([], "v double")
    out = benford_audit(df, value_col="v").collect()
    assert len(out) == 9
    assert all(r.n_observed == 0 and r.n_total == 0 for r in out)
    assert all(r.p_obs_e6 is None and r.chi2_contrib_e6 is None for r in out)


def test_profile_store_delete_batch_equals_rebuild(spark, tmp_path):
    """Lifecycle symmetry for the profile store: dropping one batch's
    partition must make the merged profile bit-identical to a store
    that never ingested it; deleting an absent id is a no-op; deleting
    every batch leaves a readable empty store."""
    from spatially_databricks_etl_spark.operators.profile import (
        profile_append_store,
        profile_delete_batch,
        profile_read_store,
        profile_write_store,
    )

    cols = {"qty": 0, "price": 2}
    b1 = _store_rows(spark, 0, 50)
    b2 = _store_rows(spark, 50, 80)
    b3 = _store_rows(spark, 80, 90)

    inc = str(tmp_path / "inc_del")
    profile_write_store(b1, inc, cols=cols, batch_id="b1")
    profile_append_store(b2, inc, batch_id="b2")
    profile_append_store(b3, inc, batch_id="b3")
    profile_delete_batch(spark, inc, "b2")

    want_store = str(tmp_path / "without_b2")
    profile_write_store(b1, want_store, cols=cols, batch_id="b1")
    profile_append_store(b3, want_store, batch_id="b3")

    got = {r.col_name: tuple(r) for r in profile_read_store(spark, inc).collect()}
    want = {
        r.col_name: tuple(r) for r in profile_read_store(spark, want_store).collect()
    }
    assert got == want and set(got) == {"qty", "price"}

    # absent id: no-op
    profile_delete_batch(spark, inc, "nope")
    again = {r.col_name: tuple(r) for r in profile_read_store(spark, inc).collect()}
    assert again == got

    # deleting every batch leaves a readable empty store
    profile_delete_batch(spark, inc, "b1")
    profile_delete_batch(spark, inc, "b3")
    assert profile_read_store(spark, inc).count() == 0


def test_drift_embedding_identity_and_closed_form(spark):
    """Embedding-drift contracts: (a) a snapshot against itself is
    EXACTLY (cos=1.0, shift=0) — the exact-integer core, not a
    float-happens-to-round identity; (b) a closed-form hand case
    (sum_r=(s,s) vs sum_c=(s,0): cos = 1/sqrt(2), mean shift =
    sqrt(0.5)); (c) null-vector rows enter neither the sums nor the
    counts; (d) an empty side yields null statistics with the counts
    still reported."""
    from pyspark.sql import functions as F

    from spatially_databricks_etl_spark.operators.profile import drift_embedding

    ref = spark.createDataFrame(
        [([1.0, 0.0],), ([0.0, 1.0],), (None,)], "embedding array<float>"
    )
    cur = spark.createDataFrame([([1.0, 0.0],)], "embedding array<float>")

    self_row = drift_embedding(ref, ref).collect()[0]
    assert (
        self_row["n_ref"],
        self_row["n_cur"],
        self_row["centroid_cos_e6"],
        self_row["mean_shift_l2_e6"],
    ) == (2, 2, 1_000_000, 0)

    row = drift_embedding(ref, cur).collect()[0]
    # cos(sum_r, sum_c) = 1/sqrt(2); shift = |(0.5,0.5)-(1,0)| = sqrt(.5)
    assert (row["n_ref"], row["n_cur"]) == (2, 1)
    assert row["centroid_cos_e6"] == 707107
    assert row["mean_shift_l2_e6"] == 707107

    empty = cur.filter("embedding IS NULL")
    erow = drift_embedding(ref, empty).collect()[0]
    assert (erow["n_ref"], erow["n_cur"]) == (2, 0)
    assert erow["centroid_cos_e6"] is None and erow["mean_shift_l2_e6"] is None


def test_drift_embedding_headroom_breach_raises_loudly(spark):
    """ADVICE r11 (enforced by VERDICT r11 item 5): past the
    decimal(38,0) headroom the squared common-denominator term
    (S_r·n_c − S_c·n_r)² would overflow — under non-ANSI Spark the
    product silently nulls and F.sum drops it, producing a WRONG
    statistic indistinguishable from the legitimate empty-side null.
    The guard must instead raise at execution. Components of ~1e13 at
    value_decimals=6 give per-row scaled sums ~1e19, whose squared
    cross terms (~1e40) breach 38 digits with only a handful of rows.
    Also pins that the guard does NOT fire on ordinary unit-scale
    input (the sibling test's cases run through the same code path)
    and that the legitimate empty side still yields nulls, not an
    error."""
    import pytest

    from spatially_databricks_etl_spark.operators.profile import drift_embedding

    big = spark.createDataFrame(
        [([1.0e13, -1.0e13],)] * 4, "embedding array<float>"
    )
    small = spark.createDataFrame(
        [([1.0, 0.0],), ([0.0, 1.0],)], "embedding array<float>"
    )
    # ANSI-on sessions (the Spark 4 default) fail loudly at the
    # decimal cast itself; the guard exists for non-ANSI sessions,
    # where the overflow would otherwise be a silent null-drop —
    # both paths must be LOUD
    with pytest.raises(Exception, match="headroom|NUMERIC_VALUE_OUT_OF_RANGE"):
        drift_embedding(big, small).collect()
    ansi_was = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        for a, b in ((big, small), (small, big)):
            with pytest.raises(Exception, match="headroom"):
                drift_embedding(a, b).collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi_was)
    # unit-scale inputs pass untouched through the guarded plan
    row = drift_embedding(small, small).collect()[0]
    assert row["centroid_cos_e6"] == 1_000_000
    # an empty side is a null statistic, never a guard error
    erow = drift_embedding(
        small, small.filter("embedding IS NULL")
    ).collect()[0]
    assert erow["centroid_cos_e6"] is None


def test_embedding_quality_hand_counters_and_exact_rms(spark):
    """embedding_quality closed-form hand case covering every counter:
    null / empty / nonfinite / zero vectors, RAGGED dims (2 vs 3),
    and the RMS norm replayed from the exact integer formula the
    operator (and its DuckDB oracle) uses — floor-scale, square, sum,
    one division + sqrt + e6 floor."""
    import math

    from spatially_databricks_etl_spark.operators.profile import embedding_quality

    rows = [
        ([3.0, 4.0],),          # valid, dim 2, sq-norm 25e12
        ([0.0, 0.0],),          # zero vector (valid, enters RMS)
        (None,),                # null
        ([],),                  # empty
        ([float("nan"), 1.0],), # nonfinite
        ([1.0, 2.0, 2.0],),     # valid, dim 3, sq-norm 9e12
    ]
    df = spark.createDataFrame(rows, "embedding array<float>")
    r = embedding_quality(df).collect()[0]
    assert (
        r["n_rows"],
        r["n_null_vec"],
        r["n_empty_vec"],
        r["n_nonfinite_vec"],
        r["dim_min"],
        r["dim_max"],
        r["n_zero_vec"],
    ) == (6, 1, 1, 1, 2, 3, 1)
    want = math.floor(
        math.sqrt(float(25e12 + 0 + 9e12) / (3.0 * 1e12)) * 1e6 + 0.5
    )
    assert r["norm_rms_e6"] == want

    # all-invalid input: counters report, RMS is null (never an error)
    bad = spark.createDataFrame([(None,), ([],)], "embedding array<float>")
    rb = embedding_quality(bad).collect()[0]
    assert rb["norm_rms_e6"] is None and rb["dim_min"] is None

    # per-row squared sums accumulate in decimal(38,0), NOT int64: a
    # component of 1e10 scales to c=1e16 whose square (1e32) silently
    # WRAPS in non-ANSI long arithmetic — here it must stay exact:
    # rms = sqrt(1e32 / 1e12) = 1e10, e6-floored to exactly 10^16
    huge = spark.createDataFrame([([1.0e10],)], "embedding array<float>")
    rh = embedding_quality(huge).collect()[0]
    assert rh["norm_rms_e6"] == 10**16
