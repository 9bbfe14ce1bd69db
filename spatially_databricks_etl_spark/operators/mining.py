"""Pattern-mining operators: market-basket association rules and
Markov transition matrices over event sequences.

These extend the curation toolbox (reference scope: the notebook's
single-table recode pipeline, ``Spatially ETL test.py:120-214``) with
the co-occurrence analyses a training-data pipeline runs to audit
corpus composition: which items/tags/sources co-occur (and how
strongly), and how users/sessions move between event states.

Design notes (100 TB):
- Pair generation is a SELF-EQUI-JOIN on the basket key, never a
  cross join: the shuffle moves each (basket, item) row once, and the
  per-basket quadratic work is bounded by the basket size. A-priori
  pruning (drop infrequent items BEFORE pairing) cuts the join input
  — at web scale most of the long tail dies here, which is the
  classic Apriori observation (Agrawal & Srikant, VLDB '94).
- All emitted statistics are ratios of exact integer counts
  (support/confidence/lift; transition probabilities), so a single
  IEEE division per row replays bit-identically in any engine.
- The transition matrix uses one window shuffle on the sequence key
  (the ``sessionize`` shape) followed by a hash aggregate whose
  output is |states|² — cardinality-bounded, never data-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

__all__ = [
    "frequent_pairs",
    "assoc_rules",
    "attribution",
    "attribution_linear",
    "collocations",
    "event_transitions",
]


def _basket_items(
    df: DataFrame,
    *,
    basket_col: str,
    item_col: str,
    min_item_count: int,
    max_basket_size: int | None,
) -> "tuple[DataFrame, DataFrame, DataFrame]":
    """Shared basket-prep stage for :func:`frequent_pairs` and
    :func:`assoc_rules`: distinct non-null (basket, item) pairs, the
    optional degenerate-basket size cap, then the a-priori item-count
    prune. Returns ``(items, item_counts, totals)`` where ``items`` is
    the pruned (__basket, __item) frame, ``item_counts`` the
    (__item, __icnt) counts of SURVIVING items, and ``totals`` a lazy
    one-row (__nb) basket-universe count taken AFTER the size cap but
    BEFORE item pruning — dropping an infrequent item must not shrink
    the denominator of every lift (unused frames cost nothing).
    """
    items = (
        df.select(
            F.col(basket_col).alias("__basket"),
            F.col(item_col).alias("__item"),
        )
        .filter(F.col("__basket").isNotNull() & F.col("__item").isNotNull())
        .distinct()
    )
    if max_basket_size is not None:
        sizes = items.groupBy("__basket").agg(
            F.count(F.lit(1)).alias("__bsize")
        )
        items = items.join(
            sizes.filter(F.col("__bsize") <= max_basket_size).select("__basket"),
            "__basket",
        )
    totals = items.select("__basket").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("__nb")
    )
    item_counts = items.groupBy("__item").agg(
        F.count(F.lit(1)).cast("long").alias("__icnt")
    )
    if min_item_count > 1:
        item_counts = item_counts.filter(F.col("__icnt") >= min_item_count)
        items = items.join(item_counts.select("__item"), "__item", "semi")
    return items, item_counts, totals


def _order_cols_not_null(order_cols: "list[str]"):
    """Conjunction requiring every sequence-order column to be
    non-null: Spark windows sort ASC NULLS FIRST while ANSI engines
    default NULLS LAST, so a null order key would place an event at a
    different sequence position per engine. Every sequence operator
    in this module excludes such rows up front."""
    cond = F.lit(True)
    for c in order_cols:
        cond = cond & F.col(c).isNotNull()
    return cond


def _pair_counts(
    items: DataFrame, *, min_pair_count: int, count_alias: str
) -> DataFrame:
    """Shared pair stage: ONE self-equi-join on the basket key
    (per-basket quadratic, bounded by basket size after the
    :func:`_basket_items` guards) then a pair hash-agg, filtered to
    ``count_alias >= min_pair_count``."""
    a = items.alias("a")
    b = items.alias("b")
    return (
        a.join(
            b,
            (F.col("a.__basket") == F.col("b.__basket"))
            & (F.col("a.__item") < F.col("b.__item")),
        )
        .groupBy(
            F.col("a.__item").alias("item_a"),
            F.col("b.__item").alias("item_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias(count_alias))
        .filter(F.col(count_alias) >= min_pair_count)
    )


def frequent_pairs(
    df: DataFrame,
    *,
    basket_col: str,
    item_col: str,
    min_item_count: int = 2,
    min_pair_count: int = 2,
    max_basket_size: int | None = None,
) -> DataFrame:
    """Frequent item PAIRS by basket co-occurrence (the 2-itemset
    stage of Apriori). Returns (item_a, item_b, pair_n) with
    item_a < item_b and pair_n = number of distinct baskets
    containing both, filtered to ``pair_n >= min_pair_count``.

    A-priori pruning: items appearing in fewer than
    ``min_item_count`` baskets are dropped BEFORE the self-join —
    no pair they form can reach that support, and at corpus scale
    this removes the long tail that would otherwise dominate the
    join input. ``max_basket_size`` (optional) drops whole baskets
    above the cap — a skew guard for degenerate baskets (a crawler
    session touching every item would contribute O(n_items²) pairs);
    when set, dropped baskets are simply absent from every count, so
    results stay deterministic.

    Scale shape: one (basket, item) distinct shuffle, one item-count
    hash-agg, a semi-join against the frequent-item set, ONE
    self-equi-join on the basket key (per-basket quadratic, bounded
    by basket size), one pair hash-agg. No cross joins, no
    driver-side data collects.
    """
    items, _, _ = _basket_items(
        df,
        basket_col=basket_col,
        item_col=item_col,
        min_item_count=min_item_count,
        max_basket_size=max_basket_size,
    )
    return _pair_counts(
        items, min_pair_count=min_pair_count, count_alias="pair_n"
    )


def assoc_rules(
    df: DataFrame,
    *,
    basket_col: str,
    item_col: str,
    min_item_count: int = 2,
    min_pair_count: int = 2,
    max_basket_size: int | None = None,
) -> DataFrame:
    """Directed association rules from frequent pairs: for every
    frequent unordered pair {a, b}, emit BOTH rules a→b and b→a with

      support_n  = baskets containing both (exact long)
      conf_e6    = floor(support_n / n_antecedent · 1e6 + 0.5)
      lift_e6    = floor(support_n · n_baskets /
                         (n_antecedent · n_consequent) · 1e6 + 0.5)

    Confidence is P(consequent | antecedent); lift > 1e6 (i.e. >1.0)
    means the pair co-occurs more than independence predicts. Counts
    are exact longs; each statistic is ONE IEEE division of exact
    integer products (products stay far below 2⁶³ for any corpus
    where counts fit in a long and baskets ≤ ~10⁹), then the
    e6 floor — the repo's standard cross-engine quantization.

    Returns (antecedent, consequent, support_n, n_antecedent,
    n_consequent, conf_e6, lift_e6).

    Scale shape: :func:`frequent_pairs` plus two equi-joins against
    the item-count frame and a one-row broadcast of the basket total
    (the :func:`_basket_items` / :func:`_pair_counts` stages are
    shared with :func:`frequent_pairs`, so the two cannot drift).
    The n_baskets total counts baskets SURVIVING the guards (size
    cap), so every ratio is internally consistent.
    """
    items, item_counts, totals = _basket_items(
        df,
        basket_col=basket_col,
        item_col=item_col,
        min_item_count=min_item_count,
        max_basket_size=max_basket_size,
    )
    pairs = _pair_counts(
        items, min_pair_count=min_pair_count, count_alias="support_n"
    )
    # Both rule directions from one pair row, then resolve the two
    # item counts by equi-join (the item-count frame is
    # vocabulary-sized; Spark may broadcast it under AQE, and the
    # equi-join stays correct when it cannot).
    directed = pairs.select(
        F.col("item_a").alias("antecedent"),
        F.col("item_b").alias("consequent"),
        "support_n",
    ).unionByName(
        pairs.select(
            F.col("item_b").alias("antecedent"),
            F.col("item_a").alias("consequent"),
            "support_n",
        )
    )
    ante = item_counts.select(
        F.col("__item").alias("antecedent"),
        F.col("__icnt").alias("n_antecedent"),
    )
    cons = item_counts.select(
        F.col("__item").alias("consequent"),
        F.col("__icnt").alias("n_consequent"),
    )
    out = (
        directed.join(ante, "antecedent")
        .join(cons, "consequent")
        .crossJoin(F.broadcast(totals))
    )
    e6 = F.lit(1000000.0)
    conf = F.col("support_n").cast("double") / F.col("n_antecedent").cast(
        "double"
    )
    lift = (F.col("support_n") * F.col("__nb")).cast("double") / (
        F.col("n_antecedent") * F.col("n_consequent")
    ).cast("double")
    return out.select(
        "antecedent",
        "consequent",
        "support_n",
        "n_antecedent",
        "n_consequent",
        F.floor(conf * e6 + F.lit(0.5)).cast("long").alias("conf_e6"),
        F.floor(lift * e6 + F.lit(0.5)).cast("long").alias("lift_e6"),
    )


def event_transitions(
    df: DataFrame,
    *,
    seq_col: str,
    state_col: str,
    order_cols: list[str],
) -> DataFrame:
    """First-order Markov transition matrix over per-sequence event
    streams: order each sequence (user, session, document) by
    ``order_cols`` (must be a deterministic total order within a
    sequence — pass a tiebreaker like the event id), lag the state
    column, and count (prev_state, next_state) transitions across
    ALL sequences. Emits (prev_state, next_state, n_transitions,
    p_e6) where p_e6 is the e6-floored row-conditional probability
    P(next | prev) — each row of the matrix sums to ~1e6.

    Scale shape: exactly the ``sessionize`` shape — ONE window
    shuffle on the sequence key (each sequence's events sort within
    a partition; skew = one hot sequence, the standard salting
    candidate), then a hash aggregate to a |states|²-sized frame.
    The row totals for the conditional probabilities are computed by
    a second aggregate OVER THE MATRIX FRAME (≤ |states|² rows), not
    the data, and joined back — no window over raw data, no
    driver-side collect.
    """
    w = Window.partitionBy("__seq").orderBy(*[F.col(c) for c in order_cols])
    lagged = (
        df.select(
            F.col(seq_col).alias("__seq"),
            F.col(state_col).alias("__state"),
            *[F.col(c) for c in order_cols],
        )
        .filter(
            F.col("__seq").isNotNull() & F.col("__state").isNotNull()
        )
        # a null order key has no defined position in the sequence
        # (Spark sorts NULLS FIRST, DuckDB NULLS LAST — either choice
        # silently diverges cross-engine), so such rows are excluded.
        .filter(_order_cols_not_null(order_cols))
        .withColumn("__prev", F.lag("__state").over(w))
        .filter(F.col("__prev").isNotNull())
    )
    matrix = lagged.groupBy(
        F.col("__prev").alias("prev_state"),
        F.col("__state").alias("next_state"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
    row_totals = matrix.groupBy("prev_state").agg(
        F.sum("n_transitions").cast("long").alias("__row_n")
    )
    out = matrix.join(row_totals, "prev_state")
    p = F.col("n_transitions").cast("double") / F.col("__row_n").cast("double")
    return out.select(
        "prev_state",
        "next_state",
        "n_transitions",
        F.floor(p * F.lit(1000000.0) + F.lit(0.5)).cast("long").alias("p_e6"),
    )


def collocations(
    df: DataFrame,
    *,
    text_col: str,
    min_pair_count: int = 5,
) -> DataFrame:
    """Corpus collocation extraction: adjacent-token bigrams ranked by
    pointwise mutual information (Church & Hanks, Computational
    Linguistics 1990) — the phrase-discovery member of the text
    family ("new york", "machine learning" score high because they
    co-occur far more than their unigram frequencies predict). Each
    ROW of ``text_col`` is the document boundary — bigrams never span
    rows. Tokens are the lowercased text split on single spaces with
    empties dropped; for each bigram surviving ``min_pair_count``:

      pmi = ln( n_pair · N  /  (n_w1 · n_w2) )     N = total tokens

    Returns (w1, w2, n_pair, n_w1, n_w2, pmi_e6). Counts are exact
    longs; the PMI ratio multiplies count DOUBLES in a pinned order
    (exact below 2⁵³ tokens) so one libm ``ln`` is the only
    transcendental — the e6-floor replays cross-engine.

    Scale shape: bigram extraction is ARRAY-NATIVE codegen (split →
    filter → transform over index sequence → explode): zero shuffles
    until the two hash aggregates (bigram counts, unigram counts),
    both map-side combined. Unigram counts join back by equi-join on
    each word (vocabulary-sized build sides); the token total rides a
    one-row broadcast. No window over raw tokens, no per-doc shuffle.
    """
    toks = df.filter(F.col(text_col).isNotNull()).select(
        F.filter(
            F.split(F.lower(F.col(text_col)), " "), lambda x: x != ""
        ).alias("__toks")
    )
    # Adjacent pairs from the filtered token array, all inside codegen.
    bigrams = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(__toks) - 1),"
                " i -> struct(__toks[i-1] AS w1, __toks[i] AS w2))"
            )
        ).alias("__bg")
    ).select(F.col("__bg.w1").alias("w1"), F.col("__bg.w2").alias("w2"))
    pair_counts = (
        bigrams.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
        .filter(F.col("n_pair") >= min_pair_count)
    )
    unigrams = toks.select(F.explode("__toks").alias("w"))
    uni_counts = unigrams.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("n_w")
    )
    total = unigrams.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    out = (
        pair_counts.join(
            uni_counts.select(F.col("w").alias("w1"), F.col("n_w").alias("n_w1")),
            "w1",
        )
        .join(
            uni_counts.select(F.col("w").alias("w2"), F.col("n_w").alias("n_w2")),
            "w2",
        )
        .crossJoin(F.broadcast(total))
    )
    # Pinned op order: (n_pair_d * N_d) first, then the denominator
    # product, ONE division, ONE ln.
    ratio = (
        F.col("n_pair").cast("double") * F.col("__n").cast("double")
    ) / (F.col("n_w1").cast("double") * F.col("n_w2").cast("double"))
    return out.select(
        "w1",
        "w2",
        "n_pair",
        "n_w1",
        "n_w2",
        F.floor(F.log(ratio) * F.lit(1000000.0) + F.lit(0.5))
        .cast("long")
        .alias("pmi_e6"),
    )


def attribution(
    df: DataFrame,
    *,
    seq_col: str,
    type_col: str,
    order_cols: list[str],
    conversion_type: str,
    model: str = "last",
) -> DataFrame:
    """Single-touch marketing/journey attribution: split each
    sequence's event stream into CONVERSION SEGMENTS (everything
    after the previous conversion, up to and including the next one)
    and credit each conversion to ONE touch in its segment — the
    latest (``model="last"``) or the earliest (``model="first"``).
    Returns (touch_type, n_credited) with exact long counts: every
    credit is a whole conversion, so the output hashes bit-identically
    in any engine with no quantization at all.

    ``order_cols`` must totally order events within a sequence (pass
    a unique tiebreaker, e.g. the event id). Conversions with no
    preceding touch in their segment (self-converting sessions) are
    simply uncredited; touches after the last conversion never
    convert and are dropped.

    Scale shape: one window shuffle on the sequence key computes the
    running conversion count (the segment id — the `sessionize`
    shape); segment membership is then an EQUI-join of touches
    against the (sequence, segment) conversion set, the
    pick-one-touch step is a row_number window on (sequence,
    segment), and the final aggregate is |touch types|-sized. No
    cross joins, no driver-side collects, no floats.
    """
    if model not in ("last", "first"):
        raise ValueError(f"attribution: unknown model {model!r}")
    w = Window.partitionBy("__seq").orderBy(*[F.col(c) for c in order_cols])
    base = (
        df.select(
            F.col(seq_col).alias("__seq"),
            F.col(type_col).alias("__type"),
            *[F.col(c) for c in order_cols],
        )
        .filter(F.col("__seq").isNotNull() & F.col("__type").isNotNull())
        .filter(_order_cols_not_null(order_cols))
        .withColumn(
            "__c",
            F.sum((F.col("__type") == conversion_type).cast("long")).over(w),
        )
    )
    convs = base.filter(F.col("__type") == conversion_type).select(
        "__seq", F.col("__c").alias("__seg")
    )
    touches = base.filter(F.col("__type") != conversion_type).select(
        "__seq",
        "__type",
        (F.col("__c") + 1).alias("__seg"),
        *[F.col(c) for c in order_cols],
    )
    valid = touches.join(convs, ["__seq", "__seg"])
    order = [F.col(c).desc() if model == "last" else F.col(c).asc() for c in order_cols]
    pick = Window.partitionBy("__seq", "__seg").orderBy(*order)
    credited = valid.withColumn("__rn", F.row_number().over(pick)).filter(
        F.col("__rn") == 1
    )
    return credited.groupBy(F.col("__type").alias("touch_type")).agg(
        F.count(F.lit(1)).cast("long").alias("n_credited")
    )


def attribution_linear(
    df: DataFrame,
    *,
    seq_col: str,
    type_col: str,
    order_cols: list[str],
    conversion_type: str,
) -> DataFrame:
    """Linear (equal-credit) multi-touch attribution, emitted at the
    (touch_type, segment_size) granularity so every number stays a
    pure function of exact integer counts: a conversion segment with
    k touches gives each touch 1/k of the conversion, and the output
    row (touch_type, segment_size=k, n_touches, credit_e6) carries

      credit_e6 = floor(n_touches / k · 1e6 + 0.5)

    — ONE IEEE division of two exact longs per row (the repo's e6
    idiom), never an order-dependent float sum. Total credit for a
    type is Σ rows, and the caller can resum exactly.

    Scale shape: the :func:`attribution` segment machinery plus two
    hash aggregates — (sequence, segment) sizes (≤ one row per
    conversion), then (type, k) counts (≤ |types|·|distinct k| rows).
    """
    w = Window.partitionBy("__seq").orderBy(*[F.col(c) for c in order_cols])
    base = (
        df.select(
            F.col(seq_col).alias("__seq"),
            F.col(type_col).alias("__type"),
            *[F.col(c) for c in order_cols],
        )
        .filter(F.col("__seq").isNotNull() & F.col("__type").isNotNull())
        .filter(_order_cols_not_null(order_cols))
        .withColumn(
            "__c",
            F.sum((F.col("__type") == conversion_type).cast("long")).over(w),
        )
    )
    convs = base.filter(F.col("__type") == conversion_type).select(
        "__seq", F.col("__c").alias("__seg")
    )
    touches = base.filter(F.col("__type") != conversion_type).select(
        "__seq", "__type", (F.col("__c") + 1).alias("__seg")
    )
    valid = touches.join(convs, ["__seq", "__seg"])
    sizes = valid.groupBy("__seq", "__seg").agg(
        F.count(F.lit(1)).cast("long").alias("segment_size")
    )
    per_type = valid.groupBy("__seq", "__seg", "__type").agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    joined = per_type.join(sizes, ["__seq", "__seg"])
    out = joined.groupBy(
        F.col("__type").alias("touch_type"), "segment_size"
    ).agg(F.sum("__n").cast("long").alias("n_touches"))
    credit = F.col("n_touches").cast("double") / F.col("segment_size").cast(
        "double"
    )
    return out.select(
        "touch_type",
        "segment_size",
        "n_touches",
        F.floor(credit * F.lit(1000000.0) + F.lit(0.5))
        .cast("long")
        .alias("credit_e6"),
    )
