"""Python-boundary operators: Arrow-batched pandas UDFs (scalar +
grouped-agg), ``applyInPandas`` grouped transforms, and a Python UDTF.

The reference has no UDF surface at all (its only Python functions are
driver-side fetch helpers, `Spatially ETL test.py:102-128`); SURVEY.md
§2b lists UDF/UDAF/UDTF as a gap the new engine must fill. UDFs are
the slow path, so everything here demonstrates the *correct* way to
cross the JVM↔Python boundary when built-ins genuinely can't express
the logic:

- Arrow batches only (``pandas_udf`` / ``applyInPandas`` /
  ``mapInPandas``), never row-at-a-time Python UDFs;
- inputs projected to the minimal column set before the hop, so wide
  rows don't pay Arrow serialization;
- vectorized numpy/pandas inside the batch;
- deterministic, SQL-expressible contracts so the DuckDB oracle can
  verify each operator exactly (the boundary must not change results).

Scale notes: all three shapes distribute per-partition (scalar UDF,
UDTF) or per-group (grouped agg / grouped map). Grouped map requires a
shuffle on the group key and the whole group must fit in one executor
— fine for bounded groups (here: order-priority buckets), wrong for
unbounded ones; use window functions instead when the per-group
computation is expressible.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

# NOTE: pandas_udf/udtf with DDL-string return types resolve the type
# against the ACTIVE session, so the decorators must run lazily inside
# the call — not at module import (a bare `import` would then require
# a running SparkContext).


def sigmoid_udf(x: Column | str) -> Column:
    """Arrow-batched scalar pandas UDF: logistic over a double column.
    Vectorized numpy inside the batch — one Arrow hop per ~10k rows,
    not per row."""

    @pandas_udf("double")
    def _sigmoid(s: pd.Series) -> pd.Series:
        import numpy as np

        return 1.0 / (1.0 + np.exp(-s))

    return _sigmoid(x)


def weighted_mean_udaf(v: Column | str, w: Column | str) -> Column:
    """Grouped-aggregate pandas UDF (UDAF): sum(v*w)/sum(w). Spark
    feeds each group's columns as Series; returns one scalar per
    group. Partial aggregation does NOT apply to pandas UDAFs (the
    whole group ships to one executor) — acceptable for low-cardinality
    keys, otherwise decompose into built-in sum()s."""

    @pandas_udf("double")
    def _wmean(vs: pd.Series, ws: pd.Series) -> float:
        den = float(ws.sum())
        return float((vs * ws).sum()) / den if den else float("nan")

    return _wmean(v, w)


def zscore_per_group(
    df: DataFrame, group_col: str, value_col: str, id_col: str
) -> DataFrame:
    """Grouped-map ``applyInPandas``: z-score of ``value_col`` within
    each group (sample stddev, ddof=1). The canonical shape for
    per-group model-ish transforms that need the whole group in memory.
    Input is projected to 3 columns before the shuffle+Arrow hop."""
    out_schema = f"{id_col} long, {group_col} string, zscore double"

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        m = pdf[value_col].mean()
        s = pdf[value_col].std(ddof=1)
        z = (pdf[value_col] - m) / s if s and s > 0 else pdf[value_col] * 0.0
        return pd.DataFrame(
            {id_col: pdf[id_col], group_col: pdf[group_col], "zscore": z}
        )

    return (
        df.select(id_col, group_col, value_col)
        .groupBy(group_col)
        .applyInPandas(fn, out_schema)
    )


class TokenizeUDTF:
    """Python UDTF (Spark ≥3.5): one row per token with its 1-based
    position. Splits on single spaces (exactly — no collapsing) so the
    contract matches ANSI ``string_split(text, ' ')``. Lateral-joined
    per input row; distributes with the scan."""

    def eval(self, text: str):
        if text is None:
            return
        for i, t in enumerate(text.split(" ")):
            yield (i + 1, t)


def tokenize_lateral(df: DataFrame, text_col: str, *carry: str) -> DataFrame:
    """Lateral-join TokenizeUDTF against every row of ``df``, carrying
    ``carry`` columns alongside the exploded (pos, tok) rows."""
    spark = df.sparkSession
    spark.udtf.register("tokenize_udtf", udtf(TokenizeUDTF, returnType="pos int, tok string"))
    df.createOrReplaceTempView("__tokenize_src")
    cols = ", ".join(f"s.{c}" for c in carry)
    return spark.sql(
        f"SELECT {cols}, t.pos, t.tok "
        f"FROM __tokenize_src s, LATERAL tokenize_udtf(s.{text_col}) t"
    )


def asof_join_cogroup(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_time: str,
    right_time: str,
    right_values: "list[str]",
    direction: str = "backward",
    tolerance: "float | int | None" = None,
) -> DataFrame:
    """As-of join through the COGROUPED Arrow boundary
    (``groupBy(k).cogroup(right.groupBy(k)).applyInPandas``) — the
    same core semantics as ``relational.asof_join`` (most recent
    right row at-or-before each left row, per key; ``forward`` for
    at-or-after), executed as one ``pandas.merge_asof`` per key group
    instead of the union+window plan — PLUS the merge modes beyond
    the plain directional match:

    - ``tolerance``: maximum allowed |left time − right time| for a
      match (a number in the time columns' own units for numeric
      keys; SECONDS for timestamp keys). A candidate outside the
      bound annotates null — the staleness cutoff every
      sensor/feature as-of join eventually needs. Honesty note: for
      backward/forward this IS one-window-expressible (bounded match
      = unbounded match when recent enough), and
      ``relational.asof_join`` now takes the same ``tolerance``
      natively — that is the production route; this path pins the
      pandas semantics against it (equal by test) and hosts the mode
      below.
    - ``direction="nearest"``: the closest right row in EITHER
      direction by absolute distance — the mode with no one-window
      form. Tie rules, pinned by property test against a
      from-scratch replay: the backward candidate is the LATEST
      right row at-or-before (last among equal times, the window
      form's last-wins fold), the forward candidate the EARLIEST
      at-or-after (first among equal times), and an equidistant tie
      resolves BACKWARD (pandas' documented preference, kept as the
      contract).

    Contracts: rows with a null left time emit with null annotations
    (they order nowhere); null right times never match. Ties on the
    right time resolve to the LATEST right row in (time, input
    order) — pandas' stable sort, matching the window form's
    last-wins fold. Output schema = left columns + ``right_values``
    (names must not collide with left columns, except the
    ``right_time`` column itself).

    Scale shape: one shuffle of each side on the key (exactly the
    union+window plan's cost), then per-group Arrow batches; the
    per-group merge is O(n log n) local work. Skewed keys behave
    like any cogroup — AQE cannot split a single group, so a
    mega-key needs pre-bucketing (the documented cogroup trade vs
    the window form, which shares the same limit per partition
    ordering).

    Measured honesty (sf0.1, 100k events × 150 keys, local[32]):
    ~10 s vs ~0.4 s for the union+window plan — and an IDENTITY
    cogroup passthrough alone costs ~5 s, so half is the Arrow
    per-group machinery itself. This is the repo-wide "UDFs are the
    slow path" guidance in numbers: use ``relational.asof_join`` for
    plain as-of; reach for this form only when the per-group merge
    logic genuinely needs pandas."""
    from pyspark.sql.types import StructField, StructType

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward/forward/nearest, got {direction!r}"
        )
    if tolerance is not None and not tolerance > 0:
        raise ValueError(f"tolerance must be positive, got {tolerance!r}")
    left_names = set(left.columns)
    out_fields = list(left.schema.fields) + [
        StructField(c, right.schema[c].dataType, True)
        for c in right_values
        if c not in left_names
    ]
    schema = StructType(out_fields)
    out_cols = [f.name for f in out_fields]
    val_cols = [c for c in right_values if c not in left_names]
    lt, rt, d, tol = left_time, right_time, direction, tolerance

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if l.empty:
            return pd.DataFrame(columns=out_cols)
        lnull = l[l[lt].isna()]
        lok = l[l[lt].notna()].sort_values(lt, kind="stable")
        r2 = r[r[rt].notna()].sort_values(rt, kind="stable") if not r.empty else r
        if r2 is None or len(r2) == 0:
            m = lok.copy()
            for c in val_cols:
                m[c] = None
        else:
            ptol = None
            if tol is not None:
                ptol = (
                    pd.Timedelta(seconds=tol)
                    if pd.api.types.is_datetime64_any_dtype(lok[lt])
                    else tol
                )
            m = pd.merge_asof(
                lok,
                r2[[rt, *[c for c in right_values if c != rt]]],
                left_on=lt,
                right_on=rt,
                direction=d,
                tolerance=ptol,
            )
        if len(lnull):
            ln = lnull.copy()
            for c in val_cols:
                ln[c] = None
            m = pd.concat([m, ln], ignore_index=True)
        return m[out_cols]

    return (
        left.groupBy(on)
        .cogroup(right.groupBy(on))
        .applyInPandas(merge, schema)
    )
