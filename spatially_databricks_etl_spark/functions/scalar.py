"""The reference's scalar expression surface as composable helpers.

Covers SURVEY.md §2a ops #5-#20: split/getItem (`Spatially ETL
test.py:156-157`), regexp_replace/trim (`:156-157`), lower/contains
(`:176`), struct build with typed-null (`:160-163`), withField casts
(`:165-168`), casts (`:170-173`), when/otherwise recodes (`:174-177`),
snake_case renames (`:180-185`), projection (`:189-202`).

All pure Column expressions — Catalyst collapses chains of these into
a single ``Project`` (CollapseProject), so composing them is free.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def clean_split_part(
    col: Column | str,
    *,
    strip_pattern: str = r"[()]",
    delimiter: str = ",",
    index: int = 0,
    cast: str | None = None,
) -> Column:
    """Extract one delimited token from a noisy string:
    regexp_replace → split → getItem → trim → optional cast.

    Re-expresses the reference's geolocation parse
    ``trim(split(regexp_replace(col, "[()]", ""), ",").getItem(i))``
    (`Spatially ETL test.py:156-157`) as a reusable combinator.
    """
    c = F.col(col) if isinstance(col, str) else col
    # F.get (null on out-of-bounds) + try_cast (null on malformed):
    # keeps the reference's Spark-3 null-propagation semantics even
    # under Spark 4's ANSI-on default.
    token = F.trim(F.get(F.split(F.regexp_replace(c, strip_pattern, ""), delimiter), index))
    return token.try_cast(cast) if cast else token


def make_struct(fields: Mapping[str, Column]) -> Column:
    """Build a struct column with aliased fields; pass
    ``F.lit(None).cast(t)`` for typed-null fields (the reference's
    ``human_address`` pattern, `Spatially ETL test.py:160-163`).
    """
    return F.struct(*[c.alias(name) for name, c in fields.items()])


def typed_null(data_type: str = "string") -> Column:
    """``lit(None).cast(t)`` (`Spatially ETL test.py:161`)."""
    return F.lit(None).cast(data_type)


def struct_cast_fields(col: Column | str, casts: Mapping[str, str]) -> Column:
    """Cast nested struct fields in place via ``withField``
    (`Spatially ETL test.py:165-168`), e.g.
    ``struct_cast_fields("geolocation", {"latitude": "double"})``.
    """
    c = F.col(col) if isinstance(col, str) else col
    name = col if isinstance(col, str) else None
    for field, dtype in casts.items():
        inner = F.col(f"{name}.{field}") if name else c.getField(field)
        c = c.withField(field, inner.try_cast(dtype))
    return c


def cast_columns(df: DataFrame, casts: Mapping[str, str]) -> DataFrame:
    """Bulk ``withColumn(name, col.try_cast(t))`` (`Spatially ETL
    test.py:170-173`). ``try_cast`` gives null-on-malformed — the
    reference's (Spark 3, ANSI-off) CSV-all-strings semantics — even
    on an ANSI-enabled Spark 4 session.
    """
    return df.withColumns({name: F.col(name).try_cast(t) for name, t in casts.items()})


def recode(col: Column | str, mapping: Mapping[str, str], default: Column | None = None) -> Column:
    """Value recode via chained CASE WHEN (`Spatially ETL
    test.py:174-175`): equality match → replacement literal, falling
    through to the original value (or ``default``).
    """
    c = F.col(col) if isinstance(col, str) else col
    expr: Column | None = None
    for old, new in mapping.items():
        expr = (F.when(c == old, new) if expr is None else expr.when(c == old, new))
    if expr is None:
        return c
    return expr.otherwise(default if default is not None else c)


def recode_when_contains(
    col: Column | str,
    needle: str,
    replacement: str,
    *,
    lowercase: bool = True,
    default: Column | None = None,
) -> Column:
    """``when(lower(col).contains(needle), lit(replacement))
    .otherwise(...)`` (`Spatially ETL test.py:176-177`)."""
    c = F.col(col) if isinstance(col, str) else col
    probe = F.lower(c) if lowercase else c
    return F.when(probe.contains(needle), F.lit(replacement)).otherwise(
        default if default is not None else c
    )


def rename_columns(df: DataFrame, renames: Mapping[str, str]) -> DataFrame:
    """Bulk rename (`Spatially ETL test.py:180-185`). Uses the single
    `withColumnsRenamed` so the plan gets one Project, not six.
    """
    return df.withColumnsRenamed(dict(renames))


def snake_case_columns(df: DataFrame) -> DataFrame:
    """Normalize camelCase / spaced column names to snake_case — the
    generalized form of the reference's hand-written renames."""
    import re

    def snake(name: str) -> str:
        s = re.sub(r"[\s\-]+", "_", name)
        s = re.sub(r"(?<=[a-z0-9])(?=[A-Z])", "_", s)
        return s.lower()

    return df.withColumnsRenamed({c: snake(c) for c in df.columns if snake(c) != c})


def project(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Final explicit projection (`Spatially ETL test.py:189-202`) —
    column pruning reaches the scan via Catalyst ColumnPruning."""
    return df.select(*[F.col(c) for c in columns])
