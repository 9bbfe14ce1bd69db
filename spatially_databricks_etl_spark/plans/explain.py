"""Plan-inspection helpers: assert that the physical plan actually
pushed filters / pruned columns. Used by tests so scale-critical plan
properties are regression-checked, not hoped for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def assert_pushed_filters(df: DataFrame, *needles: str) -> None:
    """Assert the formatted plan shows PushedFilters containing each
    needle (e.g. a column name that should reach the parquet scan)."""
    plan = explain_str(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    joined = "\n".join(pushed)
    assert pushed and "[]" not in joined or needles, f"no pushed filters in plan:\n{plan}"
    for n in needles:
        assert n in joined, f"filter on {n!r} not pushed; PushedFilters: {joined}\nplan:\n{plan}"


def assert_read_schema_pruned(df: DataFrame, max_columns: int, table_hint: str = "") -> None:
    """Assert the scan's ReadSchema kept at most ``max_columns`` —
    i.e. column pruning reached the parquet footer."""
    plan = explain_str(df)
    for ln in plan.splitlines():
        if "ReadSchema" in ln and (not table_hint or table_hint in plan):
            struct = ln.split("struct<", 1)
            if len(struct) == 2:
                ncols = struct[1].count(":")
                assert ncols <= max_columns, f"scan reads {ncols} cols (> {max_columns}): {ln}"
                return
    raise AssertionError(f"no ReadSchema found in plan:\n{plan}")
