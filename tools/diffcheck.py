#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every catalog
query in Spark AND its DuckDB oracle at a given sf dir, compare
row-count + column names + order-insensitive values.

Usage: python tools/diffcheck.py [sf_dir] [query ...]

NB: full-catalog runs are feasible at sf0.001/sf0.01 only — the
minhash_neardup/ngram_jaccard oracle is a deliberately brute-force
O(docs^2) pairwise self-join (the point is an independent exact
check, not speed) and takes hours at sf0.1's 5000 docs. At sf0.1,
verify selected queries by name instead.
"""

from __future__ import annotations

import functools
import math
import sys

print = functools.partial(print, flush=True)


def normalize(rows: list[tuple], columns: list[str]) -> list[tuple]:
    """Sort columns by name, normalize values, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def norm(v):
        if v is None:
            return None
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return round(v, 9)
        if hasattr(v, "isoformat"):
            return v.isoformat()
        return v

    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--vanilla"]
    vanilla = "--vanilla" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import duckdb

    from spatially_databricks_etl_spark.catalog import ORACLES, QUERIES

    if vanilla:
        # simulate the DRIVER's session exactly: ANSI defaults, no
        # tuned confs — catches bare-cast / nanos-ts regressions that
        # only bite outside our own get_spark()
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.ui.showConsoleProgress", "false")
            .getOrCreate()
        )
    else:
        from spatially_databricks_etl_spark.session import get_spark

        spark = get_spark(app_name="diffcheck")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        sql = ORACLES.get(name)
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {exc}"))
            print(f"FAIL {name}: spark error {str(exc)[:300]}")
            continue
        if sql is None:
            print(f"ok   {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {exc}"))
            print(f"FAIL {name}: duckdb error {str(exc)[:300]}")
            continue
        if sorted(scols) != sorted(ocols):
            failures.append((name, f"schema: spark={sorted(scols)} duck={sorted(ocols)}"))
            print(f"FAIL {name}: schema mismatch\n  spark={sorted(scols)}\n  duck ={sorted(ocols)}")
            continue
        if len(srows) != len(orows):
            failures.append((name, f"rowcount: spark={len(srows)} duck={len(orows)}"))
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(orows)}")
            continue
        ns = normalize([tuple(r) for r in srows], scols)
        no = normalize(orows, ocols)
        if ns != no:
            diffs = [i for i, (a, b) in enumerate(zip(ns, no)) if a != b][:3]
            msg = "; ".join(f"row{i}: spark={ns[i]} duck={no[i]}" for i in diffs)
            failures.append((name, f"values: {msg}"))
            print(f"FAIL {name}: value mismatch ({len(diffs)}+ rows)\n  {msg[:500]}")
            continue
        print(f"ok   {name}: {len(srows)} rows match")

    print(f"\n{len(failures)} failures / {len(only or QUERIES)} checked")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
