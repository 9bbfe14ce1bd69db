"""Paginated REST ingest (SURVEY.md §2a #2-#3).

The reference fetches Socrata-style pages on the DRIVER with a
10-thread pool, ships each page to the cluster via ``sc.parallelize``
and unions RDDs (`Spatially ETL test.py:102-128`). That pattern is
driver-memory-bound and loses all scan pushdown — it cannot survive
scale. The re-design distributes the fetch itself:

1. Build a tiny DataFrame of page offsets (driver-side arithmetic).
2. ``mapInPandas`` over it — each EXECUTOR fetches its pages and
   yields rows — so bandwidth scales with the cluster, and a failed
   page is a task retry, not a silently dropped batch (fixing the
   swallow at `Spatially ETL test.py:108-109,119`).
3. Optionally land raw JSON to storage first (``land_dir``), then
   scan — restoring pushdown/pruning for downstream queries.

``requests`` is gated behind an import-try so the module imports in
network-less CI; unit tests inject a fake ``fetch_page``.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def default_fetch_page(base_url: str, limit: int, offset: int) -> list[dict]:
    """GET ``base_url?$limit=..&$offset=..`` (Socrata convention, as in
    `Spatially ETL test.py:102-109`) — but raises on failure instead of
    returning None, so Spark's task retry handles transient errors."""
    try:
        import requests  # type: ignore[import-not-found]
    except ImportError as exc:  # pragma: no cover - env without requests
        raise RuntimeError("requests not installed; inject fetch_page=") from exc
    resp = requests.get(base_url, params={"$limit": limit, "$offset": offset}, timeout=60)
    resp.raise_for_status()
    return resp.json()


def paginated_offsets_df(
    spark: SparkSession, total_records: int, limit: int, num_partitions: int | None = None
) -> DataFrame:
    """One row per page — the unit of distributed fetch work."""
    offsets = [(o,) for o in range(0, total_records, limit)]
    df = spark.createDataFrame(offsets, "offset long")
    return df.repartition(num_partitions or min(len(offsets), 64))


def fetch_paginated_to_df(
    spark: SparkSession,
    base_url: str,
    *,
    limit: int,
    total_records: int,
    schema: StructType | str,
    fetch_page: Callable[[str, int, int], list[dict]] | None = None,
    columns: list[str] | None = None,
) -> DataFrame:
    """Distributed paginated ingest: offsets DF → mapInPandas(fetch).

    Unlike the reference's driver thread pool (`Spatially ETL
    test.py:111-128`), no page ever transits the driver; an explicit
    ``schema`` replaces the eager inference job of
    ``spark.read.json(rdd)`` (`:125`).
    """
    import pandas as pd

    fetcher = fetch_page or default_fetch_page
    offsets = paginated_offsets_df(spark, total_records, limit)
    wanted = columns

    def fetch_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            for off in batch["offset"].tolist():
                rows = fetcher(base_url, limit, int(off))
                if rows is None:
                    raise RuntimeError(f"page offset={off} returned no data")
                df = pd.DataFrame.from_records(rows)
                if wanted:
                    df = df.reindex(columns=wanted)
                yield df

    return offsets.mapInPandas(fetch_partition, schema=schema)


def land_paginated_json(
    spark: SparkSession,
    base_url: str,
    land_dir: str,
    *,
    limit: int,
    total_records: int,
    fetch_page: Callable[[str, int, int], list[dict]] | None = None,
) -> str:
    """Land-then-scan variant: executors write raw JSON-lines to
    ``land_dir`` (one file per page), so downstream reads are normal
    pushdown-capable scans and re-runs are replays, not re-fetches."""
    import pandas as pd

    fetcher = fetch_page or default_fetch_page
    offsets = paginated_offsets_df(spark, total_records, limit)

    def land_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import os

        os.makedirs(land_dir, exist_ok=True)
        for batch in batches:
            for off in batch["offset"].tolist():
                rows = fetcher(base_url, limit, int(off))
                path = os.path.join(land_dir, f"page_{int(off)}.jsonl")
                with open(path, "w") as f:
                    for r in rows:
                        f.write(json.dumps(r) + "\n")
                yield pd.DataFrame({"offset": [int(off)], "rows": [len(rows)]})

    offsets.mapInPandas(land_partition, schema="offset long, rows long").collect()
    return land_dir
