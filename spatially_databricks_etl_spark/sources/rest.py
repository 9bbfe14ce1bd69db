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


def synthetic_fetch_page(base_url: str, limit: int, offset: int) -> list[dict]:
    """Deterministic offline page generator (id + value string derived
    from the offset) — the default ``fetch_fn`` for tests/demos in
    this egress-less environment; a real deployment points
    ``fetch_fn`` at :func:`default_fetch_page` or its own client."""
    return [{"id": offset + i, "v": f"r{offset + i}"} for i in range(limit)]


def _resolve_fetch_fn(spec: str):
    """Import ``module:callable`` on the EXECUTOR — the fetch function
    ships as a dotted path (DataSource options are strings), so the
    executor resolves it locally instead of pickling a closure."""
    import importlib

    mod_name, _, fn_name = spec.partition(":")
    if not fn_name:
        raise ValueError(
            f"fetch_fn must be 'module:callable', got {spec!r}"
        )
    return getattr(importlib.import_module(mod_name), fn_name)


try:  # Spark >= 4 Python Data Source API; module stays importable without it
    from pyspark.sql.datasource import DataSource as _DataSourceBase
    from pyspark.sql.datasource import DataSourceReader as _DataSourceReaderBase
except ImportError:  # pragma: no cover - pre-4.0 Spark
    _DataSourceBase = object  # type: ignore[assignment,misc]
    _DataSourceReaderBase = object  # type: ignore[assignment,misc]


class PagedRestDataSource(_DataSourceBase):
    """Spark 4 Python Data Source (V2) for paginated REST APIs — the
    reference's driver-side thread-pool fetch (`Spatially ETL
    test.py:102-128`) promoted to a FIRST-CLASS source:
    ``spark.read.format("paged_rest").option(...).load()``. Unlike the
    mapInPandas helper (:func:`fetch_paginated_to_df`, kept for
    programmatic use), the registered source composes with everything
    a real scan does — schema declaration, SQL ``CREATE TABLE ...
    USING paged_rest``, and Catalyst planning over the result.

    Options (all strings, the V2 contract):

    - ``url``: base URL, passed to the fetch function;
    - ``total_records``: row-count ceiling (the Socrata count
      endpoint supplies it in production);
    - ``limit``: page size (default 1000);
    - ``pages_per_partition``: pages fetched by one task (default 8)
      — partition count = ceil(pages / pages_per_partition), so
      bandwidth scales with the cluster, and a failed page is a task
      retry, not a silently dropped batch;
    - ``fetch_fn``: ``module:callable`` resolved ON EXECUTORS
      (options are strings, so the function travels as a dotted path;
      default — this module's offline :func:`synthetic_fetch_page`;
      production — ``...sources.rest:default_fetch_page``).

    Rows are emitted in the user-declared schema's field order; pass
    an all-string schema for reference-parity ingest and ``try_cast``
    downstream (the dirty-input discipline).
    """

    def __init__(self, options):
        self.options = options

    @classmethod
    def name(cls) -> str:
        return "paged_rest"

    def schema(self) -> str:
        return "id bigint, v string"

    def reader(self, schema):
        return _PagedRestReader(schema, dict(self.options))


class _PagedRestReader(_DataSourceReaderBase):
    def __init__(self, schema, options):
        self.schema = schema
        self.url = options.get("url", "")
        self.limit = int(options.get("limit", "1000"))
        self.total = int(options["total_records"])
        self.ppp = int(options.get("pages_per_partition", "8"))
        self.fetch_spec = options.get(
            "fetch_fn",
            "spatially_databricks_etl_spark.sources.rest:synthetic_fetch_page",
        )

    def partitions(self):
        from pyspark.sql.datasource import InputPartition

        offsets = list(range(0, self.total, self.limit))
        return [
            InputPartition(offsets[i : i + self.ppp])
            for i in range(0, len(offsets), self.ppp)
        ]

    def read(self, partition):
        fetch = _resolve_fetch_fn(self.fetch_spec)
        names = [f.name for f in self.schema.fields]
        for offset in partition.value:
            n = min(self.limit, self.total - offset)
            for rec in fetch(self.url, n, offset):
                yield tuple(rec.get(name) for name in names)


def register_paged_rest(spark: SparkSession) -> None:
    """Register :class:`PagedRestDataSource` so
    ``spark.read.format("paged_rest")`` resolves in this session."""
    if _DataSourceBase is object:  # pragma: no cover - pre-4.0 Spark
        raise RuntimeError(
            "paged_rest needs the Spark 4 Python Data Source API"
        )
    spark.dataSource.register(PagedRestDataSource)
