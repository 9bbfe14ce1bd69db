"""File sources (SURVEY.md §2a #1): csv / json / parquet scans.

The reference reads CSV header-only with no schema (`Spatially ETL
test.py:131`) — every column lands as string. That is preserved as the
default for parity, but at 100 TB an explicit ``StructType`` is
mandatory (schema inference is a full extra pass over the data), so
every reader takes ``schema=``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    *,
    schema: StructType | str | None = None,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV scan. No ``inferSchema`` ever: either explicit schema (scale
    path) or all-string columns (reference parity path,
    `Spatially ETL test.py:131`)."""
    reader = spark.read.options(header=str(header).lower(), **options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    *,
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """JSON-lines scan. The reference infers schema from API payloads
    (`Spatially ETL test.py:125`); here inference happens only when no
    schema is given (fine for landed samples, not for 100 TB scans)."""
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_parquet(spark: SparkSession, path: str, *columns: str) -> DataFrame:
    """Parquet scan; optional projection so pruning is explicit at the
    call site (ReadSchema shrinks to the requested columns)."""
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def read_orc(
    spark: SparkSession,
    path: str,
    *,
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """ORC scan — same predicate-pushdown/column-pruning contract as
    parquet (both columnar with stripe/rowgroup stats); included so a
    warehouse already on ORC can be read without conversion."""
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def read_text(
    spark: SparkSession,
    path: str,
    *,
    whole_text: bool = False,
    line_sep: str | None = None,
) -> DataFrame:
    """Raw text scan → one ``value`` string column (per line, or per
    file with ``whole_text`` — the ingest shape for document corpora
    before parsing). Splittable per line at 100 TB; whole-file mode
    parallelizes per file."""
    reader = spark.read
    if line_sep is not None:
        reader = reader.option("lineSep", line_sep)
    # NB: wholetext must go through the text() kwarg — the
    # .option("wholetext", ...) spelling is silently ignored
    return reader.text(path, wholetext=whole_text)


def read_xml(
    spark: SparkSession,
    path: str,
    *,
    row_tag: str,
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """XML scan (Spark 4 NATIVE ``xml`` source — no external package):
    one row per ``row_tag`` element, attributes surfaced with the
    ``_`` prefix. Same explicit-schema contract as the other readers —
    inference costs a full extra pass, so 100 TB scans must pass
    ``schema``. XML is splittable by row tag in the native source, so
    a big file still parallelizes; prefer converting to parquet at
    landing all the same (XML parse cost is paid per scan)."""
    reader = spark.read.format("xml").option("rowTag", row_tag).options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def read_binary_files(
    spark: SparkSession,
    path: str,
    *,
    glob: str | None = None,
) -> DataFrame:
    """Binary-file scan (``binaryFile`` format): one row per file with
    (path, modificationTime, length, content binary) — the ingest
    entry point for the multimodal column pipeline
    (operators/multimodal.py), which treats payloads as opaque binary
    plus typed metadata. Each file is one row/task; at 100 TB of
    small media files, pack them into parquet binary columns early
    (this reader is the packer's input) rather than scanning millions
    of tiny objects repeatedly."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)
