"""spatially_databricks_etl_spark — a PySpark-native analytics/ETL engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo ``DiMar-dev/spatially-databricks-etl`` (a Databricks
notebook ETL pipeline; see SURVEY.md), widened to the full relational
surface (joins, aggregations, windows, set ops, streaming) and to
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns), designed for 100 TB scale:

- Declarative plans: everything is the DataFrame/SQL API so Catalyst
  handles pushdown, pruning, join planning, and AQE handles runtime
  re-planning (skew, coalesce).
- Explicit schemas at scans (never ``inferSchema`` at scale).
- Broadcast hints for dimension joins; salting helpers for skew.
- Pandas UDFs (Arrow-batched) only where built-ins cannot express the
  semantics; never row-at-a-time Python UDFs in hot paths.
"""

from spatially_databricks_etl_spark.session import get_spark, load_tables

__all__ = ["get_spark", "load_tables"]
__version__ = "0.1.0"
