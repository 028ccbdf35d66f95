"""ethiopia_legal_etl_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference ETL
pipeline ``jaja44-hub/ethiopia-legal-etl`` (a single-threaded Python
document pipeline; see SURVEY.md) as an idiomatic Spark DataFrame /
Spark SQL / Structured Streaming engine, extended with the relational,
dedup, similarity-search, text-analysis and streaming operators a
large-scale (100 TB design point) training-data pipeline needs.

Layout:
    session.py     SparkSession builder (AQE + Arrow on)
    schemas.py     explicit StructTypes (document record, test tables)
    sources/       readers (parquet tables, binaryFile, JSON links)
    functions/     pure column-expression helpers (year regex, names…)
    operators/     relational / etl / dedup / similarity / text ops
    streaming/     windowed & stateful streaming (batch-first analogs)
    plans/         plan introspection helpers (explain capture)
"""

from ethiopia_legal_etl_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
