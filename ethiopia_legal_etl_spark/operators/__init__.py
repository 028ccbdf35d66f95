"""Operator modules. Each module contributes named queries to the
engine registry (see registry.py); __spark_entry__.py exposes the
merged registry to the driver harness.
"""

from ethiopia_legal_etl_spark.operators.registry import REGISTRY, Query, all_queries

__all__ = ["REGISTRY", "Query", "all_queries"]
