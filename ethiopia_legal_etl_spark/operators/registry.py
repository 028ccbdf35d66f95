"""Query registry: name -> (Spark builder, optional DuckDB oracle SQL).

Contract (driver harness, __spark_entry__.py):
- builder(spark, sf_dir) -> DataFrame, every computed column aliased;
- oracle: equivalent ANSI SQL over the same parquet tables, aliases
  matching the Spark output EXACTLY (the driver sorts columns by name
  and hashes values);
- oracle=None for non-SQL-expressible ops (LSH, binary plumbing,
  stateful streaming) -> driver records a rows-only check.

Float policy (keeps results raw-repr-identical across engines, not
just normalized-hash-equal — verified by check_oracle's strict check):
- money/product aggregates: exact DECIMAL(12,2) casts, summed exactly,
  CAST AS DOUBLE at the end (no rounding step at all);
- averages: decimal-exact sum cast to double, divided by the count —
  both engines divide the same double by the same int;
- per-row products of 2dp inputs: ROUND at 4dp (the exact value has
  ≤4 decimals, so no round-tie exists);
- irrational outputs (cosine, ln, sqrt, stddev): ROUND at 4-6dp, tie
  probability ~1e-11/row; signed statistics add `+ 0` to canonicalize
  IEEE -0.0 (DuckDB emits -0.0 for rounded covariances).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    builder: Builder
    oracle: str | None = None  # None => rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a builder to the global registry.

    Builders are wrapped so the engine's runtime confs (UTC session
    timezone, ns-parquet handling, AQE, Arrow) are applied to WHATEVER
    SparkSession the caller passes — the driver harness constructs its
    own session without our builder defaults.
    """

    def wrap(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")

        import functools

        @functools.wraps(fn)
        def confed(spark: SparkSession, sf_dir: str) -> DataFrame:
            from ethiopia_legal_etl_spark.session import ensure_session_confs

            return fn(ensure_session_confs(spark), sf_dir)

        REGISTRY[name] = Query(name=name, builder=confed, oracle=oracle, doc=doc)
        return fn

    return wrap


def all_queries() -> dict[str, Query]:
    """Import every operator module (side effect: registration) and
    return the merged registry."""
    from ethiopia_legal_etl_spark.operators import (  # noqa: F401
        dedup,
        etl,
        multimodal,
        pipeline,
        relational,
        relational2,
        relational3,
        relational4,
        relational5,
        relational6,
        relational7,
        relational8,
        relational9,
        relational10,
        relational11,
        relational12,
        relational13,
        similarity,
        textstats,
    )
    from ethiopia_legal_etl_spark.streaming import windows  # noqa: F401

    return dict(REGISTRY)
