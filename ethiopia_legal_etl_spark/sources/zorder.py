"""Z-order (Morton-curve) clustered writes: multi-dimensional data
skipping decided at write time.

The range-clustered write (tests/test_clustered_write.py) proves files
get disjoint min/max footer stats on ONE sort column; a predicate on
any other column still reads every file. Z-ordering interleaves the
bits of several normalized key columns so that a contiguous range of
the curve is a localized region of the key space — every file's
min/max footer range then bounds EVERY participating column, and a scan
with a predicate on ANY of them skips most files (Delta Lake OPTIMIZE
ZORDER BY / ClickHouse mortonEncode semantics, built from public Spark
primitives: shiftleft | bitwise-or expression tree, repartitionByRange,
sortWithinPartitions).

Everything is JVM column expressions — no UDF, whole-stage codegen
keeps the encode inline with the scan. Cost at scale: one pass to
compute per-column bounds (or pass them in from table stats), one
range shuffle on the z-value; the same price as any clustered rewrite.
"""

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(cols: list[Column], bits: int = 8) -> Column:
    """Interleave `bits` bits of each already-bucketed int column
    (values must be in [0, 2**bits)) into one Morton code.

    Bit j of column i lands at position j*len(cols)+i — the standard
    z-curve. 2 cols x 8 bits -> 16-bit codes, plenty for file-level
    clustering (files ≫ cells is never wanted anyway).
    """
    z = F.lit(0)
    n = len(cols)
    for j in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), j).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, j * n + i))
    return z


def minmax_bucket(col: Column, lo: Column, hi: Column, bits: int = 8) -> Column:
    """Linearly bucket `col` into [0, 2**bits) given broadcast bounds.

    Linear bucketing is the cheap path (one global agg for bounds);
    for skewed keys substitute approxQuantile boundaries — the z-curve
    itself is agnostic to how buckets were assigned.
    """
    n_buckets = F.lit((1 << bits) - 1)
    span = (hi - lo).cast("double")
    frac = F.when(span > 0, (col - lo).cast("double") / span).otherwise(F.lit(0.0))
    return F.least(F.floor(frac * (1 << bits)).cast("long"), n_buckets.cast("long"))


def write_zorder_clustered(
    df: DataFrame, path: str, columns: list[str], n_files: int, bits: int = 8
) -> None:
    """Rewrite `df` as `n_files` parquet files clustered on the z-curve
    of `columns`; per-file footer min/max then prune on any of them."""
    bounds = df.agg(
        *[F.min(c).alias(f"__lo_{c}") for c in columns],
        *[F.max(c).alias(f"__hi_{c}") for c in columns],
    )
    with_bounds = df.crossJoin(F.broadcast(bounds))
    bucketed = [
        minmax_bucket(F.col(c), F.col(f"__lo_{c}"), F.col(f"__hi_{c}"), bits)
        for c in columns
    ]
    (
        with_bounds.withColumn("__z", zorder_value(bucketed, bits))
        .select(*df.columns, "__z")
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
