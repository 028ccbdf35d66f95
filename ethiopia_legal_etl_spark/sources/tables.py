"""Parquet / JSON / text / binary sources with explicit schemas.

Reference sources re-expressed (SURVEY.md §2.A):
- A-4  pdf_links.json array read/write  -> spark.read.json w/ schema
- A-18 multi-pattern binary file scan   -> binaryFile + pathGlobFilter union
Plus the driver's synthetic parquet tables (TESTDATA.md).

All readers pass an explicit schema (no inference) — the engine's
single-declaration fix for the reference's copy-pasted implicit schema
(SURVEY.md §1.1). Explicit schemas also skip the inference scan, which
matters when the 'file listing' is 100 TB of objects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ethiopia_legal_etl_spark.schemas import PDF_LINKS_SCHEMA, TABLE_NAMES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver synthetic table from ``{sf_dir}/{name}.parquet``.

    Parquet carries its own schema; the vectorized reader + column
    pruning + predicate pushdown all engage automatically on this path.

    events.ts is TIMESTAMP(NANOS), which Spark reads as long (via
    spark.sql.legacy.parquet.nanosAsLong); convert to TimestampType
    (µs, floor) here so every consumer sees a real timestamp. DuckDB
    keeps ns — queries must never emit raw ts (see operators/etl.py).
    """
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every driver table; keys match DuckDB's pre-registered views."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def read_pdf_links(spark: SparkSession, path: str) -> DataFrame:
    """A-4: read the scraper's URL hand-off as DataFrame[url: string].

    The reference writes a bare JSON array (scrape_pdf_links.py:17-18)
    and the consumer exits if it is missing (fetch_legal_docs.py:14-19).
    Spark's json source wants one object per line, so accept both: try
    JSONL `{"url": ...}` first, fall back to parsing a bare array via
    the text source (still distributed — no driver-side json.load).
    """
    df = spark.read.schema(PDF_LINKS_SCHEMA).json(path)
    # A bare-array file yields all-null urls under the object schema;
    # detect cheaply and reparse from text.
    if df.limit(1).count() == 0 or df.where("url IS NOT NULL").limit(1).count() == 0:
        from pyspark.sql import functions as F

        raw = spark.read.text(path, wholetext=True)
        df = (
            raw.select(
                F.explode(F.from_json("value", "array<string>")).alias("url")
            )
        )
    return df


def write_pdf_links(df: DataFrame, path: str) -> None:
    """A-4 sink: persist the links stage table (JSONL, idiomatic)."""
    df.write.mode("overwrite").json(path)


def read_binary_files(
    spark: SparkSession, root: str, patterns: tuple[str, ...] = ("*",)
) -> DataFrame:
    """A-18: multi-pattern binary scan, one union branch per glob.

    Mirrors auto_ingest.yml:24's ``find vol*.pdf ∪ *.docx ∪ statutes/**``
    as `binaryFile` reads with pathGlobFilter, unioned. Returns
    (path, modificationTime, length, content: binary).
    """
    dfs = [
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pat)
        .option("recursiveFileLookup", "true")
        .load(root)
        for pat in patterns
    ]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    # identical file may match two globs; the reference's `find` dedups
    return out.dropDuplicates(["path"])
