"""The composed training-data pipeline: the single query a corpus
builder actually runs — filter → language gate → exact dedup →
quality gate → token accounting — expressed as ONE declarative plan
so Catalyst fuses the narrow stages into a single scan pass.

Reference parity: the reference's pipeline is the same shape run one
document at a time (fetch → extract → filter empty → write,
fetch_legal_docs.py:32 loop); here every per-doc step is a column
expression and the only wide operation is the dedup shuffle.

Scale shape (100 TB): length/lang/quality are map-side expressions
fused into the parquet scan stage (one WholeStageCodegen span, no
materialization between "stages"); the sha2-keyed window is the one
shuffle, and its key space is uniform by construction (crypto hash),
so no salting is needed. Output is immediately writable partitioned
by lang without a second shuffle (lang is constant per row).
"""

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ethiopia_legal_etl_spark.operators.registry import register
from ethiopia_legal_etl_spark.sources.tables import load_table


@register(
    "pipeline_training_corpus",
    oracle="""
    WITH nonempty AS (
      SELECT doc_id, text FROM documents WHERE LENGTH(text) > 0
    ),
    lang_gated AS (
      SELECT doc_id, text FROM nonempty
      WHERE LENGTH(text) - LENGTH(REPLACE(text, 'the', '')) >= 3
         OR LENGTH(text) - LENGTH(REPLACE(text, 'and', '')) >= 3
    ),
    hashed AS (
      SELECT doc_id, text, sha256(text) AS digest,
             ROW_NUMBER() OVER (PARTITION BY sha256(text) ORDER BY doc_id)
               AS rn
      FROM lang_gated
    ),
    deduped AS (
      SELECT doc_id, text, digest FROM hashed WHERE rn = 1
    ),
    scored AS (
      SELECT doc_id, digest,
             LEN(string_split(text, ' ')) AS n_tokens,
             ROUND(
               0.5 * LEAST(CAST(LEN(string_split(text, ' ')) AS DOUBLE) / 50,
                           1.0)
             + 0.5 * (CAST(LEN(list_distinct(string_split(text, ' ')))
                           AS DOUBLE)
                      / LEN(string_split(text, ' '))), 4) AS quality
      FROM deduped
    )
    SELECT doc_id, n_tokens, quality, digest
    FROM scored WHERE quality >= 0.5
    """,
    doc="The full corpus-construction pipeline as one plan: non-empty "
    "filter -> marker-based language gate -> sha2 exact dedup "
    "(keep-lowest-doc_id) -> quality gate -> token accounting. "
    "Filters and hash fuse into the scan stage; the dedup window is "
    "the single shuffle, keyed on a uniform crypto digest.",
)
def pipeline_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")

    def marker_count(marker: str):
        return (
            F.length("text") - F.length(F.regexp_replace("text", marker, ""))
        ) / len(marker)

    lang_gated = docs.where(F.length("text") > 0).where(
        (marker_count("the") >= 1) | (marker_count("and") >= 1)
    )
    digest = F.sha2(F.col("text"), 256)
    w = Window.partitionBy(digest).orderBy("doc_id")
    deduped = (
        lang_gated.withColumn("digest", digest)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
    )
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks)
    quality = F.round(
        0.5 * F.least(n_tokens.cast("double") / 50, F.lit(1.0))
        + 0.5 * (F.size(F.array_distinct(toks)).cast("double") / n_tokens),
        4,
    )
    return (
        deduped.select(
            "doc_id",
            n_tokens.alias("n_tokens"),
            quality.alias("quality"),
            "digest",
        )
        .where(F.col("quality") >= 0.5)
    )


def observed_training_corpus(spark: SparkSession, sf_dir: str):
    """The pipeline instrumented with df.observe() CollectMetrics:
    per-run data-quality counters (rows in, survivors, quality mass)
    computed INSIDE the job — no second pass over the data, which at
    100 TB is the difference between free metrics and a re-scan.
    Returns (result_df, input_observation, output_observation); read
    `.get` after an action completes."""
    from pyspark.sql import Observation

    docs = load_table(spark, sf_dir, "documents")
    obs_in = Observation("corpus_in")
    obs_out = Observation("corpus_out")
    observed = docs.observe(
        obs_in,
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.length("text") == 0, 1).otherwise(0)).alias("n_empty"),
    )

    def marker_count(marker: str):
        return (
            F.length("text") - F.length(F.regexp_replace("text", marker, ""))
        ) / len(marker)

    lang_gated = observed.where(F.length("text") > 0).where(
        (marker_count("the") >= 1) | (marker_count("and") >= 1)
    )
    digest = F.sha2(F.col("text"), 256)
    w = Window.partitionBy(digest).orderBy("doc_id")
    deduped = (
        lang_gated.withColumn("digest", digest)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
    )
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks)
    quality = F.round(
        0.5 * F.least(n_tokens.cast("double") / 50, F.lit(1.0))
        + 0.5 * (F.size(F.array_distinct(toks)).cast("double") / n_tokens),
        4,
    )
    result = (
        deduped.select(
            "doc_id",
            n_tokens.alias("n_tokens"),
            quality.alias("quality"),
            "digest",
        )
        .where(F.col("quality") >= 0.5)
        .observe(
            obs_out,
            F.count(F.lit(1)).alias("n_survivors"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )
    return result, obs_in, obs_out
