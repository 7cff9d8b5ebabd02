"""End-to-end training-data cleaning pipeline — the composition a real
corpus-preparation job runs (quality gate → exact dedup → corpus summary),
built from the text-analysis and dedup operators so the whole flow is one
declarative Catalyst plan.

Scale shape (100 TB): the quality gate is pure scan-side expression work
(no shuffle, whole-stage codegen); the dedup stage shuffles only
(16-byte fingerprint, doc_id) pairs; the summary aggregates with map-side
combine. One scan, two narrow shuffles, payload never moves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from hopspark.catalog import read_table

MIN_TOKENS = 10
MIN_DISTINCT_RATIO = 0.3


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, "documents", sf_dir)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_tokens = F.size(toks)
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n_tokens.cast(
        "double"
    )
    fp = F.md5(F.lower(F.regexp_replace(F.col("text"), r"\s+", " ")))
    return docs.select(
        "doc_id",
        "source",
        "lang",
        fp.alias("fp"),
        n_tokens.alias("n_tokens"),
        distinct_ratio.alias("distinct_ratio"),
    )


def _cleaned(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _scored(spark, sf_dir)
    filtered = scored.filter(
        (F.col("n_tokens") >= MIN_TOKENS)
        & (F.col("distinct_ratio") >= MIN_DISTINCT_RATIO)
    )
    w = W.partitionBy("fp").orderBy("doc_id")
    return (
        filtered.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surviving documents after the quality gate (length + repetition
    thresholds) and exact keep-first dedup."""
    return _cleaned(spark, sf_dir).select(
        "doc_id", "source", "lang", "n_tokens", "distinct_ratio"
    ).orderBy("doc_id")


PIPELINE_CLEAN_SQL = rf"""
WITH scored AS (
  SELECT doc_id, source, lang,
         md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp,
         len(string_split_regex(trim(text), '\s+')) AS n_tokens,
         CAST(len(list_distinct(string_split_regex(trim(text), '\s+'))) AS DOUBLE)
           / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE)
           AS distinct_ratio
  FROM documents
),
filtered AS (
  SELECT * FROM scored
  WHERE n_tokens >= {MIN_TOKENS} AND distinct_ratio >= {MIN_DISTINCT_RATIO}
),
kept AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
  FROM filtered
)
SELECT doc_id, source, lang, CAST(n_tokens AS INT) AS n_tokens, distinct_ratio
FROM kept WHERE rn = 1 ORDER BY doc_id
"""


def pipeline_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, lang) summary of the cleaned corpus: kept docs and total
    token volume — the report a curation run ends with."""
    return (
        _cleaned(spark, sf_dir)
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_tokens").cast("long")).alias("total_tokens"),
        )
        .orderBy("source", "lang")
    )


PIPELINE_STATS_SQL = rf"""
WITH scored AS (
  SELECT doc_id, source, lang,
         md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp,
         len(string_split_regex(trim(text), '\s+')) AS n_tokens,
         CAST(len(list_distinct(string_split_regex(trim(text), '\s+'))) AS DOUBLE)
           / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE)
           AS distinct_ratio
  FROM documents
),
filtered AS (
  SELECT * FROM scored
  WHERE n_tokens >= {MIN_TOKENS} AND distinct_ratio >= {MIN_DISTINCT_RATIO}
),
kept AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
  FROM filtered
)
SELECT source, lang, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM kept WHERE rn = 1
GROUP BY source, lang
ORDER BY source, lang
"""


QUERIES: dict[str, tuple] = {
    "pipeline_clean_corpus": (pipeline_clean_corpus, PIPELINE_CLEAN_SQL),
    "pipeline_corpus_stats": (pipeline_corpus_stats, PIPELINE_STATS_SQL),
}
