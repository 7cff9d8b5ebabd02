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


# --- Full training-mix composition ---------------------------------------------

MIX_ALPHA = 0.7
MIX_BUDGET = 300


def pipeline_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE corpus-to-training-mix flow as one declarative plan:
    quality gate → exact keep-first dedup → per-source temperature
    allocation (w_s ∝ n_s^0.7 over a fixed budget) → quality-ranked take of
    each source's allocation → per-source report (candidates, allocation,
    selected, selected token volume).

    Scale shape: stages 1-2 are `_cleaned` (scan-side expressions + one
    16-byte-key shuffle); the allocation is a |sources|-row aggregate
    broadcast back; the ranked take is one rank window per source.  The
    window's per-task state is a running rank (constant), but — unlike
    curation_source_cap's constant K, which plans as WindowGroupLimit — a
    DATA-DEPENDENT allocation cannot be pushed into the sort, so each
    source pays a full per-partition sort; for a pathologically hot source
    the two-pass threshold form (compute the alloc-th quality value, then
    filter scan-side — mixture_quality_gate's shape) is the documented
    fallback.  Allocation integers derive from 6-decimal-rounded weights
    so a 1-ulp pow() difference cannot flip them (mixture.py discipline).
    """
    cleaned = _cleaned(spark, sf_dir)
    counts = cleaned.groupBy("source").agg(F.count(F.lit(1)).alias("n_cand"))
    total = counts.agg(
        F.sum(F.pow(F.col("n_cand"), F.lit(MIX_ALPHA))).alias("z")
    )
    weight = F.round(F.pow(F.col("n_cand"), F.lit(MIX_ALPHA)) / F.col("z"), 6)
    alloc = counts.crossJoin(F.broadcast(total)).select(
        "source",
        "n_cand",
        F.round(weight * MIX_BUDGET, 0).cast("bigint").alias("alloc"),
    )
    w = W.partitionBy("source").orderBy(
        F.desc("distinct_ratio"), F.asc("doc_id")
    )
    ranked = cleaned.withColumn("rk", F.row_number().over(w))
    picked = ranked.join(F.broadcast(alloc), "source").where(
        F.col("rk") <= F.col("alloc")
    )
    return (
        picked.groupBy("source", "n_cand", "alloc")
        .agg(
            F.count(F.lit(1)).alias("n_selected"),
            F.sum("n_tokens").cast("bigint").alias("tok_selected"),
        )
        .orderBy("source")
    )


PIPELINE_TRAINING_MIX_SQL = rf"""
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
cleaned AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
    FROM filtered
  ) WHERE rn = 1
),
counts AS (SELECT source, COUNT(*) AS n_cand FROM cleaned GROUP BY source),
tot AS (SELECT SUM(POW(n_cand, {MIX_ALPHA})) AS z FROM counts),
alloc AS (
  SELECT source, n_cand,
         CAST(ROUND(ROUND(POW(n_cand, {MIX_ALPHA}) / z, 6) * {MIX_BUDGET}, 0)
              AS BIGINT) AS alloc
  FROM counts, tot
),
ranked AS (
  SELECT c.*, ROW_NUMBER() OVER (
    PARTITION BY c.source ORDER BY c.distinct_ratio DESC, c.doc_id ASC) AS rk
  FROM cleaned c
)
SELECT r.source, a.n_cand, a.alloc,
       CAST(COUNT(*) AS BIGINT) AS n_selected,
       CAST(SUM(r.n_tokens) AS BIGINT) AS tok_selected
FROM ranked r JOIN alloc a ON r.source = a.source
WHERE r.rk <= a.alloc
GROUP BY r.source, a.n_cand, a.alloc
ORDER BY r.source
"""


QUERIES: dict[str, tuple] = {
    "pipeline_clean_corpus": (pipeline_clean_corpus, PIPELINE_CLEAN_SQL),
    "pipeline_corpus_stats": (pipeline_corpus_stats, PIPELINE_STATS_SQL),
    "pipeline_training_mix": (pipeline_training_mix, PIPELINE_TRAINING_MIX_SQL),
}
