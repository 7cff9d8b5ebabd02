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


PREFIX_LEN_SPLIT = 12
TRAIN_BUCKETS, VAL_BUCKETS = 16, 2  # of 20: 80% / 10% / 10%


def pipeline_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: near-duplicate documents must land
    in the SAME split, or the eval set silently contains copies of training
    rows. Cluster by the head-prefix fingerprint (the cheap near-dup proxy
    dedup_prefix_clusters uses), assign the split PER CLUSTER (bucket of
    the cluster representative), then join the label back to the docs —
    every member inherits its cluster's split by construction.

    100 TB design: clustering is one hash aggregation over (16-byte pkey,
    doc_id, n_tokens) — the payload never shuffles; split assignment is a
    scan-side CASE on the one-row-per-cluster relation; the label
    join-back is a pkey equi-join (AQE broadcasts the cluster side when
    it measures small, shuffle-hash otherwise — no pinned hint, the
    cluster relation is corpus-derived). Production note: bucketing the
    cluster REPRESENTATIVE's id keeps the oracle engine-neutral; a
    content-stable deployment buckets the fingerprint itself so splits
    survive recrawls with different ids."""
    docs = read_table(spark, "documents", sf_dir)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    keyed = docs.select(
        "doc_id",
        "source",
        F.size(toks).alias("n_tokens"),
        F.md5(
            F.array_join(F.slice(toks, 1, PREFIX_LEN_SPLIT), " ")
        ).alias("pkey"),
    )
    clusters = keyed.groupBy("pkey").agg(
        F.min("doc_id").alias("rep_id"),
        F.count(F.lit(1)).alias("csize"),
    )
    bucket = F.pmod(F.col("rep_id"), F.lit(20))
    splits = clusters.select(
        "pkey",
        "csize",
        F.when(bucket < TRAIN_BUCKETS, "train")
        .when(bucket < TRAIN_BUCKETS + VAL_BUCKETS, "val")
        .otherwise("test")
        .alias("split"),
    )
    labeled = keyed.join(splits, "pkey")
    return (
        labeled.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("pkey").alias("n_clusters"),
            F.sum("n_tokens").alias("tok_total"),
            F.countDistinct("source").alias("n_sources"),
        )
        .orderBy("split")
    )


PIPELINE_LEAKAGE_SPLIT_SQL = f"""
WITH keyed AS (
  SELECT doc_id, source,
         len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
         md5(array_to_string(
           list_slice(string_split_regex(trim(text), '\\s+'), 1,
                      {PREFIX_LEN_SPLIT}), ' ')) AS pkey
  FROM documents
),
clusters AS (
  SELECT pkey, MIN(doc_id) AS rep_id, COUNT(*) AS csize
  FROM keyed GROUP BY pkey
),
splits AS (
  SELECT pkey,
         CASE WHEN rep_id % 20 < {TRAIN_BUCKETS} THEN 'train'
              WHEN rep_id % 20 < {TRAIN_BUCKETS + VAL_BUCKETS} THEN 'val'
              ELSE 'test' END AS split
  FROM clusters
)
SELECT s.split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT k.pkey) AS BIGINT) AS n_clusters,
       CAST(SUM(k.n_tokens) AS BIGINT) AS tok_total,
       CAST(COUNT(DISTINCT k.source) AS BIGINT) AS n_sources
FROM keyed k JOIN splits s ON k.pkey = s.pkey
GROUP BY s.split
ORDER BY s.split
"""


def pipeline_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering with a DETERMINISTIC pseudo-shuffle: training
    pipelines present short/simple documents first (phase 1) and longer
    ones later, but within a phase the order must be (a) shuffled — no
    source/crawl-order correlation — and (b) reproducible across reruns
    and engines. Order within a phase by md5(seed || doc_id): a keyed
    hash shuffle both engines compute bit-identically, re-seedable per
    epoch. Returns the head of the curriculum (seq, phase, doc).

    100 TB design: phases are scan-side CASE buckets; the head-of-order
    fetch plans as TakeOrderedAndProject (top-K per partition, K rows to
    the driver — never a global sort), and the seq stamp is a 20-row
    window after the take. A full-epoch materialization would write
    sortWithinPartitions(phase, h) per output split instead."""
    docs = read_table(spark, "documents", sf_dir)
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    phase = (
        F.when(n_tokens <= 60, 1).when(n_tokens <= 120, 2).otherwise(3)
    )
    h = F.md5(F.concat(F.lit("epoch0:"), F.col("doc_id").cast("string")))
    head = (
        docs.select(
            "doc_id", phase.alias("phase"), h.alias("h"),
            n_tokens.alias("n_tokens"),
        )
        .orderBy("phase", "h")
        .limit(20)
    )
    w = W.orderBy("phase", "h")
    return head.select(
        F.row_number().over(w).alias("seq"),
        "phase",
        "doc_id",
        "n_tokens",
    )


PIPELINE_CURRICULUM_SQL = """
WITH scored AS (
  SELECT doc_id,
         CASE WHEN len(string_split_regex(trim(text), '\\s+')) <= 60 THEN 1
              WHEN len(string_split_regex(trim(text), '\\s+')) <= 120 THEN 2
              ELSE 3 END AS phase,
         md5('epoch0:' || CAST(doc_id AS VARCHAR)) AS h,
         len(string_split_regex(trim(text), '\\s+')) AS n_tokens
  FROM documents
),
head AS (SELECT * FROM scored ORDER BY phase, h LIMIT 20)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY phase, h) AS INT) AS seq,
       phase, doc_id, CAST(n_tokens AS INT) AS n_tokens
FROM head
ORDER BY seq
"""


QUERIES: dict[str, tuple] = {
    "pipeline_clean_corpus": (pipeline_clean_corpus, PIPELINE_CLEAN_SQL),
    "pipeline_leakage_safe_split": (
        pipeline_leakage_safe_split, PIPELINE_LEAKAGE_SPLIT_SQL),
    "pipeline_curriculum_order": (
        pipeline_curriculum_order, PIPELINE_CURRICULUM_SQL),
    "pipeline_corpus_stats": (pipeline_corpus_stats, PIPELINE_STATS_SQL),
    "pipeline_training_mix": (pipeline_training_mix, PIPELINE_TRAINING_MIX_SQL),
}
