"""Corpus-curation operators for LLM training-data pipelines (extension
beyond the reference — BASELINE.json north star): PII redaction, benchmark
contamination detection, overlapping chunking, greedy sequence packing, and
gap-filled time-series downsampling.

Scale design (100 TB thinking):
  * PII redaction & chunking are pure Catalyst expressions — scan-side,
    embarrassingly parallel, zero shuffle before the (tiny) final sort.
  * Contamination joins the training corpus's exploded n-grams against the
    *benchmark* n-gram set, which is small by construction (benchmarks are
    thousands of documents, not billions) — pinned `F.broadcast`, so the
    100 TB side never shuffles; each scan task probes a local hash set.
  * Sequence packing is inherently sequential *within* a pack stream, so
    the corpus is sharded into (source, shard) groups — shard = a fixed
    doc_id range — and packed greedily inside each group with one
    Arrow-batched applyInPandas. Group state is bounded by the shard width
    (SHARD_WIDTH docs), never by corpus or source size, which is what makes
    the operator safe when one source holds billions of documents.
  * Gap-fill downsampling aggregates first (one shuffle of compact
    (type, bucket) partials), then explodes each type's [min, max] hour
    range — the generated axis is proportional to the time span, not the
    event count.

The packing group loop is the one non-expression path (greedy reset is a
stateful scan); its oracle is a DuckDB recursive CTE computing the identical
fold, so even the stateful operator stays hash-checked.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hopspark.catalog import read_table

# --- PII redaction ----------------------------------------------------------

# Pattern order matters: SSN (3-2-4) must be redacted before phone (3-3-4)
# so the generic digit-group pattern can't half-match an SSN. RE2 (oracle)
# and Java (Spark) agree on this subset: classes, bounded repeats, \b.
_PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"),
    ("phone", r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"),
]


def pii_redact_text(col):
    """Redact every PII class in order; each match becomes ``<CLASS>``."""
    out = col
    for name, pat in _PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    return out


def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII detection + redaction: match counts per class and
    the md5 of the redacted text (so the oracle checks the rewrite itself,
    not just the counts). Scan-side expressions only."""
    docs = read_table(spark, "documents", sf_dir)
    counts = [
        F.size(F.regexp_extract_all(F.col("text"), F.lit(pat), F.lit(0))).alias(
            f"n_{name}"
        )
        for name, pat in _PII_PATTERNS
    ]
    return docs.select(
        "doc_id",
        *counts,
        F.md5(pii_redact_text(F.col("text"))).alias("redacted_md5"),
    ).orderBy("doc_id")


_PII_COUNT_SQL = ",\n       ".join(
    f"len(regexp_extract_all(text, '{pat}')) AS n_{name}"
    for name, pat in _PII_PATTERNS
)
_PII_REDACT_SQL = "text"
for _name, _pat in _PII_PATTERNS:
    _PII_REDACT_SQL = (
        f"regexp_replace({_PII_REDACT_SQL}, '{_pat}', '<{_name.upper()}>', 'g')"
    )

TEXT_PII_REDACT_SQL = f"""
SELECT doc_id,
       {_PII_COUNT_SQL},
       md5({_PII_REDACT_SQL}) AS redacted_md5
FROM documents ORDER BY doc_id
"""


# --- benchmark contamination ------------------------------------------------

CONTAM_NGRAM = 8
BENCHMARK_SOURCE = "src0"  # stands in for a held-out eval set


def _ngram_hashes(th, n: int):
    """Distinct n-gram keys as 64-bit hashes over a pre-materialized
    token-hash array column `th` (array<long>) — xxhash64 over n token
    hashes, no string concatenation in the row path (the 2⁻⁶⁴ collision
    rate is negligible against overlap counting). `th` must be its own
    projection; inlining the expression would recompute it per element
    access (see dedup._hashed_shingles_of)."""
    idx = F.sequence(F.lit(0), F.greatest(F.size(th) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(
            idx, lambda i: F.xxhash64(*[F.get(th, i + j) for j in range(n)])
        )
    )


def _doc_ngrams(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, source, g) — exploded distinct hashed n-grams per doc."""
    th = docs.select(
        "doc_id",
        "source",
        F.transform(
            F.split(F.trim(F.col("text")), r"\s+"), lambda t: F.xxhash64(t)
        ).alias("th"),
    )
    return th.select(
        "doc_id", "source", F.explode(_ngram_hashes(F.col("th"), n)).alias("g")
    )


def text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: fraction of each training document's
    distinct 8-grams that appear anywhere in the benchmark set (here: the
    `src0` slice of the corpus standing in for an eval benchmark).

    Scale shape: the benchmark n-gram set is distinct'd and **broadcast**
    (benchmarks are small by nature); the training side explodes its
    n-grams scan-side and probes the broadcast set — the 100 TB corpus
    never shuffles its text, and the per-doc groupBy carries only
    (doc_id, two ints)."""
    docs = read_table(spark, "documents", sf_dir)
    grams = _doc_ngrams(docs, CONTAM_NGRAM)
    bench = (
        grams.filter(F.col("source") == BENCHMARK_SOURCE).select("g").distinct()
    )
    train = grams.filter(F.col("source") != BENCHMARK_SOURCE)
    # One pass over the exploded corpus: left-join the (broadcast) benchmark
    # set with a hit marker, then a single groupBy counts total and
    # contaminated grams together — the corpus n-grams explode exactly once.
    marked = train.join(
        F.broadcast(bench.withColumn("_hit", F.lit(1))), "g", "left"
    )
    per_doc = marked.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.count("_hit").alias("n_contaminated"),
    )
    return per_doc.select(
        "doc_id",
        "source",
        "n_grams",
        "n_contaminated",
        (
            F.col("n_contaminated").cast("double")
            / F.col("n_grams").cast("double")
        ).alias("contamination_ratio"),
    ).orderBy("doc_id")


TEXT_CONTAMINATION_SQL = rf"""
WITH grams AS (
  SELECT doc_id, source,
         unnest(list_distinct([
           array_to_string(toks[i:i+{CONTAM_NGRAM - 1}], ' ')
           FOR i IN range(1, greatest(len(toks) - {CONTAM_NGRAM - 1}, 1) + 1)
         ])) AS g
  FROM (SELECT doc_id, source,
               string_split_regex(trim(text), '\s+') AS toks FROM documents)
),
bench AS (SELECT DISTINCT g FROM grams WHERE source = '{BENCHMARK_SOURCE}')
SELECT doc_id, source,
       COUNT(*) AS n_grams,
       COUNT(*) FILTER (WHERE g IN (SELECT g FROM bench)) AS n_contaminated,
       CAST(COUNT(*) FILTER (WHERE g IN (SELECT g FROM bench)) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS contamination_ratio
FROM grams
WHERE source <> '{BENCHMARK_SOURCE}'
GROUP BY doc_id, source
ORDER BY doc_id
"""


# --- overlapping chunking ---------------------------------------------------

CHUNK_TOKENS = 32
CHUNK_STRIDE = 24  # 8-token overlap between consecutive chunks


def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each document into overlapping token-window chunks (size
    CHUNK_TOKENS, stride CHUNK_STRIDE) — the context-window prep step of a
    training pipeline. Start offsets are generated with `sequence`, the
    windows sliced scan-side, and the chunk content pinned by md5 so the
    oracle verifies the actual text of every chunk. Zero shuffle."""
    docs = read_table(spark, "documents", sf_dir)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    starts = F.sequence(
        F.lit(1),
        F.greatest(
            F.size(toks) - F.lit(CHUNK_TOKENS - CHUNK_STRIDE), F.lit(1)
        ),
        F.lit(CHUNK_STRIDE),
    )
    chunked = docs.select(
        "doc_id",
        F.posexplode(
            F.transform(starts, lambda s: F.slice(toks, s, CHUNK_TOKENS))
        ).alias("chunk_idx", "chunk"),
    )
    return chunked.select(
        "doc_id",
        "chunk_idx",
        F.size("chunk").alias("n_tokens"),
        F.md5(F.concat_ws(" ", "chunk")).alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_idx")


TEXT_CHUNK_OVERLAP_SQL = rf"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
),
starts AS (
  SELECT doc_id, toks,
         unnest(generate_series(
           1, greatest(len(toks) - {CHUNK_TOKENS - CHUNK_STRIDE}, 1),
           {CHUNK_STRIDE})) AS s,
         generate_subscripts(generate_series(
           1, greatest(len(toks) - {CHUNK_TOKENS - CHUNK_STRIDE}, 1),
           {CHUNK_STRIDE}), 1) - 1 AS chunk_idx
  FROM t
)
SELECT doc_id, chunk_idx,
       len(toks[s:s + {CHUNK_TOKENS - 1}]) AS n_tokens,
       md5(array_to_string(toks[s:s + {CHUNK_TOKENS - 1}], ' ')) AS chunk_md5
FROM starts
ORDER BY doc_id, chunk_idx
"""


# --- greedy sequence packing ------------------------------------------------

PACK_CAPACITY = 256  # tokens per training sequence
# Docs per packing shard: bounds applyInPandas group state (a shard's docs
# must fit one Arrow batch) while keeping groups coarse enough that
# per-group Python dispatch overhead stays negligible.
SHARD_WIDTH = 1024


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequential sequence packing: within each (source, shard)
    group, walk documents in doc_id order and assign each to the current
    pack until adding it would exceed PACK_CAPACITY tokens, then open a new
    pack. Emits (source, shard, doc_id, n_tokens, pack_id, pack_pos).

    The greedy reset is a stateful scan (not expressible as a window
    aggregate), so each group is folded in one Arrow-batched applyInPandas
    call. Sharding by fixed doc_id ranges bounds per-group state at
    SHARD_WIDTH documents regardless of how big a source is — the property
    that keeps the operator safe at 100 TB — and pack ids are
    (shard-local), exactly how a distributed packing job would number
    output sequences per shard file."""
    docs = read_table(spark, "documents", sf_dir)
    base = docs.select(
        "source",
        (F.col("doc_id") / F.lit(SHARD_WIDTH)).cast("long").alias("shard"),
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        pack_ids, pack_pos = [], []
        pid, pos, acc = 0, 0, 0
        for n in pdf["n_tokens"]:
            if acc > 0 and acc + n > PACK_CAPACITY:
                pid, pos, acc = pid + 1, 0, 0
            pack_ids.append(pid)
            pack_pos.append(pos)
            pos, acc = pos + 1, acc + int(n)
        pdf["pack_id"] = pack_ids
        pdf["pack_pos"] = pack_pos
        return pdf

    out_schema = (
        "source string, shard long, doc_id long, n_tokens int, "
        "pack_id long, pack_pos long"
    )
    return (
        base.groupBy("source", "shard")
        .applyInPandas(_pack, out_schema)
        .orderBy("doc_id")
    )


PACK_SEQUENCES_SQL = rf"""
WITH RECURSIVE d AS (
  SELECT source,
         (doc_id // {SHARD_WIDTH}) AS shard,
         doc_id,
         len(string_split_regex(trim(text), '\s+')) AS n_tokens,
         ROW_NUMBER() OVER (
           PARTITION BY source, (doc_id // {SHARD_WIDTH})
           ORDER BY doc_id) AS rn
  FROM documents
),
p(source, shard, rn, doc_id, n_tokens, pack_id, pack_pos, acc) AS (
  SELECT source, shard, rn, doc_id, n_tokens,
         CAST(0 AS BIGINT), CAST(0 AS BIGINT), n_tokens
  FROM d WHERE rn = 1
  UNION ALL
  SELECT d.source, d.shard, d.rn, d.doc_id, d.n_tokens,
         CASE WHEN p.acc + d.n_tokens > {PACK_CAPACITY}
              THEN p.pack_id + 1 ELSE p.pack_id END,
         CASE WHEN p.acc + d.n_tokens > {PACK_CAPACITY}
              THEN 0 ELSE p.pack_pos + 1 END,
         CASE WHEN p.acc + d.n_tokens > {PACK_CAPACITY}
              THEN d.n_tokens ELSE p.acc + d.n_tokens END
  FROM p JOIN d ON d.source = p.source AND d.shard = p.shard
               AND d.rn = p.rn + 1
)
SELECT source, shard, doc_id, CAST(n_tokens AS INT) AS n_tokens,
       pack_id, pack_pos
FROM p ORDER BY doc_id
"""


# --- gap-filled time-series downsample --------------------------------------


def events_gapfill_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly downsample of the event stream per event_type with gap
    filling: every hour in each type's [min, max] range appears, empty
    hours as (n_events=0, avg_value=NULL) — the hypertable-rollup /
    time_bucket_gapfill shape.

    Aggregation happens first (compact (type, hour) partials, one
    shuffle); the dense hour axis is then generated per type with
    `sequence` — cost proportional to the time span, not the event
    count — and left-joined against the rollup."""
    ev = read_table(spark, "events", sf_dir)
    hourly = (
        ev.select(
            "event_type", F.date_trunc("hour", "ts").alias("bucket"), "value"
        )
        .groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # exact decimal sum -> double, / count: deterministic under any
            # partitioning (double avg is summation-order-sensitive and can
            # flip the 6th decimal at scale)
            (
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                / F.count("value")
            ).alias("avg_value"),
        )
    )
    axis = (
        hourly.groupBy("event_type")
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("bucket"),
        )
    )
    return (
        axis.join(hourly, ["event_type", "bucket"], "left")
        .select(
            "event_type",
            "bucket",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.round("avg_value", 6).alias("avg_value"),
        )
        .orderBy("event_type", "bucket")
    )


EVENTS_GAPFILL_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value) AS avg_value
  FROM events GROUP BY 1, 2
),
axis AS (
  SELECT event_type,
         unnest(generate_series(min(bucket), max(bucket),
                                INTERVAL 1 HOUR)) AS bucket
  FROM hourly GROUP BY event_type
)
SELECT a.event_type, a.bucket,
       COALESCE(h.n_events, 0) AS n_events,
       ROUND(h.avg_value, 6) AS avg_value
FROM axis a LEFT JOIN hourly h
  ON h.event_type = a.event_type AND h.bucket = a.bucket
ORDER BY a.event_type, a.bucket
"""


# --- deterministic train/val/test split ------------------------------------

_HEX = "0123456789abcdef"
# 256 content-hash buckets: <230 train (~90%), <243 val (~5%), rest test.
SPLIT_TRAIN_LT = 230
SPLIT_VAL_LT = 243


def _split_bucket_spark() -> "F.Column":
    fp = F.md5(F.col("text"))
    d1 = F.instr(F.lit(_HEX), F.substring(fp, 31, 1)) - 1
    d2 = F.instr(F.lit(_HEX), F.substring(fp, 32, 1)) - 1
    return d1 * 16 + d2


def text_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split by content hash (last two hex
    digits of md5(text) → 256 buckets, ~90/5/5). Content-addressed
    bucketing keeps the split stable across reruns, re-shards, and corpus
    growth — the property random() splits lack — and exact duplicates land
    in the same split, so train/test contamination can't enter through the
    splitter. Scan-side expression, one aggregation of compact partials."""
    docs = read_table(spark, "documents", sf_dir)
    bucket = _split_bucket_spark()
    split = (
        F.when(bucket < SPLIT_TRAIN_LT, F.lit("train"))
        .when(bucket < SPLIT_VAL_LT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("split")
    )


TEXT_TRAIN_SPLIT_SQL = f"""
WITH b AS (
  SELECT (strpos('{_HEX}', substr(md5(text), 31, 1)) - 1) * 16
         + strpos('{_HEX}', substr(md5(text), 32, 1)) - 1 AS bucket,
         n_chars
  FROM documents
)
SELECT CASE WHEN bucket < {SPLIT_TRAIN_LT} THEN 'train'
            WHEN bucket < {SPLIT_VAL_LT} THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM b
GROUP BY 1
ORDER BY split
"""


# --- per-source corpus cap --------------------------------------------------

#: max documents any one source may contribute after capping
SOURCE_CAP = 15


def curation_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap each source's contribution at SOURCE_CAP quality-ranked docs —
    the web-corpus governance step that stops one crawl domain from
    dominating the training mixture. Rank = longest-first (n_chars DESC,
    doc_id tiebreak); reports per source how many docs survived, how many
    were cut, and the source's share of the capped corpus.

    100 TB design: row_number + `rk <= K` compiles to WindowGroupLimit —
    each scan task keeps only its local top-K per source before the
    shuffle, so a billion-doc domain ships K rows per task, not its whole
    partition (same partitioned-top-n contract the reference's analytic
    TopN limit pushdown provides, be/src/exec/topn-node.h). The share
    denominator is one broadcastable scalar aggregate; the share itself
    is a single integer division rounded at 6 — no float summation
    anywhere."""
    docs = read_table(spark, "documents", sf_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    kept = (
        docs.select("source", "n_chars", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= SOURCE_CAP)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").alias("kept_chars"),
        )
    )
    totals = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    total = kept.agg(F.sum("n_kept").alias("total_kept"))
    return (
        totals.join(kept, "source")
        .crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_docs",
            "n_kept",
            (F.col("n_docs") - F.col("n_kept")).alias("n_dropped"),
            F.col("kept_chars").cast("bigint").alias("kept_chars"),
            F.round(
                F.col("n_kept").cast("double") / F.col("total_kept").cast("double"),
                6,
            ).alias("share_after"),
        )
        .orderBy("source")
    )


CURATION_SOURCE_CAP_SQL = f"""
WITH kept AS (
  SELECT source, COUNT(*) AS n_kept, SUM(n_chars) AS kept_chars
  FROM (
    SELECT source, n_chars,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY n_chars DESC, doc_id) AS rk
    FROM documents
  ) r WHERE rk <= {SOURCE_CAP}
  GROUP BY source
),
totals AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
)
SELECT t.source,
       CAST(t.n_docs AS BIGINT) AS n_docs,
       CAST(k.n_kept AS BIGINT) AS n_kept,
       CAST(t.n_docs - k.n_kept AS BIGINT) AS n_dropped,
       CAST(k.kept_chars AS BIGINT) AS kept_chars,
       ROUND(CAST(k.n_kept AS DOUBLE)
             / CAST((SELECT SUM(n_kept) FROM kept) AS DOUBLE),
             6) AS share_after
FROM totals t JOIN kept k ON t.source = k.source
ORDER BY t.source
"""


QUERIES: dict[str, tuple] = {
    "curation_source_cap": (curation_source_cap, CURATION_SOURCE_CAP_SQL),
    "text_train_split": (text_train_split, TEXT_TRAIN_SPLIT_SQL),
    "text_pii_redact": (text_pii_redact, TEXT_PII_REDACT_SQL),
    "text_contamination": (text_contamination, TEXT_CONTAMINATION_SQL),
    "text_chunk_overlap": (text_chunk_overlap, TEXT_CHUNK_OVERLAP_SQL),
    "pack_sequences": (pack_sequences, PACK_SEQUENCES_SQL),
    "events_gapfill_downsample": (events_gapfill_downsample, EVENTS_GAPFILL_SQL),
}
