"""Data-mixture sampling operators for training-corpus construction.

The reference engine's TABLESAMPLE (reference `fe/src/main/java/org/apache/
impala/analysis/TableSampleClause.java`, `be/src/exec/hdfs-scan-node-base.cc`
sample-range plumbing) covers uniform row/file sampling; a training-data
pipeline additionally needs *weighted* sampling: per-source rates, mixture
rebalancing toward target shares, quality-percentile gating, and fractional
epoch upsampling (the "repeat good sources 2.5×" recipe from public LLM
data-curation literature, e.g. the Pile / RefinedWeb / DoReMi papers).

All sampling here is content/id-addressed (md5-bucket), never `rand()`:
deterministic across reruns, re-shards, and engines — which is what makes a
DuckDB oracle possible and what a reproducible corpus build needs anyway.

Scale notes (100 TB):
- Every rate decision is a scan-side expression on a 16-byte hash; no
  shuffle is added to the row path.
- Rebalancing aggregates per-source counts first (a ~#sources-row result),
  then broadcast-joins the rates back — the big side never shuffles.
- Quality gating uses a per-group percentile *threshold* (tiny agg +
  broadcast join + scan-side filter), NOT a percent_rank window over the
  full corpus — a window would total-sort every group in one task chain.
- Epoch upsampling explodes a `sequence(1, n_rep)` — output rows scale by
  the mean epoch factor, never materialized driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hopspark.catalog import read_table

_HEX = "0123456789abcdef"

# Deterministic 4096-way bucket from the last 3 hex digits of md5(doc_id).
# Independent of the train/val/test splitter (curation.py uses md5(text));
# using the id keeps sampling stable under text edits, the splitter stable
# under id reassignment.


def _bucket4096_spark() -> "F.Column":
    fp = F.md5(F.col("doc_id").cast("string"))

    def d(i: int) -> "F.Column":
        return F.instr(F.lit(_HEX), F.substring(fp, i, 1)) - 1

    return d(30) * 256 + d(31) * 16 + d(32)


_BUCKET4096_SQL = (
    f"(strpos('{_HEX}', substr(md5(CAST(doc_id AS VARCHAR)), 30, 1)) - 1) * 256"
    f" + (strpos('{_HEX}', substr(md5(CAST(doc_id AS VARCHAR)), 31, 1)) - 1) * 16"
    f" + strpos('{_HEX}', substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)) - 1"
)

# Per-source tier rates: sources are 'src<N>'; tier by N. A realistic shape:
# keep curated tiers fully, downsample the mid tier, heavily cut the tail.
def _sid_spark() -> "F.Column":
    return F.substring(F.col("source"), 4, 8).cast("int")


_SID_SQL = "CAST(substr(source, 4) AS INT)"


def mixture_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source stratified sampling at fixed tier rates (1.0 / 0.5 / 0.25)
    via deterministic md5 bucketing; reports kept vs total per source.

    Scan-side CASE + hash filter folded into one aggregation — zero extra
    shuffle over a plain groupBy, and the parquet scan prunes to
    (doc_id, source, n_chars)."""
    docs = read_table(spark, "documents", sf_dir)
    rate = (
        F.when(_sid_spark() < 5, F.lit(1.0))
        .when(_sid_spark() < 15, F.lit(0.5))
        .otherwise(F.lit(0.25))
    )
    kept = (_bucket4096_spark() < rate * 4096).cast("int")
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(kept).alias("n_kept"),
            F.sum(kept * F.col("n_chars")).alias("chars_kept"),
        )
        .orderBy("source")
    )


MIXTURE_STRATIFIED_SQL = f"""
WITH d AS (
  SELECT source, n_chars,
         CASE WHEN {_BUCKET4096_SQL}
              < CASE WHEN {_SID_SQL} < 5 THEN 1.0
                     WHEN {_SID_SQL} < 15 THEN 0.5
                     ELSE 0.25 END * 4096
              THEN 1 ELSE 0 END AS kept
  FROM documents
)
SELECT source,
       COUNT(*) AS n_total,
       CAST(SUM(kept) AS BIGINT) AS n_kept,
       CAST(SUM(kept * n_chars) AS BIGINT) AS chars_kept
FROM d GROUP BY source ORDER BY source
"""


def mixture_rebalance_uniform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebalance the corpus toward a uniform per-source mixture: rate_s =
    min(1, (total/#sources)/count_s), applied as a deterministic hash
    filter; reports per-source kept counts and the applied rate.

    Two passes over the data: a count-only aggregation whose result is
    ~#sources rows, then the rates broadcast-join back onto the scan.
    The 100 TB side never shuffles; only compact counts do."""
    docs = read_table(spark, "documents", sf_dir)
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("cnt"))
    tot = counts.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("n_sources")
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        "source",
        "cnt",
        F.least(
            F.lit(1.0), (F.col("total") / F.col("n_sources")) / F.col("cnt")
        ).alias("rate"),
    )
    return (
        docs.join(F.broadcast(rates), "source")
        .where(_bucket4096_spark() < F.col("rate") * 4096)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.round(F.first("rate"), 6).alias("rate"),
        )
        .orderBy("source")
    )


MIXTURE_REBALANCE_SQL = f"""
WITH counts AS (
  SELECT source, COUNT(*) AS cnt FROM documents GROUP BY source
),
rates AS (
  SELECT source, cnt,
         LEAST(1.0, (SUM(cnt) OVER () / (COUNT(*) OVER () * 1.0)) / cnt) AS rate
  FROM counts
)
SELECT d.source,
       COUNT(*) AS n_kept,
       ROUND(MIN(r.rate), 6) AS rate
FROM documents d JOIN rates r ON d.source = r.source
WHERE {_BUCKET4096_SQL} < r.rate * 4096
GROUP BY d.source ORDER BY d.source
"""


def mixture_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep each language's top quality quartile, where quality = distinct
    token ratio; reports per-language kept count and mean kept score.

    Threshold-based, not rank-based: an exact per-language p75 is computed
    by aggregation (5 rows), broadcast back, and applied as a scan-side
    filter. A percent_rank window would sort each language's entire corpus
    in one task chain — this shape does the same cut with a tiny agg +
    one more scan, which survives a 1000-executor corpus."""
    docs = read_table(spark, "documents", sf_dir)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    score = F.size(F.array_distinct(toks)).cast("double") / F.size(toks).cast(
        "double"
    )
    scored = docs.select("lang", score.alias("score"))
    thresholds = scored.groupBy("lang").agg(
        F.percentile(F.col("score"), F.lit(0.75)).alias("p75")
    )
    return (
        scored.join(F.broadcast(thresholds), "lang")
        .where(F.col("score") >= F.col("p75"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            # decimal-sum discipline: double avg is summation-order-
            # sensitive and can flip the 6th decimal under repartitioning
            F.round(
                F.sum(F.col("score").cast("decimal(18,10)")).cast("double")
                / F.count("score"),
                6,
            ).alias("avg_score"),
        )
        .orderBy("lang")
    )


MIXTURE_QUALITY_GATE_SQL = r"""
WITH scored AS (
  SELECT lang,
         CAST(len(list_distinct(string_split_regex(trim(text), '\s+'))) AS DOUBLE)
           / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS score
  FROM documents
),
thresholds AS (
  SELECT lang, quantile_cont(score, 0.75) AS p75 FROM scored GROUP BY lang
)
SELECT s.lang,
       COUNT(*) AS n_kept,
       ROUND(CAST(SUM(CAST(s.score AS DECIMAL(18,10))) AS DOUBLE)
             / COUNT(s.score), 6) AS avg_score
FROM scored s JOIN thresholds t ON s.lang = t.lang
WHERE s.score >= t.p75
GROUP BY s.lang ORDER BY s.lang
"""


def mixture_epoch_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fractional epoch upsampling: tier epochs 2.5 / 1.25 / 1.0 by source;
    the fractional part is resolved per-document by hash bucket (a doc
    under epochs=2.5 appears 2 or 3 times, deterministically). Reports
    per-source input docs, emitted rows, and emitted chars.

    The repeat is `explode(sequence(1, n_rep))` on the scan — rows fan out
    executor-side in the same stage, no join, no shuffle before the final
    small aggregation."""
    docs = read_table(spark, "documents", sf_dir)
    epochs = (
        F.when(_sid_spark() % 3 == 0, F.lit(2.5))
        .when(_sid_spark() % 3 == 1, F.lit(1.25))
        .otherwise(F.lit(1.0))
    )
    frac = epochs - F.floor(epochs)
    n_rep = (
        F.floor(epochs) + (_bucket4096_spark() < frac * 4096).cast("long")
    ).cast("int")
    return (
        docs.select("source", "n_chars", n_rep.alias("n_rep"))
        .select(
            "source",
            "n_chars",
            F.explode(F.sequence(F.lit(1), F.col("n_rep"))).alias("rep"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_chars").alias("chars_total"),
        )
        .orderBy("source")
    )


MIXTURE_EPOCH_SQL = f"""
WITH d AS (
  SELECT source, n_chars,
         CAST(FLOOR(ep) + CASE WHEN {_BUCKET4096_SQL} < (ep - FLOOR(ep)) * 4096
                               THEN 1 ELSE 0 END AS INT) AS n_rep
  FROM (
    SELECT source, n_chars, doc_id,
           CASE WHEN {_SID_SQL} % 3 = 0 THEN 2.5
                WHEN {_SID_SQL} % 3 = 1 THEN 1.25
                ELSE 1.0 END AS ep
    FROM documents
  )
),
exploded AS (
  SELECT source, n_chars, unnest(generate_series(1, n_rep)) AS rep FROM d
)
SELECT source,
       COUNT(*) AS n_rows,
       CAST(SUM(n_chars) AS BIGINT) AS chars_total
FROM exploded GROUP BY source ORDER BY source
"""


# --- Temperature-scaled mixture weights ---------------------------------------

MIX_ALPHA = 0.7  # temperature exponent (the multilingual-LM standard)
MIX_BUDGET = 100_000  # target corpus size the weights allocate


def mixture_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled sampling weights per source: w_s ∝ n_s^α with
    α = 0.7 — the standard low-resource-upweighting rule for multilingual /
    multi-source LM mixtures — plus each source's integer document
    allocation out of a fixed budget.  The allocation derives from the
    ALREADY-ROUNDED weight so the floor/round boundary cannot flip on a
    1-ulp pow() difference between engines.

    Scale shape: one map-side-combinable count per source (tiny result),
    one single-row total joined back by broadcast — the corpus is scanned
    once and only (source) rows ever shuffle."""
    docs = read_table(spark, "documents", sf_dir)
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    total = counts.agg(
        F.sum(F.pow(F.col("n_docs"), F.lit(MIX_ALPHA))).alias("z")
    )
    weight = F.round(F.pow(F.col("n_docs"), F.lit(MIX_ALPHA)) / F.col("z"), 6)
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_docs",
            weight.alias("weight"),
            F.round(weight * MIX_BUDGET, 0).cast("bigint").alias("alloc"),
        )
        .orderBy("source")
    )


MIXTURE_TEMPERATURE_SQL = f"""
WITH c AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
t AS (SELECT SUM(POW(n_docs, {MIX_ALPHA})) AS z FROM c)
SELECT source, n_docs,
       ROUND(POW(n_docs, {MIX_ALPHA}) / z, 6) AS weight,
       CAST(ROUND(ROUND(POW(n_docs, {MIX_ALPHA}) / z, 6) * {MIX_BUDGET}, 0)
            AS BIGINT) AS alloc
FROM c, t ORDER BY source
"""


QUERIES: dict[str, tuple] = {
    "mixture_stratified_sample": (mixture_stratified_sample, MIXTURE_STRATIFIED_SQL),
    "mixture_temperature_weights": (
        mixture_temperature_weights,
        MIXTURE_TEMPERATURE_SQL,
    ),
    "mixture_rebalance_uniform": (mixture_rebalance_uniform, MIXTURE_REBALANCE_SQL),
    "mixture_quality_gate": (mixture_quality_gate, MIXTURE_QUALITY_GATE_SQL),
    "mixture_epoch_upsample": (mixture_epoch_upsample, MIXTURE_EPOCH_SQL),
}
