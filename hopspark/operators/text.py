"""Text-analysis operators for LLM training-data pipelines (extension
beyond the reference — BASELINE.json north star).

All hot-path expressions are built-in Catalyst functions (JVM-side,
whole-stage codegen); no Python in the per-row path. At 100 TB the
`documents` table is scanned once per pipeline stage with column pruning
(only `doc_id`, `text` and metadata columns are read) and every operator is
embarrassingly parallel — no shuffle at all except final small aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hopspark.catalog import read_table

# Tokens: whitespace split of trimmed text. Both engines treat the regex
# identically; documents are non-empty word lists (TESTDATA.md generator).
def _tokens():
    return F.split(F.trim(F.col("text")), r"\s+")


def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, distinct tokens, char stats."""
    docs = read_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        F.size(_tokens()).alias("n_tokens"),
        F.size(F.array_distinct(_tokens())).alias("n_distinct_tokens"),
        F.length("text").alias("len_chars"),
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))))
        .alias("n_spaces"),
    ).orderBy("doc_id")


TEXT_TOKEN_STATS_SQL = r"""
SELECT doc_id,
       len(string_split_regex(trim(text), '\s+')) AS n_tokens,
       len(list_distinct(string_split_regex(trim(text), '\s+'))) AS n_distinct_tokens,
       length(text) AS len_chars,
       length(text) - length(replace(text, ' ', '')) AS n_spaces
FROM documents ORDER BY doc_id
"""


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: stopword ratio, mean token length, repetition ratio.
    Ratio arithmetic is a fixed expression tree evaluated in float64 by both
    engines → bit-deterministic."""
    docs = read_table(spark, "documents", sf_dir)
    n_tokens = F.size(_tokens()).cast("double")
    n_distinct = F.size(F.array_distinct(_tokens())).cast("double")
    stop_hits = F.size(
        F.filter(_tokens(), lambda t: t.isin("the", "a", "of", "and", "to"))
    ).cast("double")
    mean_tok_len = (F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
                    / n_tokens)
    return docs.select(
        "doc_id",
        "lang",
        (stop_hits / n_tokens).alias("stopword_ratio"),
        (n_distinct / n_tokens).alias("distinct_ratio"),
        mean_tok_len.alias("mean_token_len"),
    ).orderBy("doc_id")


TEXT_QUALITY_SCORE_SQL = r"""
SELECT doc_id, lang,
       CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                            t -> t IN ('the','a','of','and','to'))) AS DOUBLE)
         / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS stopword_ratio,
       CAST(len(list_distinct(string_split_regex(trim(text), '\s+'))) AS DOUBLE)
         / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS distinct_ratio,
       CAST(length(replace(text, ' ', '')) AS DOUBLE)
         / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS mean_token_len
FROM documents ORDER BY doc_id
"""


def text_langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram/stopword language-ID heuristic: score marker tokens per
    language, argmax with a fixed preference order. (The synthetic corpus
    draws from one vocabulary, so this exercises the operator shape —
    scoring + argmax — not real langid accuracy.)"""
    docs = read_table(spark, "documents", sf_dir)
    toks = _tokens()
    en = F.size(F.filter(toks, lambda t: t.isin("the", "and", "of")))
    tech = F.size(F.filter(toks, lambda t: t.isin("query", "table", "data")))
    pred = (
        F.when(en > tech, F.lit("en"))
        .when(tech > en, F.lit("tech"))
        .otherwise(F.lit("unknown"))
    )
    return (
        docs.select("doc_id", "lang", pred.alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "predicted")
    )


TEXT_LANGID_SQL = r"""
WITH scored AS (
  SELECT doc_id, lang,
         len(list_filter(string_split_regex(trim(text), '\s+'), t -> t IN ('the','and','of'))) AS en,
         len(list_filter(string_split_regex(trim(text), '\s+'), t -> t IN ('query','table','data'))) AS tech
  FROM documents
)
SELECT lang,
       CASE WHEN en > tech THEN 'en' WHEN tech > en THEN 'tech' ELSE 'unknown' END AS predicted,
       COUNT(*) AS n_docs
FROM scored
GROUP BY lang, predicted
ORDER BY lang, predicted
"""


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over whitespace-normalized lowercase
    text; per-source distinct-fingerprint counts (content-addressed dedup
    prep)."""
    docs = read_table(spark, "documents", sf_dir)
    fp = F.md5(F.lower(F.regexp_replace(F.col("text"), r"\s+", " ")))
    return (
        docs.select("source", fp.alias("fingerprint"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("fingerprint").alias("n_unique"),
        )
        .orderBy("source")
    )


TEXT_FINGERPRINT_SQL = r"""
SELECT source, COUNT(*) AS n_docs,
       COUNT(DISTINCT md5(lower(regexp_replace(text, '\s+', ' ', 'g')))) AS n_unique
FROM documents GROUP BY source ORDER BY source
"""


# BPE-ish pretokenizer: letter runs / digit runs / punctuation runs, each
# with optional leading space (the GPT-2 pattern family minus lookahead,
# which RE2-based engines — and so the oracle — don't support).
_BPE_RE = r" ?[a-zA-Z]+| ?[0-9]+| ?[^ a-zA-Z0-9]+"


def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subword-style token counting: BPE-ish pretoken pieces, plus the
    chars/4 LLM-budget heuristic, per document and per source."""
    docs = read_table(spark, "documents", sf_dir)
    pieces = F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), F.lit(0)))
    return (
        docs.select(
            "source",
            pieces.alias("pieces"),
            F.ceil(F.length("text") / 4).alias("chars4"),
        )
        .groupBy("source")
        .agg(
            F.sum("pieces").cast("bigint").alias("bpe_pieces"),
            F.sum("chars4").cast("bigint").alias("chars_div4_est"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .orderBy("source")
    )


TEXT_BPE_SQL = rf"""
SELECT source,
       CAST(SUM(len(regexp_extract_all(text, '{_BPE_RE}'))) AS BIGINT) AS bpe_pieces,
       CAST(SUM(CAST(ceil(length(text) / 4.0) AS BIGINT)) AS BIGINT) AS chars_div4_est,
       COUNT(*) AS n_docs
FROM documents GROUP BY source ORDER BY source
"""


def text_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling (polynomial) hash over the token stream — order-sensitive
    content fingerprint (reordered tokens hash differently, unlike the
    bag-of-words md5). Modular arithmetic keeps every intermediate below
    2⁶³ so both engines agree exactly."""
    docs = read_table(spark, "documents", sf_dir)
    tokval = lambda t: (F.ascii(t) * 256 + F.length(t)) % 1000000007  # noqa: E731
    rolled = F.aggregate(
        _tokens(),
        F.lit(0).cast("long"),
        lambda acc, t: (acc * 1000003 + tokval(t)) % 1000000007,
    )
    return docs.select("doc_id", rolled.alias("rolling_hash")).orderBy("doc_id")


TEXT_ROLLING_HASH_SQL = r"""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(string_split_regex(trim(text), '\s+'),
                          t -> CAST((ascii(t) * 256 + length(t)) % 1000000007 AS BIGINT))),
         (acc, v) -> (acc * 1000003 + v) % 1000000007
       ) AS rolling_hash
FROM documents ORDER BY doc_id
"""


QUERIES: dict[str, tuple] = {
    "text_token_stats": (text_token_stats, TEXT_TOKEN_STATS_SQL),
    "text_quality_score": (text_quality_score, TEXT_QUALITY_SCORE_SQL),
    "text_langid_heuristic": (text_langid_heuristic, TEXT_LANGID_SQL),
    "text_fingerprint": (text_fingerprint, TEXT_FINGERPRINT_SQL),
    "text_bpe_token_count": (text_bpe_token_count, TEXT_BPE_SQL),
    "text_rolling_hash": (text_rolling_hash, TEXT_ROLLING_HASH_SQL),
}
