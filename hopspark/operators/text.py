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


def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head: top-25 tokens by frequency with corpus
    share and cumulative coverage — the first diagnostic of any
    tokenizer/vocab build (what fraction of the stream the head covers).

    Scale shape: explode + groupBy(token) is the canonical word-count —
    map-side partial aggregation collapses each partition's counts before
    the only shuffle (compact (token, cnt) rows); the total is a scalar
    broadcast and the window runs over the 25-row result."""
    from pyspark.sql import Window as W

    docs = read_table(spark, "documents", sf_dir)
    counts = (
        docs.select(F.explode(_tokens()).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = counts.agg(F.sum("cnt").alias("total"))
    top = (
        counts.orderBy(F.desc("cnt"), F.asc("token"))
        .limit(25)
        .crossJoin(F.broadcast(total))
    )
    w = W.orderBy(F.desc("cnt"), F.asc("token")).rowsBetween(
        W.unboundedPreceding, 0
    )
    return top.select(
        "token",
        "cnt",
        F.round(F.col("cnt") / F.col("total"), 6).alias("share"),
        F.round(F.sum("cnt").over(w) / F.col("total"), 6).alias("cum_share"),
    ).orderBy(F.desc("cnt"), F.asc("token"))


TEXT_VOCAB_COVERAGE_SQL = r"""
WITH counts AS (
  SELECT u.token, COUNT(*) AS cnt
  FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
        FROM documents) u
  GROUP BY u.token
),
total AS (SELECT SUM(cnt) AS total FROM counts),
top AS (
  SELECT token, cnt FROM counts ORDER BY cnt DESC, token LIMIT 25
)
SELECT token, cnt,
       ROUND(cnt / (SELECT total FROM total), 6) AS share,
       ROUND(SUM(cnt) OVER (ORDER BY cnt DESC, token
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             / (SELECT total FROM total), 6) AS cum_share
FROM top ORDER BY cnt DESC, token
"""


def text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model counts: top-30 bigrams by frequency with the
    conditional probability P(w2|w1) = c(w1,w2) / Σ_w c(w1,w) — the
    distributed n-gram-count job behind KenLM-style LM training.

    Scale shape: bigrams are built scan-side by zipping the token array
    with its own tail (no self-join), shuffle once on compact (w1, w2)
    keys with map-side combine; context totals reuse the bigram counts
    (an agg over the already-small count table, never the corpus)."""
    docs = read_table(spark, "documents", sf_dir)
    toks = _tokens()
    bigrams = F.zip_with(
        F.slice(toks, 1, F.size(toks) - 1),
        F.slice(toks, 2, F.size(toks) - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bg = (
        docs.select(F.explode(bigrams).alias("bg"))
        .select("bg.w1", "bg.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    ctx = bg.groupBy("w1").agg(F.sum("cnt").alias("ctx_cnt"))
    return (
        bg.join(ctx, "w1")
        .select(
            "w1",
            "w2",
            "cnt",
            F.round(F.col("cnt") / F.col("ctx_cnt"), 6).alias("p_cond"),
        )
        .orderBy(F.desc("cnt"), F.asc("w1"), F.asc("w2"))
        .limit(30)
    )


TEXT_BIGRAM_LM_SQL = r"""
WITH t AS (
  SELECT string_split_regex(trim(text), '\s+') AS l FROM documents
),
bg AS (
  SELECT u.bg[1] AS w1, u.bg[2] AS w2, COUNT(*) AS cnt
  FROM (SELECT unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS bg FROM t) u
  GROUP BY 1, 2
),
ctx AS (SELECT w1, SUM(cnt) AS ctx_cnt FROM bg GROUP BY w1)
SELECT bg.w1, bg.w2, bg.cnt,
       ROUND(bg.cnt / ctx.ctx_cnt, 6) AS p_cond
FROM bg JOIN ctx ON bg.w1 = ctx.w1
ORDER BY bg.cnt DESC, bg.w1, bg.w2 LIMIT 30
"""


def text_dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition signal: fraction of duplicate word
    3-grams per document (the Gopher/MassiveText-style quality rule —
    high duplicate-n-gram fraction flags boilerplate and degenerate
    repetition).

    100 TB design: pure per-row Catalyst expressions over one pruned
    scan (`doc_id`, `text`), zero shuffle except the final order —
    embarrassingly parallel at any scale."""
    docs = read_table(spark, "documents", sf_dir)
    # name the token array in its own projection so the gram lambda
    # slices a column reference — inlining the split into the lambda
    # would re-split the text once per gram (O(n_tokens²) per document)
    base = docs.select("doc_id", _tokens().alias("toks")).where(
        F.size("toks") >= 3
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.size("toks") - 2),
        lambda i: F.concat_ws(" ", F.slice("toks", i, 3)),
    )
    sel = base.select("doc_id", grams.alias("grams"))
    n = F.size("grams")
    nd = F.size(F.array_distinct("grams"))
    return sel.select(
        "doc_id",
        n.alias("n_grams"),
        nd.alias("n_distinct_grams"),
        F.round(
            F.lit(1.0) - nd.cast("double") / n.cast("double"), 6
        ).alias("dup_frac"),
    ).orderBy("doc_id")


TEXT_DUP_NGRAM_SQL = r"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS l FROM documents
),
g AS (
  SELECT doc_id,
         list_transform(
           list_zip(l[1:len(l)-2], l[2:len(l)-1], l[3:len(l)]),
           x -> x[1] || ' ' || x[2] || ' ' || x[3]
         ) AS grams
  FROM t WHERE len(l) >= 3
)
SELECT doc_id,
       len(grams) AS n_grams,
       len(list_distinct(grams)) AS n_distinct_grams,
       ROUND(1 - len(list_distinct(grams))::DOUBLE / len(grams), 6) AS dup_frac
FROM g ORDER BY doc_id
"""


def text_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring: train an add-one-smoothed bigram LM
    on the corpus, then score every document by its mean conditional
    bigram probability — the distributed shape of perplexity-style
    quality filters (train on corpus, score each doc, gate on score).

    Determinism: the per-bigram score is an integer PPM —
    round(1e6·(c+1)/(ctx+V)) — built only from IEEE-exact integer→double
    divisions (no libm), so Spark and the oracle agree bit-for-bit and
    the per-doc SUM is order-independent integer arithmetic.

    100 TB design: bigrams are built scan-side (zip of the token array
    with its tail, no self-join); the LM is bigram-TYPE-sized (≪ corpus)
    and broadcast to the scoring join; ctx totals and vocab size are
    tiny aggregates over the LM, never a second corpus pass."""
    docs = read_table(spark, "documents", sf_dir)
    toks = _tokens()
    bigrams = F.zip_with(
        F.slice(toks, 1, F.size(toks) - 1),
        F.slice(toks, 2, F.size(toks) - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    doc_bg = docs.select(
        "doc_id", F.explode(bigrams).alias("bg")
    ).select("doc_id", "bg.w1", "bg.w2")
    bg = doc_bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt"))
    ctx = bg.groupBy("w1").agg(F.sum("cnt").alias("ctx_cnt"))
    vocab = docs.select(F.explode(toks).alias("w")).agg(
        F.countDistinct("w").alias("vs")
    )
    lm = (
        bg.join(ctx, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.round(
                F.lit(1000000.0)
                * (F.col("cnt") + 1)
                / (F.col("ctx_cnt") + F.col("vs"))
            )
            .cast("bigint")
            .alias("p_ppm"),
        )
    )
    return (
        # NOTE: no broadcast hint — the LM is corpus-derived (distinct
        # bigram TYPES grow with corpus size; tens of GB at 100 TB), so a
        # pinned broadcast would OOM the driver at scale. AQE still picks
        # a broadcast join when it measures the LM small (it does at test
        # SFs); at scale it degrades gracefully to a shuffle hash join on
        # (w1, w2). Plan-locked by
        # tests/test_plans.py::test_no_forced_broadcast_of_corpus_derived_relations.
        doc_bg.join(lm, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("p_ppm").alias("sum_ppm"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "sum_ppm",
            F.round(
                F.col("sum_ppm") * F.lit(1.0) / F.col("n_bigrams"), 3
            ).alias("mean_ppm"),
        )
        .orderBy("doc_id")
    )


TEXT_BIGRAM_SCORE_SQL = r"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS l FROM documents
),
dbg AS (
  SELECT doc_id, u.bg[1] AS w1, u.bg[2] AS w2
  FROM (SELECT doc_id, unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS bg
        FROM t) u
),
bg AS (SELECT w1, w2, COUNT(*) AS cnt FROM dbg GROUP BY 1, 2),
ctx AS (SELECT w1, SUM(cnt) AS ctx_cnt FROM bg GROUP BY 1),
v AS (SELECT COUNT(DISTINCT u.w) AS vs FROM (SELECT unnest(l) AS w FROM t) u),
lm AS (
  SELECT bg.w1, bg.w2,
         CAST(ROUND(1000000.0 * (bg.cnt + 1) / (ctx.ctx_cnt + v.vs))
              AS BIGINT) AS p_ppm
  FROM bg JOIN ctx ON bg.w1 = ctx.w1, v
)
SELECT d.doc_id,
       COUNT(*) AS n_bigrams,
       CAST(SUM(lm.p_ppm) AS BIGINT) AS sum_ppm,
       ROUND(CAST(SUM(lm.p_ppm) AS BIGINT) * 1.0 / COUNT(*), 3) AS mean_ppm
FROM dbg d JOIN lm ON d.w1 = lm.w1 AND d.w2 = lm.w2
GROUP BY d.doc_id ORDER BY d.doc_id
"""


# --- TF-IDF distinctive terms -------------------------------------------------

TFIDF_TOP_K = 3


def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document most-distinctive terms, TF-IDF style: rank each doc's
    terms by term frequency descending, document frequency ascending
    (rarer = more distinctive), term ascending — the float-free ordering
    equivalent of tf·idf for ranking purposes (idf is monotone-decreasing
    in df), so the result is bit-exact across engines with no ln() in the
    compared columns.

    Scale shape: explode → (doc, term) count is a map-side-combinable
    aggregation; the df table is vocabulary-sized (≪ corpus), and the
    tf⋈df join shuffles two PRE-AGGREGATED relations on term — never raw
    token rows.  The per-doc top-k window partitions by doc_id with
    per-partition state bounded by one doc's vocabulary, and Spark plans
    it as WindowGroupLimit (rank pushdown) so no doc's full term list
    survives the shuffle."""
    from pyspark.sql import Window as W

    docs = read_table(spark, "documents", sf_dir)
    terms = docs.select("doc_id", F.explode(_tokens()).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = W.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("df"), F.asc("term")
    )
    return (
        tf.join(dfreq, "term")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TFIDF_TOP_K)
        .select("doc_id", "rank", "term", "tf", "df")
        .orderBy("doc_id", "rank")
    )


TEXT_TFIDF_TOP_TERMS_SQL = rf"""
WITH terms AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY doc_id, term),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
ranked AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
         ROW_NUMBER() OVER (
           PARTITION BY tf.doc_id
           ORDER BY tf.tf DESC, dfreq.df ASC, tf.term ASC
         ) AS rank
  FROM tf JOIN dfreq USING (term)
)
SELECT doc_id, rank, term, tf, df FROM ranked
WHERE rank <= {TFIDF_TOP_K}
ORDER BY doc_id, rank
"""


QUERIES: dict[str, tuple] = {
    "text_token_stats": (text_token_stats, TEXT_TOKEN_STATS_SQL),
    "text_tfidf_top_terms": (text_tfidf_top_terms, TEXT_TFIDF_TOP_TERMS_SQL),
    "text_dup_ngram_fraction": (text_dup_ngram_fraction, TEXT_DUP_NGRAM_SQL),
    "text_bigram_score": (text_bigram_score, TEXT_BIGRAM_SCORE_SQL),
    "text_vocab_coverage": (text_vocab_coverage, TEXT_VOCAB_COVERAGE_SQL),
    "text_bigram_lm": (text_bigram_lm, TEXT_BIGRAM_LM_SQL),
    "text_quality_score": (text_quality_score, TEXT_QUALITY_SCORE_SQL),
    "text_langid_heuristic": (text_langid_heuristic, TEXT_LANGID_SQL),
    "text_fingerprint": (text_fingerprint, TEXT_FINGERPRINT_SQL),
    "text_bpe_token_count": (text_bpe_token_count, TEXT_BPE_SQL),
    "text_rolling_hash": (text_rolling_hash, TEXT_ROLLING_HASH_SQL),
}
