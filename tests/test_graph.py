"""Unit tests for the exact similarity join + connected components.

The oracle-parity test already hash-checks both registered queries against a
brute-force + recursive-CTE DuckDB oracle; these tests pin the component
semantics on crafted graphs (shapes sf0.001 may not contain) and prove the
prefix-filtered join is *exact* (identical edge set to all-pairs) on a corpus
engineered with near-duplicates, a hot boilerplate shingle, and singletons.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hopspark.operators.graph import connected_components, similarity_join_edges


def _cc_labels(spark, edges):
    df = spark.createDataFrame(edges, "u long, v long")
    rows = connected_components(df).collect()
    return {r["node"]: r["component"] for r in rows}


def test_cc_chain_collapses_to_min(spark):
    # 1-2-3-4-5 chain: every node labels 1. Chains are the worst case for
    # naive propagation; star-contraction closes them in O(log n) rounds.
    labels = _cc_labels(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_cc_multiple_components_and_cycle(spark):
    labels = _cc_labels(
        spark,
        [(10, 20), (20, 30), (30, 10), (7, 8), (100, 101)],
    )
    assert labels == {10: 10, 20: 10, 30: 10, 7: 7, 8: 7, 100: 100, 101: 100}


def test_cc_duplicate_and_reversed_edges(spark):
    labels = _cc_labels(spark, [(2, 1), (1, 2), (2, 1), (3, 2)])
    assert labels == {1: 1, 2: 1, 3: 1}


def _shingle_df(spark, docs):
    rows = [(i, set(words.split())) for i, words in docs]
    return spark.createDataFrame(
        [(i, sorted(s), len(s)) for i, s in rows],
        "doc_id long, sh array<string>, sz int",
    )


def _brute_force_pairs(docs, threshold):
    items = [(i, set(w.split())) for i, w in docs]
    out = set()
    for ai, (ia, sa) in enumerate(items):
        for ib, sb in items[ai + 1 :]:
            j = len(sa & sb) / len(sa | sb)
            if j >= threshold:
                out.add((min(ia, ib), max(ia, ib)))
    return out


def test_similarity_join_matches_brute_force(spark):
    # Corpus with exact dups, near-dups, a hot shingle ("the" in every doc),
    # and unrelated docs. Prefix filtering must lose nothing vs all-pairs.
    docs = [
        (1, "the quick brown fox jumps over lazy dog"),
        (2, "the quick brown fox jumps over lazy cat"),
        (3, "the quick brown fox jumps over lazy dog"),
        (4, "the slow green turtle walks under busy bridge"),
        (5, "the slow green turtle walks under busy tunnel"),
        (6, "the completely unrelated document about spark engines"),
        (7, "the completely unrelated document about spark engines"),
        (8, "the onlyword"),
    ]
    threshold = 0.8
    got = {
        (r["doc_a"], r["doc_b"])
        for r in similarity_join_edges(_shingle_df(spark, docs), threshold).collect()
    }
    assert got == _brute_force_pairs(docs, threshold)


def test_similarity_join_jaccard_values_exact(spark):
    docs = [(1, "a b c d e"), (2, "a b c d f"), (3, "a b c d e")]
    out = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in similarity_join_edges(_shingle_df(spark, docs), 0.6).collect()
    }
    # |{a..e} ∩ {a..d,f}| = 4, union = 6
    assert abs(out[(1, 2)] - 4 / 6) < 1e-12
    assert out[(1, 3)] == 1.0
    assert abs(out[(2, 3)] - 4 / 6) < 1e-12


def test_similarity_join_no_self_or_reverse_pairs(spark):
    docs = [(1, "x y z"), (2, "x y z")]
    rows = similarity_join_edges(_shingle_df(spark, docs), 0.5).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in rows] == [(1, 2)]


def test_posting_stats_audits_hot_shingle_drops(spark):
    """POSTING_CAP audit (round-2 verdict item): a ubiquitous shingle must be
    counted as hot, and the only docs flagged at-risk are those whose true
    (uncapped) prefix contains it — the docs whose pairs the cap can drop."""
    from hopspark.operators.graph import posting_stats_from_shingles

    HOT = 999
    rows = [
        # four 4-shingle docs sharing HOT plus three rare shingles each:
        # prefix_len = 4 - ceil(0.8*4) + 1 = 1, rarest-first ordering puts a
        # df=1 shingle in the prefix, so HOT never enters their prefixes.
        (1, [HOT, 11, 12, 13]),
        (2, [HOT, 21, 22, 23]),
        (3, [HOT, 31, 32, 33]),
        (4, [HOT, 41, 42, 43]),
        # single-shingle doc: its prefix IS the hot shingle -> at risk.
        (5, [HOT]),
    ]
    sh = spark.createDataFrame(rows, "doc_id long, sh array<long>").withColumn(
        "sz", F.size("sh")
    )
    stats = posting_stats_from_shingles(sh, threshold=0.8, cap=3).head()
    assert stats.n_shingles == 13
    assert stats.n_hot_shingles == 1  # HOT has df=5 > cap=3
    assert stats.max_df == 5
    assert stats.n_docs == 5
    assert stats.n_docs_prefix_at_risk == 1  # only doc 5
