"""Semantic tests for the dedup operators on crafted corpora (the driver's
oracle can't check MinHash — hash functions are engine-specific — so these
pin the behavior instead)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hopspark.operators.dedup import (
    minhash_bands,
    minhash_signature,
    shingle_set,
)


@pytest.fixture(scope="module")
def corpus(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away home"
    near = base.replace("lazy", "sleepy")  # one-token change → high jaccard
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, near),  # near dup of 1
        (4, "completely different content about spark query engines and planners"),
        (5, "another unrelated document mentioning catalyst optimizer rules only"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_shingles(corpus):
    row = corpus.filter(F.col("doc_id") == 1).select(
        shingle_set().alias("sh")
    ).head()
    assert "the quick brown" in row.sh
    assert all(len(s.split(" ")) == 3 for s in row.sh)


def test_minhash_identical_docs_equal_signatures(corpus):
    sigs = (
        corpus.select("doc_id", minhash_signature(shingle_set()).alias("sig"))
        .orderBy("doc_id")
        .collect()
    )
    by_id = {r.doc_id: r.sig for r in sigs}
    assert by_id[1] == by_id[2]
    assert by_id[1] != by_id[4]
    # near-dup shares most minhashes
    shared = sum(a == b for a, b in zip(by_id[1], by_id[3]))
    assert shared >= 8, f"only {shared}/16 minhashes shared for near-dup"


def test_lsh_banding_finds_near_dups(spark, corpus):
    sh = corpus.select("doc_id", shingle_set().alias("shingles"))
    sig = sh.select("doc_id", minhash_signature(F.col("shingles")).alias("sig"))
    banded = sig.select(
        "doc_id", F.explode(minhash_bands(F.col("sig"))).alias("band_hash")
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = {
        (r.x, r.y)
        for r in a.join(
            b,
            (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("x"), F.col("b.doc_id").alias("y"))
        .distinct()
        .collect()
    }
    assert (1, 2) in pairs  # exact dup must always collide
    assert (1, 3) in pairs or (2, 3) in pairs  # near-dup should collide
    assert (4, 5) not in pairs  # unrelated docs must not


def test_exact_dedup_on_testdata(spark, sf_dir):
    from hopspark.operators.dedup import dedup_exact_groups, dedup_exact_keep_first

    groups = dedup_exact_groups(spark, sf_dir)
    kept = dedup_exact_keep_first(spark, sf_dir)
    assert groups.count() == kept.count()  # one keeper per fingerprint


def test_simhash_detects_high_jaccard_pairs(spark, sf_dir):
    """SimHash candidates must recover most exact high-Jaccard near-dups
    (it is a candidate generator: recall matters, perfect precision not)."""
    from hopspark.operators.dedup import dedup_minhash_candidates, dedup_simhash

    mh = {
        (r.doc_a, r.doc_b)
        for r in dedup_minhash_candidates(spark, sf_dir).collect()
        if r.jaccard >= 0.95
    }
    sh = {(r.doc_a, r.doc_b) for r in dedup_simhash(spark, sf_dir).collect()}
    assert sh, "simhash found no candidate pairs"
    if mh:
        recall = len(mh & sh) / len(mh)
        assert recall >= 0.7, f"simhash recall {recall:.2f} over {len(mh)} pairs"


def test_embedding_cosine_scores_bounded(spark, sf_dir):
    from hopspark.operators.dedup import dedup_embedding_cosine

    rows = dedup_embedding_cosine(spark, sf_dir).collect()
    assert rows
    assert all(-1.0001 <= r.cos_sim <= 1.0001 for r in rows)
    assert all(r.is_near_dup == (r.cos_sim >= 0.9) for r in rows)
