"""Semantic unit tests for the curation operators on crafted inputs the
synthetic corpus can't exercise (real PII strings, capacity-edge packing,
genuine gaps). The oracle-parity test covers the registered queries
differentially; these pin behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from hopspark.operators.curation import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    PACK_CAPACITY,
    pii_redact_text,
)


def test_pii_redaction_classes(spark):
    df = spark.createDataFrame(
        [
            ("mail me at bob.smith+x@example.co.uk today",),
            ("ssn 123-45-6789 phone 555-867-5309 ip 10.0.255.1",),
            ("clean text with no identifiers at all",),
            ("version 1.2.3.4.5 is not an ip boundary case",),
        ],
        "text string",
    )
    out = [r["red"] for r in df.select(pii_redact_text(F.col("text")).alias("red")).collect()]
    assert out[0] == "mail me at <EMAIL> today"
    assert out[1] == "ssn <SSN> phone <PHONE> ip <IPV4>"
    assert out[2] == "clean text with no identifiers at all"
    # 1.2.3.4.5: the first four octets match the \b-delimited ipv4 pattern
    # (the trailing .5 is outside the match) — documented greedy behavior.
    assert "<IPV4>" in out[3]


def test_pack_capacity_never_exceeded_and_order_kept(spark):
    # Doc lengths chosen to force pack breaks: 100+100 fits (200<=256),
    # +100 overflows -> new pack; a 300-token doc exceeds capacity alone
    # and must still land in its own pack.
    rows = [(i, "w " * n) for i, n in enumerate([100, 100, 100, 300, 10])]
    df = spark.createDataFrame(rows, "doc_id long, text string").select(
        F.lit("s").alias("source"), "doc_id", "text"
    )

    import os
    import tempfile

    from hopspark.operators import curation

    d = tempfile.mkdtemp()
    df.select(
        "doc_id", "text", F.lit("en").alias("lang"), F.col("source"),
        F.length("text").alias("n_chars"),
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = curation.pack_sequences(spark, d).collect()
    by_doc = {r["doc_id"]: r for r in out}
    assert [by_doc[i]["pack_id"] for i in range(5)] == [0, 0, 1, 2, 3]
    assert [by_doc[i]["pack_pos"] for i in range(5)] == [0, 1, 0, 0, 0]
    # capacity invariant: sum of tokens per pack <= capacity unless the
    # pack is a single oversized doc
    sums: dict = {}
    for r in out:
        sums.setdefault(r["pack_id"], []).append(r["n_tokens"])
    for toks in sums.values():
        assert sum(toks) <= PACK_CAPACITY or len(toks) == 1


def test_chunk_overlap_windows(spark):
    import os
    import tempfile

    from hopspark.operators import curation

    n = 80
    text = " ".join(f"t{i}" for i in range(n))
    d = tempfile.mkdtemp()
    spark.createDataFrame(
        [(1, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    rows = sorted(
        curation.text_chunk_overlap(spark, d).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # starts: 1, 25, 49, 73 (stride 24, last start <= n - (W - stride) = 72
    # -> 73 included because sequence stop is n - 8 = 72? start grid is
    # 1 + k*24 <= 72 -> 1, 25, 49; tail covered to token 80 by chunk at 49?
    # 49+31 = 80 exactly -> full coverage with 3 chunks.
    assert [r["chunk_idx"] for r in rows] == [0, 1, 2]
    assert [r["n_tokens"] for r in rows] == [CHUNK_TOKENS, CHUNK_TOKENS, CHUNK_TOKENS]
    # consecutive chunks overlap by W - stride tokens
    assert CHUNK_TOKENS - CHUNK_STRIDE == 8


def test_gapfill_fills_missing_hours(spark):
    import os
    import tempfile

    from hopspark.operators import curation

    d = tempfile.mkdtemp()
    # the testdata events table stores ts as raw int64 nanoseconds (see
    # hopspark/catalog.py); mirror that layout in the fixture
    spark.createDataFrame(
        [
            (1, "2024-01-01 00:10:00", 7, "click", 1.0, "{}"),
            (2, "2024-01-01 03:20:00", 7, "click", 3.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn(
        "ts", (F.unix_micros(F.to_timestamp("ts")) * 1000).cast("long")
    ).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    rows = curation.events_gapfill_downsample(spark, d).collect()
    assert len(rows) == 4  # hours 00..03 inclusive, gaps filled
    counts = [r["n_events"] for r in rows]
    assert counts == [1, 0, 0, 1]
    assert rows[1]["avg_value"] is None and rows[2]["avg_value"] is None


def test_source_cap_semantics(spark, sf_dir):
    """No source exceeds SOURCE_CAP kept docs; dropped = docs - kept;
    shares are kept/total and sum to ~1 over all sources."""
    from hopspark.operators.curation import SOURCE_CAP, curation_source_cap

    rows = [r.asDict() for r in curation_source_cap(spark, sf_dir).collect()]
    assert rows, "expected at least one source"
    total_kept = sum(r["n_kept"] for r in rows)
    for r in rows:
        assert r["n_kept"] <= SOURCE_CAP
        assert r["n_kept"] <= r["n_docs"]
        assert r["n_dropped"] == r["n_docs"] - r["n_kept"]
        assert abs(r["share_after"] - r["n_kept"] / total_kept) < 1e-6
    assert abs(sum(r["share_after"] for r in rows) - 1.0) < 1e-4


def test_source_cap_is_partitioned_topn(spark, sf_dir):
    """The per-source rank filter must compile to WindowGroupLimit so a
    billion-doc source ships top-K per scan task, not its whole
    partition (InferWindowGroupLimit; reference topn-node.h)."""
    import io
    from contextlib import redirect_stdout

    from hopspark.operators.curation import curation_source_cap

    buf = io.StringIO()
    with redirect_stdout(buf):
        curation_source_cap(spark, sf_dir).explain("formatted")
    assert "WindowGroupLimit" in buf.getvalue()
