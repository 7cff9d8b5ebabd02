"""Streaming extension: the windowed stream agg must equal its batch twin
when run with availableNow over the same files (backfill equivalence)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from hopspark.catalog import read_table
from hopspark.streaming.windows import stream_events, windowed_event_counts

CKPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".pytest_tmp_stream"
)


@pytest.fixture()
def ckpt_dir():
    os.makedirs(CKPT, exist_ok=True)
    yield CKPT
    shutil.rmtree(CKPT, ignore_errors=True)


def test_stream_window_equals_batch(spark, sf_dir, ckpt_dir):
    stream = stream_events(spark, sf_dir)
    assert stream.isStreaming

    agg = windowed_event_counts(stream, window="1 hour", watermark="30 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(ckpt_dir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.sql(
        "SELECT window_start, event_type, n FROM win_counts ORDER BY window_start, event_type"
    ).collect()

    batch = (
        read_table(spark, "events", sf_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
        .orderBy("window_start", "event_type")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in batch]
    assert len(got) > 0


def test_session_windows_stream_equals_batch(spark, sf_dir, ckpt_dir):
    """Gap-timeout sessionization: streaming state-store result must equal
    the batch session_window over the same files."""
    from hopspark.streaming.windows import sessionized_counts

    stream = sessionized_counts(stream_events(spark, sf_dir), gap="30 minutes")
    q = (
        stream.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(ckpt_dir, "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT user_id, session_start, n_events FROM sessions "
        "ORDER BY user_id, session_start"
    ).collect()

    batch = (
        sessionized_counts(read_table(spark, "events", sf_dir), gap="30 minutes")
        .select("user_id", "session_start", "n_events")
        .orderBy("user_id", "session_start")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in batch]
    assert len(got) > 0
