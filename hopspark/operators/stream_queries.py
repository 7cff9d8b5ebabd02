"""Streaming queries surfaced through the driver gate.

The reference has no streaming subsystem (SURVEY.md §2.10) — this extension
runs Structured Streaming jobs to completion over the bounded events file
stream and returns the final state as a batch DataFrame, so the SAME DuckDB
oracle that checks the batch operator checks the streaming path: a
stream/batch-agreement proof inside the correctness gate, not just a unit
test.

Scale notes: the file source feeds micro-batches (maxFilesPerTrigger=1);
state lives in the streaming state store keyed by (window, event_type) —
bounded by the key space, not the row count; the watermark bounds how long
late rows keep state alive on an unbounded stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def streaming_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window hourly rollup executed as a STREAM to
    completion (memory sink, complete mode), returned as the final
    snapshot. Matches the batch `events_hourly_rollup` oracle exactly —
    the value sum keeps the exact-decimal discipline so stream/batch/oracle
    agree bit-for-bit."""
    from hopspark.streaming.windows import stream_events

    ev = stream_events(spark, sf_dir)
    counts = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(14,4)"))
            .cast("double")
            .alias("value_sum"),
        )
    )
    qname = "hopspark_stream_hourly_rollup"
    q = (
        counts.writeStream.format("memory")
        .queryName(qname)
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.table(qname)
        .select(
            F.col("w.start").alias("hour"),
            "event_type",
            "n",
            "value_sum",
        )
        .orderBy("hour", "event_type")
    )


STREAMING_HOURLY_SQL = """
SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(14,4))) AS DOUBLE) AS value_sum
FROM events
GROUP BY 1, 2
ORDER BY hour, event_type
"""


QUERIES: dict[str, tuple] = {
    "streaming_hourly_rollup": (streaming_hourly_rollup, STREAMING_HOURLY_SQL),
}
