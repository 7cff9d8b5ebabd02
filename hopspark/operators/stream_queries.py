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
    from hopspark.streaming.windows import (
        run_stream_to_completion,
        stream_state_partitions,
    )

    snap = run_stream_to_completion(
        spark, counts, "hopspark_stream_hourly_rollup", "complete",
        stream_state_partitions(sf_dir),
    )
    return (
        snap
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


def streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-timeout sessionization executed as a STREAM via native
    `session_window` (state-store-merged across micro-batches), returned
    as the final snapshot with per-user session numbering — checked by the
    same lag+cumsum gaps-and-islands oracle as the batch operator.

    Boundary alignment: the batch rule starts a new session when the gap
    EXCEEDS 1800s, and `session_window` merges events with gap <= the
    window size (verified empirically on an exactly-1801s gap) — so the
    same 1800s constant aligns the two rules exactly. Session numbering
    runs on the tiny final snapshot, not the stream."""
    from pyspark.sql import Window as W

    from hopspark.streaming.windows import stream_events

    ev = stream_events(spark, sf_dir).select(
        "user_id", F.date_trunc("second", "ts").alias("ts")
    )
    sessions = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "1800 seconds").alias("w"), "user_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    from hopspark.streaming.windows import (
        run_stream_to_completion,
        stream_state_partitions,
    )

    snap = run_stream_to_completion(
        spark, sessions, "hopspark_stream_sessionize", "complete",
        stream_state_partitions(sf_dir),
    )
    order = W.partitionBy("user_id").orderBy("session_start")
    return (
        snap.select(
            "user_id",
            F.row_number().over(order).alias("session_no"),
            "session_start",
            "session_end",
            "n_events",
        )
        .orderBy("user_id", "session_no")
    )


STREAMING_SESSIONIZE_SQL = """
WITH e AS (
  SELECT user_id, date_trunc('second', CAST(ts AS TIMESTAMP)) AS ts,
         event_id
  FROM events
),
flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
              OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id)) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM e
),
sess AS (
  -- event_id carried into this ORDER BY so the cumulative sum walks rows in
  -- the SAME order the lag-based new_sess flag was computed: with ts-only
  -- ordering, second-truncated ts ties let DuckDB place a new_sess=0 row
  -- before its session-opening new_sess=1 sibling, shifting it into the
  -- previous session and flaking the gate nondeterministically.
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_no
  FROM flagged
)
SELECT user_id, CAST(session_no AS INT) AS session_no,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       COUNT(*) AS n_events
FROM sess
GROUP BY user_id, session_no
ORDER BY user_id, session_no
"""


def streaming_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING exact dedup — `dropDuplicates` over the key columns with
    the dedup state in the streaming state store, run to completion and
    returned as the surviving key set. The LLM-pipeline dedup operators
    (operators/dedup.py) in continuous-ingestion form: first occurrence
    wins, every later duplicate is dropped in-flight.

    Scale note: keyed-only dropDuplicates holds one state row per distinct
    key forever — right for bounded backfill; an unbounded 100 TB/day feed
    uses `dropDuplicatesWithinWatermark` so keys age out with the
    watermark (documented trade-off: dedup guarantee then only spans the
    watermark horizon). Output = just the keys, so which physical row
    survived never affects the result."""
    from hopspark.streaming.windows import stream_events

    ev = stream_events(spark, sf_dir)
    deduped = ev.dropDuplicates(["user_id", "event_type"]).select(
        "user_id", "event_type"
    )
    from hopspark.streaming.windows import (
        run_stream_to_completion,
        stream_state_partitions,
    )

    snap = run_stream_to_completion(
        spark, deduped, "hopspark_stream_dedup_keys", "append",
        stream_state_partitions(sf_dir),
    )
    return snap.orderBy("user_id", "event_type")


STREAMING_DEDUP_SQL = """
SELECT DISTINCT user_id, event_type
FROM events
ORDER BY user_id, event_type
"""


def streaming_view_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM interval join: each view joined to the same user's
    purchases within the following hour — both sides watermarked so the
    join state is bounded by the interval + watermark, the canonical
    Structured Streaming attribution join. Run to completion; the same
    pairs a batch range-join produces, so the DuckDB oracle is exact."""
    from hopspark.streaming.windows import stream_events

    views = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select("user_id", F.col("ts").alias("view_ts"))
        .withWatermark("view_ts", "1 hour")
    )
    buys = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("buyer_id"), F.col("ts").alias("buy_ts"))
        .withWatermark("buy_ts", "1 hour")
    )
    joined = views.join(
        buys,
        F.expr(
            "user_id = buyer_id AND "
            "buy_ts >= view_ts AND buy_ts <= view_ts + INTERVAL 1 HOUR"
        ),
    ).select("user_id", "view_ts", "buy_ts")
    from hopspark.streaming.windows import (
        run_stream_to_completion,
        stream_state_partitions,
    )

    snap = run_stream_to_completion(
        spark, joined, "hopspark_stream_vp_join", "append",
        stream_state_partitions(sf_dir),
    )
    return snap.orderBy("user_id", "view_ts", "buy_ts")


STREAMING_VP_JOIN_SQL = """
SELECT v.user_id, v.ts AS view_ts, p.ts AS buy_ts
FROM events v
JOIN events p
  ON v.user_id = p.user_id
 AND v.event_type = 'view' AND p.event_type = 'purchase'
 AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
ORDER BY v.user_id, view_ts, buy_ts
"""


QUERIES: dict[str, tuple] = {
    "streaming_hourly_rollup": (streaming_hourly_rollup, STREAMING_HOURLY_SQL),
    "streaming_sessionize": (streaming_sessionize, STREAMING_SESSIONIZE_SQL),
    "streaming_dedup_keys": (streaming_dedup_keys, STREAMING_DEDUP_SQL),
    "streaming_view_purchase_join": (
        streaming_view_purchase_join,
        STREAMING_VP_JOIN_SQL,
    ),
}
