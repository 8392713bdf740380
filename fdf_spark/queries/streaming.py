"""Streaming-surface queries (SURVEY §2.9), oracle-checked by batch
equivalence: the windowed aggregations run as REAL micro-batch
streaming queries (file source → memory sink) inside the query
function; the DuckDB oracle is the relational twin of the same window
math. With the full fixture present, stream result == batch result —
that equivalence is exactly what the driver verifies.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from fdf_spark.functions.scalar import dsum, sql_dsum
from fdf_spark.queries import query
from fdf_spark.sources.tables import load_table as T
from fdf_spark.streaming.events import (
    event_stream,
    run_stream_to_batch,
    session_agg,
    sliding_agg,
    stream_stream_join,
    tumbling_agg,
)

SQL_WINDOW_AGG = f"""
  COUNT(*) AS n_events, {sql_dsum('value')} AS total_value
"""


@query(
    "q50_tumbling_window",
    f"""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           CAST(date_trunc('hour', ts) + INTERVAL 1 HOUR AS TIMESTAMP) AS window_end,
           event_type, {SQL_WINDOW_AGG}
    FROM events
    GROUP BY 1, 2, 3
    ORDER BY window_start, event_type
    """,
    operators=("ST1", "ST3", "S7"),
    doc="Tumbling 1h windows per event_type, executed as a real Structured "
    "Streaming query (parquet file source → memory sink); oracle is the "
    "batch twin.",
)
def q50_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = event_stream(spark, os.path.join(sf_dir, "events.parquet"))
    out = run_stream_to_batch(spark, tumbling_agg(stream.withWatermark("ts", "10 minutes")))
    return out.orderBy("window_start", "event_type")


@query(
    "q51_sliding_window",
    f"""
    WITH offs AS (SELECT unnest(range(2)) AS o),
    win AS (
      SELECT make_timestamp(((epoch_us(ts) // 1800000000) - o) * 1800000000) AS window_start,
             event_type, value
      FROM events CROSS JOIN offs)
    SELECT window_start,
           CAST(window_start + INTERVAL 1 HOUR AS TIMESTAMP) AS window_end,
           event_type, {SQL_WINDOW_AGG}
    FROM win
    GROUP BY 1, 2, 3
    ORDER BY window_start, event_type
    """,
    operators=("ST3",),
    doc="Sliding windows (1h width, 30m slide): every event in 2 windows; "
    "oracle materializes the window set relationally.",
)
def q51_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    return sliding_agg(ev).orderBy("window_start", "event_type")


@query(
    "q52_session_window",
    f"""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE OR
                       LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sessions AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM marked)
    SELECT MIN(ts) AS session_start,
           CAST(MAX(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
           user_id, {SQL_WINDOW_AGG}
    FROM sessions
    GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
    operators=("ST3",),
    doc="Gap-based session windows per user (session_window ≡ lag/cumsum "
    "sessionization; end = last event + gap).",
)
def q52_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    return session_agg(ev).orderBy("user_id", "session_start")


@query(
    "q54_stateful_dedup_count",
    """
    SELECT CAST(COUNT(DISTINCT sha256(text)) AS BIGINT) AS n_unique FROM documents
    """,
    operators=("ST1", "ST3", "ST5", "N1"),
    doc="Custom stateful streaming operator (applyInPandasWithState): "
    "first-seen content-hash filter over a document stream; the emitted "
    "row count must equal the batch COUNT(DISTINCT hash) whatever the "
    "micro-batch slicing — that invariant is the oracle.",
)
def q54_stateful_dedup_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fdf_spark.llm.hashing import portable_hash60
    from fdf_spark.streaming.events import file_stream
    from fdf_spark.streaming.stateful import running_dedup

    # footer-derived schema: survives fixture column re-encodes/reorders
    path = os.path.join(sf_dir, "documents.parquet")
    docs = file_stream(spark, path).select(
        (portable_hash60(F.col("text")) % 64).cast("int").alias("bucket"),
        "doc_id",
        F.sha2("text", 256).alias("content_hash"),
    )
    out = run_stream_to_batch(spark, running_dedup(docs), output_mode="append")
    return out.agg(F.count("*").alias("n_unique"))


@query(
    "q53_stream_event_decode",
    """
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(((event_id >> 0) & 255)
              + ((event_id >> 8) & 255) * 256
              + ((event_id >> 16) & 255) * 65536
              + ((event_id >> 24) & 255) * 16777216 AS BIGINT)) AS BIGINT) AS shot_sum
    FROM events WHERE event_id < 4294967296
    GROUP BY event_type ORDER BY event_type
    """,
    operators=("S7", "S8", "ST1", "ST2", "F9", "A7"),
    doc="Streaming consume + payload byte-codec: run the event-decode "
    "aggregation through a real micro-batch stream (wfevent's decode, "
    "factory.py:317, applied in bulk).",
)
def q53_stream_event_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fdf_spark.functions.scalar import decode_shot_bytes, encode_shot_bytes

    stream = event_stream(spark, os.path.join(sf_dir, "events.parquet"))
    decoded = (
        stream.filter(F.col("event_id") < 2**32)
        .withColumn("shot", decode_shot_bytes(encode_shot_bytes(F.col("event_id"))))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("shot").alias("shot_sum"))
    )
    return run_stream_to_batch(spark, decoded).orderBy("event_type")


@query(
    "q55_stream_stream_join",
    """
    SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
           CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS gap_us
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    ORDER BY click_id, purchase_id
    """,
    operators=("ST1", "ST3", "ST4", "S7", "J7"),
    doc="Stream-stream interval self-join, run as a real micro-batch "
    "streaming query: each click paired with the same user's purchases "
    "in the following 30 minutes. Watermarks on both branches + the "
    "time bound in the join condition let Spark expire join state, so "
    "per-side buffers hold only the watermark+interval horizon — the "
    "property that makes two unbounded streams joinable at all. Oracle "
    "is the batch interval join of the same relation.",
)
def q55_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = event_stream(spark, os.path.join(sf_dir, "events.parquet"))
    joined = stream_stream_join(stream)
    return run_stream_to_batch(spark, joined, output_mode="append").orderBy(
        "click_id", "purchase_id"
    )


@query(
    "q113_stream_static_enrich",
    f"""
    SELECT e.event_type, c.c_mktsegment AS segment,
           COUNT(*) AS n_events, {sql_dsum('e.value')} AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY e.event_type, c.c_mktsegment
    ORDER BY event_type, segment
    """,
    operators=("ST1", "ST3", "S7", "J2"),
    doc="Stream-static enrichment: the events STREAM joined to the "
    "static customer dimension (broadcast per micro-batch — the stream "
    "is never shuffled, no join state to watermark), then a per "
    "(event_type, segment) revenue rollup. Run as a real micro-batch "
    "query into a memory sink; the oracle is the batch twin of the "
    "same join+agg.",
)
def q113_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fdf_spark.streaming.events import enrich_stream

    stream = event_stream(spark, os.path.join(sf_dir, "events.parquet"))
    dim = T(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
    )
    enriched = enrich_stream(stream, dim, "user_id").groupBy("event_type", "segment").agg(
        F.count("*").alias("n_events"), dsum("value").alias("total_value")
    )
    return run_stream_to_batch(spark, enriched).orderBy("event_type", "segment")


@query(
    "q149_stream_left_outer_join",
    """
    WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
         p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
         wm AS (SELECT least((SELECT max(ts) FROM c), (SELECT max(ts) FROM p))
                       - INTERVAL 10 MINUTE AS w)
    SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
           CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS gap_us
    FROM c JOIN p
      ON c.user_id = p.user_id
     AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    UNION ALL
    SELECT c.event_id, CAST(NULL AS BIGINT), c.user_id, CAST(NULL AS BIGINT)
    FROM c, wm
    WHERE NOT EXISTS (SELECT 1 FROM p
                      WHERE p.user_id = c.user_id
                        AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE)
      AND c.ts + INTERVAL 30 MINUTE < wm.w
    ORDER BY click_id, purchase_id
    """,
    operators=("ST1", "ST3", "ST4", "S7", "J7"),
    doc="Watermarked stream-stream LEFT OUTER interval join — the "
    "funnel query ('clicks with no purchase'), run as a real "
    "micro-batch streaming query. A click with no purchase in its "
    "30-minute window emits with NULL purchase columns, but ONLY once "
    "the global watermark (min over both branches of max-event-time "
    "minus the 10-minute delay) passes the click's last possible match "
    "time: on an unbounded stream 'no purchase' is unknowable until "
    "the watermark rules a late match out, so clicks younger than the "
    "horizon at end-of-input emit nothing. The oracle replays that "
    "state-expiry rule RELATIONALLY — inner join UNION ALL "
    "anti-join-filtered clicks older than the horizon — which turns "
    "the watermark semantics themselves into an oracle-checked "
    "contract (the inner tier is q55; the null tier is new state "
    "machinery: per-row eviction with null emission at expiry).",
)
def q149_stream_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = event_stream(spark, os.path.join(sf_dir, "events.parquet"))
    joined = stream_stream_join(stream, how="left_outer")
    return run_stream_to_batch(spark, joined, output_mode="append").orderBy(
        "click_id", "purchase_id"
    )
