"""Streaming semantics that batch equivalence can't cover: the event
bus round-trip (setevent → wfevent), late-data watermark drop across
micro-batches, and stream/batch window agreement."""

from __future__ import annotations

import os
import threading
import time

import pytest
from pyspark.sql import functions as F

from fdf_spark.sources.tables import load_table
from fdf_spark.streaming.events import (
    event_stream,
    run_stream_to_batch,
    setevent,
    tumbling_agg,
    wfevent,
)
from tests.conftest import SMOKE_DIR


def test_event_bus_roundtrip(spark, tmp_path):
    bus = str(tmp_path / "bus")
    os.makedirs(bus)
    # publisher fires shortly after the consumer starts blocking
    t = threading.Thread(
        target=lambda: (time.sleep(1.0), setevent(spark, bus, "new_shot", 141000))
    )
    t.start()
    shot = wfevent(spark, bus, "new_shot", timeout_sec=30.0)
    t.join()
    assert shot == 141000  # factory.py:298-299 encode → :317 decode


def test_wfevent_timeout(spark, tmp_path):
    bus = str(tmp_path / "bus2")
    os.makedirs(bus)
    setevent(spark, bus, "other_event", 1)
    assert wfevent(spark, bus, "wanted_event", timeout_sec=3.0) is None


def test_stream_schema_matches_batch(spark):
    """Batch loader and streaming source must agree on the decoded events
    schema (ts = microsecond TIMESTAMP) whatever the fixture's physical
    parquet encoding — the round-3 regression (stale hardcoded
    int64-nanos stream schema vs a re-encoded timestamp[us] fixture)
    fails here loudly instead of as a wrong-answer window query."""
    batch = load_table(spark, SMOKE_DIR, "events")
    stream = event_stream(spark, os.path.join(SMOKE_DIR, "events.parquet"))
    assert stream.schema == batch.schema


def test_stream_batch_equivalence(spark):
    ev = load_table(spark, SMOKE_DIR, "events")
    batch = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["total_value"])
        for r in tumbling_agg(ev).collect()
    }
    stream = event_stream(spark, os.path.join(SMOKE_DIR, "events.parquet"))
    streamed = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["total_value"])
        for r in run_stream_to_batch(spark, tumbling_agg(stream)).collect()
    }
    assert batch == streamed


def test_watermark_drops_late_data(spark, tmp_path):
    """Batch 1 advances the watermark to 12:49 (max 12:59 − 10 min); batch 2
    then carries an event at 10:10 — beyond the watermark — which must be
    dropped, so the 10:00 window never updates past n_events=1. Update
    output mode makes the drop observable deterministically (every state
    change emits a row; an accepted late event would emit n_events=2)."""
    src = str(tmp_path / "late_src")
    os.makedirs(src)
    from datetime import datetime

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    mk = lambda rows: spark.createDataFrame(rows, schema)
    on_time = [(1, datetime(2024, 1, 1, 10, 5), 1, "click", 1.0, "{}"),
               (2, datetime(2024, 1, 1, 12, 59), 1, "click", 1.0, "{}")]
    late = [(3, datetime(2024, 1, 1, 10, 10), 1, "click", 1.0, "{}")]  # 2h39m late

    name = "late_test_out"
    stream = spark.readStream.schema(schema).parquet(src)
    agg = tumbling_agg(stream.withWatermark("ts", "10 minutes"))
    mk(on_time).write.mode("append").parquet(src)
    q = (
        agg.writeStream.outputMode("update").format("memory").queryName(name)
        .trigger(processingTime="200 milliseconds").start()
    )
    try:
        q.processAllAvailable()  # on-time batch done → watermark = 12:49
        mk(late).write.mode("append").parquet(src)
        q.processAllAvailable()  # late batch runs against the 12:49 watermark
        out = spark.table(name).collect()
    finally:
        q.stop()
    w10 = [r for r in out if str(r["window_start"]).startswith("2024-01-01 10:00")]
    assert len(w10) >= 1  # the on-time event produced the window
    assert all(r["n_events"] == 1 for r in w10)  # late event never merged in


def test_stream_stream_join_across_batches(spark, tmp_path):
    """A click buffered in batch 1 must still match a purchase arriving
    in batch 2 — cross-micro-batch join state, which the single-batch
    oracle of q55 cannot observe. Out-of-window and wrong-order pairs
    must not match."""
    from datetime import datetime

    from fdf_spark.streaming.events import stream_stream_join

    src = str(tmp_path / "ssj_src")
    os.makedirs(src)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    mk = lambda rows: spark.createDataFrame(rows, schema)
    clicks = [
        (1, datetime(2024, 1, 1, 10, 0), 1, "click", 1.0, "{}"),
        (2, datetime(2024, 1, 1, 10, 0), 2, "click", 1.0, "{}"),
    ]
    purchases = [
        (10, datetime(2024, 1, 1, 10, 10), 1, "purchase", 9.0, "{}"),  # match
        (11, datetime(2024, 1, 1, 11, 0), 2, "purchase", 9.0, "{}"),   # > 30 min
        (12, datetime(2024, 1, 1, 9, 50), 1, "purchase", 9.0, "{}"),   # precedes click
    ]

    stream = spark.readStream.schema(schema).parquet(src)
    joined = stream_stream_join(stream)
    name = "ssj_test_out"
    mk(clicks).write.mode("append").parquet(src)
    q = (
        joined.writeStream.outputMode("append").format("memory").queryName(name)
        .trigger(processingTime="200 milliseconds").start()
    )
    try:
        q.processAllAvailable()          # clicks buffered, no matches yet
        mk(purchases).write.mode("append").parquet(src)
        q.processAllAvailable()          # purchases join against buffered clicks
        out = [(r["click_id"], r["purchase_id"], r["gap_us"]) for r in spark.table(name).collect()]
    finally:
        q.stop()
    assert out == [(1, 10, 600_000_000)]


def test_events_confs_settable_on_plain_session(spark):
    """The driver builds its OWN SparkSession with no tz conf set.
    set_events_session_confs must work there: Spark 4's
    conf.get(key, default) validates the default, so probing the
    session timezone with an invalid placeholder ('') raises on any
    session where the key is unset — the regression that broke every
    events-touching query under a plain session."""
    from fdf_spark.sources.tables import set_events_session_confs

    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.unset("spark.sql.session.timeZone")  # plain-session state
        set_events_session_confs(spark)
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_left_outer_join_nulls_only_after_watermark(spark, tmp_path):
    """Null emission is gated by state expiry, not by end-of-batch: an
    unmatched click emits its NULL row only once the global watermark
    (advanced by LATER events) passes click_ts + 30min, and a click
    still inside that horizon at end-of-input emits NOTHING."""
    from datetime import datetime

    from fdf_spark.streaming.events import stream_stream_join

    src = str(tmp_path / "lsoj_src")
    os.makedirs(src)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    mk = lambda rows: spark.createDataFrame(rows, schema)
    batch1 = [
        (1, datetime(2024, 1, 1, 10, 0), 1, "click", 1.0, "{}"),   # will match
        (2, datetime(2024, 1, 1, 10, 0), 2, "click", 1.0, "{}"),   # never matches -> NULL after horizon
        (10, datetime(2024, 1, 1, 10, 10), 1, "purchase", 9.0, "{}"),
    ]
    # batch 2 advances both branch watermarks PAST click 2's horizon
    # (10:30 + 10min delay = 10:40) and adds a fresh unmatched click
    # still inside its own horizon -> must NOT emit
    batch2 = [
        (3, datetime(2024, 1, 1, 12, 0), 3, "click", 1.0, "{}"),
        (11, datetime(2024, 1, 1, 12, 0), 9, "purchase", 9.0, "{}"),
    ]

    stream = spark.readStream.schema(schema).parquet(src)
    joined = stream_stream_join(stream, how="left_outer")
    name = "lsoj_test_out"
    mk(batch1).write.mode("append").parquet(src)
    q = (
        joined.writeStream.outputMode("append").format("memory").queryName(name)
        .trigger(processingTime="200 milliseconds").start()
    )
    try:
        q.processAllAvailable()
        after_b1 = {(r["click_id"], r["purchase_id"]) for r in spark.table(name).collect()}
        # inner result immediate; click 2 unmatched but watermark (10:10-10min
        # = 10:00) has not passed 10:00+30min -> no null row yet
        assert after_b1 == {(1, 10)}
        mk(batch2).write.mode("append").parquet(src)
        q.processAllAvailable()
        after_b2 = {(r["click_id"], r["purchase_id"]) for r in spark.table(name).collect()}
    finally:
        q.stop()
    # click 2 expired -> null row; click 3 (12:00, horizon 12:30 > watermark
    # 11:50) still pending -> absent
    assert after_b2 == {(1, 10), (2, None)}


def test_full_outer_join_emits_both_sides_after_watermark(spark, tmp_path):
    """how= passes through to full_outer: unmatched PURCHASES also emit
    (null click columns) once their state expires — the right-side twin
    of the left-outer rule."""
    from datetime import datetime

    from fdf_spark.streaming.events import stream_stream_join

    src = str(tmp_path / "fsoj_src")
    os.makedirs(src)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    mk = lambda rows: spark.createDataFrame(rows, schema)
    batch1 = [
        (1, datetime(2024, 1, 1, 10, 0), 1, "click", 1.0, "{}"),      # matches
        (2, datetime(2024, 1, 1, 10, 0), 2, "click", 1.0, "{}"),      # no purchase
        (10, datetime(2024, 1, 1, 10, 10), 1, "purchase", 9.0, "{}"),  # matches
        (11, datetime(2024, 1, 1, 10, 5), 7, "purchase", 9.0, "{}"),   # no click
    ]
    batch2 = [  # advance the watermark past every horizon above
        (3, datetime(2024, 1, 1, 13, 0), 8, "click", 1.0, "{}"),
        (12, datetime(2024, 1, 1, 13, 0), 9, "purchase", 9.0, "{}"),
    ]
    stream = spark.readStream.schema(schema).parquet(src)
    joined = stream_stream_join(stream, how="full_outer")
    name = "fsoj_test_out"
    mk(batch1).write.mode("append").parquet(src)
    q = (
        joined.writeStream.outputMode("append").format("memory").queryName(name)
        .trigger(processingTime="200 milliseconds").start()
    )
    try:
        q.processAllAvailable()
        mk(batch2).write.mode("append").parquet(src)
        q.processAllAvailable()
        got = {(r["click_id"], r["purchase_id"]) for r in spark.table(name).collect()}
    finally:
        q.stop()
    # inner pair + expired unmatched click + expired unmatched purchase;
    # batch-2 rows still inside their horizons emit nothing
    assert got == {(1, 10), (2, None), (None, 11)}
