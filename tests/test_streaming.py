"""Structured Streaming over events: file-source micro-batches drained to
a memory sink, checked against the batch-mode equivalents."""

import shutil

import pytest
from pyspark.sql import functions as F

from azure_kusto_parquet_conv_spark.streaming.events import (
    read_events_stream,
    sessionize_stream,
    windowed_counts,
)


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory, sf_dir):
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{sf_dir}/events.parquet", d / "events.parquet")
    return str(d)


def drain(q):
    q.processAllAvailable()
    q.stop()


def test_windowed_counts_matches_batch(spark, sf_dir, stream_dir):
    ev = read_events_stream(spark, stream_dir)
    q = (windowed_counts(ev)
         .writeStream.format("memory").queryName("win_counts")
         .outputMode("append").start())
    drain(q)
    got = {(r["window_start_ms"], r["event_type"]): (r["n"], r["sum_value"])
           for r in spark.sql("select * from win_counts").collect()}
    # batch twin over the same data
    from azure_kusto_parquet_conv_spark.queries import QUERIES
    want = {(r["window_start_ms"], r["event_type"]): (r["n"], r["sum_value"])
            for r in QUERIES["q_tumbling_window"](spark, sf_dir).collect()}
    # append mode only emits windows finalized by the watermark; everything
    # emitted must match the batch result, and most windows should appear
    assert got, "stream emitted no windows"
    for k, v in got.items():
        assert want.get(k) == v, f"window {k}: stream {v} != batch {want.get(k)}"
    assert len(got) >= len(want) * 0.8


def test_sessionize_stream_counts(spark, sf_dir, stream_dir):
    ev = read_events_stream(spark, stream_dir)
    q = (sessionize_stream(ev, gap_minutes=30)
         .writeStream.format("memory").queryName("sessions")
         .outputMode("append").start())
    drain(q)
    got = spark.sql("select * from sessions").collect()
    # closed sessions only (the open tail per user stays in state), so the
    # stream emits a subset of the batch sessionization — verify each
    # emitted session exists in the batch result with identical stats
    from azure_kusto_parquet_conv_spark.queries import QUERIES
    batch = {(r["user_id"], r["start_us"]): r["n_events"]
             for r in QUERIES["q_sessionize"](spark, sf_dir).collect()}
    assert got, "no sessions emitted"
    for r in got:
        key = (r["user_id"], r["session_start_us"])
        assert batch.get(key) == r["n_events"], f"session {key} mismatch"
