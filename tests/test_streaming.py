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


def test_sessionize_multi_batch_state(spark, sf_dir, tmp_path):
    """Two time-ordered files + maxFilesPerTrigger=1 force two
    micro-batches; open sessions must carry across the batch boundary and
    every emitted session must still match the batch truth."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/events.parquet")
    t = t.sort_by("ts")
    half = t.num_rows // 2
    d = tmp_path / "two_batches"
    d.mkdir()
    pq.write_table(t.slice(0, half), str(d / "a_first.parquet"))
    pq.write_table(t.slice(half), str(d / "b_second.parquet"))

    from azure_kusto_parquet_conv_spark.session import prepare_session
    from azure_kusto_parquet_conv_spark.streaming.events import EVENTS_RAW_SCHEMA
    from pyspark.sql import functions as F

    prepare_session(spark)
    raw = (spark.readStream.schema(EVENTS_RAW_SCHEMA)
           .option("maxFilesPerTrigger", 1).parquet(str(d)))
    ev = raw.withColumnRenamed("ts", "ts_ns").withColumn(
        "ts", F.timestamp_micros(F.expr("ts_ns div 1000")))
    q = (sessionize_stream(ev, gap_minutes=30)
         .writeStream.format("memory").queryName("sessions_mb")
         .outputMode("append").start())
    drain(q)
    got = spark.sql("select * from sessions_mb").collect()
    assert got, "no sessions emitted across batches"
    from azure_kusto_parquet_conv_spark.queries import QUERIES
    batch = {(r["user_id"], r["start_us"]): r["n_events"]
             for r in QUERIES["q_sessionize"](spark, sf_dir).collect()}
    for r in got:
        key = (r["user_id"], r["session_start_us"])
        assert batch.get(key) == r["n_events"], f"session {key} mismatch"


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
