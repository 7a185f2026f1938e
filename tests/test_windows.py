"""Event-time windowing (operators/windows.py): batch/streaming unified
semantics, sliding windows, session boundaries, and the watermark contract
(late rows dropped, only finalized windows emitted in append mode)."""

import json
import os
import time

import pytest
from pyspark.sql import Row, functions as F, types as T

from plugin_singer_spark.operators.windows import (
    sessionize,
    stream_windowed_counts,
    tumbling_counts,
)


def test_tumbling_counts_batch(spark):
    df = spark.createDataFrame(
        [Row(ts=f"2024-01-01 10:{m:02d}:00", k="a") for m in (5, 45, 59)]
        + [Row(ts="2024-01-01 11:30:00", k="a"), Row(ts="2024-01-01 10:10:00", k="b")]
    ).select(F.col("ts").cast("timestamp").alias("ts"), "k")
    out = {(str(r.window_start), r.k): r.n_events for r in tumbling_counts(df, "ts", "1 hour", ["k"]).collect()}
    assert out[("2024-01-01 10:00:00", "a")] == 3
    assert out[("2024-01-01 11:00:00", "a")] == 1
    assert out[("2024-01-01 10:00:00", "b")] == 1


def test_sliding_windows_double_count(spark):
    df = spark.createDataFrame([Row(ts="2024-01-01 10:45:00")]).select(
        F.col("ts").cast("timestamp").alias("ts")
    )
    out = sorted(
        str(r.window_start) for r in tumbling_counts(df, "ts", "1 hour", slide="30 minutes").collect()
    )
    # one event belongs to two overlapping hour windows at 30-min slide
    assert out == ["2024-01-01 10:00:00", "2024-01-01 10:30:00"]


def test_session_window_boundary_semantics(spark):
    # Spark's session interval is CLOSED at last+gap: an event at exactly
    # +gap merges; one at +gap+1s starts a new session (the user_sessions
    # oracle mirrors this with a strictly-greater comparison)
    df = spark.createDataFrame(
        [Row(u=1, ts="2024-01-01 10:00:00"),
         Row(u=1, ts="2024-01-01 10:30:00"),   # exactly +gap → merges
         Row(u=1, ts="2024-01-01 11:00:01"),   # +gap+1s after 10:30 → new
         Row(u=2, ts="2024-01-01 10:00:00")]
    ).select("u", F.col("ts").cast("timestamp").alias("ts"))
    out = sessionize(df, "ts", "30 minutes", ["u"]).collect()
    u1 = sorted([r for r in out if r.u == 1], key=lambda r: r.session_start)
    assert len(u1) == 2
    assert u1[0].n_events == 2 and u1[1].n_events == 1
    assert len([r for r in out if r.u == 2]) == 1


def test_streaming_watermark_drops_late_rows(spark, tmp_path):
    """Watermark contract across a restart: run 1 establishes (and the
    checkpoint persists) watermark = max event time - delay; run 2's input
    carries a row older than that watermark — it must be dropped by the
    stateful operator and never appear in an emitted window. Append mode
    emits exactly the windows the watermark finalized."""
    src = tmp_path / "stream_src"
    src.mkdir()
    schema = T.StructType(
        [T.StructField("ts", T.TimestampType()), T.StructField("k", T.StringType())]
    )

    def write_file(name, rows):
        with open(src / name, "w") as f:
            for ts, k in rows:
                f.write(json.dumps({"ts": ts, "k": k}) + "\n")

    results = []

    def run_once():
        out = stream_windowed_counts(
            spark, str(src), schema, ts_col="ts", duration="1 hour",
            keys=["k"], watermark="30 minutes", max_files_per_trigger=1,
        )
        q = (
            out.writeStream.outputMode("append")
            .foreachBatch(lambda df, eid: results.extend(df.collect()))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(150)
        return q

    # run 1: max event time 11:30 → committed watermark 11:00; append
    # emits only the finalized [10:00, 11:00) window
    write_file("f1.json", [("2024-01-01T10:05:00.000", "a"),
                           ("2024-01-01T10:45:00.000", "a"),
                           ("2024-01-01T11:30:00.000", "a")])
    run_once()
    assert {(str(r.window_start), r.n_events) for r in results} == {("2024-01-01 10:00:00", 2)}

    # run 2 (same checkpoint): 09:10 is older than the restored 11:00
    # watermark → dropped; 12:10 only advances the watermark to 11:40, so
    # no new window finalizes
    write_file("f2.json", [("2024-01-01T09:10:00.000", "a"),
                           ("2024-01-01T12:10:00.000", "a")])
    q = run_once()
    assert {(str(r.window_start), r.n_events) for r in results} == {("2024-01-01 10:00:00", 2)}
    dropped = sum(
        s.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for s in p.get("stateOperators", [])
    )
    assert dropped == 1
