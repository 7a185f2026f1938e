"""Event-time windowing: tumbling/sliding window aggregation and session
windows, batch and Structured Streaming.

The reference has no event-time windows (its flushes are row-count/time
batches — SURVEY.md §2.2 "Streaming: windows"); a 100 TB event pipeline
needs them, so the engine provides the standard Spark shapes:

- ``tumbling_counts`` / ``sessionize`` are plain DataFrame plans — they
  run identically over a batch table or a streaming source (Spark's
  unified semantics), so correctness is oracle-checked in batch and the
  SAME plan is driven through ``readStream`` in tests.
- ``stream_windowed_counts`` wires the batch plan to a file stream with a
  watermark: late rows beyond the watermark are dropped and only finalized
  windows are emitted (append mode) — the at-scale contract, since a
  window's state can be evicted once the watermark passes it.

Scale: windowed aggregation is one shuffle on (key, window); session
windows shuffle on the session key then merge adjacent intervals inside
the partition — both stock Catalyst/Structured-Streaming state machinery,
no custom state store. Late data in the CDC path is ordered by change-seq
and resolved by LWW MERGE instead (SURVEY §2.2), so watermarks here serve
the analytics surface, not ingest correctness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def tumbling_counts(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    keys: list[str] | None = None,
    slide: str | None = None,
) -> DataFrame:
    """Per-(window, keys) event counts over tumbling (or, with ``slide``,
    sliding) event-time windows. Output flattens the window struct to
    ``window_start``/``window_end`` so results are plain SQL columns."""
    w = F.window(F.col(ts_col), duration, slide) if slide else F.window(F.col(ts_col), duration)
    gb = [w] + [F.col(k) for k in (keys or [])]
    return (
        df.groupBy(*gb)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *[F.col(k) for k in (keys or [])],
            "n_events",
        )
    )


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    keys: list[str] | None = None,
) -> DataFrame:
    """Session windows per key: events closer than ``gap`` merge into one
    session (``F.session_window`` — batch and streaming). Emits the
    session bounds Spark defines: start = first event, end = last event +
    gap, plus event count."""
    sw = F.session_window(F.col(ts_col), gap)
    gb = [sw] + [F.col(k) for k in (keys or [])]
    return (
        df.groupBy(*gb)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max(ts_col).alias("last_event_ts"),
        )
        .select(
            *[F.col(k) for k in (keys or [])],
            F.col("session_window.start").alias("session_start"),
            "last_event_ts",
            "n_events",
        )
    )


def stream_windowed_counts(
    spark: SparkSession,
    source_dir: str,
    schema,
    ts_col: str = "ts",
    duration: str = "1 hour",
    keys: list[str] | None = None,
    watermark: str = "2 hours",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """The streaming form of ``tumbling_counts``: file source → watermark →
    windowed count. Returned (unstarted) streaming DataFrame is meant for
    ``writeStream.outputMode("append")`` — append emits a window only after
    the watermark passes its end, i.e. exactly the finalized windows, and
    state for closed windows is evicted (bounded memory at any corpus
    rate). Late rows older than the watermark are dropped by Spark's
    stateful operator — asserted in tests/test_windows.py."""
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(source_dir)
    )
    return tumbling_counts(src.withWatermark(ts_col, watermark), ts_col, duration, keys)
