"""Streaming CDC replay: Structured Streaming + chunked availableNow replay.

Two drivers over the same epoch-fenced merge core:

- :func:`stream_binlog` — true Structured Streaming: ``readStream`` over the
  binlog directory (file source, ``maxFilesPerTrigger`` ≈ the reference's
  ``export_batch_rows`` chunking, taps/PipelinewiseMysql.java:93-96), with
  ``foreachBatch`` doing the fenced MERGE. Spark's checkpoint gives offset
  tracking; the table's epoch fence makes the sink idempotent — together
  exactly-once (north_star).
- :func:`replay_chunked` — deterministic seq-range micro-batches (the
  ``trigger(availableNow=True)`` shape ≈ ``break_at_end_lsn``,
  taps/PipelinewisePostgres.java:75-79). Used by the bench because batch
  boundaries are bit-identical across parallelism levels.

Resume-from-checkpoint: both paths read the last committed seq bookmark /
epoch fence from the table snapshot and continue mid-stream; killing the
job between merge-commit and anything else loses nothing because bookmark,
epoch and data are one atomic snapshot swap.
"""

from __future__ import annotations

import os

from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from plugin_singer_spark.ingest.pipeline import IngestReport, replay_cdc, seq_bookmark
from plugin_singer_spark.lake.table import LakeTable


@dataclass
class ReplayStats:
    events: int = 0
    batches: int = 0
    reports: list[IngestReport] = field(default_factory=list)
    # wall seconds per committed epoch — min over epochs is the steady-state
    # throughput estimator used by the scaling bench (first epoch carries
    # JIT/codegen warmup; interference bursts inflate individual epochs).
    # Mid-replay compactions (compact_every) are inside their epoch's time;
    # the end-of-replay compaction is timed separately so callers can
    # amortize it into throughput instead of silently excluding it.
    epoch_secs: list[float] = field(default_factory=list)
    final_compact_sec: float = 0.0


def _rotation_shard(table, rotate: int | None, wave_idx: int) -> list[int] | None:
    """Staggered-compaction shard: wave i compacts only buckets with
    ``b % rotate == i % rotate`` (None = every bucket, the full profile).

    Each periodic compaction wave rewrites the base of every bucket it
    touches, so the full profile's wave cost grows O(table) as the base
    grows — fine amortized, but the wave itself becomes the replay's
    longest pause. Rotating shards caps each wave at ~1/rotate of the
    table (flat cost curve) at the price of buckets carrying up to
    ``compact_every×rotate`` deltas between their turns — the standard
    staggered/partial-compaction trade (Paimon's num-sorted-run triggers,
    Hudi's inline-compaction scheduling)."""
    if not rotate or rotate <= 1:
        return None
    n = table.snapshot().num_buckets
    return [b for b in range(n) if b % rotate == wave_idx % rotate]


def replay_chunked(
    table: LakeTable,
    binlog: DataFrame,
    batch_events: int = 1_000_000,
    stream: str = "repos",
    checkpoint_id: str = "replay",
    max_batches: int | None = None,
    resume: bool = True,
    on_batch: Callable[[IngestReport], None] | None = None,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    mode: str = "cow",
    compact_every: int | None = None,
    final_compact: bool = False,
    compact_rotate: int | None = None,
    **merge_kwargs: Any,
) -> ReplayStats:
    """Replay the binlog in fixed seq-range micro-batches with epoch fencing.

    Epoch i covers seqs (i*batch_events, (i+1)*batch_events]. Epoch number
    doubles as the fence value, so a re-run (same checkpoint_id) skips every
    already-committed epoch — crash anywhere, re-run, converge.

    ``mode='mor'`` appends delta files per epoch (write cost O(batch), the
    10^10-event replay shape) and compacts every ``compact_every`` epochs
    and/or once at the end (``final_compact``) so reads stay bounded.
    """
    import time as _time

    from plugin_singer_spark.lake.merge import compact
    stats = ReplayStats()
    if transform is not None:
        binlog = transform(binlog)
    bounds = binlog.agg(F.min("seq").alias("lo"), F.max("seq").alias("hi")).collect()[0]
    if bounds["hi"] is None:
        return stats
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    start_epoch = 0
    refence_epoch = None
    if resume:
        from plugin_singer_spark.ingest.pipeline import seq_bookmark

        fence = table.last_committed_epoch(checkpoint_id)
        start_epoch = fence + 1
        bm = seq_bookmark(table, stream)
        if fence >= 0 and bm is not None:
            fence_end = lo - 1 + (fence + 1) * batch_events
            if int(bm) < fence_end and hi > int(bm):
                # the fenced tail epoch committed PARTIAL (stream ended
                # mid-range — the live-binlog tail case) and the stream has
                # since grown INTO that range: re-run the tail epoch. Safe
                # because the merge is LWW-idempotent (replayed rows tie in
                # favor of the target; only the genuinely new seqs apply).
                # A re-run over the unchanged artifact still fences to
                # zero epochs (hi == bookmark).
                start_epoch = fence
                refence_epoch = fence
    epoch = start_epoch
    while True:
        from_seq = lo - 1 + epoch * batch_events
        to_seq = lo - 1 + (epoch + 1) * batch_events
        if from_seq >= hi:
            break
        if max_batches is not None and stats.batches >= max_batches:
            break
        _t0 = _time.time()
        rep = replay_cdc(
            table,
            binlog,
            stream=stream,
            from_seq=from_seq,
            to_seq=to_seq,
            epoch=epoch,
            checkpoint_id=checkpoint_id,
            mode=mode,
            refence=(epoch == refence_epoch),
            **merge_kwargs,
        )
        stats.events += rep.record_count
        stats.batches += 1
        stats.reports.append(rep)
        if on_batch:
            on_batch(rep)
        epoch += 1
        if mode == "mor" and compact_every and (epoch - start_epoch) % compact_every == 0:
            compact(table, min_delta_files=max(1, compact_every),
                    buckets=_rotation_shard(table, compact_rotate,
                                            (epoch - start_epoch) // compact_every))
        stats.epoch_secs.append(round(_time.time() - _t0, 3))
    if mode == "mor" and final_compact:
        _t0 = _time.time()
        compact(table, min_delta_files=1)
        stats.final_compact_sec = round(_time.time() - _t0, 3)
    return stats


def replay_files(
    spark: SparkSession,
    table: LakeTable,
    src_dir: str,
    files_per_batch: int = 8,
    stream: str = "repos",
    checkpoint_id: str = "files",
    input_format: str = "parquet",
    record_schema=None,
    mode: str = "mor",
    compact_every: int | None = None,
    final_compact: bool = True,
    compact_rotate: int | None = None,
    resume: bool = True,
    max_batches: int | None = None,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    archive_dir: str | None = None,
    activate_fences: bool = True,
    **merge_kwargs: Any,
) -> ReplayStats:
    """Replay a staged binlog directory in FILE-granular micro-batches: one
    epoch reads only its own k files — zero re-scans of the full log (the
    ``maxFilesPerTrigger`` shape, without Structured Streaming's driver).

    ``activate_fences`` (lean-jsonl path only): detect ACTIVATE_VERSION
    resync fences with an extra substring-prefiltered scan per epoch
    (messages.scan_activation_fence). Costs one additional sequential read
    of the epoch's raw files; set False for streams that never resync.

    ``archive_dir`` retains each epoch's consumed raw files under
    ``<archive_dir>/epoch=<n>/`` (hardlink when possible, copy otherwise)
    BEFORE the merge commits, and records the archive paths in the epoch's
    lineage record — the ``archive_load_files`` retention contract
    (targets/PipelinewiseSnowflake.java:368-376): every commit points at a
    replayable copy of exactly the raw input it consumed.

    ``input_format='jsonl'`` replays the raw Singer JSONL artifact: each
    epoch parses the envelope (one ``json_tuple`` per line) and casts RECORD
    payloads via ``from_json`` to ``record_schema`` — the faithful
    tap→target pipeline (tap stdout → typed rows → MERGE), fully
    vectorized/codegen'd. Part files are seq-ordered by construction
    (datagen.write_singer_jsonl) but correctness does not depend on it: the
    merge is sequence-conditional.

    Epoch fencing + bookmarks commit atomically with each merge, exactly as
    in :func:`replay_chunked`; the epoch number is the file-chunk index, so
    resume re-derives the same chunking from the sorted file list.

    Growth contract: files that arrive AFTER a fenced run must sort
    lexicographically after every already-consumed file (true for
    monotonic binlog file naming — mysql binlog.NNNNNN, WAL segments, and
    datagen's part-NNNNN), otherwise the re-derived chunk boundaries shift
    under the fence. For seq-carrying streams without that naming, use
    :func:`replay_chunked` (seq-range epochs + grow-into-tail re-run).
    """
    import glob as _glob

    from plugin_singer_spark.lake.merge import compact
    from plugin_singer_spark import messages

    from plugin_singer_spark.lake.evolution import evolve_schema

    stats = ReplayStats()
    files = sorted(_glob.glob(os.path.join(src_dir, "part-*")))
    if not files:
        return stats
    chunks = [files[i : i + files_per_batch] for i in range(0, len(files), files_per_batch)]
    start_epoch = (table.last_committed_epoch(checkpoint_id) + 1) if resume else 0
    import time as _time

    # live schema registry (record_schema=None): folds in-band SCHEMA
    # messages across epochs — a mid-stream SCHEMA with a new column evolves
    # the parse struct for ITS OWN batch onward (SURVEY §1.3: the diff must
    # apply before the cast of the batch that carried the new SCHEMA), and
    # the merge's evolve=True widens the table schema on commit. On resume
    # the SCHEMA messages of committed epochs are never re-read, so the
    # registry seeds from the table's committed schema (which those epochs
    # evolved) plus the CDC op envelope field.
    live_schema = None
    if record_schema is None and input_format != "parquet" and start_epoch > 0:
        from pyspark.sql import types as _T

        from plugin_singer_spark.lake.table import DELETED_AT, SEQ_FIELD

        data_fields = [
            f for f in table.snapshot().schema.fields if f.name not in (SEQ_FIELD, DELETED_AT)
        ]
        live_schema = _T.StructType(data_fields + [_T.StructField("op", _T.StringType())])

    for epoch in range(start_epoch, len(chunks)):
        if max_batches is not None and stats.batches >= max_batches:
            break
        _t0 = _time.time()
        chunk = chunks[epoch]
        fence_obs = None
        activations: list[int] = []
        if input_format == "parquet":
            ev = spark.read.parquet(*chunk)
        elif record_schema is not None:
            lines = spark.read.text(chunk)
            if activate_fences:
                # near-free resync detection riding the scan (flag only);
                # the full fence pass runs only when the flag fires
                lines, fence_obs = messages.observe_fence_flag(lines, line_col="value")
            ev = messages.parse_records_lean(lines, stream, record_schema, line_col="value")
        else:
            lines = spark.read.text(chunk)
            env = messages.parse_lines(lines, line_col="value", seq_from_envelope=True)
            for _seq, s_name, struct, _keys in messages.collect_schemas(env):
                if s_name == stream:
                    live_schema = struct if live_schema is None else evolve_schema(live_schema, struct)
            if live_schema is None:
                raise ValueError(
                    f"stream {stream!r}: RECORD before any SCHEMA message and no record_schema given"
                )
            activations = [
                fence for _s, s_name, fence in messages.collect_activate_versions(env) if s_name == stream
            ]
            ev = messages.records_for_stream(env, stream, live_schema, keep_envelope=("seq",))
        if transform is not None:
            # load-side stages from the job config (stream maps, flatten,
            # validate, metadata columns) — applied per epoch, pre-merge
            ev = transform(ev)
        lineage_extra = None
        if archive_dir is not None:
            # archive BEFORE the merge commit: a crash after the commit
            # still leaves the pointer valid (at-least-once for the copy,
            # exactly-once for the commit — re-archiving is idempotent)
            adir = os.path.join(archive_dir, f"epoch={epoch}")
            os.makedirs(adir, exist_ok=True)
            archived = []
            for f in chunk:
                dst = os.path.join(adir, os.path.basename(f))
                if not os.path.exists(dst):
                    try:
                        os.link(f, dst)
                    except OSError:
                        import shutil as _shutil

                        _shutil.copy2(f, dst)
                archived.append(dst)
            lineage_extra = {"archive": archived}
        rep = replay_cdc(
            table,
            ev,
            stream=stream,
            epoch=epoch,
            checkpoint_id=checkpoint_id,
            mode=mode,
            lineage_extra=lineage_extra,
            **merge_kwargs,
        )
        stats.events += rep.record_count
        stats.batches += 1
        stats.reports.append(rep)
        if fence_obs is not None and rep.metrics.get("skipped_epoch") is None:
            # the lean parse drops non-RECORD rows before the merge, so
            # resync fences need their own detection (ADVICE r2). The flag
            # observation rode the merge's scan (a fenced-skip epoch never
            # ran it — obs.get would block — but its activation was applied
            # on the first run); only a flagged epoch pays the real fence
            # pass. NOT an Observation on the parsed node: CollectMetrics
            # there blocks pruning for the merge's auxiliary passes
            # (measured 3× epoch cost).
            if fence_obs.get.get("has_fence") is not None:
                fence = messages.scan_activation_fence(
                    spark.read.text(chunk), stream, line_col="value"
                )
                if fence is not None:
                    activations.append(int(fence))
        if activations:
            # ACTIVATE_VERSION in this epoch: rows older than the (last)
            # activation point were not re-sent by the resync — drop them
            from plugin_singer_spark.lake.merge import activate_version

            activate_version(table, below_seq=max(activations))
        if mode == "mor" and compact_every and (epoch + 1) % compact_every == 0:
            compact(table, min_delta_files=max(1, compact_every),
                    buckets=_rotation_shard(table, compact_rotate,
                                            (epoch + 1) // compact_every))
        stats.epoch_secs.append(round(_time.time() - _t0, 3))
    if mode == "mor" and final_compact:
        _t0 = _time.time()
        compact(table, min_delta_files=1)
        stats.final_compact_sec = round(_time.time() - _t0, 3)
    return stats


def stream_multi(
    spark: SparkSession,
    tables: dict[str, LakeTable],
    schemas: dict[str, Any],
    binlog_dir: str,
    checkpoint_dir: str,
    checkpoint_id: str = "multi",
    max_files_per_trigger: int = 4,
    available_now: bool = True,
    processing_time: str | None = None,
    transforms: dict[str, Callable[[DataFrame], DataFrame]] | None = None,
    **merge_kwargs: Any,
):
    """Continuous multi-stream demux: ONE Structured Streaming query over a
    raw Singer JSONL artifact fans each micro-batch out to every stream's
    lake table — the streaming form of the catalog job (the reference's
    tap continuously feeding a multi-stream target,
    targets/AbstractPythonTarget.java:72-90 demux loop).

    ``tables``/``schemas``/``transforms`` are keyed by stream name. Each
    table fences independently on ``(checkpoint_id, epoch)`` so a replayed
    micro-batch skips exactly the tables that already committed it —
    per-stream exactly-once even when a crash lands between two streams'
    merges of the same epoch. Returns the StreamingQuery."""
    src = (
        spark.readStream.option("maxFilesPerTrigger", str(max_files_per_trigger))
        .text(binlog_dir)
    )

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        from plugin_singer_spark import messages

        env = messages.parse_lines(batch_df, line_col="value", seq_from_envelope=True)
        for stream, table in tables.items():
            if epoch_id <= table.last_committed_epoch(checkpoint_id):
                continue  # this table already has this epoch (partial-crash replay)
            ev = messages.records_for_stream(env, stream, schemas[stream], keep_envelope=("seq",))
            if transforms and stream in transforms:
                ev = transforms[stream](ev)
            replay_cdc(
                table,
                ev,
                stream=stream,
                epoch=int(epoch_id),
                checkpoint_id=checkpoint_id,
                **merge_kwargs,
            )

    writer = src.writeStream.foreachBatch(handle).option("checkpointLocation", checkpoint_dir)
    if processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    elif available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_binlog(
    spark: SparkSession,
    table: LakeTable,
    binlog_dir: str,
    checkpoint_dir: str,
    stream: str = "repos",
    checkpoint_id: str = "stream",
    max_files_per_trigger: int = 4,
    available_now: bool = True,
    processing_time: str | None = None,
    input_format: str = "parquet",
    record_schema=None,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    **merge_kwargs: Any,
):
    """Structured Streaming driver: file source over the binlog (parquet, or
    ``input_format='jsonl'`` for the raw Singer artifact parsed per batch
    with ``record_schema``) → foreachBatch(epoch-fenced MERGE). Returns the
    StreamingQuery.

    The sink is idempotent under Spark's at-least-once foreachBatch contract
    because the merge is fenced on (checkpoint_id, epoch_id) inside the
    atomic snapshot commit — the exactly-once upgrade of the reference's
    save-state-after-success (taps/AbstractPythonTap.java:104-106).
    """
    if input_format == "jsonl":
        if record_schema is None:
            raise ValueError("input_format='jsonl' requires record_schema")
        src = (
            spark.readStream.option("maxFilesPerTrigger", str(max_files_per_trigger))
            .text(binlog_dir)
        )
    else:
        sample = spark.read.parquet(binlog_dir)
        src = (
            spark.readStream.schema(sample.schema)
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
            .parquet(binlog_dir)
        )

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        fence = table.last_committed_epoch(checkpoint_id)
        if epoch_id <= fence:
            return  # replayed epoch — already committed, skip (idempotent)
        # NOTE: no seq-bookmark filter here — the file source's micro-batches
        # are not globally seq-ordered (a later batch can carry lower seqs),
        # and Spark's checkpoint already delivers each file exactly once.
        # LWW merge makes any cross-batch ordering converge; the epoch fence
        # alone guards replays.
        raw_lines, fence_obs = None, None
        if input_format == "jsonl":
            from plugin_singer_spark import messages

            # flag observation rides the scan (below json_tuple, so it
            # cannot block the parse's column pruning — see
            # messages.observe_fence_flag); a flagged batch pays one extra
            # prefiltered pass for the fence value
            raw_lines = batch_df
            flagged, fence_obs = messages.observe_fence_flag(batch_df, line_col="value")
            batch_df = messages.parse_records_lean(
                flagged, stream, record_schema, line_col="value"
            )
        if transform is not None:
            batch_df = transform(batch_df)
        rep = replay_cdc(
            table,
            batch_df,
            stream=stream,
            epoch=int(epoch_id),
            checkpoint_id=checkpoint_id,
            **merge_kwargs,
        )
        if (
            fence_obs is not None
            and rep.metrics.get("skipped_epoch") is None
            and fence_obs.get.get("has_fence") is not None
        ):
            from plugin_singer_spark import messages

            fence_v = messages.scan_activation_fence(raw_lines, stream, line_col="value")
            if fence_v is not None:
                from plugin_singer_spark.lake.merge import activate_version

                activate_version(table, below_seq=int(fence_v))

    writer = src.writeStream.foreachBatch(handle).option("checkpointLocation", checkpoint_dir)
    if processing_time is not None:
        # time-based flush — the ``batch_wait_limit_seconds`` analog
        # (targets/PipelinewiseSnowflake.java:300-304): commit an epoch every
        # interval instead of running the source dry in one availableNow pass
        writer = writer.trigger(processingTime=processing_time)
    elif available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
