"""Config-driven ingest job — the ``spark-submit --py-files`` entry (P24).

Reference analog: the Java layer materializes ``config.json`` /
``catalog.json`` / ``state.json`` and launches the connector
(AbstractPythonSinger.java:128-199); the engine's launch mode per the north
rule is::

    spark-submit --py-files engine.zip -m plugin_singer_spark.job --config job.json
    # or:  python -m plugin_singer_spark.job --config job.json

Job config (JSON)::

    {
      "table":  {"path": "/lake/repos", "keys": ["repo", "path"],
                 "num_buckets": 64,
                 "columns": {"repo": "string", "path": "string",
                             "commit": "string", "lang": "string",
                             "content": "string"}},
      "source": {"format": "jsonl",   # jsonl | parquet | generic | jdbc
                 "path": "/binlog/dir",
                 "stream": "repos",
                 "files_per_batch": 8,
                 # generic: "reader": "pkg.mod:fn" or a register_source name
                 #          (taps/GenericTap.java:28-77 analog)
                 # jdbc:    "options": {"url": ..., "dbtable": ...}
                 },
      "replication_method": "LOG_BASED",     # | INCREMENTAL | FULL_TABLE
      "replication_key": "seq",              # INCREMENTAL only
      "write_mode": "mor",                   # mor | cow
      "checkpoint_id": "job",
      "streaming": true,                     # Structured Streaming driver
      "batch_wait_limit_seconds": 30,        # → trigger(processingTime=...)
                                             #  (PipelinewiseSnowflake.java:300-304;
                                             #   absent ⇒ bounded availableNow run)
      "compact_every": 8,                    # MOR compaction cadence (batch replay)
      "validate": {...stream JSON-Schema...},      # optional (P15)
      "invalid_records_detect": true,              # DatamillCoPostgres.java:148
      "invalid_records_threshold": 0,
      "quarantine_path": "...",                    # default <table>_quarantine
      "stream_map": {...},                         # optional (P19)
      "flatten": {"max_level": 2},                 # optional (P16,
                                                   #  data_flattening_max_level)
      "add_metadata_columns": true,                # optional (P17)
      "before_sql": ["..."], "after_sql": ["..."]  # DatamillCoPostgres.java:159-168
    }

Catalog-driven multi-stream jobs replace ``table`` with ``catalog`` (a
Singer discovery doc, or ``"discover"`` to bootstrap the catalog from the
raw artifact itself — the ``--discover`` run, taps/AbstractPythonTap.java:
149-163) + ``streams_configurations`` + ``tables_root``. Additional
catalog-job keys: ``epoch`` (artifact generation number — re-running the
same epoch is fenced per stream), ``persist_empty_tables``,
``type_options`` (use_singer_decimal / use_date_datatype /
prefer_float_over_numeric), and per-entry ``where`` / ``limit`` in
``streams_configurations`` (the BigQuery tap's query shaping). A
``discover_only: true`` job returns the discovery document instead of
ingesting.

The run prints one JSON line: events, batches, final snapshot version and
bookmarks — the ``Output{raw, count}`` analog
(taps/AbstractPythonTap.java:180-194). ``final_rows`` comes from parquet
footer statistics (LakeTable.stats), never a full-table scan. Re-running
with the same checkpoint_id resumes from the epoch fence (exactly-once).
"""

from __future__ import annotations

import argparse
import importlib
import json
import os
import shutil
import sys
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession, types as T

# ---------------------------------------------------------------------------
# Source adapters (GenericTap analog: arbitrary reader → same pipeline)
# ---------------------------------------------------------------------------

SourceReader = Callable[[SparkSession, dict], DataFrame]
_SOURCE_READERS: dict[str, SourceReader] = {}


def register_source(name: str, reader: SourceReader) -> None:
    """Register a named source reader callable ``(spark, source_cfg) → DataFrame``.

    The returned DataFrame must carry the change columns the replication
    method needs (``seq`` always; ``op`` for LOG_BASED). This is the
    engine's GenericTap plug point (taps/GenericTap.java:28-77): any
    DataFrame reader — JDBC, a lake table, a custom format — flows through
    the same replay/merge path.
    """
    _SOURCE_READERS[name] = reader


def _resolve_reader(spec: str) -> SourceReader:
    if spec in _SOURCE_READERS:
        return _SOURCE_READERS[spec]
    if ":" in spec:  # dotted path "pkg.mod:fn"
        mod, attr = spec.rsplit(":", 1)
        fn = getattr(importlib.import_module(mod), attr)
        return fn
    raise KeyError(f"unknown source reader {spec!r} (not registered, not a pkg.mod:fn path)")


def _load_source(spark: SparkSession, src: dict[str, Any]) -> DataFrame:
    """Batch-load one source per its format (scans stay declarative so
    Catalyst pushes the replication filters down into them)."""
    fmt = src.get("format", "parquet")
    if fmt == "parquet":
        return spark.read.parquet(src["path"])
    if fmt == "jsonl":
        from plugin_singer_spark import messages

        schema = T.StructType.fromDDL(
            ", ".join(f"{n} {t}" for n, t in src["columns"].items())
        )
        return messages.parse_records_lean(
            spark.read.text(src["path"]), src.get("stream", "repos"), schema, line_col="value"
        )
    if fmt == "jdbc":
        # JDBC incremental source (PipelinewiseOracle/SqlServer analog):
        # plain options passthrough; partitionColumn/numPartitions in the
        # options dict give the parallel read
        return spark.read.format("jdbc").options(**src.get("options", {})).load()
    if fmt == "generic":
        return _resolve_reader(src["reader"])(spark, src)
    raise ValueError(f"unknown source format {fmt!r}")


# ---------------------------------------------------------------------------
# Load-side transform stages (stream map → flatten → validate → metadata)
# ---------------------------------------------------------------------------

def _build_transform(cfg: dict[str, Any], quarantine_path: str | None) -> Callable[[DataFrame], DataFrame] | None:
    """Compile the configured load stages into one DataFrame→DataFrame
    closure, applied per micro-batch before the merge. All stages are pure
    Column expressions — no Python in the row path."""
    from plugin_singer_spark.messages import inject_metadata_columns
    from plugin_singer_spark.operators.flatten import flatten
    from plugin_singer_spark.operators.streammap import apply_stream_map
    from plugin_singer_spark.operators.validate import (
        enforce_threshold,
        split_valid,
        validate_records,
    )

    stages: list[Callable[[DataFrame], DataFrame]] = []
    if cfg.get("stream_map"):
        stages.append(
            lambda df: apply_stream_map(df, cfg["stream_map"], cfg.get("stream_map_config"))[0]
        )
    if cfg.get("flatten"):
        level = int(cfg["flatten"].get("max_level", 1))
        stages.append(lambda df: flatten(df, max_level=level))
    if cfg.get("validate"):

        def _validate(df: DataFrame) -> DataFrame:
            validated = validate_records(df, cfg["validate"])
            rep = enforce_threshold(
                validated,
                detect=bool(cfg.get("invalid_records_detect", True)),
                threshold=int(cfg.get("invalid_records_threshold", 0)),
            )
            ok, quarantine = split_valid(validated)
            if rep.invalid > 0 and quarantine_path:
                # persist the rejected rows WITH their failure reasons —
                # the quarantine side output the module contract promises
                quarantine.write.mode("append").parquet(quarantine_path)
            return ok

        stages.append(_validate)
    if cfg.get("add_metadata_columns"):
        stages.append(
            lambda df: inject_metadata_columns(df, extracted_at_col=cfg.get("extracted_at_col"))
        )
    if not stages:
        return None

    def transform(df: DataFrame) -> DataFrame:
        for s in stages:
            df = s(df)
        return df

    return transform


def _run_sql_hooks(spark: SparkSession, statements: list[str] | None) -> None:
    """before/after SQL hooks (targets/DatamillCoPostgres.java:159-168) —
    run against whatever views the caller registered (stream tables)."""
    for stmt in statements or []:
        spark.sql(stmt)


def _final_rows(table) -> int | None:
    """Scan-free final count: parquet footer stats (exact when the table is
    delta-free — every job path ends compacted). None means 'not derivable
    without a full MOR resolve' — deliberately NOT computed (100 TB rule)."""
    return table.row_count()


def _struct_from_columns(columns: dict[str, str]) -> T.StructType:
    return T.StructType.fromDDL(", ".join(f"{n} {t}" for n, t in columns.items()))


def _open_table(spark: SparkSession, cfg: dict[str, Any]):
    from plugin_singer_spark.lake.table import LakeTable

    tcfg = cfg["table"]
    if LakeTable.exists(tcfg["path"]):
        return LakeTable(spark, tcfg["path"])
    schema = _struct_from_columns(tcfg["columns"])
    return LakeTable.create(
        spark, tcfg["path"], schema, tcfg["keys"], num_buckets=int(tcfg.get("num_buckets", 64))
    )


def run_catalog_job(spark: SparkSession, cfg: dict[str, Any]) -> dict[str, Any]:
    """Multi-stream catalog-driven sync — the reference's catalog.json path.

    ``cfg["catalog"]`` is a Singer discovery document
    (models/DiscoverStreams.java:8-10) or the string ``"discover"`` to
    bootstrap it from the raw artifact (the ``--discover`` run,
    taps/AbstractPythonTap.java:149-163 — in-band SCHEMA messages win,
    schema-less streams are inferred from their records).
    ``cfg["streams_configurations"]`` are selection rules applied with
    last-config-wins regex semantics (services/SelectedService.java:13-68).
    Every SELECTED stream is demuxed out of the shared raw artifact, pruned
    to its selected properties (true column pruning before any shuffle), and
    merged into its own lake table under ``tables_root/<stream>`` using the
    stream's replication method. LOG_BASED streams are epoch-fenced on
    ``(checkpoint_id, epoch)`` so re-running the same artifact is a no-op,
    and compacted after merge so tables stay read-optimized and counts come
    from footer stats. Per-stream record counts are reported like the
    reference's per-stream metrics (JsonTest.java:61-62: 8 category + 4
    region).
    """
    from pyspark.sql import functions as F

    from plugin_singer_spark import messages
    from plugin_singer_spark.catalog import (
        StreamsConfiguration,
        catalog_from_discovery,
        discover_from_jsonl,
        fill,
        infer_metadata,
        to_discovery_doc,
    )
    from plugin_singer_spark.ingest.pipeline import replay_cdc, sync_full_table, sync_incremental, seq_bookmark
    from plugin_singer_spark.lake.merge import compact
    from plugin_singer_spark.lake.table import LakeTable

    src = cfg["source"]
    if cfg.get("catalog") in (None, "discover"):
        catalog = discover_from_jsonl(spark, src["path"])
    else:
        catalog = catalog_from_discovery(cfg["catalog"])
    for s in catalog.streams:
        infer_metadata(s)  # bootstrap metadata for bare discovery docs
    catalog = fill(
        catalog,
        [StreamsConfiguration(**c) for c in cfg.get("streams_configurations", [])],
    )
    if cfg.get("discover_only"):
        return {"discovered": to_discovery_doc(catalog)}
    root = cfg["tables_root"]
    mode = cfg.get("write_mode", "mor")
    checkpoint_id = cfg.get("checkpoint_id", "catalog")
    epoch = int(cfg.get("epoch", 0))
    persist_empty = bool(cfg.get("persist_empty_tables", True))
    env = messages.parse_lines(
        spark.read.text(src["path"]), line_col="value", seq_from_envelope=True
    )
    transform = _build_transform(cfg, cfg.get("quarantine_path"))

    from plugin_singer_spark.schema import TypeOptions

    # schema-conversion preferences from the job config — the connectors'
    # type knobs (use_singer_decimal taps/PipelinewiseSqlServer.java:112-116,
    # use_date_datatype :96-100, prefer_float_over_numeric
    # targets/Oracle.java:107-110)
    topts = TypeOptions(**cfg["type_options"]) if cfg.get("type_options") else None

    # in-band SCHEMA messages evolve each stream's parse struct mid-stream
    # (SURVEY §1.3): new columns flow through, the merge widens the table —
    # the catalog schema is the baseline, not a ceiling
    from plugin_singer_spark.lake.evolution import evolve_schema

    inband: dict[str, T.StructType] = {}
    for _seq, s_name, struct_ib, _keys in messages.collect_schemas(env, topts):
        inband[s_name] = (
            struct_ib if s_name not in inband else evolve_schema(inband[s_name], struct_ib)
        )

    report: dict[str, Any] = {}
    for s in catalog.selected():
        struct = s.spark_schema(topts)
        keep = [p for p in s.selected_properties()]
        # keys are always kept (inclusion=automatic in the reference)
        cols = list(dict.fromkeys(s.key_properties + keep))
        struct = T.StructType([f for f in struct.fields if f.name in cols])
        if s.stream in inband:
            # columns the catalog doesn't know yet (mid-stream ADD COLUMN)
            known = set(f.name for f in s.spark_schema(topts).fields)
            extra = [f for f in inband[s.stream].fields if f.name not in known]
            struct = evolve_schema(struct, T.StructType(list(struct.fields) + extra))
        struct = T.StructType(list(struct.fields) + [T.StructField("op", T.StringType())])
        recs = messages.records_for_stream(env, s.stream, struct, keep_envelope=("seq",))
        recs = recs.withColumn("op", F.coalesce(F.col("op"), F.lit("U")))
        # per-stream WHERE + limit (taps/BigQuery.java:46-50,128-141): the
        # predicate pushes into the scan; the cap is by ascending seq so it
        # is deterministic across partitionings
        md = s.stream_node().metadata
        if md.get("where"):
            recs = recs.filter(F.expr(md["where"]))
        if md.get("limit") is not None:
            recs = recs.orderBy("seq").limit(int(md["limit"]))
        if transform is not None:
            recs = transform(recs)
        tpath = os.path.join(root, s.stream)
        tschema = T.StructType([f for f in recs.schema.fields if f.name not in ("op", "seq")])
        # keyless stream (e.g. discovered from raw records, where the source
        # metadata that names PKs isn't available): full-row identity key —
        # append-only semantics, like reference targets without a PK
        # (primary_key_required=false, targets/PipelinewisePostgres.java:160)
        keys = s.key_properties or [f.name for f in tschema.fields]
        created = not LakeTable.exists(tpath)
        table = (
            LakeTable.create(spark, tpath, tschema, keys, num_buckets=int(cfg.get("num_buckets", 8)))
            if created
            else LakeTable(spark, tpath)
        )
        method, repl_key = s.replication()
        method = (method or cfg.get("replication_method", "LOG_BASED")).upper()
        if method == "INCREMENTAL":
            if not repl_key:
                raise ValueError(
                    f"stream {s.stream!r}: INCREMENTAL replication requires a "
                    "replication-key (services/SelectedService.java:57-61)"
                )
            rep = sync_incremental(
                table, recs, replication_key=repl_key, stream=s.stream,
                bookmark=seq_bookmark(table, s.stream),
            )
        elif method == "FULL_TABLE":
            rep = sync_full_table(table, recs, stream=s.stream)
        else:
            rep = replay_cdc(
                table, recs, stream=s.stream, epoch=epoch,
                checkpoint_id=checkpoint_id, mode=mode,
            )
            if rep.record_count > 0:
                # ACTIVATE_VERSION (Singer full-resync fence): rows older
                # than the activation point were not re-sent — drop them
                from plugin_singer_spark.lake.merge import activate_version

                acts = [
                    fence for _q, nm, fence in messages.collect_activate_versions(env) if nm == s.stream
                ]
                if acts:
                    activate_version(table, below_seq=max(acts))
            compact(table, min_delta_files=1)
        if rep.record_count == 0 and created and not persist_empty:
            shutil.rmtree(tpath, ignore_errors=True)
            report[s.stream] = {"events": 0, "table": None, "replication_method": method}
            continue
        table.read().createOrReplaceTempView(s.stream)  # lazy — for SQL hooks
        report[s.stream] = {
            "events": rep.record_count,
            "final_rows": _final_rows(table),
            "table": tpath,
            "replication_method": method,
            "columns": [f.name for f in table.snapshot().schema.fields],
        }
    _run_sql_hooks(spark, cfg.get("after_sql"))
    return {"streams": report}


def run_job(spark: SparkSession, cfg: dict[str, Any]) -> dict[str, Any]:
    if "catalog" in cfg or "tables_root" in cfg:
        return run_catalog_job(spark, cfg)
    from plugin_singer_spark.ingest.pipeline import sync_full_table, sync_incremental, seq_bookmark
    from plugin_singer_spark.ingest.streaming import replay_chunked, replay_files
    from plugin_singer_spark.lake.table import LakeTable

    src = cfg["source"]
    stream = src.get("stream", "repos")
    method = cfg.get("replication_method", "LOG_BASED").upper()
    mode = cfg.get("write_mode", "mor")
    checkpoint_id = cfg.get("checkpoint_id", "job")
    tcfg = cfg["table"]
    quarantine_path = cfg.get("quarantine_path") or (
        tcfg["path"].rstrip("/") + "_quarantine" if cfg.get("validate") else None
    )
    transform = _build_transform(cfg, quarantine_path)

    if cfg.get("before_sql"):
        if LakeTable.exists(tcfg["path"]):
            LakeTable(spark, tcfg["path"]).read().createOrReplaceTempView(stream)
        _run_sql_hooks(spark, cfg["before_sql"])

    table = _open_table(spark, cfg)

    if method == "LOG_BASED" and src.get("format", "parquet") in ("parquet", "jsonl"):
        record_schema = None
        if src.get("format", "parquet") == "jsonl":
            cols = dict(cfg["table"]["columns"])
            cols.setdefault("op", "string")
            record_schema = _struct_from_columns(cols)
        if cfg.get("streaming"):
            # Structured Streaming driver: Spark checkpoint + epoch fence.
            # batch_wait_limit_seconds (targets/PipelinewiseSnowflake.java:
            # 300-304) maps to a processingTime trigger; absent, the run is
            # bounded (availableNow ≈ break_at_end_lsn).
            from plugin_singer_spark.ingest.streaming import stream_binlog

            events_before = sum(
                r.get("source_rows") or 0 for r in table.snapshot().lineage
            )
            wait = cfg.get("batch_wait_limit_seconds")
            q = stream_binlog(
                spark,
                table,
                src["path"],
                cfg.get("stream_checkpoint_dir") or (tcfg["path"].rstrip("/") + "_ckpt"),
                stream=stream,
                checkpoint_id=checkpoint_id,
                max_files_per_trigger=int(src.get("files_per_batch", 8)),
                available_now=wait is None,
                processing_time=(f"{int(wait)} seconds" if wait is not None else None),
                input_format=src.get("format", "parquet"),
                record_schema=record_schema,
                transform=transform,
                mode=mode,
            )
            if wait is None:
                q.awaitTermination()
            out = {
                # this run's events only: lineage delta (a fenced re-run
                # commits nothing, so the delta is correctly 0)
                "events": sum(r.get("source_rows") or 0 for r in table.snapshot().lineage)
                - events_before,
                "batches": table.last_committed_epoch(checkpoint_id) + 1,
                "streaming": True,
            }
            if wait is not None:
                out["query_id"] = str(q.id)  # caller owns the long-running query
        else:
            stats = replay_files(
                spark,
                table,
                src["path"],
                files_per_batch=int(src.get("files_per_batch", 8)),
                stream=stream,
                checkpoint_id=checkpoint_id,
                input_format=src.get("format", "parquet"),
                record_schema=record_schema,
                mode=mode,
                compact_every=cfg.get("compact_every"),
                transform=transform,
            )
            out = {"events": stats.events, "batches": stats.batches}
    elif method == "LOG_BASED":
        # generic/jdbc CDC source: a DataFrame of change events replayed in
        # seq-range micro-batches through the same fenced merge
        stats = replay_chunked(
            table,
            _load_source(spark, src),
            batch_events=int(src.get("batch_events", 1_000_000)),
            stream=stream,
            checkpoint_id=checkpoint_id,
            mode=mode,
            final_compact=(mode == "mor"),
            transform=transform,
        )
        out = {"events": stats.events, "batches": stats.batches}
    elif method == "INCREMENTAL":
        key = cfg["replication_key"]
        df = _load_source(spark, src)
        if transform is not None:
            df = transform(df)
        rep = sync_incremental(
            table,
            df,
            replication_key=key,
            stream=stream,
            bookmark=seq_bookmark(table, stream),
            inclusive=bool(cfg.get("start_always_inclusive", True)),
        )
        out = {"events": rep.record_count, "batches": 1}
    elif method == "FULL_TABLE":
        df = _load_source(spark, src)
        if transform is not None:
            df = transform(df)
        rep = sync_full_table(
            table, df, stream=stream, truncate=cfg.get("load_method", "truncate") == "truncate"
        )
        out = {"events": rep.record_count, "batches": 1}
    else:
        raise ValueError(f"unknown replication_method {method!r}")

    out.update(
        {
            "stream": stream,
            "snapshot_version": table.current_version(),
            "bookmarks": table.bookmarks(),
            "final_rows": _final_rows(table),
            # Singer METRIC parity (AbstractPythonSinger.java:322-356): the
            # per-run counter the reference extracts from tap stderr, with
            # the same name mangling / tag lowering (ingest/metrics.py)
            "metrics": [
                {
                    "type": "counter",
                    "metric": "singer.record.count",
                    "value": out["events"],
                    "tags": {"stream": stream.lower()},
                }
            ],
        }
    )
    if cfg.get("after_sql"):
        table.read().createOrReplaceTempView(stream)
        _run_sql_hooks(spark, cfg["after_sql"])
    return out


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="plugin_singer_spark ingest job")
    ap.add_argument("--config", required=True, help="path to job.json")
    ap.add_argument("--master", default=None, help="override master (default: env/local[*])")
    args = ap.parse_args(argv)
    with open(args.config) as f:
        cfg = json.load(f)

    from plugin_singer_spark.session import get_spark

    spark = get_spark(app_name=cfg.get("app_name", "singer-spark-job"), master=args.master)
    out = run_job(spark, cfg)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
