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
      "source": {"format": "jsonl",          # jsonl (raw Singer) | parquet
                 "path": "/binlog/dir",
                 "stream": "repos",
                 "files_per_batch": 8},
      "replication_method": "LOG_BASED",     # | INCREMENTAL | FULL_TABLE
      "replication_key": "seq",              # INCREMENTAL only
      "write_mode": "mor",                   # mor | cow
      "checkpoint_id": "job",
      "validate": {...stream JSON-Schema...},      # optional (P15)
      "invalid_records_threshold": 0,              # optional
      "stream_map": {...}                          # optional (P19)
    }

The run prints one JSON line: events, batches, final snapshot version and
bookmarks — the ``Output{raw, count}`` analog
(taps/AbstractPythonTap.java:180-194). Re-running with the same
checkpoint_id resumes from the epoch fence (exactly-once).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Any

from pyspark.sql import SparkSession, types as T


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
    (models/DiscoverStreams.java:8-10); ``cfg["streams_configurations"]``
    are selection rules applied with last-config-wins regex semantics
    (services/SelectedService.java:13-68). Every SELECTED stream is demuxed
    out of the shared raw artifact, pruned to its selected properties
    (true column pruning before any shuffle), and merged into its own lake
    table under ``tables_root/<stream>`` using the stream's replication
    method. Per-stream record counts are reported like the reference's
    per-stream metrics (JsonTest.java:61-62: 8 category + 4 region).
    """
    from pyspark.sql import functions as F

    from plugin_singer_spark import messages
    from plugin_singer_spark.catalog import (
        StreamsConfiguration,
        catalog_from_discovery,
        fill,
        infer_metadata,
    )
    from plugin_singer_spark.ingest.pipeline import replay_cdc, sync_full_table, sync_incremental, seq_bookmark
    from plugin_singer_spark.lake.table import LakeTable

    catalog = catalog_from_discovery(cfg["catalog"])
    for s in catalog.streams:
        infer_metadata(s)  # bootstrap metadata for bare discovery docs
    catalog = fill(
        catalog,
        [StreamsConfiguration(**c) for c in cfg.get("streams_configurations", [])],
    )
    src = cfg["source"]
    root = cfg["tables_root"]
    mode = cfg.get("write_mode", "mor")
    env = messages.parse_lines(
        spark.read.text(src["path"]), line_col="value", seq_from_envelope=True
    )

    report: dict[str, Any] = {}
    for s in catalog.selected():
        struct = s.spark_schema()
        keep = [p for p in s.selected_properties()]
        # keys are always kept (inclusion=automatic in the reference)
        cols = list(dict.fromkeys(s.key_properties + keep))
        struct = T.StructType(
            [f for f in struct.fields if f.name in cols] + [T.StructField("op", T.StringType())]
        )
        recs = messages.records_for_stream(env, s.stream, struct, keep_envelope=("seq",))
        recs = recs.withColumn("op", F.coalesce(F.col("op"), F.lit("U")))
        tpath = os.path.join(root, s.stream)
        tschema = T.StructType([f for f in struct.fields if f.name != "op"])
        table = (
            LakeTable(spark, tpath)
            if LakeTable.exists(tpath)
            else LakeTable.create(spark, tpath, tschema, s.key_properties, num_buckets=int(cfg.get("num_buckets", 8)))
        )
        method, repl_key = s.replication()
        method = (method or cfg.get("replication_method", "LOG_BASED")).upper()
        if method == "INCREMENTAL" and repl_key:
            rep = sync_incremental(
                table, recs, replication_key=repl_key, stream=s.stream,
                bookmark=seq_bookmark(table, s.stream),
            )
        elif method == "FULL_TABLE":
            rep = sync_full_table(table, recs, stream=s.stream)
        else:
            rep = replay_cdc(table, recs, stream=s.stream, epoch=None, mode=mode)
        report[s.stream] = {
            "events": rep.record_count,
            "final_rows": table.read().count(),
            "table": tpath,
            "replication_method": method,
            "columns": [f.name for f in table.snapshot().schema.fields],
        }
    return {"streams": report}


def run_job(spark: SparkSession, cfg: dict[str, Any]) -> dict[str, Any]:
    if "catalog" in cfg:
        return run_catalog_job(spark, cfg)
    from plugin_singer_spark.ingest.pipeline import sync_full_table, sync_incremental, seq_bookmark
    from plugin_singer_spark.ingest.streaming import replay_files
    from plugin_singer_spark.operators.streammap import apply_stream_map
    from plugin_singer_spark.operators.validate import enforce_threshold, split_valid, validate_records

    table = _open_table(spark, cfg)
    src = cfg["source"]
    stream = src.get("stream", "repos")
    method = cfg.get("replication_method", "LOG_BASED").upper()
    mode = cfg.get("write_mode", "mor")
    checkpoint_id = cfg.get("checkpoint_id", "job")

    def load_batch_df():
        df = spark.read.parquet(src["path"])
        if cfg.get("stream_map"):
            df, _ = apply_stream_map(df, cfg["stream_map"])
        if cfg.get("validate"):
            validated = validate_records(df, cfg["validate"])
            enforce_threshold(
                validated, detect=True, threshold=int(cfg.get("invalid_records_threshold", 0))
            )
            df, _quarantine = split_valid(validated)
        return df

    if method == "LOG_BASED":
        record_schema = None
        if src.get("format", "parquet") == "jsonl":
            cols = dict(cfg["table"]["columns"])
            cols.setdefault("op", "string")
            record_schema = _struct_from_columns(cols)
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
        )
        out = {"events": stats.events, "batches": stats.batches}
    elif method == "INCREMENTAL":
        key = cfg["replication_key"]
        rep = sync_incremental(
            table,
            load_batch_df(),
            replication_key=key,
            stream=stream,
            bookmark=seq_bookmark(table, stream),
            inclusive=bool(cfg.get("start_always_inclusive", True)),
        )
        out = {"events": rep.record_count, "batches": 1}
    elif method == "FULL_TABLE":
        rep = sync_full_table(
            table, load_batch_df(), stream=stream, truncate=cfg.get("load_method", "truncate") == "truncate"
        )
        out = {"events": rep.record_count, "batches": 1}
    else:
        raise ValueError(f"unknown replication_method {method!r}")

    out.update(
        {
            "stream": stream,
            "snapshot_version": table.current_version(),
            "bookmarks": table.bookmarks(),
            "final_rows": table.read().count(),
        }
    )
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
