"""JDBC relational sink: one table per stream through Spark's distributed
JDBC writer — the engine's counterpart to the reference's pipelinewise SQL
targets (targets/PipelinewisePostgres.java, targets/SqlServer.java,
targets/Oracle.java, targets/PipelinewiseRedshift.java).

Config parity (all keys optional except ``url``):

- ``default_target_schema`` / ``table_prefix`` — target table naming
  (SqlServer.java:112-118): ``<schema>.<prefix><stream>``.
- ``hard_delete`` (PipelinewisePostgres.java:104-106): when true, rows
  whose ``_sdc_deleted_at`` tombstone is set are DROPPED from the load
  (the relational table keeps only live rows); when false they load as-is
  (soft delete — the column rides along).
- ``primary_keys``: ``{stream: [cols]}`` — pre-load LWW dedup on the
  change-sequence column so an overwrite load is idempotent per key. A
  relational MERGE upsert is the lake table's job (lake/merge.py); this
  sink loads *final* states, so dedup-then-overwrite is the upsert-shaped
  path and append is the raw-feed path.
- ``batch_size_rows`` → JDBC ``batchsize`` (PipelinewisePostgres.java:153):
  rows per executor-side INSERT batch.
- ``parallelism`` / ``max_parallelism`` (PipelinewisePostgres.java:155-156):
  number of concurrent writer tasks (= JDBC connections). 0 keeps the
  DataFrame's own partitioning; -1 means one per CPU core, like the
  reference's thread pool.
- ``mode``: ``append`` (default) | ``overwrite``. Overwrite uses JDBC
  ``truncate=true`` so the table is truncated, not dropped — DDL, grants
  and indexes survive, matching how the pipelinewise targets reload.
- ``options``: passthrough JDBC writer options (driver, user, password,
  isolationLevel, ...).

The write itself is Spark's jdbc format: each partition opens one
connection and streams batched INSERTs — distributed, no driver-side row
materialization, which is what the 100 TB path needs from a relational
mirror load.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from plugin_singer_spark.lake.merge import lww_dedup
from plugin_singer_spark.lake.table import DELETED_AT, SEQ_FIELD


def jdbc_table_name(stream: str, schema: str | None = None, prefix: str | None = None) -> str:
    """``<default_target_schema>.<table_prefix><stream>``
    (SqlServer.java:112-118; Oracle quotes the same way at Oracle.java:111-118)."""
    name = f"{prefix}{stream}" if prefix else stream
    return f"{schema}.{name}" if schema else name


def write_jdbc_streams(
    records_by_stream: dict[str, DataFrame], cfg: dict
) -> dict[str, str]:
    """Load each stream's records into its JDBC table; returns
    ``{stream: qualified_table_name}`` (the sink contract)."""
    url = cfg["url"]
    schema = cfg.get("default_target_schema")
    prefix = cfg.get("table_prefix")
    mode = cfg.get("mode", "append")
    pk_map = cfg.get("primary_keys", {})
    parallelism = int(cfg.get("parallelism", 0))
    max_par = int(cfg.get("max_parallelism", 16))
    if parallelism == -1:
        parallelism = os.cpu_count() or 1
    options = dict(cfg.get("options", {}))
    if "batch_size_rows" in cfg:
        options.setdefault("batchsize", str(int(cfg["batch_size_rows"])))
    if mode == "overwrite":
        options.setdefault("truncate", "true")

    written: dict[str, str] = {}
    for stream, df in records_by_stream.items():
        keys = pk_map.get(stream)
        if keys:
            seq = SEQ_FIELD if SEQ_FIELD in df.columns else cfg.get("sequence_column", "seq")
            if seq in df.columns:
                df = lww_dedup(df, list(keys), seq_col=seq)
        if cfg.get("hard_delete") and DELETED_AT in df.columns:
            df = df.filter(df[DELETED_AT].isNull()).drop(DELETED_AT)
        if parallelism > 0:
            n = min(parallelism, max_par)
            df = df.coalesce(n) if df.rdd.getNumPartitions() > n else df.repartition(n)
        table = jdbc_table_name(stream, schema, prefix)
        (
            df.write.format("jdbc")
            .mode(mode)
            .option("url", url)
            .option("dbtable", table)
            .options(**options)
            .save()
        )
        written[stream] = table
    return written
