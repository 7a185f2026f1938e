"""plugin_singer_spark — a PySpark-native CDC / incremental-ingest engine.

Re-creates the query/data-processing capabilities of kestra-io/plugin-singer
(Singer-protocol tap→target pipelines: catalog discovery, stream/property
selection, FULL_TABLE / INCREMENTAL / LOG_BASED replication, bookmark state,
key-based upsert with last-writer-wins dedup, schema evolution, metrics and
lineage) as an idiomatic Spark engine:

- Singer-style SCHEMA/RECORD/STATE message streams parsed vectorized
  (Arrow/pandas batches, never per-row Python) into typed DataFrames.
- Key-partitioned, bucketed copy-on-write MERGE upserts into a snapshot-based
  lake table (``plugin_singer_spark.lake``) keyed by ``(repo, path)``.
- Exactly-once via idempotent epoch-fenced snapshot commits.
- Bookmark/replication-key incremental sync and log-based CDC replay via
  Structured Streaming ``foreachBatch``.

Reference parity citations live in each module's docstrings as
``reference-file:line`` pointers into /root/reference (kestra-io/plugin-singer).
"""

__version__ = "0.1.0"

from plugin_singer_spark.session import get_spark  # noqa: F401
