"""Snapshot-based lake-table layer: atomic commits, bucketed layout,
copy-on-write MERGE, schema evolution, epoch fencing, time travel.

The BASELINE north_star calls for Iceberg MERGE INTO; this container ships
no Iceberg runtime jar, so the engine implements the same contract natively
on parquet + JSON manifests (an "Iceberg-shaped" format). Everything that
matters at 100 TB is preserved:

- data is hash-bucketed by the upsert key ⇒ a MERGE touches (reads AND
  rewrites) only the buckets containing changed keys — the analog of
  Iceberg ``bucket(N, repo, path)`` partition-spec pruning;
- commits are atomic snapshot swaps; readers always see a consistent
  version; time travel = read an older manifest;
- snapshot properties carry bookmarks + per-checkpoint epoch fences, so
  state and data commit together (exactly-once, north_rule);
- per-snapshot lineage records (source offset range → snapshot id → row
  counts) live in the manifest.
"""

from plugin_singer_spark.lake.table import LakeTable, Snapshot  # noqa: F401
from plugin_singer_spark.lake.merge import (  # noqa: F401
    activate_version,
    compact,
    lww_dedup,
    lww_dedup_salted,
    merge_append,
    merge_into,
    purge_deleted,
)
