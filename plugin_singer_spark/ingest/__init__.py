from plugin_singer_spark.ingest.pipeline import (  # noqa: F401
    IngestReport,
    replay_cdc,
    sync_full_table,
    sync_incremental,
)
from plugin_singer_spark.ingest.streaming import stream_binlog, replay_chunked  # noqa: F401
