from plugin_singer_spark.ingest.pipeline import (  # noqa: F401
    IngestReport,
    replay_cdc,
    sync_full_table,
    sync_incremental,
)
from plugin_singer_spark.ingest.streaming import (  # noqa: F401
    replay_chunked,
    replay_files,
    stream_binlog,
)
