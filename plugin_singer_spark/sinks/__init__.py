from plugin_singer_spark.sinks.files import (  # noqa: F401
    write_csv_streams,
    write_jsonl_streams,
    write_parquet_streams,
)
from plugin_singer_spark.sinks.jdbc import write_jdbc_streams  # noqa: F401
