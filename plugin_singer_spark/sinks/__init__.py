from plugin_singer_spark.sinks.files import write_csv_streams, write_jsonl_streams  # noqa: F401
