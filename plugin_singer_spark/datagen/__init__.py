from plugin_singer_spark.datagen.binlog import (  # noqa: F401
    generate_binlog,
    expected_final_state,
    BinlogSpec,
)
