from chat_data_pipeline_spark.sources.io import (  # noqa: F401
    combine_sources,
    read_table,
    write_sink,
)
