from chat_data_pipeline_spark.streaming.pipeline import (  # noqa: F401
    read_events_stream,
    sessionize,
    stream_static_enrich,
    streaming_cms_table,
    streaming_datacard,
    streaming_hll_registers,
    streaming_value_histogram,
    streaming_clean_filter,
    streaming_decontaminate,
    streaming_exact_dedup,
    streaming_funnel,
    windowed_event_aggregates,
)
