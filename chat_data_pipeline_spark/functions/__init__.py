from chat_data_pipeline_spark.functions import analysis, cleaners, filters  # noqa: F401
