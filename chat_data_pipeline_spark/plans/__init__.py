from chat_data_pipeline_spark.plans.pipeline import SparkPreprocessor  # noqa: F401
from chat_data_pipeline_spark.plans.registry import get_cleaner, get_filter  # noqa: F401
