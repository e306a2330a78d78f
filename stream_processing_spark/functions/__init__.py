from stream_processing_spark.functions import dedup, similarity, text  # noqa: F401
