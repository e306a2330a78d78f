from stream_processing_spark.sources.grep import dgrep, dgrep_count  # noqa: F401
