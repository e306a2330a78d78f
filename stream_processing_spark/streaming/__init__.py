from stream_processing_spark.streaming.job import StreamJob  # noqa: F401
from stream_processing_spark.streaming.stateful import stateful_running_count  # noqa: F401
