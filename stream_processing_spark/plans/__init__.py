from stream_processing_spark.plans.rainstorm import OP_LIBRARY, parse_op, rainstorm  # noqa: F401
