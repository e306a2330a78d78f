from stream_processing_spark.plans.rainstorm import (  # noqa: F401
    OP_LIBRARY,
    parse_op,
    rainstorm,
    register_op,
    register_stateful_op,
)
