"""stream_processing_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference stack (Nyepes/Stream-Processing: RainStorm
streaming, HyDFS storage, LogQuerier distributed grep), plus the relational
and large-scale training-data operators a 100 TB pipeline needs.

Layers (see SURVEY.md §7):
- ``session``    — SparkSession factory tuned for scale (AQE, Arrow, etc.)
- ``catalog``    — schema registry + loaders for the test tables
- ``operators``  — RainStorm operator parity (filter/project/flatMap/
                   stateful count) and full relational surface
- ``sources``    — grep-over-logs, text/CSV/parquet envelope readers
- ``functions``  — text analysis, dedup (exact/MinHash/SimHash), similarity
                   search, multimodal column plumbing
- ``store``      — dataset lifecycle (create/append/merge/get/ls) on tables
- ``streaming``  — Structured Streaming job API (exactly-once via checkpoint)
- ``plans``      — the 2-operator RainStorm Job contract re-expressed
"""

__version__ = "0.1.0"

from stream_processing_spark.session import get_spark  # noqa: F401
