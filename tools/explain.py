"""Print the formatted physical plan of any registry query.

Usage: python tools/explain.py <query_name> [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    if len(sys.argv) < 2:
        from stream_processing_spark.queries import REGISTRY

        print(__doc__)
        print("available:", ", ".join(sorted(REGISTRY)))
        return 2
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from pyspark.sql import SparkSession

    from stream_processing_spark.queries import REGISTRY

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    REGISTRY[name].spark(spark, sf_dir).explain("formatted")
    return 0


if __name__ == "__main__":
    sys.exit(main())
