from __future__ import annotations

import pytest

# BEFORE any SparkSession exists: probe for a usable protobuf runtime
# (native or vendored) so transformWithState execution tests can run —
# the env vars must be set before the JVM launches for python workers
# to inherit them. Returns None harmlessly when the container can't.
from stream_processing_spark.compat import ensure_protobuf_runtime

TWS_RUNTIME = ensure_protobuf_runtime()

from stream_processing_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    from stream_processing_spark.catalog import TABLES

    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_ORACLE}/{t}.parquet')"
        )
    yield con
    con.close()
