"""Training-shard writer contract: partition layout, in-file sort
order, size bounds, and partition pruning on read."""

from __future__ import annotations

import os

import pytest

from stream_processing_spark.catalog import load_table
from stream_processing_spark.shards import read_shard, write_shards

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def shard_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("shards")) + "/docs"
    docs = load_table(spark, SF, "documents").select("doc_id", "lang", "text")
    write_shards(
        docs, out, partition_cols=["lang"], sort_cols=["doc_id"],
        max_records_per_file=50,
    )
    return out


def test_partition_directories_and_size_bound(shard_dir):
    langs = {d for d in os.listdir(shard_dir) if d.startswith("lang=")}
    assert len(langs) >= 2
    # every parquet file respects the record bound
    import pyarrow.parquet as pq

    for root, _, files in os.walk(shard_dir):
        for f in files:
            if f.endswith(".parquet"):
                assert pq.ParquetFile(os.path.join(root, f)).metadata.num_rows <= 50


def test_in_file_sort_order(shard_dir):
    import pyarrow.parquet as pq

    checked = 0
    for root, _, files in os.walk(shard_dir):
        for f in files:
            if f.endswith(".parquet"):
                ids = pq.read_table(os.path.join(root, f), columns=["doc_id"])[
                    "doc_id"
                ].to_pylist()
                assert ids == sorted(ids)
                checked += 1
    assert checked > 0


def test_read_shard_prunes_partitions(spark, shard_dir):
    df = read_shard(spark, shard_dir, lang="en")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "lang" in plan.split("PartitionFilters")[1].split("]")[0]
    full = load_table(spark, SF, "documents")
    assert df.count() == full.filter(full.lang == "en").count() > 0
