"""Schema evolution at the storage layer: a 100 TB table accretes files
written under older schemas; readers must handle added columns (old
files yield NULL), reordered columns, and widened partitions without
rewriting history."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_added_column_reads_null_for_old_files(spark, tmp_path):
    p = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, name string"
    ).write.parquet(p)
    # later writer adds a column; old files simply lack it
    spark.createDataFrame(
        [(3, "c", 30.0)], "id long, name string, score double"
    ).write.mode("append").parquet(p)

    df = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(df.columns) == {"id", "name", "score"}
    rows = {r.id: r.score for r in df.collect()}
    assert rows == {1: None, 2: None, 3: 30.0}
    # pushdown still works through the merged schema
    assert df.filter(F.col("score") > 10).count() == 1


def test_reordered_columns_resolve_by_name(spark, tmp_path):
    p = str(tmp_path / "t2")
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(p)
    spark.createDataFrame(
        [("b", 2)], "name string, id long"
    ).select("name", "id").write.mode("append").parquet(p)
    df = spark.read.option("mergeSchema", "true").parquet(p)
    got = sorted((r.id, r.name) for r in df.collect())
    assert got == [(1, "a"), (2, "b")]


def test_partition_column_type_widening(spark, tmp_path):
    # partition discovery must reconcile a partition column that a later
    # writer widened (int-looking dirs + a wider value): values resolve
    # under one inferred type instead of failing the scan
    p = str(tmp_path / "t3")
    spark.createDataFrame([(1, 7)], "id long, day int").write.partitionBy(
        "day"
    ).parquet(p)
    spark.createDataFrame(
        [(2, 4000000000)], "id long, day long"
    ).write.mode("append").partitionBy("day").parquet(p)
    df = spark.read.parquet(p)
    got = sorted((r.id, int(r.day)) for r in df.collect())
    assert got == [(1, 7), (2, 4000000000)]
