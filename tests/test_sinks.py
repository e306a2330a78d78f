"""Idempotent foreachBatch sink: batch replay must not duplicate rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_processing_spark.streaming.sinks import (
    idempotent_batch_writer,
    read_sink,
)


def _write_files(d, rows_per_file: dict[str, list[str]]):
    d.mkdir(exist_ok=True)
    for name, lines in rows_per_file.items():
        (d / name).write_text("\n".join(lines) + "\n")


def test_streaming_writes_land_in_sink(spark, tmp_path):
    src, out, ckpt = tmp_path / "src", str(tmp_path / "out"), str(tmp_path / "ck")
    _write_files(src, {"a.txt": ["x,1", "y,2"], "b.txt": ["z,3"]})
    stream = spark.readStream.format("text").load(str(src))
    q = (
        stream.select(F.split("value", ",")[0].alias("k"))
        .writeStream.foreachBatch(idempotent_batch_writer(out))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["k"] for r in read_sink(spark, out).collect())
    assert got == ["x", "y", "z"]


def test_batch_replay_is_idempotent(spark, tmp_path):
    out = str(tmp_path / "out")
    writer = idempotent_batch_writer(out)
    batch = spark.createDataFrame([("x",), ("y",)], "k string")

    writer(batch, 7)
    writer(batch, 7)  # replay of the same batch id — must not duplicate
    writer(batch.filter(F.col("k") == "x"), 8)

    got = sorted(r["k"] for r in read_sink(spark, out).collect())
    assert got == ["x", "x", "y"]  # batch 7 once (x,y) + batch 8 (x)
