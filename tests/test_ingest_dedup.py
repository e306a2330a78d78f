"""Streaming incremental near-dup ingest (streaming/ingest_dedup.py):
the running MinHash-LSH corpus matches the batch computation exactly —
bands, candidate-pair set, once-per-pair discovery — and survives full
batch replay without duplicates."""

from __future__ import annotations

import glob
import os
import shutil
import time

from pyspark.sql import functions as F

from stream_processing_spark.catalog import load_table
from stream_processing_spark.functions import dedup as dd
from stream_processing_spark.streaming.ingest_dedup import (
    StreamingIngestDedup,
    band_buckets,
)

SF = "/root/testdata/sf0.001"


def _stage_batches(spark, tmp_path, n_batches=3):
    """Split the sf0.001 documents into arrival batches staged as
    parquet files with distinct mtimes."""
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    d = tmp_path / "src"
    d.mkdir()
    for i in range(n_batches):
        part = docs.where(F.col("doc_id") % n_batches == i)
        p = str(tmp_path / f"b{i}")
        part.coalesce(1).write.mode("overwrite").parquet(p)
        shutil.copy(
            glob.glob(p + "/part-*.parquet")[0], str(d / f"b{i}.parquet")
        )
        time.sleep(1.1)
    return docs, str(d)


def _drain(spark, src_dir, sink, ck):
    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .writeStream.foreachBatch(sink.writer())
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert not q.isActive


def test_streaming_ingest_matches_batch_lsh(spark, tmp_path):
    docs, src_dir = _stage_batches(spark, tmp_path)
    sink = StreamingIngestDedup(spark, str(tmp_path / "state"))
    ck = str(tmp_path / "ck")
    _drain(spark, src_dir, sink, ck)

    # corpus bands == batch bands over the full doc set
    batch_bands = band_buckets(
        dd.minhash_signatures(dd.shingles(docs, n=3), k=8)
    )
    got_bands = {
        (r.doc_id, r.band, r.sig) for r in sink.corpus_bands().collect()
    }
    want_bands = {(r.doc_id, r.band, r.sig) for r in batch_bands.collect()}
    assert got_bands == want_bands

    # pairs: set equality with the batch LSH candidates AND exactly-once
    # discovery (no pair appears in two batches)
    batch_pairs = {
        (r.doc_a, r.doc_b)
        for r in dd.lsh_candidate_pairs(
            dd.minhash_signatures(dd.shingles(docs, n=3), k=8)
        ).collect()
    }
    stream_pairs_rows = sink.candidate_pairs().collect()
    stream_pairs = {(r.doc_a, r.doc_b) for r in stream_pairs_rows}
    assert stream_pairs == batch_pairs
    assert len(stream_pairs_rows) == len(stream_pairs), "pair emitted twice"
    assert batch_pairs, "fixture produced no candidate pairs"

    # verification scores match the batch estimator (signature
    # agreement / k) for every pair
    sigs_all = dd.minhash_signatures(dd.shingles(docs, n=3), k=8)
    sig_map = {
        r.doc_id: tuple(r[f"h{s}"] for s in range(8))
        for r in sigs_all.collect()
    }
    for r in stream_pairs_rows:
        want = sum(
            1 for x, y in zip(sig_map[r.doc_a], sig_map[r.doc_b]) if x == y
        )
        assert r.n_agree == want and abs(
            r.est_jaccard - round(want / 8, 6)
        ) < 1e-9, (r, want)

    # full replay (commit log wiped, offsets intact): every batch
    # re-applies via dynamic partition overwrite — byte-stable outputs
    shutil.rmtree(os.path.join(ck, "commits"))
    _drain(spark, src_dir, sink, ck)
    again = sink.candidate_pairs().collect()
    assert len(again) == len(stream_pairs_rows)
    assert {(r.doc_a, r.doc_b) for r in again} == batch_pairs
