"""On-disk model artifacts (functions/models.py + the model_cache
persistent layer, VERDICT r9 item 7): each trained constant-size
artifact — BPE merges, WordPiece merges, unigram vocab, DSIR bucket
weights — must round-trip through parquet EXACTLY, and a fresh
"session" (in-process cache cleared, model dir configured) must serve
queries from the loaded artifact without re-running a single training
job."""

from __future__ import annotations

import pytest

from stream_processing_spark.catalog import load_table
from stream_processing_spark.functions import model_cache as mc
from stream_processing_spark.functions import models as m

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def model_dir(tmp_path):
    mc.clear_model_cache()
    mc.set_model_dir(str(tmp_path))
    yield str(tmp_path)
    mc.set_model_dir(None)
    mc.clear_model_cache()


# ---------------------------------------------------------------------
# pure save/load round-trips (adversarial floats, unicode, ties)

def test_wordpiece_merges_round_trip_exact(spark, tmp_path):
    merges = [
        (1, "a", "b", 7, 0.1 + 0.2),          # classic non-representable
        (2, "é", "世", 3, 1e-17),    # unicode syms, tiny score
        (3, "x", "y", 1, 2.0 / 3.0),
    ]
    p = str(tmp_path / "wp")
    m.save_wordpiece_merges(spark, merges, p)
    back = m.load_wordpiece_merges(spark, p)
    assert back == merges  # bit-exact floats via repr round-trip


def test_unigram_vocab_round_trip_exact(spark, tmp_path):
    vocab = sorted([
        ("a", 10, "-1.234567"),
        ("ü", 2, "-10.000000"),
        ("zz", 1, "0.000000"),
    ])
    p = str(tmp_path / "uv")
    m.save_unigram_vocab(spark, vocab, p)
    assert m.load_unigram_vocab(spark, p) == vocab


def test_dsir_weights_round_trip_exact(spark, tmp_path):
    w = sorted([
        (0, 5, 7, repr(5.0 / 7.0)),
        (3, 0, 1, repr(0.0)),
        (9, 123456789, 1, repr(123456789.0)),
    ])
    p = str(tmp_path / "dw")
    m.save_dsir_weights(spark, w, p)
    assert m.load_dsir_weights(spark, p) == w


def test_bpe_merges_round_trip_exact(spark, tmp_path):
    merges = [(1, "t", "h", 42), (2, "th", "e", 17)]
    p = str(tmp_path / "bp")
    m.save_bpe_merges(spark, merges, p)
    assert m.load_bpe_merges(spark, p) == merges


# ---------------------------------------------------------------------
# serve-from-disk across a simulated session boundary: train once,
# clear the in-process cache (the part that dies with the driver),
# poison the trainer, and demand the identical artifact from parquet.

def _assert_serves_from_disk(monkeypatch, train_once, poison):
    art1 = train_once()
    mc.clear_model_cache()  # "new session": memory gone, disk stays
    poison(monkeypatch)
    art2 = train_once()     # must come from the parquet artifact
    assert art2 == art1


def test_bpe_train_serves_from_disk(spark, model_dir, monkeypatch):
    from stream_processing_spark.functions import bpe

    docs = load_table(spark, SF, "documents")
    _assert_serves_from_disk(
        monkeypatch,
        lambda: bpe.bpe_train(docs, n_merges=3),
        lambda mp: mp.setattr(
            bpe, "_bpe_train_uncached",
            lambda *a, **k: pytest.fail("retrained: disk artifact unused"),
        ),
    )


def test_wordpiece_train_serves_from_disk(spark, model_dir, monkeypatch):
    from stream_processing_spark.functions import bpe

    docs = load_table(spark, SF, "documents")
    _assert_serves_from_disk(
        monkeypatch,
        lambda: bpe.wordpiece_train(docs, n_merges=3),
        lambda mp: mp.setattr(
            bpe, "_wordpiece_train_uncached",
            lambda *a, **k: pytest.fail("retrained: disk artifact unused"),
        ),
    )


def test_unigram_vocab_serves_from_disk(spark, model_dir, monkeypatch):
    from stream_processing_spark.functions import unigram_lm

    docs = load_table(spark, SF, "documents")
    _assert_serves_from_disk(
        monkeypatch,
        lambda: unigram_lm.trained_vocab_rows(docs, rounds=1),
        lambda mp: mp.setattr(
            unigram_lm, "word_table",
            lambda *a, **k: pytest.fail("retrained: disk artifact unused"),
        ),
    )


def test_dsir_weights_serve_from_disk(spark, model_dir, monkeypatch):
    from stream_processing_spark.queries import curation6

    docs = load_table(spark, SF, "documents")

    def train_once():
        return sorted(
            map(tuple, curation6.dsir_bucket_weights(docs).collect())
        )

    _assert_serves_from_disk(
        monkeypatch,
        train_once,
        lambda mp: mp.setattr(
            curation6, "_dsir_bucket_stats",
            lambda *a, **k: pytest.fail("retrained: disk artifact unused"),
        ),
    )


def test_encode_query_serves_from_loaded_artifact(spark, model_dir,
                                                  monkeypatch):
    """End-to-end: the WordPiece ENCODE registry query runs entirely
    off the loaded artifact in a fresh session — identical output,
    zero training jobs."""
    from stream_processing_spark.functions import bpe
    from stream_processing_spark.queries import REGISTRY

    q = REGISTRY["wordpiece_encode_source_stats"].spark
    out1 = sorted(map(tuple, q(spark, SF).collect()))
    mc.clear_model_cache()
    monkeypatch.setattr(
        bpe, "_wordpiece_train_uncached",
        lambda *a, **k: pytest.fail("retrained: disk artifact unused"),
    )
    out2 = sorted(map(tuple, q(spark, SF).collect()))
    assert out2 == out1


def test_data_rewrite_invalidates_disk_artifact(spark, tmp_path,
                                                monkeypatch):
    """The digest keys on the source fingerprint: retraining MUST
    happen when the data behind the same path changes (a stale model
    served against new data is the failure mode that matters)."""
    import shutil

    from stream_processing_spark.functions import bpe

    data = tmp_path / "docs.parquet"
    models = tmp_path / "models"
    src = load_table(spark, SF, "documents").limit(50)
    src.write.mode("overwrite").parquet(str(data))
    mc.clear_model_cache()
    mc.set_model_dir(str(models))
    try:
        docs = spark.read.parquet(str(data))
        bpe.bpe_train(docs, n_merges=2)
        # rewrite the SAME path with different content
        shutil.rmtree(data)
        src.limit(10).write.mode("overwrite").parquet(str(data))
        mc.clear_model_cache()
        calls = []
        orig = bpe._bpe_train_uncached
        monkeypatch.setattr(
            bpe, "_bpe_train_uncached",
            lambda *a, **k: calls.append(1) or orig(*a, **k),
        )
        bpe.bpe_train(spark.read.parquet(str(data)), n_merges=2)
        assert calls, "stale disk artifact served after a data rewrite"
    finally:
        mc.set_model_dir(None)
        mc.clear_model_cache()
