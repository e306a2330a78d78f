"""In-process trained-artifact cache — the serve-from-storage pattern.

Tokenizer merge lists, unigram vocabularies, DSIR bucket-weight tables,
classifier weights, and quantizer codebooks are all CONSTANT-size
artifacts (bounded by vocabulary/bucket/codebook size, never by corpus
size) that are expensive to TRAIN (multi-job ladders) and trivial to
SERVE. A production pipeline trains once and loads the artifact
(functions/models.py round-trips them through parquet); inside one
process this cache plays that role, keyed exactly like the PQ codebook
cache (similarity.py:237): the training frame's plan semanticHash plus
a source-file fingerprint (path, mtime, size), so rewriting the data
behind the same path retrains instead of serving a stale model.

Consumers: functions/bpe.py (BPE + WordPiece merges),
functions/unigram_lm.py (trained vocab rows),
queries/curation6.py (DSIR bucket weights; the quality classifier keeps
its pre-existing cache of the same shape). Artifacts stored here must
be plain picklable values (lists of tuples), NEVER DataFrames.

Persistence: when a model directory is configured (``set_model_dir``
or env ``SPARK_GRAFT_MODEL_DIR``), every cacheable artifact ALSO
round-trips through a typed parquet file (functions/models.py
save/load helpers) under ``<dir>/<tag>-<digest>``, digest = hash of
the same (plan, source fingerprint, params) key — so a NEW session
serves a previously trained model without re-running a single
training job, and rewriting the data behind the path retrains (the
digest changes). That is the real production contract the in-process
layer only approximates.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Callable

from pyspark.sql import DataFrame

_CACHE: dict[tuple, object] = {}
_CACHE_CAP = 64

_MODEL_DIR: str | None = os.environ.get("SPARK_GRAFT_MODEL_DIR") or None


def set_model_dir(path: str | None) -> None:
    """Configure (or disable, with None) the on-disk artifact store."""
    global _MODEL_DIR
    _MODEL_DIR = path


def _persisters():
    from stream_processing_spark.functions import models as m

    return {
        "bpe_merges": (m.save_bpe_merges, m.load_bpe_merges),
        "wordpiece_merges": (
            m.save_wordpiece_merges, m.load_wordpiece_merges,
        ),
        "unigram_vocab": (m.save_unigram_vocab, m.load_unigram_vocab),
        "dsir_weights": (m.save_dsir_weights, m.load_dsir_weights),
    }


def clear_model_cache() -> None:
    _CACHE.clear()


def cached_model(df: DataFrame, tag: str, params: tuple, train: Callable):
    """Return ``train()``'s artifact, served (in order) from the
    in-process cache, then the on-disk parquet store when one is
    configured, before falling back to training — and persisted to
    both layers after a train. ``train`` must return a constant-size
    plain value."""
    from stream_processing_spark.functions.similarity import (
        _source_fingerprint,
    )

    try:
        key = (df.semanticHash(), _source_fingerprint(df), tag, params)
    except Exception:  # plan not hashable (e.g. streaming) — skip cache
        key = None
    if key is not None and key in _CACHE:
        return _CACHE[key]

    spark = df.sparkSession
    disk = None
    if key is not None and _MODEL_DIR is not None:
        pair = _persisters().get(tag)
        if pair is not None:
            digest = hashlib.sha256(repr(key).encode()).hexdigest()[:16]
            disk = (pair, os.path.join(_MODEL_DIR, f"{tag}-{digest}"))
            save_fn, load_fn = pair
            if os.path.isdir(disk[1]):
                art = load_fn(spark, disk[1])
                _remember(key, art)
                return art

    art = train()
    if key is not None:
        _remember(key, art)
        if disk is not None:
            disk[0][0](spark, art, disk[1])
    return art


def _remember(key: tuple, art: object) -> None:
    if len(_CACHE) >= _CACHE_CAP:
        _CACHE.pop(next(iter(_CACHE)))
    _CACHE[key] = art
