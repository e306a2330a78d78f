"""Certification-closure invariant: the driver records CORRECTNESS for
the FIRST 50 registry entries only, so every oracled query must be
either already hash-green in some past CORRECTNESS_r*.json or inside
the current window. Round 10 out-built its window (29 oracled queries
shipped with no certification slot — the r10 verdict's top item); this
test makes that state impossible to reach silently again."""

from __future__ import annotations

import glob
import json
import os

from stream_processing_spark.queries import REGISTRY

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _green_union() -> set[str]:
    green: set[str] = set()
    for f in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        try:
            d = json.load(open(f))
        except Exception:
            continue
        if not isinstance(d, dict):
            continue
        for k, v in d.items():
            if isinstance(v, dict) and v.get("hash_match"):
                green.add(k)
    return green


def test_every_oracled_query_is_certified_or_windowed():
    window = set(list(REGISTRY)[:50])
    green = _green_union()
    uncovered = [
        name
        for name, spec in REGISTRY.items()
        if spec.oracle is not None
        and name not in green
        and name not in window
    ]
    assert not uncovered, (
        f"{len(uncovered)} oracled queries have no driver CORRECTNESS "
        f"row AND no slot in the 50-query window — rotate _PRIORITY "
        f"(queries/__init__.py) or stop adding oracled queries this "
        f"round: {sorted(uncovered)}"
    )


def test_window_has_exactly_fifty_unique_entries():
    first = list(REGISTRY)[:50]
    assert len(set(first)) == 50
