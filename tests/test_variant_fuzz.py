"""Differential fuzz of VARIANT path extraction vs DuckDB JSON.

The variantq oracle queries pin one fixed shape; this sweep generates
random NESTED documents (objects/arrays/int/string leaves, depth <= 3)
and random paths — present leaf paths and absent ones — and asserts
``try_variant_get`` agrees with DuckDB's ``json_extract_string`` /
typed extraction on every (doc, path). Scope note: leaf strings are
alphanumeric+punct without quotes/backslashes — this fuzzes STRUCTURE
(nesting, arrays, index bounds, missing keys), not JSON string
escaping, which the engines normalize differently."""

from __future__ import annotations

import json
import random

import pytest
from pyspark.sql import functions as F

_CHARS = "abcXYZ09 _-.,:;!?"


def _gen_value(rng: random.Random, depth: int):
    r = rng.random()
    if depth >= 3 or r < 0.35:
        if rng.random() < 0.5:
            return rng.randint(-10**6, 10**6)
        return "".join(rng.choice(_CHARS) for _ in range(rng.randint(0, 8)))
    if r < 0.70:
        return {
            k: _gen_value(rng, depth + 1)
            for k in rng.sample(["a", "b", "c", "d", "e"], rng.randint(1, 3))
        }
    return [_gen_value(rng, depth + 1) for _ in range(rng.randint(1, 3))]


def _leaf_paths(val, prefix="$"):
    if isinstance(val, dict):
        for k, v in val.items():
            yield from _leaf_paths(v, f"{prefix}.{k}")
    elif isinstance(val, list):
        for i, v in enumerate(val):
            yield from _leaf_paths(v, f"{prefix}[{i}]")
    else:
        yield prefix, val


def test_variant_extraction_matches_duckdb_on_random_docs(spark, duck):
    rng = random.Random(13)
    docs, cases = [], []  # cases: (doc_id, path, expected_py_value)
    for i in range(60):
        root = {
            k: _gen_value(rng, 1)
            for k in rng.sample(["a", "b", "c", "d", "e"], rng.randint(1, 4))
        }
        doc = json.dumps(root)
        docs.append((i, doc))
        leaves = list(_leaf_paths(root))
        for path, v in rng.sample(leaves, min(4, len(leaves))):
            cases.append((i, path, v))
        cases.append((i, "$.zz.absent[9]", None))  # missing path -> NULL

    df = spark.createDataFrame(docs, "doc_id long, doc string")
    import pandas as pd

    duck.register("vfuzz_pd", pd.DataFrame(docs, columns=["doc_id", "doc"]))
    duck.execute(
        "CREATE OR REPLACE TABLE vfuzz_docs AS SELECT * FROM vfuzz_pd"
    )

    mismatches = []
    # evaluate all cases for one doc at a time in a single select each
    by_doc: dict[int, list[tuple[str, object]]] = {}
    for i, path, v in cases:
        by_doc.setdefault(i, []).append((path, v))
    for i, pvs in by_doc.items():
        row = df.where(F.col("doc_id") == i).select(
            *[
                F.try_variant_get(F.parse_json("doc"), p, "string").alias(
                    f"c{j}"
                )
                for j, (p, _) in enumerate(pvs)
            ]
        ).head()
        dres = duck.execute(
            "SELECT "
            + ", ".join(
                f"json_extract_string(doc, '{p}') AS c{j}"
                for j, (p, _) in enumerate(pvs)
            )
            + f" FROM vfuzz_docs WHERE doc_id = {i}"
        ).fetchone()
        for j, (p, want) in enumerate(pvs):
            s, d = row[j], dres[j]
            exp = None if want is None else str(want)
            if not (s == d == exp):
                mismatches.append((i, p, want, s, d))
    assert not mismatches, mismatches[:10]
