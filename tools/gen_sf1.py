"""Generate the sf1 decade (10× sf0.1) for the scaling sweep.

/root/testdata ships three decades (sf0.001/0.01/0.1, read-only); the
100×-scale claims in SCALING.md rest on those plus plan shape. This
tool synthesizes ONE MORE decade for the most expensive headliners by
replicating sf0.1 ten times with replica-decorrelated content — the
"10 independent shards" scale profile: per-shard duplicate/similarity
density identical to sf0.1, near-zero cross-shard collisions, so a
linear-in-data operator should grow ~10× and any hidden quadratic
(pair joins, cluster cells, state) shows up super-linearly.

Decorrelation per table (replica k = 0 keeps the original rows):
- documents: doc_id += k·1e6; every whitespace token suffixed "_r{k}"
  so shingle/fingerprint spaces are disjoint across replicas (a bare
  text suffix would leave replicas at Jaccard ≈ 0.9 — 45× pair growth,
  a pathological rather than scaled workload); n_chars recomputed.
- events: event_id += k·1e8, user_id += k·1e7 (10× users, per-user
  activity constant — state and sessionization scale by keys).
- embeddings: vec_id += k·1e7; the vector is circular-shifted by k
  dims (norm- and distribution-preserving, cosine between a vector
  and its shift ≈ random — replicas land in independent cells).

Cached: regenerates only when the marker file disagrees. Output is
repo-local (.scaledata/sf1/, gitignored) — /root/testdata is never
written.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SRC = "/root/testdata/sf0.1"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scaledata",
    "sf1",
)
REPLICAS = 10
# v2: single-FILE parquet per table (the testdata layout) — the
# streaming _stream_dir stager symlinks the table path into a watch
# directory, and FileStreamSource does not follow directory symlinks
# v3: adds lineitem (disjoint order/part/supp key spaces per replica —
# ten independent co-purchase graphs, the linear-scaling profile for
# the graph tier)
# v4: adds orders (disjoint order/cust key spaces; dates unchanged so
# the day-domain frames SATURATE rather than grow — the real 100 TB
# shape for the rolling-median/winsorized r12 rows)
_PARAMS = {"src": SRC, "replicas": REPLICAS, "v": 4}


def ensure_sf1(spark) -> str:
    """Build .scaledata/sf1/{documents,events,embeddings}.parquet if
    missing/stale; returns the sf_dir."""
    marker = os.path.join(OUT, "_GENERATED")
    if os.path.exists(marker):
        with open(marker) as f:
            if json.load(f) == _PARAMS:
                return OUT
        shutil.rmtree(OUT)
    os.makedirs(OUT, exist_ok=True)

    import glob as _glob
    import tempfile

    from pyspark.sql import functions as F

    from stream_processing_spark.catalog import load_table

    def replicate(df, mutate):
        parts = [mutate(df, k) for k in range(REPLICAS)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def write_single_file(df, table):
        """One part file moved to OUT/<table>.parquet — the testdata
        layout (row-group splits keep scans parallel)."""
        tmp = tempfile.mkdtemp(prefix=f"sf1_{table}_")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = _glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(OUT, f"{table}.parquet"))
        shutil.rmtree(tmp, ignore_errors=True)

    docs = load_table(spark, SRC, "documents")

    def mut_docs(df, k):
        if k == 0:
            return df
        text = F.regexp_replace("text", r"(\S+)", rf"$1_r{k}")
        return df.select(
            (F.col("doc_id") + k * 1_000_000).alias("doc_id"),
            text.alias("text"),
            "lang",
            "source",
            F.length(text).cast("long").alias("n_chars"),
        )

    write_single_file(replicate(docs, mut_docs), "documents")

    events = load_table(spark, SRC, "events")

    def mut_events(df, k):
        if k == 0:
            return df
        return df.select(
            (F.col("event_id") + k * 100_000_000).alias("event_id"),
            "ts",
            (F.col("user_id") + k * 10_000_000).alias("user_id"),
            "event_type",
            "value",
            "props",
        )

    write_single_file(replicate(events, mut_events), "events")

    emb = load_table(spark, SRC, "embeddings")
    dim = len(emb.select("embedding").head()["embedding"])

    def mut_emb(df, k):
        if k == 0:
            return df
        shifted = F.expr(
            f"transform(sequence(0, {dim - 1}), "
            f"i -> element_at(embedding, (CAST(i AS INT) + {k}) % {dim} + 1))"
        ).cast("array<float>")
        return df.select(
            (F.col("vec_id") + k * 10_000_000).alias("vec_id"),
            shifted.alias("embedding"),
            "label",
        )

    write_single_file(replicate(emb, mut_emb), "embeddings")

    li = load_table(spark, SRC, "lineitem")

    def mut_li(df, k):
        if k == 0:
            return df
        return df.select(
            (F.col("l_orderkey") + k * 100_000_000).alias("l_orderkey"),
            (F.col("l_partkey") + k * 1_000_000).alias("l_partkey"),
            (F.col("l_suppkey") + k * 100_000).alias("l_suppkey"),
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
        )

    write_single_file(replicate(li, mut_li), "lineitem")

    orders = load_table(spark, SRC, "orders")

    def mut_orders(df, k):
        if k == 0:
            return df
        return df.select(
            (F.col("o_orderkey") + k * 100_000_000).alias("o_orderkey"),
            (F.col("o_custkey") + k * 1_000_000).alias("o_custkey"),
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        )

    write_single_file(replicate(orders, mut_orders), "orders")

    with open(marker, "w") as f:
        json.dump(_PARAMS, f)
    return OUT


if __name__ == "__main__":
    from stream_processing_spark.session import get_spark

    spark = get_spark(app_name="gen-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    print(ensure_sf1(spark))
