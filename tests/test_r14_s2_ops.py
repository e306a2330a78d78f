"""Round-14 session-2 operator internals: the conv()-based md5-prefix
parse, hash-before-distinct shingles, the CC round-1 shortcut and the
hashed LSH band sig must each reproduce the spelling they replaced."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_processing_spark.catalog import load_table
from stream_processing_spark.functions import dedup as dd
from stream_processing_spark.operators.graph import connected_components
from tests.conftest import SF_SMOKE


def _digit(h, pos):
    """The replaced per-digit spelling: value 0..15 of hex digit pos."""
    return F.instr(F.lit("0123456789abcdef"), F.substring(h, pos, 1)) - 1


def test_simhash60_matches_digit_decomposed_reference(spark):
    """conv(substr(md5,1,15),16,10) bit b ≡ the old
    (d_{14-b//4} >> b%4) & 1 digit decomposition, end to end."""
    docs = load_table(spark, SF_SMOKE, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).withColumn("h", F.md5("tok"))
    digs = [_digit(F.col("h"), d + 1).alias(f"d{d}") for d in range(15)]
    tok = tok.select("doc_id", *digs)
    bit_sums = [
        F.sum(
            F.when(
                F.shiftright(F.col(f"d{14 - b // 4}"), b % 4)
                .bitwiseAND(F.lit(1)) == 1,
                1,
            ).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(60)
    ]
    per_doc = tok.groupBy("doc_id").agg(*bit_sums)
    fp = None
    for b in range(60):
        term = F.when(
            F.col(f"s{b}") > 0, F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        fp = term if fp is None else fp + term
    ref = {
        r.doc_id: r.simhash
        for r in per_doc.select("doc_id", fp.alias("simhash")).collect()
    }
    got = {r.doc_id: r.simhash for r in dd.simhash60(docs).collect()}
    assert got == ref and ref


def test_hash64_shingles_reproduce_string_shingle_jaccard(spark):
    """hash-before-distinct vs distinct-then-hash: identical pairs
    (collisions aside, which the fixed testdata does not produce)."""
    docs = load_table(spark, SF_SMOKE, "documents")
    a = sorted(
        map(
            tuple,
            dd.jaccard_pairs(
                dd.shingles(docs, n=3), threshold=0.8, max_df=20
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            dd.jaccard_pairs(
                dd.shingles(docs, n=3, hash64=True), threshold=0.8, max_df=20
            ).collect(),
        )
    )
    assert a == b and a


def test_cc_round1_shortcut_star_graph_converges_in_two_rounds(spark):
    """A star graph is done after round 1; the driver loop needs one
    confirming round — and the labels must be the min node."""
    edges = spark.createDataFrame(
        [(9, 3), (3, 7), (3, 5)], "src bigint, dst bigint"
    )
    stats: dict = {}
    out = {
        (r.node, r.component)
        for r in connected_components(edges, stats=stats).collect()
    }
    assert out == {(3, 3), (5, 3), (7, 3), (9, 3)}
    assert stats["rounds"] == 2


def test_cc_round1_shortcut_chain_still_exact(spark):
    """A 12-node chain exceeds the propagation budget and must still
    close exactly through the contract+star phase."""
    n = 12
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src bigint, dst bigint"
    )
    out = {
        (r.node, r.component)
        for r in connected_components(edges, src="src", dst="dst").collect()
    }
    assert out == {(i, 0) for i in range(n)}


def test_lsh_candidate_pairs_match_string_sig_reference(spark):
    """Hashed band sigs must produce the exact candidate set the
    md5-string join produced."""
    docs = load_table(spark, SF_SMOKE, "documents")
    sigs = dd.minhash_signatures(
        dd.shingles(docs, n=3, distinct=False), k=8
    )
    got = sorted(
        map(
            tuple,
            dd.lsh_candidate_pairs(sigs, bands=4, rows_per_band=2).collect(),
        )
    )
    buckets = dd.band_buckets(sigs, bands=4, rows_per_band=2)
    a = buckets.select(F.col("doc_id").alias("doc_a"), "band", "sig")
    b = buckets.select(F.col("doc_id").alias("doc_b"), "band", "sig")
    ref = sorted(
        map(
            tuple,
            a.join(b, ["band", "sig"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .distinct()
            .collect(),
        )
    )
    assert got == ref and got
