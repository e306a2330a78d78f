"""SimHash banding guarantee: at Hamming radius <= 3 the 4-byte band
join is EXACT (pigeonhole — a pair differing in <= 3 bits matches on at
least one of 4 bytes), so it must reproduce the brute-force answer."""

from __future__ import annotations

from itertools import combinations

from stream_processing_spark.catalog import load_table
from stream_processing_spark.functions import dedup as dd
from tests.conftest import SF_SMOKE


def test_simhash_band_join_is_exact_at_radius_3(spark):
    fp_df = dd.simhash32(load_table(spark, SF_SMOKE, "documents"))
    fps = {r.doc_id: r.simhash for r in fp_df.collect()}

    brute = {
        (a, b, bin(fps[a] ^ fps[b]).count("1"))
        for a, b in combinations(sorted(fps), 2)
        if bin(fps[a] ^ fps[b]).count("1") <= 3
    }
    banded = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in dd.simhash_pairs(fp_df, max_hamming=3).collect()
    }
    assert banded == brute
    assert brute, "no pairs at radius 3 — testdata assumption broken"


def test_simhash60_band_join_is_exact_at_radius_3(spark):
    """The production pair-mining width (15-bit blocks): same
    pigeonhole recall-1 guarantee, checked against brute force."""
    fp_df = dd.simhash60(load_table(spark, SF_SMOKE, "documents"))
    fps = {r.doc_id: r.simhash for r in fp_df.collect()}

    assert all(0 <= v < (1 << 60) for v in fps.values())
    brute = {
        (a, b, bin(fps[a] ^ fps[b]).count("1"))
        for a, b in combinations(sorted(fps), 2)
        if bin(fps[a] ^ fps[b]).count("1") <= 3
    }
    banded = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in dd.simhash_pairs(
            fp_df, max_hamming=3, fp_bits=60
        ).collect()
    }
    assert banded == brute


def test_simhash60_deterministic_across_partitionings(spark):
    """Bit b is the sign of an integer ±1 sum — partitioning must not
    change any fingerprint (same invariant test_runtime checks for
    simhash32)."""
    docs = load_table(spark, SF_SMOKE, "documents")
    a = sorted(map(tuple, dd.simhash60(docs.coalesce(1)).collect()))
    b = sorted(map(tuple, dd.simhash60(docs.repartition(7)).collect()))
    assert a == b


def test_containment_pairs_directional_subset(spark):
    """A short doc fully embedded in a long one: containment from the
    short side is 1.0, the reverse direction fails the threshold, and
    an unrelated doc pairs with neither. min_shingles floors out
    trivially-contained tiny docs."""
    short = "alpha beta gamma delta epsilon zeta eta"  # 5 shingles
    longd = short + " theta iota kappa lambda mu nu xi omicron pi rho"
    tiny = "alpha beta gamma"  # 1 shingle — under the floor
    other = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame(
        [(1, short), (2, longd), (3, tiny), (4, other)],
        "doc_id long, text string",
    )
    got = {
        (r.doc_a, r.doc_b, r.containment)
        for r in dd.containment_pairs(
            dd.shingles(df, n=3), threshold=0.9, min_shingles=5
        ).collect()
    }
    assert got == {(1, 2, 1.0)}, got
    # without the floor, the tiny doc is trivially contained in both
    got2 = {
        (r.doc_a, r.doc_b)
        for r in dd.containment_pairs(
            dd.shingles(df, n=3), threshold=0.9, min_shingles=1
        ).collect()
    }
    assert got2 == {(1, 2), (3, 1), (3, 2)}, got2
