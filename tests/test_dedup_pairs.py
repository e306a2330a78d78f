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
