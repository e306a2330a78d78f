"""Property-based tests: custom operators vs brute-force Python references
on random inputs. The oracle suite proves fixed-dataset correctness; these
cover the input space (ties, empty groups, singletons, duplicates).

Spark round-trips are slow, so examples are few but each is adversarial
(hypothesis shrinks failures to minimal cases).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# (key, ts, id) rows; small key/ts domains force collisions and ties
_rows = st.lists(
    st.tuples(
        st.integers(0, 3),
        st.integers(0, 20),
        st.integers(0, 999),
    ),
    min_size=0,
    max_size=25,
)


@given(left=_rows, right=_rows)
@SET
def test_asof_join_matches_bruteforce(spark, left, right):
    from stream_processing_spark.operators.asof import asof_join

    ldf = spark.createDataFrame(
        [(k, t, i) for k, t, i in left] or [(0, 0, 0)],
        "k long, lts long, lid long",
    ).withColumn("lts", F.timestamp_seconds("lts"))
    rdf = spark.createDataFrame(
        [(k, t, i) for k, t, i in right], "k long, rts long, rid long"
    ).withColumn("rts", F.timestamp_seconds("rts"))

    out = asof_join(
        ldf, rdf, on="k", left_ts="lts", right_ts="rts", right_tiebreak="rid"
    )
    got = {
        (r["k"], r["lts"].timestamp(), r["lid"]): r["rid"] for r in out.collect()
    }

    for k, t, i in left or [(0, 0, 0)]:
        cands = [(rt, ri) for rk, rt, ri in right if rk == k and rt <= t]
        want = max(cands)[1] if cands else None
        assert got[(k, float(t), i)] == want, (k, t, i, cands)


@given(left=_rows, right=_rows, tol=st.one_of(st.none(), st.integers(0, 5)))
@SET
def test_asof_forward_tolerance_matches_bruteforce(spark, left, right, tol):
    from stream_processing_spark.operators.asof import asof_join

    ldf = spark.createDataFrame(
        [(k, t, i) for k, t, i in left] or [(0, 0, 0)],
        "k long, lts long, lid long",
    ).withColumn("lts", F.timestamp_seconds("lts"))
    rdf = spark.createDataFrame(
        [(k, t, i) for k, t, i in right], "k long, rts long, rid long"
    ).withColumn("rts", F.timestamp_seconds("rts"))

    out = asof_join(
        ldf, rdf, on="k", left_ts="lts", right_ts="rts",
        right_tiebreak="rid", direction="forward", tolerance_sec=tol,
    )
    got = {
        (r["k"], r["lts"].timestamp(), r["lid"]): r["rid"] for r in out.collect()
    }

    for k, t, i in left or [(0, 0, 0)]:
        cands = [
            (rt, ri) for rk, rt, ri in right
            if rk == k and rt >= t and (tol is None or rt - t <= tol)
        ]
        want = min(cands)[1] if cands else None
        assert got[(k, float(t), i)] == want, (k, t, i, cands)


@given(left=_rows, right=_rows, lookback=st.integers(1, 10))
@SET
def test_range_join_count_matches_bruteforce(spark, left, right, lookback):
    from stream_processing_spark.operators.rangejoin import range_join_count

    # unique left ids so the groupBy collapse is well-defined
    left = [(k, t, idx) for idx, (k, t, _) in enumerate(left)]
    ldf = spark.createDataFrame(
        left or [(0, 0, 0)], "k long, ts long, lid long"
    ).withColumn("ts", F.timestamp_seconds("ts"))
    rdf = spark.createDataFrame(
        right, "k long, rts long, rid long"
    ).withColumn("rts", F.timestamp_seconds("rts"))

    out = range_join_count(
        ldf,
        rdf.select("k", "rts"),
        on="k",
        left_ts="ts",
        right_ts="rts",
        lookback_sec=lookback,
        count_alias="n",
    )
    got = {r["lid"]: r["n"] for r in out.collect()}

    for k, t, lid in left or [(0, 0, 0)]:
        want = sum(
            1 for rk, rt, _ in right if rk == k and t - lookback < rt <= t
        )
        assert got[lid] == want, (k, t, lid, want)


_edges = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=1, max_size=20
)


@given(edges=_edges)
@SET
def test_connected_components_matches_unionfind(spark, edges):
    from stream_processing_spark.operators.graph import connected_components

    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(edf).collect()
    }

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    assert got == want


@given(
    big=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 99)),
                 min_size=0, max_size=25),
    small=st.lists(st.tuples(st.integers(0, 3), st.integers(100, 199)),
                   min_size=0, max_size=8),
    how=st.sampled_from(["inner", "left"]),
)
@SET
def test_salted_join_equals_plain(spark, big, small, how):
    from stream_processing_spark.operators.skew import salted_join

    bdf = spark.createDataFrame(big or [], "k long, bv long")
    sdf = spark.createDataFrame(small or [], "k long, sv long")
    plain = sorted(
        (r["k"], r["bv"], r["sv"])
        for r in bdf.join(sdf, "k", how).collect()
    )
    salted = sorted(
        (r["k"], r["bv"], r["sv"])
        for r in salted_join(bdf, sdf, "k", salt_buckets=4, how=how).collect()
    )
    assert plain == salted


@given(rows=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 100)),
                     min_size=1, max_size=30),
       buckets=st.integers(2, 8))
@SET
def test_salted_agg_equals_plain(spark, rows, buckets):
    from stream_processing_spark.operators.skew import (
        salted_count_by,
        salted_sum_by,
    )

    df = spark.createDataFrame(rows, "k long, v long")
    plain_cnt = {r["k"]: r["n"] for r in
                 df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    salted_cnt = {r["k"]: r["cnt"] for r in
                  salted_count_by(df, "k", salt_buckets=buckets).collect()}
    assert plain_cnt == salted_cnt

    plain_sum = {r["k"]: r["s"] for r in
                 df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    salted_sum = {r["k"]: r["total"] for r in
                  salted_sum_by(df, "k", F.col("v"), salt_buckets=buckets).collect()}
    assert plain_sum == salted_sum


@given(rows=_rows, gap=st.integers(1, 10))
@SET
def test_sessionize_matches_bruteforce(spark, rows, gap):
    """session_seq == 1 + number of preceding within-key gaps > gap_seconds,
    for any event set (duplicate timestamps, singletons, empty keys)."""
    from stream_processing_spark.operators.sessionize import with_sessions

    # de-dup (key, ts, id) so the (ts, id) order is total within a key
    rows = sorted(set(rows))
    df = spark.createDataFrame(
        rows or [(0, 0, 0)], "k long, tsec long, eid long"
    ).withColumn("ts", F.timestamp_seconds("tsec"))

    out = with_sessions(df, "k", "ts", gap_seconds=gap, order_cols=["ts", "eid"])
    got = {(r["k"], r["tsec"], r["eid"]): r["session_seq"] for r in out.collect()}

    for k in {r[0] for r in rows or [(0, 0, 0)]}:
        evs = sorted((t, i) for kk, t, i in (rows or [(0, 0, 0)]) if kk == k)
        seq = 0
        prev_t = None
        for t, i in evs:
            if prev_t is None or t - prev_t > gap:
                seq += 1
            prev_t = t
            assert got[(k, t, i)] == seq, (k, t, i, evs, gap)


@given(rows=_rows)
@SET
def test_resample_ffill_matches_bruteforce(spark, rows):
    """Dense per-key hourly grid; gaps carry the last value forward and
    zero-filled counts; boundaries equal each key's min/max hour."""
    from stream_processing_spark.operators.resample import resample_ffill

    rows = sorted(set(rows))
    df = spark.createDataFrame(
        rows or [(0, 0, 0)], "k long, hoff long, v long"
    ).withColumn("ts", F.timestamp_seconds(F.col("hoff") * 3600 + 17))

    out = resample_ffill(
        df,
        key_col="k",
        ts_col="ts",
        aggs=[F.sum("v").alias("val"), F.count(F.lit(1)).alias("n_events")],
        unit="hour",
        fill_cols=["val"],
        zero_cols=["n_events"],
    )
    got = {
        (r["k"], int(r["bucket_ts"].timestamp()) // 3600): (
            r["val_ffill"],
            r["n_events"],
        )
        for r in out.collect()
    }

    data = rows or [(0, 0, 0)]
    for k in {r[0] for r in data}:
        evs = [(h, v) for kk, h, v in data if kk == k]
        hours = sorted({h for h, _ in evs})
        assert {h for kk, h in got if kk == k} == set(
            range(hours[0], hours[-1] + 1)
        )
        last = None
        for h in range(hours[0], hours[-1] + 1):
            here = [v for hh, v in evs if hh == h]
            if here:
                last = sum(here)
            assert got[(k, h)] == (last, len(here)), (k, h, evs)


@given(pairs=st.lists(st.tuples(st.integers(0, 9), st.integers(0, 9)), max_size=15))
@SET
def test_canonical_from_pairs_matches_bruteforce(spark, pairs):
    """canonical(v) == min over {v} ∪ direct neighbors, any pair soup
    (self-loops, duplicates, both orientations)."""
    from stream_processing_spark.functions.dedup import canonical_from_pairs

    ids = sorted({i for p in pairs for i in p} | {0, 1})
    pdf = spark.createDataFrame(pairs or [(0, 0)], "id_a long, id_b long")
    idf = spark.createDataFrame([(i,) for i in ids], "vec_id long")

    got = {
        r["vec_id"]: r["canonical_id"]
        for r in canonical_from_pairs(pdf, idf).collect()
    }
    data = pairs or [(0, 0)]
    for v in ids:
        nbrs = {b for a, b in data if a == v} | {a for a, b in data if b == v}
        assert got[v] == min(nbrs | {v}), (v, nbrs)


def test_range_join_count_keeps_duplicate_left_rows(spark):
    # ADVICE r1: two identical left rows must each get their own count
    # row (not one collapsed row summing both)
    from datetime import datetime

    from stream_processing_spark.operators.rangejoin import range_join_count

    t = datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [("k", t), ("k", t)], "k string, lts timestamp"
    )
    right = spark.createDataFrame(
        [("k", datetime(2024, 1, 1, 11, 59, 30))], "k string, rts timestamp"
    )
    out = range_join_count(
        left, right, on="k", left_ts="lts", right_ts="rts", lookback_sec=60
    ).collect()
    assert len(out) == 2
    assert sorted(r.n_in_range for r in out) == [1, 1]


def test_asof_join_rejects_payload_collision(spark):
    from datetime import datetime

    import pytest

    from stream_processing_spark.operators.asof import asof_join

    t = datetime(2024, 1, 1)
    left = spark.createDataFrame([("k", t, 1.0)], "k string, lts timestamp, v double")
    right = spark.createDataFrame([("k", t, 2.0)], "k string, rts timestamp, v double")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on="k", left_ts="lts", right_ts="rts")


def test_weighted_reservoir_favors_heavy_rows(spark):
    # deterministic given the fixed corpus + md5: the exact-k weighted
    # sample must overrepresent heavy rows (mean selected weight well
    # above the corpus mean), stay at exactly k rows, and reproduce
    # identically on rerun
    from pyspark.sql import functions as F

    from stream_processing_spark.catalog import load_table
    from stream_processing_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.01"
    spec = REGISTRY["weighted_reservoir_sample"]
    rows = spec.spark(spark, sf).collect()
    assert len(rows) == 50
    assert rows == spec.spark(spark, sf).collect()  # rerun-stable

    docs = load_table(spark, sf, "documents")
    wt = F.least(F.ceil(F.col("n_chars") / 64.0).cast("bigint"), F.lit(16))
    corpus_mean = docs.agg(F.avg(wt)).head()[0]
    sample_mean = sum(r.wt for r in rows) / len(rows)
    # k/N is 10% here, so size-biasing is diluted vs the k<<N regime;
    # the deterministic fixture gives 5.72 vs 5.15 — assert a margin
    # safely inside that
    assert sample_mean > corpus_mean * 1.05, (sample_mean, corpus_mean)

    # mechanism exactness: each row's priority IS min over its wt
    # copies of md5("i:doc_id") — recomputed with hashlib
    import hashlib

    for r in rows[:10]:
        expect = min(
            hashlib.md5(f"{i}:{r.doc_id}".encode()).hexdigest()
            for i in range(r.wt)
        )
        assert r.priority == expect, (r.doc_id, r.priority, expect)


_bloom_keys = st.lists(
    st.one_of(st.none(), st.integers(-5, 15)), min_size=0, max_size=20
)


@given(big=_bloom_keys, build=_bloom_keys, m_bits=st.sampled_from([64, 256]))
@SET
def test_bloom_join_invariant_on_random_keys(spark, big, build, m_bits):
    # result invariance is THE bloom-join contract: for any key sets
    # (nulls, negatives, duplicates, empty sides) and any bitset size
    # (including saturated tiny filters), bloom_join == plain join
    from stream_processing_spark.operators import bloomjoin

    bigdf = spark.createDataFrame(
        [(k, i) for i, k in enumerate(big)], "k long, row_id long"
    ) if big else spark.createDataFrame([], "k long, row_id long")
    builddf = spark.createDataFrame(
        [(k,) for k in build], "k long"
    ) if build else spark.createDataFrame([], "k long")
    want = sorted(
        map(tuple, bigdf.join(builddf, on="k").collect())
    )
    got = sorted(
        map(
            tuple,
            bloomjoin.bloom_join(
                bigdf, builddf, big_key="k", m_bits=m_bits
            ).collect(),
        )
    )
    assert got == want


# documents over a tiny token alphabet: forces shared shingles,
# identical docs, sub-shingle-length docs, and containment chains
_docs = st.lists(
    st.lists(st.sampled_from("abcde"), min_size=0, max_size=8),
    min_size=0,
    max_size=8,
)


@given(docs=_docs)
@SET
def test_containment_pairs_matches_bruteforce(spark, docs):
    from stream_processing_spark.functions import dedup as dd

    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    if not rows:
        return
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.containment
        for r in dd.containment_pairs(
            dd.shingles(df, n=3), threshold=0.5, min_shingles=1
        ).collect()
    }

    def sh(words):
        return {
            " ".join(words[i : i + 3]) for i in range(len(words) - 2)
        }

    want = {}
    for ia, wa in enumerate(docs):
        for ib, wb in enumerate(docs):
            if ia == ib or not sh(wa):
                continue
            c = len(sh(wa) & sh(wb)) / len(sh(wa))
            if c >= 0.5:
                want[(ia, ib)] = round(c, 6)
    assert got == want, (got, want)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),   # user
            st.integers(min_value=0, max_value=9999),  # ts offset s
            st.sampled_from([1.0, 2.0, 2.0, None]),  # value (dupes+null)
        ),
        min_size=1,
        max_size=40,
    )
)
@SET
def test_scd2_history_invariants(spark, rows):
    """SCD2 properties on random change streams: per user the version
    intervals tile the timeline (valid_to[k] == valid_from[k+1]),
    exactly one open (is_current) version exists, versions are dense
    from 1, and consecutive equal values (null-safe) never open a new
    version."""
    import datetime

    from stream_processing_spark.queries.analytics_queries import (
        scd2_user_value_history,
    )

    base = datetime.datetime(2024, 1, 1)
    ev = [
        (i, base + datetime.timedelta(seconds=off), u, "view", v, "{}")
        for i, (u, off, v) in enumerate(rows)
    ]
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="scd2_fx_")
    spark.createDataFrame(
        ev,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet")
    )
    got = scd2_user_value_history(spark, d).collect()

    by_user: dict[int, list] = {}
    for r in got:
        by_user.setdefault(r["user_id"], []).append(r)
    # reference: collapse consecutive duplicates per user
    want_chains: dict[int, list] = {}
    for i, (u, off, v) in enumerate(rows):
        want_chains.setdefault(u, []).append((off, i, v))
    for u, chain in want_chains.items():
        chain.sort()
        collapsed = []
        for off, i, v in chain:
            if not collapsed or collapsed[-1] != v:
                collapsed.append(v)
        versions = sorted(by_user[u], key=lambda r: r["version"])
        assert [r["version"] for r in versions] == list(
            range(1, len(collapsed) + 1)
        )
        assert [r["value"] for r in versions] == collapsed
        assert sum(r["is_current"] for r in versions) == 1
        assert versions[-1]["is_current"] == 1
        for a, b in zip(versions, versions[1:]):
            assert a["valid_to"] == b["valid_from"]
        assert versions[-1]["valid_to"] is None
