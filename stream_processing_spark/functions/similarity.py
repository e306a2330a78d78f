"""Similarity search over embedding columns (array<float>).

- ``cosine(a, b)`` — native higher-order functions (zip_with + aggregate),
  elementwise in double; a sequential left-fold, so the summation order is
  deterministic (and matches DuckDB's sequential list functions).
- ``brute_force_topk`` — broadcast the query vector, one scan, top-k via
  sort+limit (TakeOrderedAndProject). The exact baseline.
- ``cosine_pairs`` — all-pairs above a threshold. Quadratic by nature;
  correct at sf0.01, replaced by ``lsh_bucketed_pairs`` at scale.
- ``lsh_bucketed_pairs`` — random-hyperplane (sign) LSH: b-bit signatures
  from fixed seeded hyperplanes, candidate pairs share a signature bucket,
  exact cosine verifies candidates. Turns O(n²) into per-bucket joins.
"""

from __future__ import annotations

import pandas as pd  # module-global: pandas_udf type hints resolve here

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stream_processing_spark.runtime import materialize


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


# NOTE on a rejected "optimization": inlining literal-codebook dots as
# explicit element_at/multiply/add chains (instead of zip_with+aggregate
# folds) was tried and REVERTED — the expanded expressions blow janino's
# 64 KB generated-method limit on the 32-plane signature and 256-codeword
# ADC paths, and Spark's fallback (compile-attempt per task + interpreted
# projection of the huge tree) benchmarked 2-6x SLOWER than the fold
# (ann_lsh_bucketed_pairs 2.8s -> 16.3s at sf0.1). The fold's per-row
# interpretation cost is dwarfed by plan-compilation overhead, which is
# CONSTANT in data volume — the right trade at 100 TB.
#
# What WAS worth fixing: building those folds through the PySpark
# higher-order-function API costs ~17 ms of py4j round-trips PER dot at
# expression-CONSTRUCTION time (lambda plumbing) — 512 codebook dots ≈
# 18 s of driver-side Python before any job runs. _dot_sql builds the
# IDENTICAL Catalyst expression via one spark-SQL string parsed
# JVM-side (same zip_with/aggregate/casts, so results are bit-equal),
# collapsing construction to milliseconds.


def _dot_sql(vec_sql: str, weights: list[float]) -> str:
    """SQL text for ``dot(<vec_sql>, array(<literal weights>))`` —
    parses to the exact expression ``dot`` builds (verified equal)."""
    lits = ", ".join(repr(float(w)) + "D" for w in weights)
    return (
        f"aggregate(zip_with({vec_sql}, array({lits}), "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "0D, (acc, x) -> acc + x)"
    )


def _self_dot_sql(vec_sql: str) -> str:
    lits_free = (
        f"aggregate(zip_with({vec_sql}, {vec_sql}, "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "0D, (acc, x) -> acc + x)"
    )
    return lits_free


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k nearest (cosine) to the vector with query_vec_id."""
    q = embeddings.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("__q")
    )
    sim = F.round(cosine(F.col(vec_col), F.col("__q")), 6)
    return (
        embeddings.filter(F.col(id_col) != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(F.col(id_col), sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def cosine_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine >= threshold (brute force, id_a < id_b).

    Norms are computed ONCE per vector before the join (O(n·dim)), not
    per pair (O(n²·dim)); `sqrt(dot(v,v))` is the same double either
    way, so results are bit-identical to the inline-cosine form."""
    a = embeddings.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        norm(F.col(vec_col)).alias("na"),
    )
    b = embeddings.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        norm(F.col(vec_col)).alias("nb"),
    )
    sim = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", F.round(sim, 6))
        .filter(sim >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Fixed seeded random hyperplanes (deterministic across runs)."""
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]


def signature_col(vec: Column | str, planes: list[list[float]]) -> Column:
    """Sign-LSH signature string, one char per hyperplane.

    Pass the vector as a SQL string (column name / slice expression)
    for the fast construction path (_dot_sql); a Column still works but
    pays the py4j lambda cost per plane."""
    if isinstance(vec, str):
        bits = [
            F.when(F.expr(_dot_sql(vec, p)) >= 0, F.lit("1")).otherwise(
                F.lit("0")
            )
            for p in planes
        ]
    else:
        bits = [
            F.when(
                dot(vec, F.array(*[F.lit(w) for w in p])) >= 0, F.lit("1")
            ).otherwise(F.lit("0"))
            for p in planes
        ]
    return F.concat(*bits)


def _cell_rank_sql(
    vec_sql: str, cents: dict[int, list[float]], metric: str = "cosine"
) -> str | None:
    """SQL text for the rank array (see _cell_rank_array); None when the
    codebook is empty. Kept as a STRING so composite expressions
    (per-subspace assignment arrays, ADC sums) can concatenate many of
    these into ONE spark-SQL parse instead of thousands of py4j-built
    Column objects — expression construction is driver-side and
    constant-in-data, but at 256 codewords it was multiple seconds per
    query."""
    if not cents:
        return None
    # ONE transform over an array-of-centroid-structs literal, instead
    # of an N-entry array of independent per-centroid subtrees. The
    # arithmetic is IDENTICAL per cell (same zip_with/aggregate fold,
    # same order), so results are bit-equal to the old form and to the
    # oracles — but the generated code is a small data-driven loop, so
    # codegen stays inside JIT limits at sqrt(N)-scaled cell counts
    # (the unrolled form at 141 cells fell off JIT: semantic dedup
    # measured 146 s vs 21 s at sf1).
    cent_lits = ", ".join(
        "named_struct('cv', array({}), 'nc', {})".format(
            ", ".join(repr(float(w)) + "D" for w in cvec), -cid
        )
        for cid, cvec in sorted(cents.items())
    )
    dot_vc = (
        f"aggregate(zip_with({vec_sql}, c.cv, "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "0D, (acc, x) -> acc + x)"
    )
    dot_cc = (
        "aggregate(zip_with(c.cv, c.cv, "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "0D, (acc, x) -> acc + x)"
    )
    if metric == "l2":
        s = f"{dot_vc} - 0.5D * {dot_cc}"
    else:
        s = (
            f"{dot_vc} / (sqrt({_self_dot_sql(vec_sql)}) * sqrt({dot_cc}))"
        )
    return (
        f"transform(array({cent_lits}), "
        f"c -> named_struct('s', {s}, 'nc', c.nc))"
    )


def _cells_vectorized_udf(cents: dict[int, list[float]], metric: str = "cosine"):
    """Arrow-batched numpy twin of ``-array_max(_cell_rank_array(...)).nc``
    — BIT-EXACT, not approximate: every dot accumulates per-DIMENSION
    across the row batch (``acc = acc + X[:, k] * c[k]``), which runs the
    identical IEEE add/mul sequence per row as the engine's sequential
    aggregate fold, so scores, ties, and the smallest-cid tie-break all
    match the HOF expression and the DuckDB oracles bit-for-bit.

    Why it exists: higher-order functions are CodegenFallback —
    interpreted per row, measured ~300 µs/row on a 16-cell 64-dim rank
    (ann_ivfpq_topk spent 5-6 s of its sf1 wall in ONE such map). The
    vectorized twin does the same arithmetic in ~1 ms per 10k-row Arrow
    batch. The expression form stays the source of truth for oracles and
     1-row lookups; hot full-scan assignment paths use this twin."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cids = sorted(cents)
    cvecs = [np.asarray(cents[c], dtype=np.float64) for c in cids]

    @pandas_udf("int")
    def cell_of(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype="int32")
        X = np.array(list(emb), dtype=np.float64)
        n, d = X.shape
        if metric == "cosine":
            vv = np.zeros(n)
            for k in range(d):
                vv = vv + X[:, k] * X[:, k]
            nv = np.sqrt(vv)
        best_s = None
        best_c = None
        for cid, cv in zip(cids, cvecs):
            acc = np.zeros(n)
            for k in range(d):
                acc = acc + X[:, k] * cv[k]
            cc = 0.0
            for k in range(d):
                cc = cc + cv[k] * cv[k]
            if metric == "l2":
                s = acc - 0.5 * cc
                nan = np.zeros(n, dtype=bool)
            else:
                with np.errstate(invalid="ignore", divide="ignore",
                                 over="ignore"):
                    s = acc / (nv * np.sqrt(cc))
                # Spark ranks NaN STRICTLY above every double,
                # including +inf (a nonzero dot over a denominator
                # that underflows to +0 scores a genuine +inf), so
                # NaN is tracked as an explicit mask rather than
                # mapped onto inf — mapping would tie the two and
                # hand the win to the smaller cid (ADVICE r9).
                nan = np.isnan(s)
                s = np.where(nan, -np.inf, s)
            if best_s is None:
                best_s = s
                best_nan = nan
                best_c = np.full(n, cid, dtype=np.int64)
            else:
                # strict rank: NaN beats non-NaN; equal NaN-ness
                # falls back to score; ties keep the smaller cid
                upd = (nan & ~best_nan) | (
                    ~nan & ~best_nan & (s > best_s)
                )
                best_s = np.where(upd, s, best_s)
                best_nan = np.where(upd, nan, best_nan)
                best_c = np.where(upd, cid, best_c)
        return pd.Series(best_c.astype("int32"))

    return cell_of


def _pq_cells_vectorized_udf(
    seeds: dict[int, dict[int, list[float]]], m: int, dim: int
):
    """Arrow-batched twin of the m per-subspace L2 assignment columns in
    ``pq_codebooks`` (same bit-exact per-dim accumulation and
    smallest-cid ties as _cells_vectorized_udf), returning all m cell
    ids as one array<int> per row — one Arrow pass instead of m
    interpreted HOF folds."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    sub = dim // m
    subbooks = [
        [(c, np.asarray(seeds[j][c], dtype=np.float64))
         for c in sorted(seeds[j])]
        for j in range(m)
    ]

    @pandas_udf("array<int>")
    def cells_of(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype="object")
        X = np.array(list(emb), dtype=np.float64)
        n = X.shape[0]
        out = np.empty((n, m), dtype=np.int32)
        for j in range(m):
            Xs = X[:, j * sub : (j + 1) * sub]
            best_s = None
            best_c = None
            for cid, cv in subbooks[j]:
                acc = np.zeros(n)
                for k in range(sub):
                    acc = acc + Xs[:, k] * cv[k]
                cc = 0.0
                for k in range(sub):
                    cc = cc + cv[k] * cv[k]
                s = acc - 0.5 * cc
                if best_s is None:
                    best_s = s
                    best_c = np.full(n, cid, dtype=np.int32)
                else:
                    upd = s > best_s
                    best_s = np.where(upd, s, best_s)
                    best_c = np.where(upd, cid, best_c)
            out[:, j] = best_c
        return pd.Series(list(out))

    return cells_of


def _adc_vectorized_udf(
    books: dict[int, dict[int, list[float]]],
    qvec: list[float],
    m: int,
    dim: int,
):
    """Arrow-batched twin of ``_pq_adc_score``'s expression: per
    subspace, L2-assign the best codeword (x·c − 0.5·c·c, sequential
    per-dim accumulation = the engine's fold, smallest-cid ties), look
    up the driver-folded LUT value, and sum subspace terms left to
    right — the same IEEE sequence as the engine's `t0 + t1 + ...`
    expression, so the raw double is bit-identical and the engine-side
    ROUND(…, 6) on top matches the oracle."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    sub = dim // m
    luts = []
    subbooks = []
    for j in range(m):
        cb = books[j]
        cids = sorted(cb)
        luts.append(
            np.asarray(
                [_fold_dot(qvec[j * sub : (j + 1) * sub], cb[c]) for c in cids]
            )
        )
        subbooks.append([np.asarray(cb[c], dtype=np.float64) for c in cids])

    @pandas_udf("double")
    def adc_of(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype="float64")
        X = np.array(list(emb), dtype=np.float64)
        n = X.shape[0]
        total = np.zeros(n)
        for j in range(m):
            Xs = X[:, j * sub : (j + 1) * sub]
            best_s = None
            best_code = None
            for code, cv in enumerate(subbooks[j]):
                acc = np.zeros(n)
                for k in range(sub):
                    acc = acc + Xs[:, k] * cv[k]
                cc = 0.0
                for k in range(sub):
                    cc = cc + cv[k] * cv[k]
                s = acc - 0.5 * cc
                if best_s is None:
                    best_s = s
                    best_code = np.zeros(n, dtype=np.int64)
                else:
                    upd = s > best_s
                    best_s = np.where(upd, s, best_s)
                    best_code = np.where(upd, code, best_code)
            total = total + luts[j][best_code]
        return pd.Series(total)

    return adc_of


def _cell_rank_array(
    vec_sql: str, cents: dict[int, list[float]], metric: str = "cosine"
) -> Column:
    """array<struct<s: affinity-to-centroid, nc: -cid>> — array_max picks
    the best cell (highest score, ties → lowest cid); sorted tail gives
    nprobe. ``metric='cosine'`` scores angular affinity; ``'l2'`` scores
    -0.5·‖x−c‖² up to a per-x constant (x·c − 0.5·c·c), i.e. nearest
    EUCLIDEAN centroid — the right assignment rule for PQ codebooks,
    where subvector magnitude carries signal. Both keep every float op
    engine-side (sequential folds), so an oracle engine reproduces the
    assignment bit-exactly."""
    sql = _cell_rank_sql(vec_sql, cents, metric)
    if sql is None:
        # zero centroids (an EMPTY training frame — e.g. a day-slice
        # with no data): return a typed empty array so array_max
        # compiles to a NULL struct instead of a VOID type error; the
        # caller's input is empty too, so no row ever evaluates it
        return F.array().cast("array<struct<s:double,nc:int>>")
    return F.expr(sql)


# trained codebooks are tiny and deterministic — cache per logical plan
# (semanticHash) like a real system persists its quantizer, so repeated
# queries don't re-train. Keyed by (plan hash, SOURCE-FILE fingerprint,
# n_cells, id col, vec col): the fingerprint digests the scan's input
# file list plus local mtime/size, so rewriting the parquet behind the
# same path retrains instead of serving a stale quantizer. (Remote/
# unstat-able files contribute path-only — same staleness contract as
# any mtime-based cache; clear_centroid_cache() remains the big hammer.)
# Size-capped FIFO so a long-lived process can't grow it unboundedly.
_CENTROID_CACHE: dict[tuple, dict[int, list[float]]] = {}
_CENTROID_CACHE_CAP = 64


def _source_fingerprint(df: DataFrame) -> str | None:
    """md5 over the scan's (path, mtime_ns, size) triples. Driver-side
    metadata only — the file listing already exists in the scan relation;
    no job runs. None if the plan exposes no input files (e.g. a local
    in-memory frame), in which case the plan hash alone must decide."""
    import hashlib
    import os

    try:
        files = sorted(df.inputFiles())
    except Exception:
        return None
    if not files:
        return None
    h = hashlib.md5()
    for f in files:
        h.update(f.encode())
        p = f[7:] if f.startswith("file:///") else f[5:] if f.startswith("file:") else f
        if not p.startswith("/"):
            p = "/" + p
        try:
            st = os.stat(p)
            h.update(f"|{st.st_mtime_ns}|{st.st_size}".encode())
        except OSError:  # remote path — path identity only
            pass
    return h.hexdigest()


def clear_centroid_cache() -> None:
    """Drop all cached IVF codebooks (call after rewriting source data)."""
    _CENTROID_CACHE.clear()


def kmeans_centroids(
    embeddings: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
) -> dict[int, list[float]]:
    """Deterministic k-means coarse quantizer for IVF.

    Seeds: the ``n_cells`` vectors with the smallest md5(id) — an
    engine-portable "uniform random" sample (md5 is a fixed hash, so any
    engine picks the same seeds; cell id = seed rank 0..n_cells-1).
    Refinement: ONE Lloyd round — assign every vector to its nearest
    seed map-side (seed literals inlined, no shuffle for assignment;
    ``metric`` picks cosine or euclidean nearest, see _cell_rank_array), then per-(cell, dim) means via posexplode + grouped
    sum. Each value is rounded to 6dp and decimal-summed so the parallel
    reduction is order-independent — the same trick as
    embedding_label_centroids, which is what lets an oracle engine
    reproduce the centroids bit-exactly. A cell that captures no vectors
    keeps its seed (both engines apply the same fallback rule).

    Cost at scale: two tiny driver collects (n_cells vectors / n_cells x
    dim means); the heavy passes are one map-side assignment and one
    shuffle of (cell, dim, value) triples. More Lloyd rounds = repeat;
    one round is the IVF-typical cost point (quantizer quality barely
    moves retrieval recall past the first round).
    """
    try:
        cache_key = (
            embeddings.semanticHash(),
            _source_fingerprint(embeddings),
            n_cells,
            id_col,
            vec_col,
            metric,
        )
    except Exception:  # plan not hashable (e.g. streaming) — skip cache
        cache_key = None
    if cache_key is not None and cache_key in _CENTROID_CACHE:
        return _CENTROID_CACHE[cache_key]
    seed_rows = (
        embeddings.select(
            id_col, vec_col, F.md5(F.col(id_col).cast("string")).alias("__r")
        )
        .orderBy("__r", id_col)
        .limit(n_cells)
        .collect()
    )
    seeds = {i: list(r[1]) for i, r in enumerate(seed_rows)}

    from stream_processing_spark.runtime import rebalance_for_expansion

    rank_arr = _cell_rank_array(vec_col, seeds, metric=metric)
    # the Lloyd-round assignment is O(n_cells·dim) per row — spread a
    # small scan's rows across cores before the compute-heavy map
    assigned = rebalance_for_expansion(embeddings).withColumn(
        "__cell", -F.array_max(rank_arr).getField("nc")
    )
    mean_rows = (
        assigned.select("__cell", F.posexplode(vec_col).alias("pos", "v"))
        .withColumn(
            "vr", F.round(F.col("v").cast("double"), 6).cast("decimal(18,6)")
        )
        .groupBy("__cell", "pos")
        .agg((F.sum("vr").cast("double") / F.count(F.lit(1))).alias("m"))
        .collect()
    )
    by_cell: dict[int, dict[int, float]] = {}
    for r in mean_rows:
        by_cell.setdefault(int(r["__cell"]), {})[int(r["pos"])] = float(r["m"])
    cents = {
        c: [by_cell[c][p] for p in range(len(seeds[c]))] if c in by_cell else seeds[c]
        for c in seeds
    }
    if cache_key is not None:
        if len(_CENTROID_CACHE) >= _CENTROID_CACHE_CAP:
            _CENTROID_CACHE.pop(next(iter(_CENTROID_CACHE)))
        _CENTROID_CACHE[cache_key] = cents
    return cents


def ivf_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cents: dict[int, list[float]] | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a coarse quantizer assigns
    every vector to its nearest centroid cell map-side (centroids are tiny
    → collected and inlined as literals, NO shuffle for assignment); the
    query probes only its ``nprobe`` nearest cells, cutting the scanned
    fraction to ~nprobe/n_cells. Centroids come from the deterministic
    k-means in ``kmeans_centroids`` (md5-sampled seeds + one Lloyd
    round), so an oracle engine can reproduce the identical quantizer.
    """
    if cents is None:  # else: a persisted codebook (functions/models.py)
        cents = kmeans_centroids(
            embeddings, n_cells, id_col=id_col, vec_col=vec_col
        )
    rank_arr = _cell_rank_array(vec_col, cents)

    # query's nprobe best cells — engine arithmetic (no Python float math)
    qrow = (
        embeddings.filter(F.col(id_col) == query_vec_id)
        .select(F.reverse(F.array_sort(rank_arr)).alias("arr"))
        .head()
    )
    if qrow is None:  # query id absent (e.g. empty corpus) -> no matches
        return embeddings.select(
            F.col(id_col), F.lit(0.0).alias("cos_sim")
        ).limit(0)
    probe = [-r["nc"] for r in qrow["arr"][:nprobe]]

    q = embeddings.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("__q")
    )
    sim = F.round(cosine(F.col(vec_col), F.col("__q")), 6)
    # full-scan cell assignment via the bit-exact Arrow twin (the
    # struct-rank HOF is the pathological interpreted case); the 1-row
    # probe ranking above stays expression-based
    cell_udf = _cells_vectorized_udf(cents, metric="cosine")
    return (
        embeddings.withColumn("__cell", cell_udf(F.col(vec_col)))
        .filter(F.col("__cell").isin(probe) & (F.col(id_col) != query_vec_id))
        .crossJoin(F.broadcast(q))
        .select(F.col(id_col), sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def lsh_banded_pairs(
    embeddings: DataFrame,
    threshold: float,
    dim: int,
    bands: int = 4,
    rows_per_band: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    reliable: bool = False,
    checkpoint_dir: str | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """Banded multi-table sign-LSH near-dup pairs — the 100 TB ANN path.

    ``max_bucket``: adversarial-data guard. Sign-LSH bucket sizes are
    data-dependent — a corpus where most vectors share one dominant
    direction (mode collapse, duplicated web boilerplate embeddings)
    lands them all in ONE signature bucket per band, and a bucket of d
    vectors is d² candidate rows: the all-pairs blowup back again.
    Buckets above the cap are dropped before the join (bounding every
    join key to max_bucket² rows); pairs inside a mega-bucket are
    overwhelmingly the same near-identical cluster, which callers
    handle via exact dedup/canonicalization rather than pairwise
    enumeration. The size count is a window over the same (band, sig)
    partitioning the join shuffles on — no extra exchange.

    ``bands`` independent signature tables of ``rows_per_band`` bits each
    (OR-construction): a pair is a candidate iff it agrees on ALL bits of
    at least one band. With per-bit collision prob p, candidate prob is
    1-(1-p^r)^b — recall grows with bands while each band keeps 2^r fine
    buckets, so no single join degrades toward all-pairs (unlike one
    global signature, where recall and bucket count fight over one knob).

    Plan (three shuffle-bounded stages, mirroring MinHash-LSH in
    dedup.py lsh_candidate_pairs):
      1. signature pass — bands×rows dot products map-side, explode to
         (id, band, sig): the shuffle carries an id + a short string,
         never the vector;
      2. per-band equi-join on (band, sig) + distinct → candidate id
         pairs (ids only through the wide join);
      3. verify — join the vectors back by id for the candidate set only
         and filter on exact cosine. Vectors are shipped O(candidates),
         not O(bucket²).
    """
    from stream_processing_spark.runtime import rebalance_for_expansion

    planes = _hyperplanes(dim, bands * rows_per_band, seed)
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            signature_col(
                vec_col, planes[b * rows_per_band : (b + 1) * rows_per_band]
            ).alias("sig"),
        )
        for b in range(bands)
    ]
    # the signature pass is bands×rows hyperplane dots per row —
    # compute-bound; spread a small scan's rows across cores first.
    # (An Arrow-batched numpy twin was tried and REVERTED here: plain-
    # array aggregate folds interpret cheaply — 0.3 s for 20k x 32
    # planes — while the UDF paid 1.3 s of Arrow transfer. The
    # pathological interpreted case is STRUCT-typed rank arrays, which
    # is why the PQ cell/ADC paths use _cells/_adc_vectorized_udf.)
    buckets = rebalance_for_expansion(embeddings).select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.sig").alias("sig"))
    if max_bucket is not None:
        from pyspark.sql.window import Window

        buckets = (
            buckets.withColumn(
                "__bsz", F.count(F.lit(1)).over(Window.partitionBy("band", "sig"))
            )
            .filter(F.col("__bsz") <= max_bucket)
            .drop("__bsz")
        )
    # the signature pass (bands×rows hyperplane dots per vector) is the
    # dominant cost and the self-join would otherwise evaluate it on BOTH
    # sides; materialize it once. reliable=True writes the signatures to
    # the context checkpoint dir (shared storage on a cluster) so an
    # executor loss mid-join can't kill the query; the default
    # localCheckpoint is the fast single-JVM spelling of the same reuse.
    buckets = materialize(
        buckets, eager=False, reliable=reliable, checkpoint_dir=checkpoint_dir
    )
    a = buckets.select(F.col(id_col).alias("id_a"), "band", "sig")
    b = buckets.select(F.col(id_col).alias("id_b"), "band", "sig")
    cand = (
        a.join(b, ["band", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = embeddings.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        norm(F.col(vec_col)).alias("na"),
    )
    vb = embeddings.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        norm(F.col(vec_col)).alias("nb"),
    )
    sim = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cos_sim", F.round(sim, 6))
        .filter(sim >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def lsh_bucketed_pairs(
    embeddings: DataFrame,
    threshold: float,
    dim: int,
    bits: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Single-table sign-LSH (one global ``bits``-bit signature).

    Kept as the recall baseline for ``lsh_banded_pairs``; with one table
    the bucket count and the recall share a single knob, so at large n
    either recall collapses (more bits) or buckets grow toward
    all-pairs/2^bits (fewer bits). Candidates share an LSH bucket, then
    exact cosine filters.
    """
    planes = _hyperplanes(dim, bits, seed)
    # signature AND norm computed once per vector, pre-join
    sigs = embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        signature_col(vec_col, planes).alias("sig"),
        norm(F.col(vec_col)).alias("nrm"),
    )
    a = sigs.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
        "sig", F.col("nrm").alias("na"),
    )
    b = sigs.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
        "sig", F.col("nrm").alias("nb"),
    )
    sim = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, "sig")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", F.round(sim, 6))
        .filter(sim >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def pq_codebooks(
    train: DataFrame,
    m: int,
    n_codes: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict[int, dict[int, list[float]]]:
    """All ``m`` subspace codebooks in TWO jobs instead of 2·m.

    Bit-identical to calling ``kmeans_centroids(slice_j, metric='l2')``
    per subspace (the per-subspace oracles depend on that): the seed
    sample is the same md5(id) order for every subspace (slicing
    driver-side), the Lloyd assignment uses the same per-subspace L2
    rank expression — evaluated for all subspaces in ONE pass — and
    the per-(subspace, cell, dim) means use the same round-to-6dp
    decimal sum. Empty cells keep their seed, same fallback rule."""
    try:
        cache_key = (
            train.semanticHash(),
            _source_fingerprint(train),
            "pq",
            m,
            n_codes,
            dim,
            id_col,
            vec_col,
        )
    except Exception:
        cache_key = None
    if cache_key is not None and cache_key in _CENTROID_CACHE:
        return _CENTROID_CACHE[cache_key]  # type: ignore[return-value]
    sub = dim // m
    seed_rows = (
        train.select(
            id_col, vec_col, F.md5(F.col(id_col).cast("string")).alias("__r")
        )
        .orderBy("__r", id_col)
        .limit(n_codes)
        .collect()
    )
    seeds = {
        j: {c: list(r[1])[j * sub : (j + 1) * sub] for c, r in enumerate(seed_rows)}
        for j in range(m)
    }
    if not seed_rows:  # empty training frame: every codebook is empty
        books0: dict[int, dict[int, list[float]]] = {j: {} for j in range(m)}
        if cache_key is not None:
            if len(_CENTROID_CACHE) >= _CENTROID_CACHE_CAP:
                _CENTROID_CACHE.pop(next(iter(_CENTROID_CACHE)))
            _CENTROID_CACHE[cache_key] = books0  # type: ignore[assignment]
        return books0
    # the m-subspace assignment is the bit-exact Arrow-batched numpy
    # twin of the m per-column HOF argmaxes (see _cells_vectorized_udf:
    # HOFs are CodegenFallback, ~300 us/row interpreted; the twin is
    # ~1 ms per 10k-row batch with identical IEEE op order)
    cells_udf = _pq_cells_vectorized_udf(seeds, m, dim)
    assigned = train.select(vec_col, cells_udf(F.col(vec_col)).alias(
        "__cells"
    )).select(
        "__cells",
        F.posexplode(vec_col).alias("pos0", "v"),
    )
    mean_rows = (
        assigned.select(
            (F.col("pos0") / sub).cast("int").alias("j"),
            F.element_at("__cells", (F.col("pos0") / sub).cast("int") + 1).alias(
                "cell"
            ),
            (F.col("pos0") % sub).alias("pos"),
            F.round(F.col("v").cast("double"), 6).cast("decimal(18,6)").alias(
                "vr"
            ),
        )
        .groupBy("j", "cell", "pos")
        .agg((F.sum("vr").cast("double") / F.count(F.lit(1))).alias("m"))
        .collect()
    )
    by: dict[int, dict[int, dict[int, float]]] = {}
    for r in mean_rows:
        by.setdefault(int(r["j"]), {}).setdefault(int(r["cell"]), {})[
            int(r["pos"])
        ] = float(r["m"])
    books: dict[int, dict[int, list[float]]] = {}
    for j in range(m):
        books[j] = {
            c: [by[j][c][p] for p in range(sub)]
            if j in by and c in by.get(j, {})
            else seeds[j][c]
            for c in seeds[j]
        }
    if cache_key is not None:
        if len(_CENTROID_CACHE) >= _CENTROID_CACHE_CAP:
            _CENTROID_CACHE.pop(next(iter(_CENTROID_CACHE)))
        _CENTROID_CACHE[cache_key] = books  # type: ignore[assignment]
    return books


def _fold_dot(xs, ys) -> float:
    """Driver-side dot with the EXACT fold order of ``dot``/
    ``_dot_sql`` (acc starts 0.0, left-to-right acc + x*y in IEEE
    double) — produces the bit-identical double the engine would."""
    acc = 0.0
    for x, y in zip(xs, ys):
        acc = acc + float(x) * float(y)
    return acc


def pq_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    m: int = 16,
    n_codes: int = 16,
    dim: int = 64,
    refine: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization ADC top-k with exact re-rank.

    Train: the vector space is split into ``m`` contiguous subspaces of
    dim/m dims; each gets its own ``n_codes``-codeword codebook from the
    same deterministic k-means as IVF (md5-sampled seeds + one Lloyd
    round of decimal-rounded means), so every engine reproduces the
    quantizer bit-exactly. Encode + score: each vector maps to its best
    codeword per subspace MAP-SIDE and is ADC-scored against the
    driver-folded query LUT inside ONE Arrow-batched bit-exact numpy
    twin (``_adc_vectorized_udf`` — zero shuffle, identical IEEE op
    order to the HOF expression, and at scale the scan reads only the
    m log2(n_codes)-bit codes, not the full vectors). The fixed
    left-to-right addition order keeps the asymmetric distance
    deterministic. Refine: the ADC top ``refine*k``
    candidates are re-ranked by exact cosine (a semi-join reads just
    those full vectors) — the standard PQ+refine topology (Jégou et al.,
    "Product Quantization for Nearest Neighbor Search").

    The fixture embeddings are ~unit-norm, so inner-product ADC ranks
    like cosine; for general corpora L2-normalize first.
    """
    qrow = (
        embeddings.filter(F.col(id_col) == query_vec_id).select(vec_col).head()
    )
    if qrow is None:  # query id absent (e.g. empty corpus) -> no matches
        return embeddings.select(
            F.col(id_col), F.lit(0.0).alias("cos_sim")
        ).limit(0)
    q = embeddings.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("__q")
    )
    books = pq_codebooks(embeddings, m, n_codes, dim, id_col, vec_col)
    if any(not cb for cb in books.values()):  # empty corpus: no rows
        return embeddings.select(
            F.col(id_col), F.lit(0.0).alias("cos_sim")
        ).limit(0)
    adc_udf = _adc_vectorized_udf(books, list(qrow[0]), m, dim)
    adc = (
        embeddings.filter(F.col(id_col) != query_vec_id)
        .select(F.col(id_col), F.round(adc_udf(F.col(vec_col)), 6).alias(
            "adc_score"
        ))
        .orderBy(F.desc("adc_score"), F.asc(id_col))
        .limit(refine * k)
    )
    cand = embeddings.join(adc.select(id_col), id_col, "left_semi")
    cos_sim = F.round(cosine(F.col(vec_col), F.col("__q")), 6)
    return (
        cand.crossJoin(F.broadcast(q))
        .select(F.col(id_col), cos_sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def ivfpq_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    m: int = 16,
    n_codes: int = 16,
    dim: int = 64,
    refine: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVFADC: IVF coarse cells prune the scan, PQ codes replace the
    vectors inside the probed cells, exact cosine re-ranks the survivors
    — the composition Jégou et al. call IVFADC and every production ANN
    store (FAISS IVF-PQ tier) ships as its default large-scale index.

    Topology (all pruning/encoding map-side, zero shuffle — cell
    assignment and ADC run in the Arrow-batched bit-exact numpy twins,
    see _cells_vectorized_udf / _adc_vectorized_udf):
      1. coarse: the cosine k-means quantizer from ``ivf_topk`` assigns
         every vector a cell; the query probes its ``nprobe`` nearest —
         only ~nprobe/n_cells of rows survive;
      2. ADC: the survivors are scored by PQ codes (codebooks trained on
         the FULL corpus so cell pruning can't shift the quantizer —
         classic IVFADC trains PQ on residuals, we score raw subvectors
         to keep every float op engine-portable for the oracle);
      3. refine: ADC top ``refine*k`` re-ranked by exact cosine via a
         semi-join that reads only those full vectors.

    At 100 TB the scan for step 2 reads (cell_id, m×log2(n_codes)-bit
    codes) — with m=16, n_codes=16 that is 8 bytes/vector instead of a
    256-byte float vector, and only nprobe/n_cells of those.
    """
    cents = kmeans_centroids(embeddings, n_cells, id_col=id_col, vec_col=vec_col)
    rank_arr = _cell_rank_array(vec_col, cents)
    qrow = (
        embeddings.filter(F.col(id_col) == query_vec_id)
        .select(
            F.col(vec_col).alias("__v"),
            F.reverse(F.array_sort(rank_arr)).alias("arr"),
        )
        .head()
    )
    if qrow is None:  # query id absent (e.g. empty corpus) -> no matches
        return embeddings.select(
            F.col(id_col), F.lit(0.0).alias("cos_sim")
        ).limit(0)
    probe = [-r["nc"] for r in qrow["arr"][:nprobe]]

    q = embeddings.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("__q")
    )
    # cell assignment + ADC scoring via the bit-exact Arrow-batched
    # twins (the HOF expressions are CodegenFallback — interpreted per
    # row, they were 80%+ of this query's wall at sf1)
    cell_udf = _cells_vectorized_udf(cents, metric="cosine")
    scanned = embeddings.withColumn(
        "__cell", cell_udf(F.col(vec_col))
    ).filter(F.col("__cell").isin(probe) & (F.col(id_col) != query_vec_id))
    books = pq_codebooks(embeddings, m, n_codes, dim, id_col, vec_col)
    if any(not cb for cb in books.values()):  # empty corpus: no rows
        return embeddings.select(
            F.col(id_col), F.lit(0.0).alias("cos_sim")
        ).limit(0)
    adc_udf = _adc_vectorized_udf(books, list(qrow["__v"]), m, dim)
    adc = (
        scanned.select(F.col(id_col), F.round(adc_udf(F.col(vec_col)), 6)
                       .alias("adc_score"))
        .orderBy(F.desc("adc_score"), F.asc(id_col))
        .limit(refine * k)
    )
    cand = embeddings.join(adc.select(id_col), id_col, "left_semi")
    cos_sim = F.round(cosine(F.col(vec_col), F.col("__q")), 6)
    return (
        cand.crossJoin(F.broadcast(q))
        .select(F.col(id_col), cos_sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )
