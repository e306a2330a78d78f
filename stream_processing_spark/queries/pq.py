"""Product-quantization ANN (``ann_pq_topk``) and its DuckDB oracle.

The oracle reproduces the ENTIRE pipeline in SQL — per-subspace
deterministic k-means (the same md5-seeded, one-Lloyd-round,
decimal-rounded-means quantizer as ann_ivf_topk's oracle), map-side
code assignment, ADC scoring against the query's exact subvectors, and
the exact-cosine re-rank of the ADC top refine*k — because every step
was designed engine-portable. The SQL is generated per subspace from
one template; list slices are 1-based inclusive in DuckDB, mirroring
Spark's 1-based F.slice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from stream_processing_spark.catalog import load_table
from stream_processing_spark.functions import similarity as sim
from stream_processing_spark.queries import register

_M = 16         # subspaces
_DIM = 64
_SUB = _DIM // _M
_CODES = 16     # codewords per subspace
_K = 10
_REFINE = 8
_QID = 0        # query vector id

_COS = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)
# l2 affinity: argmin ||x-c||^2 == argmax x.c - 0.5*c.c (per-x constant)
_L2 = "list_dot_product({x}, {c}) - 0.5 * list_dot_product({c}, {c})"



def _subspace_sql(j: int, p: str = "") -> str:
    """CTEs for subspace ``j``; ``p`` prefixes every CTE name so two
    quantizer pipelines (e.g. PQ subspaces beside the IVF coarse CTEs,
    whose generator also emits an ``assign0``) can share one WITH."""
    a, b = j * _SUB + 1, (j + 1) * _SUB
    esub = f"CAST(e.embedding AS DOUBLE[])[{a}:{b}]"
    return f"""
    {p}sseed{j} AS (
        SELECT e.vec_id, s.cid,
               {_L2.format(x=esub, c=f"s.fvec[{a}:{b}]")} AS csim
        FROM embeddings e CROSS JOIN seedrows s
    ),
    {p}assign{j} AS (
        SELECT vec_id, cid FROM (
            SELECT vec_id, cid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY csim DESC, cid ASC) AS rn
            FROM {p}sseed{j}
        ) WHERE rn = 1
    ),
    {p}means{j} AS (
        SELECT a.cid, i AS pos,
               CAST(SUM(CAST(ROUND(CAST(e.embedding[{j * _SUB} + i] AS DOUBLE),
                                   6) AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(*) AS mval
        FROM {p}assign{j} a JOIN embeddings e USING (vec_id),
             UNNEST(range(1, {_SUB + 1})) AS u(i)
        GROUP BY 1, 2
    ),
    {p}ml{j} AS (SELECT cid, list(mval ORDER BY pos) AS mvec
              FROM {p}means{j} GROUP BY cid),
    {p}cents{j} AS (
        SELECT s.cid, COALESCE(m.mvec, s.fvec[{a}:{b}]) AS cvec
        FROM seedrows s LEFT JOIN {p}ml{j} m USING (cid)
    ),
    {p}codes{j} AS (
        SELECT vec_id, cid FROM (
            SELECT e.vec_id, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                      ORDER BY {_L2.format(x=esub, c="c.cvec")}
                                               DESC, c.cid ASC) AS rn
            FROM embeddings e CROSS JOIN {p}cents{j} c
        ) WHERE rn = 1
    )
    """


def _pq_oracle() -> str:
    subspaces = ",".join(_subspace_sql(j) for j in range(_M))
    score = " + ".join(
        f"list_dot_product(q.qv[{j * _SUB + 1}:{(j + 1) * _SUB}], c{j}.cvec)"
        for j in range(_M)
    )
    code_joins = " ".join(
        f"JOIN codes{j} k{j} ON k{j}.vec_id = e.vec_id "
        f"JOIN cents{j} c{j} ON c{j}.cid = k{j}.cid"
        for j in range(_M)
    )
    qe = "CAST(e.embedding AS DOUBLE[])"
    return f"""
    WITH seedrows AS (
        SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                  vec_id) - 1 AS cid,
               CAST(embedding AS DOUBLE[]) AS fvec
        FROM embeddings
        QUALIFY ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                   vec_id) <= {_CODES}
    ),
    {subspaces},
    q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
          WHERE vec_id = {_QID}),
    adc AS (
        SELECT e.vec_id, ROUND({score}, 6) AS adc_score
        FROM embeddings e {code_joins}, q
        WHERE e.vec_id <> {_QID}
        ORDER BY adc_score DESC, e.vec_id
        LIMIT {_REFINE * _K}
    )
    SELECT e.vec_id,
           ROUND({_COS.format(a=qe, b="q.qv")}, 6) AS cos_sim
    FROM embeddings e JOIN adc ON adc.vec_id = e.vec_id, q
    ORDER BY cos_sim DESC, e.vec_id
    LIMIT {_K}
    """


@register(
    "ann_pq_topk",
    _pq_oracle(),
    doc=f"Product-quantization ANN top-{_K} with exact re-rank: {_M} "
    f"subspaces x {_CODES} codewords (deterministic k-means per "
    "subspace with EUCLIDEAN assignment — md5-sampled seeds, one Lloyd "
    "round of decimal-rounded means), codes assigned MAP-SIDE in an "
    "Arrow-batched numpy twin that replays the engine fold's IEEE op "
    "order bit-exactly (similarity._adc_vectorized_udf; the HOF "
    "expression form is CodegenFallback — ~300 us/row interpreted) "
    "(at scale the ADC scan reads 16-bit codes, never full vectors), "
    "asymmetric-distance scoring against the query's exact subvectors, "
    f"then exact-cosine re-rank of the ADC top {_REFINE * _K} via a "
    "semi-join that touches only those full vectors (Jégou et al. "
    "PQ+refine). Completes the quantization ladder: int8 scalar "
    "(ann_quantized_topk) -> IVF cells (ann_ivf_topk) -> PQ codes. "
    "Recall vs the exact baseline is asserted in test_similarity.py.",
)
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.pq_topk(
        emb,
        query_vec_id=_QID,
        k=_K,
        m=_M,
        n_codes=_CODES,
        dim=_DIM,
        refine=_REFINE,
    )


_N_CELLS = 16
_NPROBE = 4


def _ivfpq_oracle() -> str:
    """IVFADC = the IVF coarse-cell CTEs (reused verbatim from
    ann_ivf_topk's oracle) gating which rows ever reach the PQ ADC
    scorer (subspace CTEs prefixed 'p' to avoid name collisions),
    followed by the same exact-cosine re-rank as ann_pq_topk."""
    from stream_processing_spark.queries.llmops import _IVF_CELL_SQL

    subspaces = ",".join(_subspace_sql(j, p="p") for j in range(_M))
    score = " + ".join(
        f"list_dot_product(q.qv[{j * _SUB + 1}:{(j + 1) * _SUB}], c{j}.cvec)"
        for j in range(_M)
    )
    code_joins = " ".join(
        f"JOIN pcodes{j} k{j} ON k{j}.vec_id = e.vec_id "
        f"JOIN pcents{j} c{j} ON c{j}.cid = k{j}.cid"
        for j in range(_M)
    )
    qe = "CAST(e.embedding AS DOUBLE[])"
    return f"""
    WITH {_IVF_CELL_SQL},
    cells AS (SELECT vec_id, cid AS cell FROM ranked WHERE rn = 1),
    probe AS (SELECT cid AS cell FROM ranked
              WHERE vec_id = {_QID} AND rn <= {_NPROBE}),
    seedrows AS (
        SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                  vec_id) - 1 AS cid,
               CAST(embedding AS DOUBLE[]) AS fvec
        FROM embeddings
        QUALIFY ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                   vec_id) <= {_CODES}
    ),
    {subspaces},
    q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
          WHERE vec_id = {_QID}),
    adc AS (
        SELECT e.vec_id, ROUND({score}, 6) AS adc_score
        FROM embeddings e
        JOIN cells ON cells.vec_id = e.vec_id
        JOIN probe ON probe.cell = cells.cell
        {code_joins}, q
        WHERE e.vec_id <> {_QID}
        ORDER BY adc_score DESC, e.vec_id
        LIMIT {_REFINE * _K}
    )
    SELECT e.vec_id,
           ROUND({_COS.format(a=qe, b="q.qv")}, 6) AS cos_sim
    FROM embeddings e JOIN adc ON adc.vec_id = e.vec_id, q
    ORDER BY cos_sim DESC, e.vec_id
    LIMIT {_K}
    """


@register(
    "ann_ivfpq_topk",
    _ivfpq_oracle(),
    doc=f"IVFADC top-{_K} — the composition every production ANN store "
    "ships at scale (FAISS IVF-PQ): the deterministic IVF coarse "
    f"quantizer prunes the scan to the query's {_NPROBE}/{_N_CELLS} "
    f"nearest cells, PQ codes ({_M} subspaces x {_CODES} codewords, "
    "trained on the FULL corpus so pruning can't shift the quantizer) "
    "stand in for the vectors inside the probed cells, and the ADC top "
    f"{_REFINE * _K} is re-ranked by exact cosine over only those full "
    "vectors. At 100 TB the ADC scan reads 8-byte codes instead of "
    "256-byte vectors — and only nprobe/n_cells of those. Classic "
    "IVFADC encodes residuals; raw-subvector ADC here keeps every "
    "float op engine-portable for the oracle. Recall vs the exact "
    "baseline asserted in test_similarity.py.",
)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.ivfpq_topk(
        emb,
        query_vec_id=_QID,
        k=_K,
        n_cells=_N_CELLS,
        nprobe=_NPROBE,
        m=_M,
        n_codes=_CODES,
        dim=_DIM,
        refine=_REFINE,
    )
