"""Grammar-based SQL fuzzing: seeded random queries over the TPC-H-ish
views, run through BOTH spark.sql and DuckDB, results compared exactly.

Extends the fixed test_sqllogic corpus the way test_grep_differential
extends the grep goldens: the fixed corpus pins known constructs, the
fuzzer sweeps the combination space (filter × join × group-by ×
aggregate × order/limit) no hand-written corpus covers.

The grammar is restricted to the engine-portable subset this repo's
oracles already rely on:
- no raw double aggregation — sums are CAST(ROUND(col*100) AS BIGINT)
  (the data is 2-decimal, so the scaled sum is exact) or integer sums
  wrapped in CAST(... AS BIGINT) (DuckDB's HUGEINT would otherwise
  surface as float through pandas);
- every LIMIT is preceded by ORDER BY over ALL projected columns with
  explicit NULLS FIRST (Spark and DuckDB default null order differs);
- rounding only ever lands on values far from .5 (integer-valued
  floats), where HALF_UP and half-away agree.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from stream_processing_spark.catalog import register_views
from tests.oracle_util import compare

SF = "/root/testdata/sf0.01"
N_CASES = 230

T = {
    "orders": {
        "int": ["o_orderkey", "o_custkey"],
        "num": ["o_totalprice"],
        "str": ["o_orderstatus", "o_orderpriority"],
    },
    "customer": {
        "int": ["c_custkey", "c_nationkey"],
        "num": ["c_acctbal"],
        "str": ["c_name", "c_mktsegment"],
    },
    "lineitem": {
        "int": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
        "num": ["l_quantity", "l_extendedprice", "l_discount"],
        "str": ["l_returnflag", "l_linestatus"],
    },
    "part": {
        "int": ["p_partkey", "p_size"],
        "num": ["p_retailprice"],
        "str": ["p_name", "p_brand", "p_type"],
    },
    "supplier": {
        "int": ["s_suppkey", "s_nationkey"],
        "num": ["s_acctbal"],
        "str": ["s_name"],
    },
    "nation": {"int": ["n_nationkey", "n_regionkey"], "num": [], "str": ["n_name"]},
    "region": {"int": ["r_regionkey"], "num": [], "str": ["r_name"]},
}

JOINS = [
    ("orders", "customer", "o_custkey = c_custkey"),
    ("lineitem", "orders", "l_orderkey = o_orderkey"),
    ("lineitem", "part", "l_partkey = p_partkey"),
    ("customer", "nation", "c_nationkey = n_nationkey"),
    ("nation", "region", "n_regionkey = r_regionkey"),
    ("supplier", "nation", "s_nationkey = n_nationkey"),
]


def _cols(tabs: list[str], kind: str) -> list[str]:
    return [c for t in tabs for c in T[t][kind]]


def _pred(rng: random.Random, tabs: list[str]) -> str:
    kind = rng.choice(["mod", "between", "numcmp", "like", "in", "strcmp"])
    if kind == "mod":
        c = rng.choice(_cols(tabs, "int"))
        return f"{c} % {rng.randint(2, 9)} = {rng.randint(0, 1)}"
    if kind == "between":
        c = rng.choice(_cols(tabs, "int"))
        lo = rng.randint(0, 500)
        return f"{c} BETWEEN {lo} AND {lo + rng.choice([10, 100, 1000])}"
    if kind == "numcmp":
        nums = _cols(tabs, "num")
        if not nums:
            return "1 = 1"
        return f"{rng.choice(nums)} {rng.choice(['<', '>', '<=', '>='])} {rng.choice([0.05, 25.0, 900.0, 4500.0, 150000.0])}"
    if kind == "like":
        c = rng.choice(_cols(tabs, "str"))
        return f"{c} LIKE '%{rng.choice('aerost13')}%'"
    if kind == "in":
        c = rng.choice(_cols(tabs, "int"))
        vals = ", ".join(str(rng.randint(0, 200)) for _ in range(rng.randint(2, 5)))
        return f"{c} IN ({vals})"
    c = rng.choice(_cols(tabs, "str"))
    return f"length({c}) {rng.choice(['=', '>', '<'])} {rng.randint(1, 12)}"


def _group_key(rng: random.Random, tabs: list[str]) -> str:
    ts_tabs = [t for t in tabs if t in _TS_COLS]
    if ts_tabs and rng.random() < 0.2:
        t = rng.choice(ts_tabs)
        unit = rng.choice(["day", "week", "month"])
        return f"date_trunc('{unit}', {_TS_COLS[t]})"
    kind = rng.choice(["mod", "str", "substr", "band"])
    if kind == "mod":
        return f"{rng.choice(_cols(tabs, 'int'))} % {rng.randint(2, 12)}"
    if kind == "str":
        return rng.choice(_cols(tabs, "str"))
    if kind == "substr":
        return f"substring({rng.choice(_cols(tabs, 'str'))}, 1, {rng.randint(1, 3)})"
    nums = _cols(tabs, "num")
    if not nums:
        return rng.choice(_cols(tabs, "str"))
    c = rng.choice(nums)
    cut = rng.choice([10, 100, 1000, 100000])
    return f"CASE WHEN {c} < {cut} THEN 'lo' ELSE 'hi' END"


def _agg(rng: random.Random, tabs: list[str], alias: str) -> str:
    kind = rng.choice(["count", "cdist", "min", "max", "isum", "csum"])
    if kind == "count":
        return f"COUNT(*) AS {alias}"
    if kind == "cdist":
        return f"COUNT(DISTINCT {rng.choice(_cols(tabs, 'int'))}) AS {alias}"
    if kind == "min":
        return f"MIN({rng.choice(_cols(tabs, 'int'))}) AS {alias}"
    if kind == "max":
        return f"MAX({rng.choice(_cols(tabs, 'str'))}) AS {alias}"
    if kind == "isum":
        return f"CAST(SUM({rng.choice(_cols(tabs, 'int'))}) AS BIGINT) AS {alias}"
    nums = _cols(tabs, "num")
    if not nums:
        return f"COUNT(*) AS {alias}"
    return (
        f"CAST(SUM(CAST(ROUND({rng.choice(nums)} * 100) AS BIGINT)) "
        f"AS BIGINT) AS {alias}"
    )


_TS_COLS = {"orders": "o_orderdate", "lineitem": "l_shipdate"}


def _window_query(rng: random.Random, tabs: list[str], frm: str, where: str) -> str:
    # window functions with a TOTAL tie-break (unique key last in the
    # ORDER BY) so ranks are deterministic in both engines
    t1 = tabs[0]
    key = T[t1]["int"][0]
    part = rng.choice(_cols(tabs, "str") + [f"{key} % 5"])
    ordc = rng.choice(_cols(tabs, "int"))
    fn = rng.choice(
        [
            f"ROW_NUMBER() OVER (PARTITION BY {part} ORDER BY {ordc}, {key})",
            f"RANK() OVER (PARTITION BY {part} ORDER BY {ordc})",
            f"CAST(SUM({ordc}) OVER (PARTITION BY {part}) AS BIGINT)",
            f"CAST(COUNT(*) OVER (PARTITION BY {part}) AS BIGINT)",
            f"MIN({ordc}) OVER (PARTITION BY {part})",
            f"LAG({ordc}, 1) OVER (PARTITION BY {part} ORDER BY {ordc}, {key})",
        ]
    )
    proj = [f"{key} AS pk", f"{ordc} AS oc", f"{fn} AS wv"]
    ords = ", ".join(f"{i + 1} NULLS FIRST" for i in range(len(proj)))
    return (
        f"SELECT {', '.join(proj)} FROM {frm}{where} "
        f"ORDER BY {ords} LIMIT {rng.choice([30, 80])}"
    )


def _setop_query(rng: random.Random) -> str:
    """UNION [ALL] / INTERSECT / EXCEPT of two filtered variants of the
    same table — identical select-lists, total-order LIMIT on top."""
    t = rng.choice([t for t in T if T[t]["int"] and T[t]["str"]])
    cols = rng.sample(T[t]["int"], k=min(2, len(T[t]["int"])))
    cols += rng.sample(T[t]["str"], k=1)
    op = rng.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
    p1, p2 = _pred(rng, [t]), _pred(rng, [t])
    sel = ", ".join(cols)
    ords = ", ".join(f"{i + 1} NULLS FIRST" for i in range(len(cols)))
    return (
        f"SELECT {sel} FROM {t} WHERE {p1} {op} "
        f"SELECT {sel} FROM {t} WHERE {p2} "
        f"ORDER BY {ords} LIMIT {rng.choice([40, 90])}"
    )


def _semijoin_query(rng: random.Random) -> str:
    """EXISTS / NOT EXISTS / IN / NOT IN subqueries over a FK pair.
    (NOT) IN stays on non-null int key columns — the NULL-poisoning
    semantics of NOT IN are deliberately out of the grammar."""
    inner, outer, cond = rng.choice(JOINS)
    ik, ok = cond.split(" = ")
    ip = _pred(rng, [inner])
    kind = rng.choice(["EXISTS", "NOT EXISTS", "IN", "NOT IN"])
    proj = rng.sample(T[outer]["int"], k=min(2, len(T[outer]["int"])))
    sel = ", ".join(proj)
    ords = ", ".join(f"{i + 1} NULLS FIRST" for i in range(len(proj)))
    if kind in ("EXISTS", "NOT EXISTS"):
        sub = f"SELECT 1 FROM {inner} WHERE {ik} = {ok} AND {ip}"
        where = f"{kind} ({sub})"
    else:
        sub = f"SELECT {ik} FROM {inner} WHERE {ip}"
        where = f"{ok} {kind} ({sub})"
    return (
        f"SELECT {sel} FROM {outer} WHERE {where} "
        f"ORDER BY {ords} LIMIT {rng.choice([30, 80])}"
    )


def _scalar_subquery_query(rng: random.Random) -> str:
    """Correlated scalar subquery in the select list (aggregated, as
    Spark requires), COALESCEd so no-match rows stay deterministic."""
    inner, outer, cond = rng.choice(JOINS)
    ik, ok = cond.split(" = ")
    ip = _pred(rng, [inner])
    agg = rng.choice(
        [
            "COUNT(*)",
            f"MIN({rng.choice(T[inner]['int'])})",
            f"CAST(SUM({rng.choice(T[inner]['int'])}) AS BIGINT)",
        ]
    )
    key = T[outer]["int"][0]
    return (
        f"SELECT {key} AS pk, CAST(COALESCE((SELECT {agg} FROM {inner} "
        f"WHERE {ik} = {ok} AND {ip}), -1) AS BIGINT) AS sq "
        f"FROM {outer} "
        f"ORDER BY 1 NULLS FIRST, 2 NULLS FIRST LIMIT {rng.choice([40, 90])}"
    )


def _lateral_query(rng: random.Random) -> str:
    """Correlated LATERAL subquery in FROM (the r5 registry surface,
    fuzzed): either a lateral AGGREGATE (exactly one row per outer row)
    or a lateral TOP-K with a TOTAL tie-break (ORDER BY over every int
    column of the inner table — each table's int columns contain a
    unique key, so the k rows are deterministic)."""
    inner, outer, cond = rng.choice(JOINS)
    ik, ok = cond.split(" = ")
    ip = _pred(rng, [inner])
    okey = T[outer]["int"][0]
    if rng.random() < 0.5:
        agg = rng.choice(
            [
                "COUNT(*)",
                f"COALESCE(MIN({rng.choice(T[inner]['int'])}), -1)",
                f"COALESCE(CAST(SUM({rng.choice(T[inner]['int'])}) "
                "AS BIGINT), -1)",
            ]
        )
        sub = (
            f"SELECT CAST({agg} AS BIGINT) AS lv FROM {inner} "
            f"WHERE {ik} = {ok} AND {ip}"
        )
    else:
        c = rng.choice(T[inner]["int"])
        tie = ", ".join(T[inner]["int"])
        sub = (
            f"SELECT {c} AS lv FROM {inner} WHERE {ik} = {ok} AND {ip} "
            f"ORDER BY {c} NULLS FIRST, {tie} LIMIT {rng.randint(1, 3)}"
        )
    return (
        f"SELECT {okey} AS pk, lv FROM {outer}, LATERAL ({sub}) t "
        f"ORDER BY 1 NULLS FIRST, 2 NULLS FIRST LIMIT {rng.choice([40, 90])}"
    )


def _ranked_filter_query(rng: random.Random) -> str:
    """Windowed subquery with a rank predicate — the QUALIFY semantics
    (top-k per partition) in the one spelling both grammars parse
    (Spark has no QUALIFY clause; DuckDB planners treat this rewrite
    identically). ROW_NUMBER carries a total tie-break; RANK/DENSE_RANK
    rely on rank-ties being deterministic sets."""
    t = rng.choice(list(T))
    ints = T[t]["int"]
    strs = T[t]["str"]
    part = rng.choice(strs + [f"{ints[0]} % {rng.randint(3, 7)}"])
    ordc = rng.choice(ints)
    fn = rng.choice(["ROW_NUMBER", "RANK", "DENSE_RANK"])
    if fn == "ROW_NUMBER":
        over = (
            f"PARTITION BY {part} ORDER BY {ordc} NULLS FIRST, "
            + ", ".join(ints)
        )
    else:
        over = f"PARTITION BY {part} ORDER BY {ordc} NULLS FIRST"
    preds = [_pred(rng, [t]) for _ in range(rng.randint(0, 1))]
    where = (" WHERE " + " AND ".join(preds)) if preds else ""
    inner_sql = (
        f"SELECT {ints[0]} AS pk, {ordc} AS oc, "
        f"{fn}() OVER ({over}) AS rn FROM {t}{where}"
    )
    return (
        f"SELECT pk, oc, rn FROM ({inner_sql}) WHERE rn <= {rng.randint(1, 3)} "
        f"ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST "
        f"LIMIT {rng.choice([50, 120])}"
    )


def _group_by_all_query(rng: random.Random) -> str:
    """GROUP BY ALL (the r5 single-example surface, fuzzed): grouping
    keys inferred from the non-aggregate select expressions by both
    engines."""
    if rng.random() < 0.4:
        t1, t2, cond = rng.choice(JOINS)
        tabs, frm = [t1, t2], f"{t1} JOIN {t2} ON {cond}"
    else:
        t1 = rng.choice(list(T))
        tabs, frm = [t1], t1
    preds = [_pred(rng, tabs) for _ in range(rng.randint(0, 2))]
    where = (" WHERE " + " AND ".join(preds)) if preds else ""
    n_keys = rng.randint(1, 2)
    keys = [f"{_group_key(rng, tabs)} AS k{i}" for i in range(n_keys)]
    aggs = [_agg(rng, tabs, f"a{i}") for i in range(rng.randint(1, 2))]
    key_ords = ", ".join(f"{i + 1} NULLS FIRST" for i in range(n_keys))
    return (
        f"SELECT {', '.join(keys + aggs)} FROM {frm}{where} "
        f"GROUP BY ALL ORDER BY {key_ords}"
    )


def _gen_query(rng: random.Random) -> str:
    shape = rng.random()
    if shape < 0.10:
        return _setop_query(rng)
    if shape < 0.20:
        return _semijoin_query(rng)
    if shape < 0.28:
        return _scalar_subquery_query(rng)
    if shape < 0.38:
        return _lateral_query(rng)
    if shape < 0.46:
        return _ranked_filter_query(rng)
    if shape < 0.53:
        return _group_by_all_query(rng)
    if rng.random() < 0.4:
        t1, t2, cond = rng.choice(JOINS)
        tabs, frm = [t1, t2], f"{t1} JOIN {t2} ON {cond}"
    else:
        t1 = rng.choice(list(T))
        tabs, frm = [t1], t1
    preds = [_pred(rng, tabs) for _ in range(rng.randint(0, 2))]
    where = (" WHERE " + " AND ".join(preds)) if preds else ""

    if rng.random() < 0.18:  # window-function query
        return _window_query(rng, tabs, frm, where)
    if rng.random() < 0.55:  # aggregate query
        n_keys = rng.randint(1, 2)
        keys = [f"{_group_key(rng, tabs)} AS k{i}" for i in range(n_keys)]
        aggs = [_agg(rng, tabs, f"a{i}") for i in range(rng.randint(1, 3))]
        having = (
            f" HAVING COUNT(*) >= {rng.randint(2, 5)}"
            if rng.random() < 0.3
            else ""
        )
        key_ords = ", ".join(
            f"{i + 1} NULLS FIRST" for i in range(n_keys)
        )
        return (
            f"SELECT {', '.join(keys + aggs)} FROM {frm}{where} "
            f"GROUP BY {', '.join(str(i + 1) for i in range(n_keys))}"
            f"{having} ORDER BY {key_ords}"
        )
    # plain projection with total-order limit
    proj = []
    proj += rng.sample(_cols(tabs, "int"), k=min(2, len(_cols(tabs, "int"))))
    proj += rng.sample(_cols(tabs, "str"), k=min(1, len(_cols(tabs, "str"))))
    if rng.random() < 0.4 and _cols(tabs, "num"):
        proj.append(
            f"CAST(ROUND({rng.choice(_cols(tabs, 'num'))} * 100) AS BIGINT) AS cents"
        )
    ords = ", ".join(f"{i + 1} NULLS FIRST" for i in range(len(proj)))
    return (
        f"SELECT {', '.join(proj)} FROM {frm}{where} "
        f"ORDER BY {ords} LIMIT {rng.choice([20, 50, 100])}"
    )


@pytest.fixture(scope="module")
def duck_sf():
    con = duckdb.connect()
    for t in T:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    yield con
    con.close()


def test_sql_fuzz_spark_matches_duckdb(spark, duck_sf):
    register_views(spark, SF)
    rng = random.Random(20260913)
    n_nonempty = 0
    for case in range(N_CASES):
        sql = _gen_query(rng)
        got = spark.sql(sql)
        try:
            compare(got, duck_sf.sql(sql), f"case {case}: {sql}")
        except AssertionError:
            print(f"FUZZ DIVERGENCE in case {case}:\n{sql}")
            raise
        n_nonempty += 1 if got.count() > 0 else 0
    # the grammar must actually exercise data, not generate empty sets
    assert n_nonempty > N_CASES * 0.5, n_nonempty
