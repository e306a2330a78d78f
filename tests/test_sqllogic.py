"""Mini SQL-logic corpus: the SAME SQL text runs through spark.sql (over
registered temp views) and DuckDB, results hash-compared. This checks
the shared-SQL entry point (catalog.register_views + spark.sql) against
an independent engine on portable ANSI constructs — the test shape the
reference lacked entirely (SURVEY.md §5)."""

from __future__ import annotations

import pytest

from stream_processing_spark.catalog import register_views
from tests.oracle_util import compare

SF = "/root/testdata/sf0.01"

CORPUS = {
    "scalar_exprs": """
        SELECT o_orderkey,
               o_totalprice * 2 AS doubled,
               length(o_orderpriority) AS prio_len,
               upper(o_orderstatus) AS status_u,
               o_orderkey % 7 AS k7
        FROM orders WHERE o_orderkey <= 100
    """,
    "having": """
        SELECT o_custkey, COUNT(*) AS n
        FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 8
    """,
    "case_in_group": """
        SELECT CASE WHEN o_totalprice < 100000 THEN 'low'
                    WHEN o_totalprice < 300000 THEN 'mid'
                    ELSE 'high' END AS band,
               COUNT(*) AS n
        FROM orders GROUP BY 1
    """,
    "in_list": """
        SELECT c_custkey FROM customer
        WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    """,
    "between_and_like": """
        SELECT p_partkey FROM part
        WHERE p_size BETWEEN 10 AND 20 AND p_name LIKE '%a%'
    """,
    "nested_subquery": """
        SELECT n AS order_count, COUNT(*) AS n_customers
        FROM (SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY 1) t
        GROUP BY n
    """,
    "union_distinct": """
        SELECT o_custkey AS k FROM orders WHERE o_totalprice > 400000
        UNION
        SELECT c_custkey FROM customer WHERE c_acctbal > 9990
    """,
    "cross_count": """
        SELECT r.r_name, COUNT(*) AS n_nations
        FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
    """,
}


@pytest.fixture(scope="module")
def views(spark):
    register_views(spark, SF)


@pytest.mark.parametrize("name", sorted(CORPUS))
def test_shared_sql(spark, duck, views, name):
    sql = CORPUS[name]
    compare(spark.sql(sql), duck.sql(sql), name)


def test_queries_md_is_current():
    # QUERIES.md is generated from the registry; drift means someone
    # forgot `python tools/gen_queries_md.py > QUERIES.md`
    import os

    from stream_processing_spark.queries import REGISTRY

    path = os.path.join(os.path.dirname(__file__), "..", "QUERIES.md")
    head = open(path).read(300)
    assert f"{len(REGISTRY)} queries" in head


def test_every_query_documented():
    from stream_processing_spark.queries import REGISTRY

    undocumented = [n for n, s in REGISTRY.items() if not s.doc.strip()]
    assert not undocumented, undocumented
