"""SURVEY.md §2.8 long-tail: the user-defined TABLE function surface.

The reference runs arbitrary executables that may emit N output rows
per input (framework.py's fn(k,v) -> [(k,v)] contract); Spark's UDTF is
the declarative spelling of the 1->N table shape. Kept OUT of the query
registry on purpose: UDTFs evaluate as BatchEvalPythonUDTF (row-at-a-
time Python), exactly the plan shape test_plan_lint.py forbids in hot
paths — the sanctioned bulk paths are mapInPandas/applyInPandas. This
suite proves the surface exists and behaves, not that it scales."""

from __future__ import annotations

from pyspark.sql.functions import lit, udtf


def test_udtf_tokenize_lateral_join(spark):
    @udtf(returnType="pos int, token string")
    class Tokenize:
        def eval(self, text: str):
            for i, t in enumerate((text or "").split(" ")):
                if t:
                    yield i, t

    spark.udtf.register("tokenize", Tokenize)
    rows = spark.sql(
        "SELECT t.pos, t.token FROM tokenize('fast scan  merge') AS t"
    ).collect()
    assert [(r.pos, r.token) for r in rows] == [
        (0, "fast"), (1, "scan"), (3, "merge"),
    ]

    # LATERAL application over a real table expression
    df = spark.createDataFrame(
        [(1, "hash join"), (2, ""), (3, "sort")], "id int, text string"
    )
    df.createOrReplaceTempView("udtf_docs")
    out = spark.sql(
        "SELECT d.id, t.token FROM udtf_docs d, "
        "LATERAL tokenize(d.text) AS t ORDER BY d.id, t.pos"
    ).collect()
    assert [(r.id, r.token) for r in out] == [
        (1, "hash"), (1, "join"), (3, "sort"),
    ]


def test_udtf_python_call_site(spark):
    @udtf(returnType="n int")
    class Range3:
        def eval(self, base: int):
            for i in range(3):
                yield (base + i,)

    got = [r.n for r in Range3(lit(10)).collect()]
    assert got == [10, 11, 12]
