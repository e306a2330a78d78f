"""Driver-shaped correctness gate: run every registry query with a
VANILLA SparkSession and compare against its DuckDB oracle at sf0.01 —
exactly what the round driver does for CORRECTNESS_r{N}.json.

Usage:
    python tools/run_gate.py                 # full gate (~7 min)
    python tools/run_gate.py --out GATE.json # full gate + JSON artifact
                                             # (per-query ok/oracle/sec)
    python tools/run_gate.py name1 ...       # only the named queries,
                                             # plus sf0.001/sf0.1 row
                                             # probes
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as e
    from oracle_util import compare

    args = sys.argv[1:]
    out_path = None
    if "--out" in args:
        i = args.index("--out")
        if i + 1 >= len(args) or args[i + 1].startswith("-"):
            print("usage: run_gate.py [--out PATH] [query ...]")
            return 2
        out_path = args[i + 1]
        args = args[:i] + args[i + 2 :]
    only = args

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    rows = e.entry(spark).collect()
    assert rows and len(e.entry(spark).collect()) == len(rows)
    print(f"entry ok ({len(rows)} rows, stable on re-run)")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.01/{t}.parquet')"
        )

    import json
    import time

    qs, osql = e.queries(), e.oracle_sql()
    names = only or sorted(qs)
    failed = []
    results: dict[str, dict] = {}
    t_total = time.perf_counter()
    for name in names:
        t0 = time.perf_counter()
        try:
            sdf = qs[name](spark, "/root/testdata/sf0.01")
            if name in osql:
                compare(sdf, con.sql(osql[name]), name=name)
            else:
                assert sdf.count() >= 0 and sdf.columns
            results[name] = {
                "ok": True,
                "oracle": name in osql,
                "sec": round(time.perf_counter() - t0, 3),
            }
            if only:
                for sf in ("sf0.001", "sf0.1"):
                    n = qs[name](spark, f"/root/testdata/{sf}").count()
                    print(f"  {name} @{sf}: {n} rows")
        except Exception as ex:  # noqa: BLE001 - report and continue
            failed.append(name)
            results[name] = {
                "ok": False,
                "oracle": name in osql,
                "sec": round(time.perf_counter() - t0, 3),
                "err": str(ex)[:300],
            }
            print(f"FAIL {name}: {str(ex)[:300]}")
    if out_path:
        with open(out_path, "w") as f:
            json.dump(
                {
                    "n_queries": len(names),
                    "n_ok": len(names) - len(failed),
                    "n_oracled": sum(1 for n in names if n in osql),
                    "wall_sec": round(time.perf_counter() - t_total, 1),
                    "sf": 0.01,
                    "queries": results,
                },
                f,
                indent=1,
            )
        print(f"wrote {out_path}")
    if failed:
        print(f"{len(failed)}/{len(names)} FAILED: {failed}")
        return 1
    print(f"ALL OK ({len(names)} queries)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
