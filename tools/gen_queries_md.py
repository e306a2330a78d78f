"""Regenerate QUERIES.md from the query registry.

Usage: python tools/gen_queries_md.py > QUERIES.md
Groups entries by defining module, preserving registration order.
"""

from __future__ import annotations

import os
import sys
from collections import OrderedDict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stream_processing_spark.queries import REGISTRY  # noqa: E402


def main(out=sys.stdout) -> None:
    by_mod: OrderedDict[str, list] = OrderedDict()
    for name, spec in REGISTRY.items():
        mod = spec.spark.__module__.rsplit(".", 1)[-1]
        by_mod.setdefault(mod, []).append(spec)

    n = len(REGISTRY)
    n_no_oracle = sum(1 for s in REGISTRY.values() if s.oracle is None)
    print("# QUERIES — the registry surface (auto-generated from the code)", file=out)
    print(file=out)
    print(
        f"{n} queries; all but {n_no_oracle} carry a DuckDB oracle\n"
        "(hash-compared at sf0.01 by the driver and\n"
        "tests/test_oracle_queries.py). Regenerate with\n"
        "`python tools/gen_queries_md.py > QUERIES.md`.",
        file=out,
    )
    for mod, specs in by_mod.items():
        print(f"\n## {mod}\n", file=out)
        for s in specs:
            tag = "oracle" if s.oracle is not None else "rows-only"
            doc = " ".join(s.doc.split())
            print(f"- **{s.name}** ({tag}) — {doc}", file=out)


if __name__ == "__main__":
    main()
