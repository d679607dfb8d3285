"""Run one registered query by name: rows, timing, optional plan.

    python tools/run_query.py <name> [--sf DIR] [--explain] [--oracle]
                              [--limit N]

Examples:
    python tools/run_query.py q10_degree --sf /root/testdata/sf0.01
    python tools/run_query.py q1_time_range --explain
    python tools/run_query.py q_curate --oracle     # show the DuckDB SQL
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neo4j_dynagraph_spark import get_spark  # noqa: E402
from neo4j_dynagraph_spark import plans  # noqa: E402
from neo4j_dynagraph_spark.queries import REGISTRY  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("name", choices=sorted(REGISTRY))
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--oracle", action="store_true")
    ap.add_argument("--limit", type=int, default=20)
    args = ap.parse_args()

    spec = REGISTRY[args.name]
    if args.oracle:
        print(spec.oracle or "(no SQL oracle — rows-only check)")
        return

    spark = get_spark("run-query")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    df = spec.fn(spark, args.sf)
    rows = df.limit(args.limit).collect()
    n = df.count()
    dt = time.perf_counter() - t0
    print(f"# {args.name}: {n} rows in {dt:.2f}s (showing {min(n, args.limit)})")
    print("# " + (spec.doc.splitlines()[0] if spec.doc else ""))
    for r in rows:
        print(tuple(r))
    if args.explain:
        print(plans.plan_str(df, "formatted"))


if __name__ == "__main__":
    main()
