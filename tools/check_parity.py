"""Local replica of the driver's correctness gate.

Runs every registered query in Spark AND its DuckDB oracle on the same
parquet, compares row count, column names, and order-insensitive values
(columns sorted by name, rows sorted, exact equality). Usage:

    python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
import traceback

import duckdb

sys.path.insert(0, "/root/repo")

from neo4j_dynagraph_spark import get_spark  # noqa: E402
from neo4j_dynagraph_spark.queries import REGISTRY  # noqa: E402
from neo4j_dynagraph_spark.sources.tables import TABLES  # noqa: E402


def norm(v):  # noqa: ANN001
    if isinstance(v, float):
        return round(v, 9)
    if hasattr(v, "timestamp"):  # datetime
        return str(v)
    return v


def rowset(cols, rows):  # noqa: ANN001
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("parity-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, spec in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL {name}: SPARK ERROR\n{traceback.format_exc()}")
            failures.append(name)
            continue
        if spec.oracle is None:
            print(f"ok   {name}: rows={len(srows)} (no oracle) [{time.time()-t0:.1f}s]")
            if len(srows) == 0:
                print(f"     WARN {name}: empty result")
            continue
        try:
            cur = con.execute(spec.oracle)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception:
            print(f"FAIL {name}: ORACLE ERROR\n{traceback.format_exc()}")
            failures.append(name)
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={scols} oracle={ocols}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if not problems:
            a, b = rowset(scols, srows), rowset(ocols, orows)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ, first diffs {diff}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            note = " WARN-EMPTY" if len(srows) == 0 else ""
            print(f"ok   {name}: rows={len(srows)} match [{time.time()-t0:.1f}s]{note}")

    print(f"\n{len(REGISTRY) - len(failures)}/{len(REGISTRY)} pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
