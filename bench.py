"""Benchmark harness — the reference protocol ported to Spark.

Mirrors cypher_query_timing.py:217-239: each headline query runs N=10
times (after one warm-up), wall clock measured around full result
materialization at the driver (Arrow toPandas — the columnar bulk
path, equivalent to the reference's client-side `list(...)` at
cypher_query_timing.py:222 but without per-row deserialization).
Like the reference, the N sorted timings yield median/p5/p95 per query
(cypher_query_timing.py:217-233); the headline value is the sum of
per-query medians, and the spread rides along so a run-to-run delta
can be judged against measured noise. Prints ONE JSON line:

    {"metric": "...", "value": <sum of per-query medians, sec>,
     "unit": "sec", "queries": {name: median_sec, ...},
     "spread": {name: {"p5": s, "p95": s}, ...}, "sf": <sf>}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default all cores),
     BENCH_RUNS (default 10).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from neo4j_dynagraph_spark import get_spark  # noqa: E402
from neo4j_dynagraph_spark.queries import REGISTRY, bench_queries  # noqa: E402


def _pctl(sorted_samples: list[float], q: float) -> float:
    """Linear-interpolated percentile over sorted samples, the same
    estimator numpy.percentile uses in the reference's report
    (cypher_query_timing.py:230-233)."""
    if len(sorted_samples) == 1:
        return sorted_samples[0]
    pos = q * (len(sorted_samples) - 1)
    lo = int(pos)
    hi = min(lo + 1, len(sorted_samples) - 1)
    return sorted_samples[lo] + (sorted_samples[hi] - sorted_samples[lo]) * (pos - lo)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("BENCH_RUNS", "10"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("dynagraph-bench")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    spread: dict[str, dict[str, float]] = {}
    for name in bench_queries():
        fn = REGISTRY[name].fn
        t0 = time.perf_counter()
        fn(spark, sf_dir).toPandas()  # warm-up: JVM JIT + page cache
        warm = time.perf_counter() - t0
        # heavy queries (streaming drains, the full interval self-join)
        # run N=3: keeps total bench wall bounded while still yielding a
        # median; the cheap majority keeps the full N for tight spreads
        n = 3 if warm > 5.0 else runs
        samples = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn(spark, sf_dir).toPandas()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        timings[name] = round(statistics.median(samples), 4)
        spread[name] = {
            "p5": round(_pctl(samples, 0.05), 4),
            "p95": round(_pctl(samples, 0.95), 4),
        }
        print(
            f"# {name}: {timings[name]:.3f}s "
            f"[p5 {spread[name]['p5']:.3f}, p95 {spread[name]['p95']:.3f}]",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "sum of per-query median wall seconds, "
                f"{len(timings)} headline queries, N={runs} "
                "(N=3 when warm-up >5s) with p5/p95 "
                "(protocol: cypher_query_timing.py:217-239)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "spread": spread,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
