"""Dump the formatted physical plan of every registered query.

Audit tool for plan quality: pushdown (PushedFilters/PartitionFilters),
join strategies (broadcast vs shuffle), scan schemas (column pruning).

    python tools/explain_all.py [sf_dir] [out_dir]

Defaults: /root/testdata/sf0.01 -> ./plans_audit/ (one .txt per query,
plus a summary line per query on stdout: joins by type, #exchanges).

Plans are written NORMALIZED (plans.normalize_plan strips the
session-global expression/plan-id counters) so re-generations from any
session compare byte-for-byte — which is what lets `pytest -m plans`
(tests/test_plans_audit.py) mechanically fail on any unexplained plan
change against the committed audit files.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neo4j_dynagraph_spark import get_spark  # noqa: E402
from neo4j_dynagraph_spark import plans  # noqa: E402
from neo4j_dynagraph_spark.queries import REGISTRY  # noqa: E402


# Registry entries ALLOWED to raise during DataFrame construction
# (none today: every streaming query drains to a batch view whose scan
# plan audits fine). Pinned so a query that STARTS raising — a genuine
# regression — fails the plans gate instead of silently converting its
# audit test into a skip.
EXPECTED_PLAN_SKIPS: frozenset[str] = frozenset()


def audit_plan(spark, spec, sf_dir):  # noqa: ANN001
    """The normalized formatted plan for one registry entry, or None
    when the entry is in EXPECTED_PLAN_SKIPS and building its
    DataFrame raised. Shared by the CLI writer below and the
    `pytest -m plans` gate so both produce the identical text.

    Hermetic against session history: queries that persist() a shared
    subtree at construction time (the k-means assign in q_semdedup)
    register it in Spark's CacheManager, which substitutes
    InMemoryRelation into every LATER structurally-equal plan — so a
    parity run (or a differently-ordered audit) in the same session
    would flip q_cluster_purity's audited plan. Clearing the cache
    first makes each audit order-independent; self-persists inside
    the audited query itself still show (deterministically) as
    InMemoryTableScan."""
    spark.catalog.clearCache()
    try:
        df = spec.fn(spark, sf_dir)
    except Exception:
        if spec.name in EXPECTED_PLAN_SKIPS:
            return None
        raise
    return plans.normalize_plan(plans.plan_str(df, "formatted"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "plans_audit"
    if out_dir in REGISTRY:
        # a query name in the out_dir slot is a mis-invocation (this
        # tool has no per-query filter by design — the plans gate
        # byte-diffs the FULL registry); without the guard it would
        # mkdir a stray `q_*/` at the repo root (round-10 nit)
        raise SystemExit(
            f"second arg is the OUTPUT DIRECTORY, got query name {out_dir!r}; "
            "explain_all always audits the full registry"
        )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("explain-all")
    spark.sparkContext.setLogLevel("ERROR")

    for name, spec in sorted(REGISTRY.items()):
        s = audit_plan(spark, spec, sf_dir)
        if s is None:
            print(f"{name}: SKIP (in EXPECTED_PLAN_SKIPS)")
            continue
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(s)
        df = spec.fn(spark, sf_dir)
        simple = plans.plan_str(df, "simple")
        counts = {
            "bhj": simple.count("BroadcastHashJoin"),
            "bnlj": simple.count("BroadcastNestedLoopJoin"),
            "smj": simple.count("SortMergeJoin"),
            "shj": simple.count("ShuffledHashJoin"),
            "exch": simple.count("Exchange"),
        }
        flags = []
        if "PushedFilters: [" in s and "PushedFilters: []" not in s:
            flags.append("pushdown")
        if "PartitionFilters: [" in s and "PartitionFilters: []" not in s:
            flags.append("partition-prune")
        print(
            f"{name}: joins bhj={counts['bhj']} bnlj={counts['bnlj']} "
            f"smj={counts['smj']} shj={counts['shj']} exch={counts['exch']} "
            f"{' '.join(flags)}"
        )


if __name__ == "__main__":
    main()
