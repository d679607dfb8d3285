"""Opt-in plan-audit freshness gate: `pytest -m plans`.

Regenerates every registry entry's normalized physical plan (the exact
text tools/explain_all.py writes) and diffs it against the committed
plans_audit/*.txt — so a plan regression (lost pushdown, a broadcast
join degrading to shuffle, a new exchange) cannot land silently, and
the audit files cannot go stale: a NEW query without a committed audit
fails, and a LEFTOVER audit for a deleted query fails.

Excluded from the default run like the parity gate (pytest.ini
addopts); on a plan-change failure, rerun tools/explain_all.py and
commit the REVIEWED diff.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from neo4j_dynagraph_spark import get_spark  # noqa: E402
from neo4j_dynagraph_spark.queries import REGISTRY  # noqa: E402
from neo4j_dynagraph_spark.session import DEFAULT_SHUFFLE_PARTITIONS  # noqa: E402
from tools.explain_all import audit_plan  # noqa: E402

pytestmark = pytest.mark.plans

AUDIT_DIR = Path(__file__).resolve().parent.parent / "plans_audit"
SF_PLANS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark_plans():
    # the audits are written under the tool's CANONICAL config (default
    # shuffle partitions appear inside hashpartitioning(...) nodes); a
    # session already created with different conf would false-diff
    s = get_spark("plans-audit")
    s.sparkContext.setLogLevel("ERROR")
    if s.conf.get("spark.sql.shuffle.partitions") != str(
        int(
            os.environ.get(
                "SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS
            )
        )
    ):
        pytest.skip(
            "conflicting SparkSession config in this pytest run — run "
            "`pytest -m plans` on its own"
        )
    yield s


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_plan_audit_current(name, spark_plans):
    s = audit_plan(spark_plans, REGISTRY[name], SF_PLANS)
    if s is None:
        # only reachable for entries pinned in EXPECTED_PLAN_SKIPS
        # (tools/explain_all.py) — any other raise propagates and
        # fails this gate instead of skipping
        pytest.skip(f"{name} pinned in EXPECTED_PLAN_SKIPS")
    path = AUDIT_DIR / f"{name}.txt"
    assert path.exists(), (
        f"no committed plan audit for {name}: run tools/explain_all.py "
        f"and commit plans_audit/{name}.txt"
    )
    committed = path.read_text()
    assert s == committed, (
        f"physical plan for {name} differs from the committed audit — "
        "review the change, regenerate with tools/explain_all.py, and "
        "commit the diff"
    )


def test_no_stale_audit_files():
    known = {f"{n}.txt" for n in REGISTRY}
    have = {p.name for p in AUDIT_DIR.glob("*.txt")}
    stale = sorted(have - known)
    assert not stale, f"audit files for unregistered queries: {stale}"
