"""Opt-in full-registry parity gate: `pytest -m parity`.

Re-proves EVERY registry entry — the driver-graded window AND the tail
rows outside it — with the driver-identical protocol from
tools/check_parity.py, at the authoritative correctness SF (sf0.01).
One command, one row per query, so the tail rows cannot silently rot
between rounds. Excluded from the default run by pytest.ini's
`addopts = -m "not parity"` (an explicit `-m parity` overrides it).
"""

from __future__ import annotations

import pytest

from neo4j_dynagraph_spark.queries import REGISTRY
from tools.check_parity import compare_query

pytestmark = pytest.mark.parity

SF_PARITY = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck_parity():
    import duckdb

    from neo4j_dynagraph_spark.sources.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_PARITY}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_registry_parity(name, spark, duck_parity):
    problems, n_rows = compare_query(spark, duck_parity, REGISTRY[name], SF_PARITY)
    assert not problems, f"{name}: " + "; ".join(problems)
    assert n_rows >= 0
