"""Fast oracle-parity smoke inside pytest: a representative subset of
the registry vs DuckDB at sf0.001 (the full 44-query gate lives in
tools/check_parity.py and runs per-round at sf0.01)."""

from __future__ import annotations

import pytest

from neo4j_dynagraph_spark.queries import REGISTRY
from tests.conftest import SF_SMALL

SUBSET = [
    "q1_time_range",
    "q4_actor_frame_counts",
    "q7_neighbors",
    "q10_degree",
    "q_tumbling_window",
    "q_pricing_summary",
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_embed_topk",
    "q_text_stats",
]


def _norm(v):
    return round(v, 9) if isinstance(v, float) else v


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", SUBSET)
def test_oracle_parity(spark, duck, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF_SMALL)
    scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
    cur = duck.execute(spec.oracle)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows)
    assert _rowset(scols, srows) == _rowset(ocols, orows)


def test_entry_contract(spark):
    import __spark_entry__ as e

    rows = e.entry(spark).collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_approx_quantiles_error_bound(spark):
    from neo4j_dynagraph_spark.queries import REGISTRY
    from tests.conftest import SF_SMALL

    rows = REGISTRY["q_approx_quantiles"].fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        # GK with accuracy 1000 on ~hundreds of values per group: the
        # approx median must be a value near the exact median
        assert abs(r.p50_approx - r.p50_exact) <= max(0.05 * abs(r.p50_exact), 0.5)
