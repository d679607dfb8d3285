"""Round-14 optimization invariants: the checkpoint-hub contract
helpers and the _wedge_pairs checked input contract (VERDICT r13
next-round #3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neo4j_dynagraph_spark.operators import graph
from neo4j_dynagraph_spark.operators.hub import checkpoint_hub, stage_corpus_scale


def test_checkpoint_hub_narrow_frame_roundtrips(spark):
    df = spark.range(100).select(
        F.col("id").alias("actor"), (F.col("id") % 7).alias("degree")
    )
    out = checkpoint_hub(df)
    assert out.columns == ["actor", "degree"]
    assert out.count() == 100
    # the barrier is real: the plan is an RDD scan, not the range
    assert "LogicalRDD" in out._jdf.queryExecution().optimizedPlan().toString()


def test_checkpoint_hub_rejects_wide_frames(spark):
    wide = spark.range(5).select(
        *[(F.col("id") + i).alias(f"c{i}") for i in range(9)]
    )
    with pytest.raises(ValueError, match="wider than the hub bound"):
        checkpoint_hub(wide)
    # the explicit override at the call site is the sanctioned escape
    assert checkpoint_hub(wide, max_width=9).count() == 5


def test_stage_corpus_scale_roundtrips_fresh_each_call(spark):
    df = spark.range(1000).select(
        "id", F.md5(F.col("id").cast("string")).alias("h")
    )
    a = stage_corpus_scale(df, "t14")
    b = stage_corpus_scale(df, "t14")
    assert a.count() == b.count() == 1000
    # each call stages its own directory (no cross-invocation reuse)
    fa = a.inputFiles()[0].rsplit("/", 2)[-2]
    fb = b.inputFiles()[0].rsplit("/", 2)[-2]
    assert fa != fb
    assert sorted(r["h"] for r in a.collect()) == sorted(
        r["h"] for r in df.collect()
    )


def test_decontaminate_bloom_prefilter_bit_identical(spark, monkeypatch):
    from neo4j_dynagraph_spark.operators import hub, text
    from neo4j_dynagraph_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    train = docs.where(F.col("doc_id") % 97 != 0)
    base = sorted(
        tuple(r) for r in text.decontaminate(train, bench, n=4).collect()
    )
    bloomed = sorted(
        tuple(r)
        for r in text.decontaminate(
            train, bench, n=4, bloom_prefilter=True
        ).collect()
    )
    assert base == bloomed
    assert len(base) > 0
    # the prefilter is an in-row probe over the literal bit table,
    # upstream of the hit join; it lives inside the checkpointed hits
    # subtree, so neutralize the hub barrier to see it in one plan
    monkeypatch.setattr(hub, "checkpoint_hub", lambda df, **k: df)
    plan = (
        text.decontaminate(train, bench, n=4, bloom_prefilter=True)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "xxhash64" in plan


def test_wedge_pairs_contract_checked_under_flag(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_CHECK_INVARIANTS", "1")
    dup = spark.createDataFrame(
        [(1, 2), (1, 2), (2, 3)], ["actor1", "actor2"]
    )
    with pytest.raises(AssertionError, match="input contract violated"):
        graph._wedge_pairs(dup)
    ok = dup.distinct()
    # distinct input passes the check and produces the 1-wedge stream
    rows = graph._wedge_pairs(ok).collect()
    assert [(r["center"], r["actor1"], r["actor2"]) for r in rows] == [
        (2, 1, 3)
    ]


def test_wedge_pairs_contract_unchecked_by_default(spark, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_CHECK_INVARIANTS", raising=False)
    dup = spark.createDataFrame(
        [(1, 2), (1, 2), (2, 3)], ["actor1", "actor2"]
    )
    # no action, no raise: the default path stays lazy and un-gated
    graph._wedge_pairs(dup)
