"""Coverage for the convenience surface of the scalar library and the
plan inspectors — the public helpers a reference user reaches for even
though the engine's own hot paths express the same math structurally
(canonicalization via a1 < a2 joins, grid math via frame_id/
frame_start). Equivalent-formulation style (the repo's own test idiom,
after cypher_query_timing.py's paired queries): each helper is checked
against an independent formulation of the same semantics.
"""

from __future__ import annotations

import pyspark.sql.functions as F

import neo4j_dynagraph_spark.functions as dfn
from tests.conftest import SF_MED


def test_canonical_pair_orders_and_commutes(spark):
    rows = [(5, 3), (3, 5), (7, 7), (0, 9), (-2, -8)]
    df = spark.createDataFrame(rows, "a long, b long")
    lo, hi = dfn.canonical_pair(F.col("a"), F.col("b"))
    got = [
        (r.lo, r.hi)
        for r in df.select(lo.alias("lo"), hi.alias("hi")).collect()
    ]
    assert got == [(3, 5), (3, 5), (7, 7), (0, 9), (-8, -2)]
    # commutative by construction: swapping inputs changes nothing
    lo2, hi2 = dfn.canonical_pair(F.col("b"), F.col("a"))
    got2 = [
        (r.lo, r.hi)
        for r in df.select(lo2.alias("lo"), hi2.alias("hi")).collect()
    ]
    assert got2 == got


def test_align_to_grid_equals_frame_roundtrip(spark):
    # the reference formula es - ((es - start) % delta)
    # (load_gexf_to_neo4j.py:70) must equal the engine's structural
    # form frame_start(frame_id(es)) for arbitrary offsets and widths
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=10, deadline=None)
    @given(
        es_vals=st.lists(st.integers(0, 10**9), min_size=1, max_size=20),
        delta=st.sampled_from([1, 20, 1800, 3600, 86400]),
        start=st.sampled_from([0, 7, 1200]),
    )
    def check(es_vals, delta, start):
        df = spark.createDataFrame([(v,) for v in es_vals], "es long")
        out = df.select(
            dfn.align_to_grid(F.col("es"), delta, start).alias("g"),
            dfn.frame_start(
                dfn.frame_id(F.col("es"), delta, start), delta, start
            ).alias("r"),
        ).collect()
        assert all(r.g == r.r for r in out)

    check()


def test_seeded_hash64_is_prefixed_hash64(spark):
    df = spark.createDataFrame([("abc",), ("",)], "v string")
    out = df.select(
        dfn.seeded_hash64(F.col("v"), 3).alias("s"),
        dfn.hash64(F.concat(F.lit("s3:"), F.col("v"))).alias("h"),
        dfn.seeded_hash64(F.col("v"), 4).alias("s_other"),
    ).collect()
    assert all(r.s == r.h for r in out)
    # different seeds give a different member of the hash family
    assert all(r.s != r.s_other for r in out)
    # 60-bit bound holds (the cross-engine BIGINT-safety contract)
    assert all(0 <= r.s < 1 << 60 for r in out)


def test_repartition_by_bytes_sizes_and_preserves(spark):
    from neo4j_dynagraph_spark.operators.multimodal import (
        repartition_by_bytes,
    )

    df = spark.range(1000)
    # 1 GiB of payload at 128 MiB targets -> 8 partitions
    out = repartition_by_bytes(df, total_bytes=1 << 30)
    assert out.rdd.getNumPartitions() == 8
    assert out.count() == 1000
    # below one target chunk: floor at a single partition
    tiny = repartition_by_bytes(df, total_bytes=1)
    assert tiny.rdd.getNumPartitions() == 1


def test_plan_inspectors_on_registered_queries(spark):
    from neo4j_dynagraph_spark import plans
    from neo4j_dynagraph_spark.queries import REGISTRY

    # point lookup: the predicate must reach the parquet reader
    lookup = REGISTRY["q_actor_lookup"].fn(spark, SF_MED)
    assert plans.has_pushed_filters(lookup)
    # one aggregation => exactly one hash-partitioning exchange
    agg = (
        spark.read.parquet(f"{SF_MED}/events.parquet")
        .groupBy("event_type")
        .count()
    )
    assert plans.count_exchanges(agg) == 1
    # codegen count: non-negative; 0 means 'unknown' under Spark 4.1's
    # explain-codegen reporting (documented in the helper)
    assert plans.codegen_stage_count(agg) >= 0
