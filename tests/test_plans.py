"""Physical-plan assertions: lock in the plan shapes the engine is
designed around (pushdown, broadcast, take-ordered) so regressions in
query construction surface as test failures, not silent slowdowns."""

from __future__ import annotations

from neo4j_dynagraph_spark import plans
from neo4j_dynagraph_spark.queries import REGISTRY
from tests.conftest import SF_SMALL


def test_time_range_pushdown(spark):
    df = REGISTRY["q1_time_range"].fn(spark, SF_SMALL)
    s = plans.plan_str(df, "formatted")
    assert "GreaterThanOrEqual(ts," in s and "LessThan(ts," in s, (
        "pinned time range must reach the parquet scan as PushedFilters"
    )


def test_point_lookup_pushdown(spark):
    df = REGISTRY["q_actor_lookup"].fn(spark, SF_SMALL)
    s = plans.plan_str(df, "formatted")
    assert "EqualTo(c_custkey,42)" in s


def test_topk_is_take_ordered(spark):
    df = REGISTRY["q_topk"].fn(spark, SF_SMALL)
    assert "TakeOrderedAndProject" in plans.plan_str(df, "simple"), (
        "orderBy+limit must plan as top-k, not a global sort"
    )


def test_revenue_join_broadcasts_dims(spark):
    df = REGISTRY["q_revenue_by_nation"].fn(spark, SF_SMALL)
    assert plans.broadcast_join_count(df) >= 2, (
        "nation/region joins must be broadcast-hash, never shuffled"
    )


def test_triangles_broadcasts_pruned_edges(spark):
    df = REGISTRY["q11_triangles_hour"].fn(spark, SF_SMALL)
    assert plans.broadcast_join_count(df) >= 1


def test_column_pruning_reaches_scan(spark):
    df = REGISTRY["q4_actor_frame_counts"].fn(spark, SF_SMALL)
    s = plans.plan_str(df, "formatted")
    # events has 6 columns + ts_ns; q4 needs only ts + user_id.
    # ts's physical type varies by testdata generation (legacy long
    # nanos vs TIMESTAMP_MICROS read as timestamp_ntz) — assert the
    # pruned column SET, not the type.
    assert (
        "ReadSchema: struct<ts:bigint,user_id:bigint>" in s
        or "ReadSchema: struct<ts:timestamp_ntz,user_id:bigint>" in s
        or "ReadSchema: struct<ts:timestamp,user_id:bigint>" in s
    ), "scan must read only (ts, user_id); projection did not prune"


def test_ivf_broadcasts_codebook_and_probes(spark):
    df = REGISTRY["q_embed_ann_ivf"].fn(spark, SF_SMALL)
    # codebook assigns are broadcast NLJs, the probe join a broadcast
    # hash join — never a corpus-sized shuffle join
    s = plans.plan_str(df, "simple")
    n_broadcast = s.count("BroadcastHashJoin") + s.count("BroadcastNestedLoopJoin")
    assert n_broadcast >= 3
    assert "SortMergeJoin" not in s and "ShuffledHashJoin" not in s


def test_near_dup_pairs_is_broadcast_nlj(spark):
    df = REGISTRY["q_dedup_embed"].fn(spark, SF_SMALL)
    s = plans.plan_str(df, "simple")
    assert "BroadcastNestedLoopJoin" in s, (
        "exact all-pairs must broadcast one side, not shuffle a cross product"
    )


def test_minhash_pairs_single_aggregation_no_join(spark):
    df = REGISTRY["q_dedup_minhash"].fn(spark, SF_SMALL)
    s = plans.plan_str(df, "simple")
    assert "Join" not in s, (
        "bucket pair expansion is a grouped array lambda — any Join here "
        "means the self-join crept back"
    )


def test_asof_join_no_global_window(spark):
    # q_asof_join must run its carry-forward window partitioned by the
    # day bucket; a global (unpartitioned) window plans an Exchange
    # SinglePartition — the scale-killer this test locks out.
    df = REGISTRY["q_asof_join"].fn(spark, SF_SMALL)
    s = plans.plan_str(df, "simple")
    assert "SinglePartition" not in s, (
        "as-of window collapsed to a single partition"
    )
    assert "BroadcastHashJoin" in s, "carry-in side must be broadcast"


def test_dedup_embed_bucketed_is_equi_join(spark):
    # the scale path must join on the LSH bucket key (hash/broadcast
    # HASH join) — never the all-pairs BroadcastNestedLoopJoin that the
    # exact variant uses
    df = REGISTRY["q_dedup_embed_bucketed"].fn(spark, SF_SMALL)
    s = plans.plan_str(df, "simple")
    assert "BroadcastNestedLoopJoin" not in s, (
        "bucketed near-dup degenerated to a cross product"
    )
    assert "Join" in s and ("bucket" in s or ("b1" in s and "b2" in s))


def test_runs_namespace_prunes_other_run(spark):
    # filtering the two-run star to run='day' must constant-fold the
    # 'hour' branch away: exactly ONE events scan in the final plan
    df = REGISTRY["q_runs"].fn(spark, SF_SMALL)
    s = plans.plan_str(df, "simple")
    assert s.count("Scan parquet") == 1, (
        "run filter failed to prune the other run's subtree"
    )


def test_interval_overlap_no_global_distinct(spark):
    # boundary-spanning pairs dedupe via the first-shared-bucket join
    # predicate, NOT a global distinct over the pair output — at 100x
    # the distinct's exchange grows with the RESULT, the predicate is
    # free. No aggregate may appear in the plan (distinct plans as
    # HashAggregate pairs around an Exchange).
    df = REGISTRY["q_interval_overlap"].fn(spark, SF_SMALL)
    s = plans.plan_str(df, "simple")
    assert "HashAggregate" not in s and "SortAggregate" not in s, (
        "pair-output distinct crept back into q_interval_overlap"
    )


def test_pack_sequences_single_partition_only_for_chunk_totals(spark):
    # the two-phase prefix sum may serialize ONLY the per-chunk totals
    # (corpus/chunk rows) through a single partition; the corpus-sized
    # cumsum must stay partitioned by chunk_id and the offsets join
    # must broadcast the tiny totals side
    df = REGISTRY["q_pack_sequences"].fn(spark, SF_SMALL)
    s = plans.plan_str(df, "simple")
    assert s.count("SinglePartition") == 1, (
        "corpus-sized window collapsed to a single partition "
        "(or the chunk-totals window disappeared)"
    )
    assert "BroadcastHashJoin" in s, "chunk-offsets join must broadcast"


def test_train_shards_no_single_partition(spark):
    # the permutation is a hash projection + a window PARTITIONED BY
    # shard: nothing in the plan may serialize the corpus
    df = REGISTRY["q_train_shards"].fn(spark, SF_SMALL)
    s = plans.plan_str(df, "simple")
    assert "SinglePartition" not in s, (
        "train_shards planned a global window/exchange"
    )
