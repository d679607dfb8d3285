"""Round-13 additions: temporal PageRank and soft dedup."""

from __future__ import annotations

import pyspark.sql.functions as F

from neo4j_dynagraph_spark.operators import graph


def _tpr(spark, rows, frames, beta=0.85):
    e = spark.createDataFrame(
        rows, "frame_id long, actor1 long, actor2 long"
    )
    return {
        r.actor: r.tpr
        for r in graph.temporal_pagerank(e, frames, beta=beta).collect()
    }


def test_temporal_pagerank_respects_time_order(spark):
    """The defining property: rank depends on the ORDER frames occur,
    which a static PageRank (same edge multiset either way) cannot
    see. A star at node 1 drains its leaves (deg-2 hub sends two
    half-shares but receives two full shares); node 4 contacts leaf
    3 either BEFORE the drain (symmetric equal swap — node 4
    unchanged) or AFTER (it meets a drained node 3 and swaps its
    full share for a depleted one). So node 4 ends strictly poorer
    when its contact comes second, and the hub strictly richer."""
    star_then_edge = [(0, 1, 2), (0, 1, 3), (1, 3, 4)]
    edge_then_star = [(0, 3, 4), (1, 1, 2), (1, 1, 3)]
    fwd = _tpr(spark, star_then_edge, [0, 1])
    rev = _tpr(spark, edge_then_star, [0, 1])
    assert set(fwd) == set(rev) == {1, 2, 3, 4}
    # node 4 swaps its full share for a drained one only in fwd
    assert fwd[4] < rev[4]
    # node 3 recovers mass from 4 after the drain only in fwd
    assert fwd[3] > rev[3]


def test_temporal_pagerank_python_differential(spark):
    """Pure-Python replay of the integer recursion (the house
    differential for every iterative operator): same 1e-9 grid, same
    round-half-away share, same keep/receive bookkeeping — the Spark
    output must match the replay bit-for-bit, and the replay's
    integer state proves conservation is EXACT (sum invariant)."""
    rows = [
        (0, 1, 2), (0, 1, 3), (1, 3, 4), (1, 2, 4),
        (2, 1, 4), (3, 2, 3), (3, 1, 2), (5, 4, 2),
    ]
    frames = list(range(6))
    out = _tpr(spark, rows, frames)

    import collections
    from decimal import ROUND_HALF_UP, Decimal

    def rnd(x: float) -> int:
        return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))

    actors = sorted({a for _, a, b in rows} | {b for _, a, b in rows})
    r = {a: rnd(1e9 / len(actors)) for a in actors}
    total0 = sum(r.values())
    for f in frames:
        adj = collections.defaultdict(list)
        for fr, a, b in rows:
            if fr == f:
                adj[a].append(b)
                adj[b].append(a)
        # receivers accumulate on top of their own send-adjusted value
        r2 = dict(r)
        for u, nbrs in adj.items():
            s = rnd(0.85 * r[u] / len(nbrs))
            r2[u] -= len(nbrs) * s
        for u, nbrs in adj.items():
            s = rnd(0.85 * r[u] / len(nbrs))
            for v in nbrs:
                r2[v] += s
        r = r2
        assert sum(r.values()) == total0  # EXACT integer conservation
    expect = {
        a: float(
            Decimal(r[a] / 1e9).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )
        for a in actors
    }
    assert out == expect


def test_temporal_pagerank_inactive_frames_are_identity(spark):
    """Frame slots with no edges must be exact no-ops: running with
    the tight slot list equals running with trailing/leading empty
    slots added."""
    rows = [(5, 1, 2), (7, 2, 3)]
    a = _tpr(spark, rows, [5, 7])
    b = _tpr(spark, rows, [3, 4, 5, 6, 7, 8, 9])
    assert a == b


def test_temporal_pagerank_bit_stable_under_partitioning(spark):
    """House convention: integer sums make the recursion bit-identical
    whatever the input partitioning / shuffle-partition count."""
    rows = [
        (f, a, b)
        for f in range(4)
        for (a, b) in [(1, 2), (2, 3), (3, 4), (1, 4), (2, 4)]
    ]
    e = spark.createDataFrame(rows, "frame_id long, actor1 long, actor2 long")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        outs = []
        for nshuf, npart in [(1, 1), (7, 5), (8, 3)]:
            spark.conf.set("spark.sql.shuffle.partitions", str(nshuf))
            outs.append(
                sorted(
                    tuple(r)
                    for r in graph.temporal_pagerank(
                        e.repartition(npart), list(range(4))
                    ).collect()
                )
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert outs[0] == outs[1] == outs[2]


def test_soft_dedup_reweights_planted_duplicates(spark):
    """Planted corpus: source A is one doc repeated 4x (effective
    mass 1 doc), source B is 2 unique docs, one shared with A's
    content (that doc's group size is 5 across sources). Weights are
    1/group-size on the 1e-6 grid."""
    from neo4j_dynagraph_spark.operators import dedup

    rows = (
        [(i, "same text here", "A") for i in range(4)]
        + [(10, "same text here", "B"), (11, "unique words only", "B")]
    )
    d = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.source: r for r in dedup.soft_dedup(d).collect()}
    assert out["A"].n_docs == 4 and out["A"].dup_docs == 4
    assert out["B"].n_docs == 2 and out["B"].dup_docs == 1
    # group size for 'same text here' is 5 (4 in A + 1 in B)
    assert abs(out["A"].effective_docs - 4 * 0.2) < 1e-6
    assert abs(out["B"].effective_docs - (0.2 + 1.0)) < 1e-6
    # token mass: 3 tokens per doc
    assert abs(out["A"].effective_tokens - 4 * 3 * 0.2) < 1e-5
    assert abs(out["B"].effective_tokens - (3 * 0.2 + 3.0)) < 1e-5


def test_stream_soft_dedup_multibatch_equals_batch(spark, tmp_path):
    """The soft-dedup streaming twin, one file per micro-batch, must
    equal batch soft_dedup bit-for-bit: a duplicate whose copies
    arrive in DIFFERENT batches (the late-arrival reweight the store
    exists for) plus a within-batch duplicate group."""
    import glob
    import os
    import shutil

    from neo4j_dynagraph_spark.operators.dedup import soft_dedup
    from neo4j_dynagraph_spark.streaming.soft_dedup import stream_soft_dedup

    src = tmp_path / "docs"
    src.mkdir()
    shards = [
        [(0, "shared boilerplate text", "A"), (1, "unique alpha words", "A")],
        [(2, "shared boilerplate text", "B"), (3, "shared boilerplate text", "B")],
        [(4, "unique beta words", "B"), (5, "shared boilerplate text", "A")],
    ]
    for i, rows in enumerate(shards):
        spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        ).coalesce(1).write.parquet(str(src / f"shard_{i}"))
    for i in range(len(shards)):
        part = glob.glob(str(src / f"shard_{i}" / "*.parquet"))[0]
        shutil.move(part, str(src / f"s{i}.parquet"))
        shutil.rmtree(str(src / f"shard_{i}"))
        os.utime(str(src / f"s{i}.parquet"), (1000 + i, 1000 + i))

    schema = spark.read.parquet(str(src)).schema
    streamed = stream_soft_dedup(
        spark,
        str(src),
        schema,
        store_root=str(tmp_path / "sd_store"),
        max_files_per_trigger=1,
    )
    batch = soft_dedup(spark.read.parquet(str(src)))
    s_rows = sorted(map(tuple, streamed.collect()))
    b_rows = sorted(map(tuple, batch.collect()))
    assert s_rows == b_rows and len(s_rows) == 2
    by_src = {r[0]: r for r in s_rows}
    # 'shared boilerplate text' has 4 copies across batches/sources:
    # A holds 2 of them (weight 0.25 each) + 1 unique doc
    assert abs(by_src["A"][3] - (2 * 0.25 + 1.0)) < 1e-6
    assert by_src["A"][2] == 2 and by_src["B"][2] == 2  # dup_docs


def test_persistent_degree_core_planted(spark):
    """Planted persistence: a star hub with degree 2 in frames 0-2
    qualifies for both 2-frame windows at k=2; a hub equally dense in
    aggregate but active only in frame 1 (the rotating-actor case)
    qualifies for none; leaves never qualify. min_deg reports the
    weakest frame in the window."""
    rows = (
        # hub 1: deg 2 in frames 0,1; deg 3 in frame 2
        [(0, 1, 2), (0, 1, 3), (1, 1, 2), (1, 1, 4),
         (2, 1, 2), (2, 1, 3), (2, 1, 5)]
        # hub 9: deg 3 but only in frame 1
        + [(1, 9, 6), (1, 9, 7), (1, 9, 8)]
    )
    e = spark.createDataFrame(rows, "frame_id long, actor1 long, actor2 long")
    out = {
        (r.window_start, r.actor): r.min_deg
        for r in graph.persistent_degree_core(
            e, [0, 1, 2], k=2, delta=2
        ).collect()
    }
    assert out == {(0, 1): 2, (1, 1): 2}
