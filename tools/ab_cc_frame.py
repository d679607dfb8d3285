"""sf1 A/B of the r13 fixpoint change-flag inlining in
connected_components_per_frame (VERDICT r13 next-round #2).

The r13 change (dfd6540) rides the convergence flag INSIDE each
round's checkpointed plan instead of running a separate
new-vs-old-labels join job per round. Its win is proportional to the
ROUND COUNT, which at sf0.1 is ~2 (invisible against the per-round
constants); the driver's +14% reading on the row is what this A/B
adjudicates at 10x input, where the frame graphs are denser and the
label chains longer.

Both variants run on the IDENTICAL pre-staged symmetric edge frame,
timed end-to-end through component_lifecycle + the noop sink (guide
§1.4), alternating A/B/A/B to cancel session drift. Prints one JSON
line.

Usage:
    python tools/ab_cc_frame.py [sf_dir] [n_reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from neo4j_dynagraph_spark import get_spark  # noqa: E402
from neo4j_dynagraph_spark.operators import graph  # noqa: E402


def cc_per_frame_old(frame_edges, max_iterations: int = 30):  # noqa: ANN001
    """The pre-dfd6540 shape, verbatim: convergence via a separate
    per-round new-vs-old join job."""
    e = frame_edges.select("frame_id", "actor1", "actor2").distinct()
    sym = e.select(
        "frame_id",
        F.explode(
            F.array(
                F.struct(
                    F.col("actor1").alias("src"), F.col("actor2").alias("dst")
                ),
                F.struct(
                    F.col("actor2").alias("src"), F.col("actor1").alias("dst")
                ),
            )
        ).alias("p"),
    ).select("frame_id", "p.src", "p.dst").localCheckpoint()
    labels = (
        sym.select("frame_id", F.col("src").alias("actor"))
        .distinct()
        .withColumn("label", F.col("actor"))
        .localCheckpoint()
    )
    rounds = 0
    for _ in range(max_iterations):
        rounds += 1
        nbr_min = (
            sym.join(
                labels,
                (sym.frame_id == labels.frame_id) & (sym.dst == labels.actor),
            )
            .groupBy(sym.frame_id.alias("f"), sym.src.alias("s"))
            .agg(F.min("label").alias("nbr_label"))
        )
        stepped = labels.join(
            nbr_min,
            (labels.frame_id == nbr_min.f) & (labels.actor == nbr_min.s),
            "left",
        ).select(
            labels.frame_id,
            "actor",
            F.least(
                F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
            ).alias("label"),
        )
        lmap = stepped.select(
            F.col("frame_id").alias("lf"),
            F.col("actor").alias("l_actor"),
            F.col("label").alias("l_label"),
        )
        new_labels = (
            stepped.join(
                lmap,
                (stepped.frame_id == lmap.lf)
                & (stepped.label == lmap.l_actor),
                "left",
            )
            .select(
                stepped.frame_id,
                "actor",
                F.coalesce(F.col("l_label"), F.col("label")).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), ["frame_id", "actor"])
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return (
        labels.select("frame_id", "actor", F.col("label").alias("component")),
        rounds,
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/genscale/sf1"
    n_reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    spark = get_spark("ab-cc-frame")
    spark.sparkContext.setLogLevel("ERROR")

    from neo4j_dynagraph_spark import queries as qmod

    def run(variant: str) -> float:
        t0 = time.perf_counter()
        fe = qmod._edges(spark, sf_dir, qmod._day_filter())
        if variant == "old":
            labels, _ = cc_per_frame_old(fe)
        else:
            labels = graph.connected_components_per_frame(fe)
        out = graph.component_lifecycle(labels)
        out.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # warm-up once (JVM/codegen), not recorded
    spark.sparkContext.setJobDescription("ab_cc_frame warmup")
    run("new")

    walls: dict[str, list[float]] = {"old": [], "new": []}
    for i in range(n_reps):
        for variant in ("old", "new"):
            spark.sparkContext.setJobDescription(
                f"ab_cc_frame {variant} rep {i}"
            )
            walls[variant].append(round(run(variant), 3))

    med = {
        k: sorted(v)[len(v) // 2] for k, v in walls.items()
    }
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_reps": n_reps,
                "walls": walls,
                "median": med,
                "speedup_new_over_old": round(med["old"] / med["new"], 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
