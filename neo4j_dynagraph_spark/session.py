"""SparkSession factory with the engine's canonical configuration.

Design notes (100 TB scale):

- UTC session timezone: the reference used local-time calendar
  decomposition (load_gexf_to_neo4j.py:105, StructuredTimeline.java:38-39);
  we pin UTC so date-part derivation is deterministic across the
  cluster and agrees with the DuckDB oracle.
- AQE on: runtime coalescing of shuffle partitions, skew-join
  splitting, and dynamic broadcast-join demotion are exactly the
  mitigations a 1000-executor run needs when key skew shows up.
- ``spark.sql.legacy.parquet.nanosAsLong``: the driver testdata stores
  TIMESTAMP(NANOS) which vanilla Spark rejects; we read nanos as long
  and normalize in :mod:`neo4j_dynagraph_spark.sources.tables`.
- Arrow enabled: every Python-side operator in this engine is a
  vectorized pandas UDF / mapInPandas; Arrow batch transfer is the
  difference between 10x and 1000x slowdown vs JVM expressions.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "neo4j-dynagraph-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when the env var
    is set, else ``local[*]``. On a real cluster, callers pass their own
    master / rely on spark-submit and only the SQL confs below apply.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # -Xlog:disable: JVM unified-logging warnings (gc,alloc under
        # GCLocker pressure) print to STDOUT, which corrupts harnesses
        # that parse this process's stdout (bench.py's one-JSON-line
        # contract). Driver-side only; executors inherit in local mode.
        .config("spark.driver.extraJavaOptions", "-Xlog:disable")
        # warehouse pinned under the system temp root: the default is
        # ./spark-warehouse relative to the LAUNCH cwd, so any
        # saveAsTable caller (write_star_bucketed) invoked from the
        # repo root would litter the source tree with run artifacts
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(
                "SPARK_GRAFT_WAREHOUSE",
                os.path.join(tempfile.gettempdir(), "dynagraph-warehouse"),
            ),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
