"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The real registry lives in ``neo4j_dynagraph_spark.queries``; this
module is a thin adapter. NOTE: the testdata's ``events.ts`` physical
type has changed across driver generations (TIMESTAMP(NANOS) ->
TIMESTAMP_MICROS/timestamp_ntz); load_table normalizes EVERY arrival
type to the engine's (ts, ts_ns) contract and sets the runtime confs
it needs, so a vanilla driver-provided session works unmodified.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# robust to being exec'd/imported from any cwd
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from neo4j_dynagraph_spark import queries as q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: q4_actor_frame_counts —
    the full spine (scan -> tumbling discretization -> agg -> sort),
    SURVEY.md §7.2 M0."""
    return q.q4_actor_frame_counts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted for the genuinely
    non-SQL-expressible ops: LSH-ANN, mapInPandas feature extraction)."""
    return q.oracle_sql()
