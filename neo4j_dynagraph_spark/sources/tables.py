"""Parquet table loading with timestamp normalization.

The driver testdata (TESTDATA.md) stores ``events.ts`` as parquet
TIMESTAMP(NANOS,false), which Spark cannot read natively; the session
sets ``spark.sql.legacy.parquet.nanosAsLong=true`` so it arrives as a
long of epoch-nanoseconds, and this module converts it to a proper
``TimestampType`` (microsecond precision, matching what DuckDB's
reader produces for the oracle comparison).

Scale note: these are plain ``spark.read.parquet`` scans — column
pruning and predicate pushdown flow through untouched. The nanos
conversion is a single projected expression and does not block
pushdown on any other column.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# columns stored as TIMESTAMP(NANOS) -> read as long nanos -> normalize
_NANOS_TS_COLUMNS: dict[str, list[str]] = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, normalizing nano-timestamp columns."""
    if name in _NANOS_TS_COLUMNS:
        # runtime-settable SQL conf: lets driver-provided sessions (built
        # without our session factory) read TIMESTAMP(NANOS) parquet
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANOS_TS_COLUMNS.get(name, []):
        if col in df.columns and dict(df.dtypes)[col] == "bigint":
            # Keep the RAW nanos long as `{col}_ns`: predicates on the
            # bare stored column push down to the parquet reader
            # (row-group min/max pruning), which predicates on the
            # derived timestamp cannot. Time-range queries filter on
            # `{col}_ns`; everything else uses the derived timestamp.
            df = df.withColumn(f"{col}_ns", F.col(col))
            # integer nanos -> truncate to micros (same truncation DuckDB
            # applies when reading TIMESTAMP(NANOS) into its micro
            # TIMESTAMP). MUST be integer `div`: `/` promotes to double,
            # and epoch-nanos (~1.7e18) exceed double's 2^53 exact range,
            # so floor(ns/1000.0) lands on a 1024 ns grid — observed as
            # ±1 µs errors against the oracle's exact integer division.
            df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register each table as a temp view (mirrors the DuckDB oracle setup)."""
    for name in tables or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
