"""Physical-plan inspection helpers.

The reference had no optimizer to inspect; our engine's physical layer
is Catalyst's, and these helpers make plan properties assertable in
tests and tunable in the perf loop: shuffle counts, pushed filters,
broadcast usage, codegen coverage (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_str(df: DataFrame, mode: str = "formatted") -> str:
    """The executed-plan string (post-AQE when already executed)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def normalize_plan(s: str) -> str:
    """Strip session-dependent counters from an explain string so plans
    from different sessions compare byte-for-byte: attribute expression
    ids (#834L — allocated from a session-global counter, so ADDING a
    query shifts every later plan's ids), plan ids, and broadcast
    exchange ids. Structural content (operators, join strategies,
    PushedFilters, ReadSchema, codegen stage numbering) is untouched —
    exactly the properties the audit exists to pin."""
    import re

    s = re.sub(r"#\d+", "#N", s)
    # lambda-variable names (x_467) draw from the same global counter
    s = re.sub(r"_\d+#N", "_N#N", s)
    s = re.sub(r"plan_id=\d+", "plan_id=N", s)
    s = re.sub(r"\[id=\d+\]", "[id=N]", s)
    # checkpointed lineage scans: RDD id and Python/JVM callsite vary
    # per session (MapPartitionsRDD[2368] at localCheckpoint at ...:0)
    s = re.sub(r"RDD\[\d+\] at (\w+) at [^,]+", r"RDD[N] at \1 at SITE", s)
    # engine temp dirs (drain sinks, upsert dimension stores) carry
    # random per-run suffixes / content-hash version dirs; they come
    # from tempfile.mkdtemp which honors TMPDIR, so match any leading
    # directory — not just /tmp — and rewrite to one canonical token
    # prefix class is path chars only — NOT \S, which would eat the
    # surrounding "[file:" decoration of InMemoryFileIndex nodes
    s = re.sub(r"[\w./-]*/dynagraph_[^\]\s,]*", "/tmp/dynagraph_PATH", s)
    return s


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan —
    the first number to look at for any operator meant for 100 TB."""
    return plan_str(df, "simple").count("Exchange hashpartitioning") + plan_str(
        df, "simple"
    ).count("Exchange rangepartitioning")


def has_pushed_filters(df: DataFrame) -> bool:
    """True when the parquet scan carries PushedFilters (predicate made
    it to the reader, enabling row-group pruning)."""
    s = plan_str(df, "formatted")
    return "PushedFilters: [" in s and "PushedFilters: []" not in s


def broadcast_join_count(df: DataFrame) -> int:
    return plan_str(df, "simple").count("BroadcastHashJoin")


def codegen_stage_count(df: DataFrame) -> int:
    """Whole-stage-codegen subtree count from EXPLAIN CODEGEN; fewer,
    wider spans = more of the query runs as fused JVM loops. NOTE:
    Spark 4.1's explain reports 0 subtrees even for trivially
    codegen-able plans (upstream reporting change) — treat 0 as
    'unknown', not 'no codegen'."""
    import re

    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", plan_str(df, "codegen"))
    return int(m.group(1)) if m else 0
