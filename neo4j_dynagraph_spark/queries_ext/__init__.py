"""Extension query registry: dedup / similarity / text / multimodal /
streaming — the training-data-pipeline surface (SURVEY.md §7.2 M5).

Registered into the same REGISTRY as the reference-parity queries. Every
oracle replays the engine's portable md5-based hash64 in SQL, so even
MinHash signatures and SimHash fingerprints are verified bit-for-bit by
DuckDB. Queries whose semantics cannot be expressed in ANSI SQL
(LSH-ANN with engine-internal hyperplanes, streaming) either carry an
equivalent-by-construction oracle (streaming == batch aggregation) or
none (rows-only check, noted in the docstring).

Round 9: the former 5.5 kLoC single file is now a package split by
registry family; importing this package registers every family in a
fixed order. Driver-grade ordering does not depend on that order — the
explicit _GRADE_WINDOW in queries.py reorders the registry after all
registrations (see its guard, finished below for the direct-import
path).
"""

from __future__ import annotations

# import order fixes registration order of the tail (the graded window
# is reordered explicitly afterwards either way)
from neo4j_dynagraph_spark.queries_ext import _shared  # noqa: F401
from neo4j_dynagraph_spark.queries_ext.dedup import *  # noqa: F401,F403
from neo4j_dynagraph_spark.queries_ext.curate import *  # noqa: F401,F403
from neo4j_dynagraph_spark.queries_ext.similarity import *  # noqa: F401,F403
from neo4j_dynagraph_spark.queries_ext.text import *  # noqa: F401,F403
from neo4j_dynagraph_spark.queries_ext.multimodal import *  # noqa: F401,F403
from neo4j_dynagraph_spark.queries_ext.streams import *  # noqa: F401,F403
from neo4j_dynagraph_spark.queries_ext.sketch import *  # noqa: F401,F403
from neo4j_dynagraph_spark.queries_ext.graph import *  # noqa: F401,F403
from neo4j_dynagraph_spark.queries_ext.events import *  # noqa: F401,F403

# Finish the deferred grade-window application for the direct-import
# path (see the guard at the bottom of queries.py).
from neo4j_dynagraph_spark import queries as _queries_mod  # noqa: E402

if getattr(_queries_mod, "_WINDOW_DEFERRED", False):
    _queries_mod._apply_grade_window()
