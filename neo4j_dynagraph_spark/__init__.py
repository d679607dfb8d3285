"""neo4j_dynagraph_spark — a PySpark-native temporal-graph analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of SocioPatterns/neo4j-dynagraph (reference surveyed in
SURVEY.md) as an idiomatic Spark DataFrame/SQL engine:

- the reference's Neo4j property graph is a star schema in disguise
  (SURVEY.md §1.1): two fact tables (frame_actors, frame_interactions)
  and three dimensions (frames, actors, interactions);
- its hierarchical timeline index (BaseTimeline.java /
  StructuredTimeline.java) is replaced by date-part columns +
  Catalyst partition pruning (SURVEY.md §1.4);
- its 14 Cypher benchmark queries (cypher_query_timing.py) are
  re-expressed as DataFrame joins/aggregations in
  :mod:`neo4j_dynagraph_spark.queries`.

On top of reference parity, the engine ships large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal column plumbing) designed for 100 TB / multi-
executor scale: every operator is DataFrame -> DataFrame, no
driver-side collects in the data path, broadcast for small dims, and
partition-count-aware shuffles.
"""

from neo4j_dynagraph_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
