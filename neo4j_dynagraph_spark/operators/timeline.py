"""Timeline API — the Spark equivalent of the reference's Java index.

The reference builds a sorted circular linked list of time nodes
(BaseTimeline.java:55-59, addNode :172-279) plus a year/month/day/hour
tree over it (StructuredTimeline.java:36-108), because 2012-era Neo4j
lacked range indexes. In Spark the same API surface is thin sugar over
column predicates on a timestamped DataFrame: sorted-on-write parquet +
row-group min/max stats + date-part partition pruning already provide
everything the hand-built index did (SURVEY.md §1.4, §2.11).

Bound semantics are matched to the reference *exactly*:
- ``between(t1, t2)`` is EXCLUSIVE on both ends — BaseTimeline.java
  `getAllNodesBetween` walks strictly-after t1 (:678) and stops at
  ``>= endTime`` (:658).
- ``after``/``before`` are strict (:521-563, :602-632).
- ``point(ts)`` is exact equality (:481-519).

Every method returns a lazy DataFrame — the analogue of the reference's
lazy Traverser Iterables (BaseTimeline.java:441-461), except Catalyst
sees the whole composed plan instead of opaque callbacks.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


class Timeline:
    """A timestamp-indexed view over any DataFrame.

    ``ts_col`` holds epoch seconds (long) — the reference's native
    representation (load_gexf_to_neo4j.py:9).
    """

    def __init__(self, df: DataFrame, ts_col: str = "timestamp") -> None:
        self.df = df
        self.ts_col = ts_col

    @property
    def _ts(self):  # noqa: ANN202
        return F.col(self.ts_col)

    # -- point / range reads (BaseTimeline.java:417-690) ------------------

    def point(self, ts: int) -> DataFrame:
        """Exact-timestamp lookup (getNodes, BaseTimeline.java:481-519)."""
        return self.df.where(self._ts == ts)

    def after(self, ts: int) -> DataFrame:
        """Strictly-after scan (getAllNodesAfter, BaseTimeline.java:521-563)."""
        return self.df.where(self._ts > ts).orderBy(self.ts_col)

    def before(self, ts: int) -> DataFrame:
        """Strictly-before scan (getAllNodesBefore, BaseTimeline.java:602-632)."""
        return self.df.where(self._ts < ts).orderBy(self.ts_col)

    def between(self, t1: int, t2: int) -> DataFrame:
        """Exclusive-bounds range scan (getAllNodesBetween,
        BaseTimeline.java:634-690; bounds :658,678). Validates t1 < t2
        like the reference (:637-641)."""
        if not t1 < t2:
            raise ValueError(f"between requires t1 < t2, got {t1} >= {t2}")
        return self.df.where((self._ts > t1) & (self._ts < t2)).orderBy(self.ts_col)

    def all(self) -> DataFrame:
        """Full ordered scan (getAllNodes, BaseTimeline.java:441-461)."""
        return self.df.orderBy(self.ts_col)

    # -- first / last (BaseTimeline.java:138-170) --------------------------

    def first(self) -> DataFrame:
        """Min-timestamp row(s) (getFirstNode)."""
        return self.df.orderBy(self.ts_col).limit(1)

    def last(self) -> DataFrame:
        """Max-timestamp row(s) (getLastNode)."""
        return self.df.orderBy(F.desc(self.ts_col)).limit(1)

    def bounds(self) -> DataFrame:
        """(min_ts, max_ts) 1-row frame — the cached first/last pair."""
        return self.df.agg(
            F.min(self._ts).alias("min_ts"), F.max(self._ts).alias("max_ts")
        )

    # -- structured (calendar) access (StructuredTimeline.java:61-108) -----

    def by_date_parts(
        self,
        year: int | None = None,
        month: int | None = None,
        day: int | None = None,
        hour: int | None = None,
    ) -> DataFrame:
        """Tree-descent point/prefix query via date-part columns.

        On a table partitioned by (year, month, day) this is pure
        partition pruning — the Catalyst equivalent of descending the
        reference's y/m/d/h tree (StructuredTimeline.java:61-84).
        """
        out = self.df
        ts = F.timestamp_seconds(self._ts)
        for name, fn, val in (
            ("year", F.year, year),
            ("month", F.month, month),
            ("day", F.dayofmonth, day),
            ("hour", F.hour, hour),
        ):
            if val is not None:
                col = F.col(name) if name in self.df.columns else fn(ts)
                out = out.where(col == val)
        return out

    def by_date(self, date_str: str) -> DataFrame:
        """Parse 'yyyy-MM-dd HH:mm:ss' and do a point lookup —
        get_timeline_nodes_by_date (StructuredTimelinePlugin.java:74-89)."""
        ts = F.unix_timestamp(F.to_timestamp(F.lit(date_str), "yyyy-MM-dd HH:mm:ss"))
        return self.df.where(self._ts == ts)

    # -- mutation-shaped operations ---------------------------------------

    def add(self, rows: DataFrame) -> "Timeline":
        """Sorted insert (addNode, BaseTimeline.java:172-279): in a
        columnar engine this is append — order is re-established by
        sort-on-read/write, late (out-of-order) rows need no list
        splicing (SURVEY.md §2.9 T3)."""
        return Timeline(self.df.unionByName(rows), self.ts_col)

    def remove(self, predicate) -> "Timeline":  # noqa: ANN001
        """Unlink rows (removeNode, BaseTimeline.java:332-415) as a
        filtered view; `predicate` is a boolean Column."""
        return Timeline(self.df.where(~predicate), self.ts_col)
