"""Batch sessionization (gaps-and-islands): split each key's event stream
into sessions separated by inactivity gaps.

The streaming twin (``streaming.streams.sessionize``) uses Spark's
``session_window`` state machine; this batch version is the classic
two-window composition — ``lag`` to mark session starts, running ``sum`` to
number them — which Catalyst executes as ONE shuffle on the key plus two
in-partition window passes (both windows share the (key, ts) ordering, so no
second exchange).  At 100 TB that single key-shuffle is the lower bound for
any per-key ordering operator.

Reference surface: the reference has no sessionization (its window operators
come from stock Drill and no fineo test exercises them, SURVEY.md §2.5);
this is part of the training-data-pipeline extension
(`ConvertFineoMarkerIntoFilteredInputTables.java`-style time semantics
applied to activity analysis).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize_batch(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap: int,
    session_col: str = "session_idx",
) -> DataFrame:
    """Append a per-key session index (0-based) that increments whenever the
    gap to the previous event of the same key is > ``gap`` (same units as
    ``ts_col``).  Deterministic for equal timestamps: the ordering ties break
    on nothing — equal-ts rows land in the same session regardless of order,
    because only the gap to the PREVIOUS distinct timestamp matters when
    gap >= 0."""
    w = Window.partitionBy(key_col).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    new_session = F.when(prev.isNull() | ((F.col(ts_col) - prev) > gap), 1).otherwise(0)
    running = Window.partitionBy(key_col).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(session_col, (F.sum(new_session).over(running) - 1).cast("long"))


def session_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap: int,
) -> DataFrame:
    """One row per (key, session): event count and [start, end] bounds —
    the standard session-rollup built on ``sessionize_batch``; the final
    aggregation reuses the key partitioning, so still one shuffle total."""
    s = sessionize_batch(df, key_col, ts_col, gap)
    return s.groupBy(key_col, "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
    )
