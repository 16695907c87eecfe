"""Binned range join: points joined to the intervals containing them.

A naive point-in-interval join is an inequality join — Spark executes it as
a broadcast nested loop (or worse, cartesian) because hash joins need
equality keys.  The scale path bins the time axis at a chosen granularity:
each interval explodes to the bins it covers, each point falls in exactly
one bin, and the join becomes an equi-join on (key, bin) followed by the
exact range predicate.  Each (point, interval) pair meets in exactly one
bin — the point's — so no dedup pass is needed.

Cost model: shuffle on (key, bin) like any keyed join; interval explosion
multiplies the right side by ~interval_span/granularity, so pick a
granularity on the order of the typical interval length.  AQE skew handling
applies to hot (key, bin) buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    granularity: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row (same key ``on``) whose
    half-open window ``[start_ts, end_ts)`` contains ``point_ts``.

    Output: all point columns + all interval columns (caller aliases any
    collisions beforehand).  ``granularity`` is the bin width in timestamp
    units.  ``how='left'`` keeps unmatched points with NULL interval
    columns."""
    if granularity <= 0:
        raise ValueError("granularity must be positive")
    overlap = (set(points.columns) & set(intervals.columns)) - {on}
    if overlap:
        raise ValueError(f"alias colliding columns before joining: {sorted(overlap)}")

    p = points.withColumn("__bin", (F.col(point_ts).cast("long") / granularity).cast("long"))
    i = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                (F.col(start_ts).cast("long") / granularity).cast("long"),
                # end is exclusive, but a partial last bin still holds matches
                ((F.col(end_ts).cast("long") - 1) / granularity).cast("long"),
            )
        ),
    ).withColumnRenamed(on, "__ikey")
    cond = (
        (F.col(on) == F.col("__ikey"))
        & (p["__bin"] == i["__bin"])
        & (F.col(point_ts).cast("long") >= F.col(start_ts).cast("long"))
        & (F.col(point_ts).cast("long") < F.col(end_ts).cast("long"))
    )
    joined = p.join(i, cond, how=how)
    return joined.drop("__bin").drop("__ikey")
