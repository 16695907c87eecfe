"""As-of (point-in-time) join — the time-series operator Spark lacks.

For every left row, attach the latest right row with the same key whose
timestamp is <= the left timestamp (optionally within a tolerance window).
The natural need in the reference's domain (customer metric events joined to
the most recent reading of another metric) has no reference implementation —
Drill had no as-of join either; clients re-queried.

Implementation is pure DataFrame composition, one shuffle total:
tag and union both sides, then a carry-forward window (partitioned by key,
ordered by time) propagates the latest right payload onto each left row.
No Python, no per-key collect; the window state is one row per key.
At 100 TB both sides shuffle once on the key — the same cost as any keyed
join — and AQE skew handling applies to the window exchange.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: Optional[list[str]] = None,
    tolerance: Optional[int] = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join: latest right row with ``right.right_ts <=
    left.left_ts`` per key ``on``.

    ``right_cols`` defaults to every right column except the key and
    timestamp; matched columns are suffixed.  ``tolerance`` (same unit as the
    timestamps) drops matches older than ``left_ts - tolerance``.  Rows with
    no match keep NULLs (left-join semantics).  Ties (equal timestamps)
    match, with the latest right occurrence winning — DuckDB ASOF JOIN
    semantics, which the oracle tests pin down."""
    rcols = right_cols if right_cols is not None else [
        c for c in right.columns if c not in (on, right_ts)
    ]
    out_names = [f"{c}{suffix}" for c in rcols]
    matched_ts = f"{right_ts}{suffix}"

    lhs = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts).cast("long").alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*left.columns).alias("__lrow"),
        F.lit(None).cast("long").alias("__rts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(n) for c, n in zip(rcols, out_names)],
    )
    rhs = right.select(
        F.col(on).alias("__key"),
        F.col(right_ts).cast("long").alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(lhs.schema["__lrow"].dataType).alias("__lrow"),
        F.col(right_ts).cast("long").alias("__rts"),
        *[F.col(c).alias(n) for c, n in zip(rcols, out_names)],
    )
    # right rows sort before left at equal timestamps so ts-ties match; the
    # payload columns are a deterministic final tiebreaker so equal-(key,ts)
    # right rows resolve identically across runs/engines (largest payload
    # wins) instead of whichever row the shuffle ordered last
    tiebreak = [
        F.col(n)
        for c, n in zip(rcols, out_names)
        if not isinstance(right.schema[c].dataType, T.MapType)
    ]
    w = (
        Window.partitionBy("__key")
        .orderBy(F.col("__ts"), F.col("__is_left"), *tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lhs.unionByName(rhs).select(
        "__is_left",
        "__lrow",
        "__ts",
        F.last("__rts", ignorenulls=True).over(w).alias(matched_ts),
        *[F.last(n, ignorenulls=True).over(w).alias(n) for n in out_names],
    )
    out = carried.filter(F.col("__is_left") == 1)
    if tolerance is not None:
        within = F.col(matched_ts).isNotNull() & (
            (F.col("__ts") - F.col(matched_ts)) <= F.lit(tolerance)
        )
        out = out.select(
            "__lrow",
            *[F.when(within, F.col(c)).otherwise(F.lit(None)).alias(c) for c in [matched_ts, *out_names]],
        )
    else:
        out = out.select("__lrow", matched_ts, *out_names)
    return out.select(F.col("__lrow.*"), matched_ts, *out_names)
