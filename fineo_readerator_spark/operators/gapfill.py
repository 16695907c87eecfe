"""Time-series gap fill + last-observation-carried-forward (LOCF).

The hypertable-rollup companion (TimescaleDB's ``time_bucket_gapfill`` /
``locf`` surface re-expressed relationally): a bucketed aggregate only has
rows for buckets that saw data, but downstream consumers (dashboards,
drift monitors, forecasting features) need a DENSE series — every bucket
present, missing ones flagged and optionally filled with the last
observed value.

Spark-first shape: the dense spine is ``keys × sequence(min, max, step)``
— both sides are aggregates (metadata-sized relative to the fact table),
the sequence explodes in-plan from a one-row bounds frame (no driver
collect), and the bounds side is broadcast by AQE.  The fill itself is a
left join plus one running ``last(ignorenulls)`` window per key — no UDFs
anywhere, the whole thing stays in whole-stage codegen.

At 100 TB the fact scan is the cost; the spine is |keys| × |buckets|
rows, bounded by the time range over the step — a monitoring-sized
frame.  The window shuffles the SPINE (not the corpus) by key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def gap_fill(
    bucketed: DataFrame,
    bucket_col: str,
    key_cols: tuple[str, ...],
    fill_cols: tuple[str, ...] = (),
    step: str = "1 hour",
    count_col: str | None = None,
    interp_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Densify a bucketed frame: emit one row per (key, bucket) over the
    GLOBAL [min, max] bucket range at ``step`` granularity, with

    - ``is_gap`` — true where the input had no row (observation-based via
      a presence marker, so an observed bucket whose measure is NULL is
      NOT a gap),
    - ``count_col`` (if named) coalesced to 0 on gap rows,
    - ``{col}_locf`` per ``fill_cols`` entry — the last non-NULL observed
      value at or before this bucket within the key (NULL until the first
      observation; gap rows keep the original column NULL so filled and
      observed values stay distinguishable),
    - ``{col}_interp`` per ``interp_cols`` entry — linear interpolation
      between the surrounding observations (TimescaleDB ``interpolate()``
      semantics): observed rows echo their own value, gap rows get
      ``prev + (next-prev) · (t-t_prev)/(t_next-t_prev)`` over epoch
      millis, rounded at 1e-6; buckets before the first or after the last
      observation stay NULL (interpolation needs both endpoints).

    ``step`` is a SQL interval body (``"1 hour"``, ``"15 minutes"``)
    applied via ``sequence(lo, hi, interval step)`` — inclusive ends on
    both engines.

    Scale note: interpolation adds two more window passes over the SPINE
    per column (same key partitioning as LOCF — one shuffle total); the
    corpus-sized input is never re-scanned."""
    if not key_cols:
        raise ValueError("gap_fill needs at least one key column")
    # the presence marker makes is_gap observation-based, not value-based:
    # an input row whose measure happens to be NULL is still an observed
    # bucket, and callers need no probe column at all
    bucketed = bucketed.withColumn("__present", F.lit(True))
    # three consumers (keys, bounds, the fill join) — cut lineage so the
    # upstream aggregate computes once, and so a table-backed input's
    # attribute ids don't conflict in the spine self-join
    bucketed = bucketed.localCheckpoint(eager=False)
    keys = bucketed.select(*key_cols).distinct()
    bounds = bucketed.agg(
        F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi")
    )
    spine = keys.crossJoin(F.broadcast(bounds)).select(
        *key_cols,
        F.explode(
            F.expr(f"sequence(__lo, __hi, interval {step})")
        ).alias(bucket_col),
    )
    joined = spine.join(bucketed, [*key_cols, bucket_col], "left")
    out = joined.withColumn("is_gap", F.col("__present").isNull()).drop(
        "__present"
    )
    if count_col:
        out = out.withColumn(count_col, F.coalesce(F.col(count_col), F.lit(0)))
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in fill_cols:
        out = out.withColumn(f"{c}_locf", F.last(c, ignorenulls=True).over(w))
    if interp_cols:
        wf = (
            Window.partitionBy(*key_cols)
            .orderBy(bucket_col)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        t = F.unix_millis(F.col(bucket_col).cast("timestamp"))
        obs_t = lambda c: F.when(F.col(c).isNotNull(), t)  # noqa: E731
        for c in interp_cols:
            pv = F.last(c, ignorenulls=True).over(w)
            pt = F.last(obs_t(c), ignorenulls=True).over(w)
            nv = F.first(c, ignorenulls=True).over(wf)
            nt = F.first(obs_t(c), ignorenulls=True).over(wf)
            lerp = pv + (nv - pv) * ((t - pt) / (nt - pt))
            out = out.withColumn(
                f"{c}_interp",
                F.when(F.col(c).isNotNull(), F.col(c)).otherwise(
                    F.round(lerp, 6)
                ),
            )
    return out
