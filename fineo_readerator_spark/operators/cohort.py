"""Cohort retention matrix — the product-analytics staple over event
streams: group users by their first-seen bucket (the cohort), then for
every later bucket report what fraction of the cohort came back.

Relationally it is three aggregates and one co-partitioned join — no
windows, no self-join on the fact table:

1. ``act``      — DISTINCT (user, bucket): one shuffle, map-side combined.
2. ``first``    — min(bucket) per user: re-keys ``act`` by user (the frame
                  is |users × buckets|, already tiny next to the facts).
3. ``matrix``   — act ⋈ first on user (co-partitioned — both sides are
                  user-keyed after #2), grouped by (cohort, offset).
                  Because ``act`` is distinct, ``count(*)`` IS the distinct
                  user count — no expensive count_distinct.
4. cohort sizes join back as a broadcast: the cohort frame is bounded by
   the time range over the granularity (metadata-sized by construction),
   never by the corpus.

At 100 TB the fact scan and the (user, bucket) distinct dominate; both
are single-pass and key-parallel.  Skewed power users are invisible here
— each user contributes one row per bucket after the distinct.

Determinism: exact integer counts; ``retention`` is the only division,
rounded at 1e-6 (the repo-wide contract for oracle hash-compare).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def retention_matrix(
    df: DataFrame,
    user_col: str = "user_id",
    bucket_col: str = "bucket",
    granularity_days: int = 1,
) -> DataFrame:
    """Retention matrix over a (user, bucket)-shaped activity frame.

    ``bucket_col`` must already be truncated to the cohort granularity
    (``date_trunc('day'|'week', ts)``); ``granularity_days`` converts the
    day difference into the offset unit (1 for daily, 7 for weekly).

    Returns (cohort, bucket_offset, n_active, n_cohort, retention):
    one row per cohort × offset that saw activity — offset 0 is the
    cohort itself (retention 1.0 by construction)."""
    if granularity_days < 1:
        raise ValueError(
            f"granularity_days must be >= 1, got {granularity_days}"
        )
    act = (
        df.select(user_col, bucket_col)
        .distinct()
        .localCheckpoint(eager=False)  # feeds first-seen AND the matrix join
    )
    first = act.groupBy(user_col).agg(
        F.min(bucket_col).alias("cohort")
    ).localCheckpoint(eager=False)  # feeds sizes AND the matrix join
    sizes = first.groupBy("cohort").agg(F.count(F.lit(1)).alias("n_cohort"))
    matrix = (
        act.join(first, user_col)
        .select(
            "cohort",
            # explicit floor on BOTH engines: Spark's cast("int") truncates
            # toward zero while DuckDB's CAST(double AS INT) rounds to
            # nearest, so off-grid buckets (not aligned to
            # granularity_days) would silently diverge per engine
            F.floor(
                F.datediff(F.col(bucket_col), F.col("cohort")) / granularity_days
            )
            .cast("int")
            .alias("bucket_offset"),
        )
        .groupBy("cohort", "bucket_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return (
        matrix.join(F.broadcast(sizes), "cohort")
        .select(
            "cohort",
            "bucket_offset",
            "n_active",
            "n_cohort",
            F.round(F.col("n_active") / F.col("n_cohort"), 6).alias("retention"),
        )
        .orderBy("cohort", "bucket_offset")
    )


def stickiness(
    df: DataFrame,
    user_col: str = "user_id",
    bucket_col: str = "bucket",
    window_days: int = 7,
) -> DataFrame:
    """Rolling stickiness: per day, DAU (distinct users that day), WAU
    (distinct users over the trailing ``window_days`` ending that day)
    and DAU/WAU — the habit-strength metric next to cohort retention.

    Rolling DISTINCT doesn't decompose over window frames, so instead of
    a per-day self-join the activity frame EXPLODES each (user, day) row
    to the ``window_days`` report days it supports (a constant ×W fan-out
    of the already-deduped activity frame, not of the corpus), then ONE
    (report_day, user) distinct + count pass.  Report days with no
    in-window activity simply don't appear; days before the first full
    window still report (their window is clipped by data start — the
    standard convention).

    Determinism: exact counts, one rounded division."""
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    act = df.select(user_col, bucket_col).distinct()
    # each activity day supports report days d .. d+W-1
    support = act.select(
        user_col,
        F.col(bucket_col).alias("__day"),
        F.explode(
            F.expr(
                f"sequence({bucket_col}, {bucket_col} + interval "
                f"{window_days - 1} days, interval 1 day)"
            )
        ).alias("__report"),
    )
    wau = (
        support.select(user_col, "__report").distinct()
        .groupBy("__report")
        .agg(F.count(F.lit(1)).alias("wau"))
    )
    dau = act.groupBy(F.col(bucket_col).alias("__report")).agg(
        F.count(F.lit(1)).alias("dau")
    )
    # report only days with actual same-day activity (dau side) — the
    # trailing days a user "supports" beyond the data range are clipped
    return (
        dau.join(wau, "__report")
        .select(
            F.col("__report").alias(bucket_col),
            "dau",
            "wau",
            F.round(F.col("dau") / F.col("wau"), 6).alias("stickiness"),
        )
        .orderBy(bucket_col)
    )


def stickiness_oracle_sql(
    events_sql: str,
    user_col: str = "user_id",
    bucket_expr: str = "CAST(date_trunc('day', ts) AS TIMESTAMP)",
    window_days: int = 7,
) -> str:
    """DuckDB replay of :func:`stickiness`: same explode-to-report-days
    walk, same clipping convention."""
    return f"""WITH act AS (
  SELECT DISTINCT {user_col} AS u, {bucket_expr} AS day FROM ({events_sql})
),
support AS (
  SELECT u, unnest(generate_series(day, day + INTERVAL {window_days - 1} DAY,
                                   INTERVAL 1 DAY)) AS report
  FROM act
),
wau AS (SELECT report, count(*) AS wau FROM (SELECT DISTINCT u, report FROM support) GROUP BY 1),
dau AS (SELECT day AS report, count(*) AS dau FROM act GROUP BY 1)
SELECT d.report AS bucket, CAST(d.dau AS BIGINT) AS dau, CAST(w.wau AS BIGINT) AS wau,
       round(d.dau / w.wau, 6) AS stickiness
FROM dau d JOIN wau w ON d.report = w.report
ORDER BY bucket"""


def retention_oracle_sql(
    events_sql: str,
    user_col: str = "user_id",
    bucket_expr: str = "CAST(date_trunc('day', ts) AS TIMESTAMP)",
    granularity_days: int = 1,
) -> str:
    """DuckDB replay of :func:`retention_matrix` over raw events: same
    distinct → first-seen → offset-count walk, same single rounded
    division."""
    return f"""WITH act AS (
  SELECT DISTINCT {user_col} AS u, {bucket_expr} AS bucket FROM ({events_sql})
),
f AS (SELECT u, min(bucket) AS cohort FROM act GROUP BY 1),
sz AS (SELECT cohort, count(*) AS n_cohort FROM f GROUP BY 1),
m AS (
  SELECT f.cohort,
         CAST(floor(date_diff('day', f.cohort, a.bucket) / {granularity_days}) AS INT) AS bucket_offset,
         count(*) AS n_active
  FROM act a JOIN f USING (u) GROUP BY 1, 2
)
SELECT m.cohort, m.bucket_offset,
       CAST(m.n_active AS BIGINT) AS n_active,
       CAST(sz.n_cohort AS BIGINT) AS n_cohort,
       round(m.n_active / sz.n_cohort, 6) AS retention
FROM m JOIN sz USING (cohort)
ORDER BY m.cohort, m.bucket_offset"""
