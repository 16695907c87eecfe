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


def diff_in_diff(
    df: DataFrame,
    unit_col: str,
    bucket_col: str,
    value_col: str,
    treat_pred: Column,
    post_pred: Column,
) -> DataFrame:
    """Difference-in-differences over a bucketed event frame — the
    product-analytics causal read behind "did the rollout move the
    metric beyond the trend everyone was on": with per-(treatment ×
    period) cell means ``m = S/n`` of per-unit bucket sums,
    ``DiD = (m_t,post − m_t,pre) − (m_c,post − m_c,pre)``.

    Exact integers until ONE final division: the four cell sums and
    counts aggregate exactly, the mean differences cross-multiply onto
    the common denominator ``n₁n₂n₃n₄``, and ``did_milli`` is the
    half-up milli division of that single rational — with the explicit
    truncate-vs-floor correction on BOTH faces, because the numerator is
    SIGNED (a negative effect is half the point) and both engines'
    native integer division truncates toward zero (the dyadic_ewma
    find).  Empty cells make the effect undefined → zero rows rather
    than a NULL-armed report.

    Output: one row — the four cell (sum, n) pairs undivided (the
    seasonal_decompose stance: consumers re-derive any mean exactly)
    plus ``did_milli``.

    Scale shape: one (unit, treatment, period) aggregate over the raw
    frame (the only corpus-sized pass, map-side combined), then a
    4-row-cell aggregate — nothing above cell cardinality shuffles."""
    cells = (
        df.select(
            F.col(unit_col).alias("u"),
            treat_pred.cast("int").alias("t"),
            post_pred.cast("int").alias("p"),
            F.col(value_col).cast("long").alias("v"),
        )
        .groupBy("u", "t", "p")
        .agg(F.sum("v").alias("uv"))
        .groupBy("t", "p")
        .agg(F.sum("uv").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    wide = cells.agg(
        F.sum(F.when((F.col("t") == 1) & (F.col("p") == 1), F.col("s"))).alias("s_tp"),
        F.sum(F.when((F.col("t") == 1) & (F.col("p") == 1), F.col("n"))).alias("n_tp"),
        F.sum(F.when((F.col("t") == 1) & (F.col("p") == 0), F.col("s"))).alias("s_tb"),
        F.sum(F.when((F.col("t") == 1) & (F.col("p") == 0), F.col("n"))).alias("n_tb"),
        F.sum(F.when((F.col("t") == 0) & (F.col("p") == 1), F.col("s"))).alias("s_cp"),
        F.sum(F.when((F.col("t") == 0) & (F.col("p") == 1), F.col("n"))).alias("n_cp"),
        F.sum(F.when((F.col("t") == 0) & (F.col("p") == 0), F.col("s"))).alias("s_cb"),
        F.sum(F.when((F.col("t") == 0) & (F.col("p") == 0), F.col("n"))).alias("n_cb"),
    ).filter(
        F.col("n_tp").isNotNull()
        & F.col("n_tb").isNotNull()
        & F.col("n_cp").isNotNull()
        & F.col("n_cb").isNotNull()
    )
    num = (
        "(cast(s_tp as decimal(38,0)) * n_tb * n_cp * n_cb"
        " - cast(s_tb as decimal(38,0)) * n_tp * n_cp * n_cb"
        " - cast(s_cp as decimal(38,0)) * n_tp * n_tb * n_cb"
        " + cast(s_cb as decimal(38,0)) * n_tp * n_tb * n_cp)"
    )
    den = "(cast(n_tp as decimal(38,0)) * n_tb * n_cp * n_cb)"
    return wide.select(
        F.col("s_tp").cast("long").alias("treat_post_sum"),
        F.col("n_tp").cast("long").alias("treat_post_units"),
        F.col("s_tb").cast("long").alias("treat_pre_sum"),
        F.col("n_tb").cast("long").alias("treat_pre_units"),
        F.col("s_cp").cast("long").alias("ctrl_post_sum"),
        F.col("n_cp").cast("long").alias("ctrl_post_units"),
        F.col("s_cb").cast("long").alias("ctrl_pre_sum"),
        F.col("n_cb").cast("long").alias("ctrl_pre_units"),
        F.expr(
            f"cast((({num} * 2000 + {den}) div ({den} * 2))"
            f" - (case when ({num} * 2000 + {den}) < 0"
            f"      and ({num} * 2000 + {den}) % ({den} * 2) != 0"
            f"     then 1 else 0 end) as bigint)"
        ).alias("did_milli"),
    )


def diff_in_diff_oracle_sql(
    events_sql: str,
    unit_col: str,
    value_col: str,
    treat_sql: str,
    post_sql: str,
) -> str:
    """DuckDB replay of :func:`diff_in_diff` — same cell aggregates,
    common-denominator rational, and the signed half-up division with
    the truncate-vs-floor correction (DuckDB ``//`` truncates too)."""
    num = (
        "(CAST(s_tp AS HUGEINT) * n_tb * n_cp * n_cb"
        " - CAST(s_tb AS HUGEINT) * n_tp * n_cp * n_cb"
        " - CAST(s_cp AS HUGEINT) * n_tp * n_tb * n_cb"
        " + CAST(s_cb AS HUGEINT) * n_tp * n_tb * n_cp)"
    )
    den = "(CAST(n_tp AS HUGEINT) * n_tb * n_cp * n_cb)"
    return f"""
WITH per AS (
  SELECT {unit_col} AS u,
         CAST({treat_sql} AS INT) AS t, CAST({post_sql} AS INT) AS p,
         CAST(sum(CAST({value_col} AS BIGINT)) AS BIGINT) AS uv
  FROM ({events_sql}) GROUP BY 1, 2, 3
),
cells AS (
  SELECT t, p, CAST(sum(uv) AS BIGINT) AS s, count(*) AS n
  FROM per GROUP BY 1, 2
),
wide AS (
  SELECT
    sum(CASE WHEN t = 1 AND p = 1 THEN s END) AS s_tp,
    sum(CASE WHEN t = 1 AND p = 1 THEN n END) AS n_tp,
    sum(CASE WHEN t = 1 AND p = 0 THEN s END) AS s_tb,
    sum(CASE WHEN t = 1 AND p = 0 THEN n END) AS n_tb,
    sum(CASE WHEN t = 0 AND p = 1 THEN s END) AS s_cp,
    sum(CASE WHEN t = 0 AND p = 1 THEN n END) AS n_cp,
    sum(CASE WHEN t = 0 AND p = 0 THEN s END) AS s_cb,
    sum(CASE WHEN t = 0 AND p = 0 THEN n END) AS n_cb
  FROM cells
)
SELECT CAST(s_tp AS BIGINT) AS treat_post_sum, CAST(n_tp AS BIGINT) AS treat_post_units,
       CAST(s_tb AS BIGINT) AS treat_pre_sum, CAST(n_tb AS BIGINT) AS treat_pre_units,
       CAST(s_cp AS BIGINT) AS ctrl_post_sum, CAST(n_cp AS BIGINT) AS ctrl_post_units,
       CAST(s_cb AS BIGINT) AS ctrl_pre_sum, CAST(n_cb AS BIGINT) AS ctrl_pre_units,
       CAST((({num} * 2000 + {den}) // ({den} * 2))
            - (CASE WHEN ({num} * 2000 + {den}) < 0
                     AND ({num} * 2000 + {den}) % ({den} * 2) != 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS did_milli
FROM wide
WHERE n_tp IS NOT NULL AND n_tb IS NOT NULL
  AND n_cp IS NOT NULL AND n_cb IS NOT NULL
"""


def cohort_ltv(
    df: DataFrame,
    unit_col: str,
    bucket_col: str,
    value_col: str,
) -> DataFrame:
    """Cumulative value per cohort age — the LTV curve behind "how much
    has the day-X cohort produced by age N", the revenue twin of
    :func:`retention_matrix`'s activity counts: units cohort on their
    FIRST bucket, value aggregates per (cohort, age = bucket − cohort),
    and a running sum walks each cohort's curve.

    Exact integers end to end: per-cell value sums, cohort sizes, and
    the cumulative window are all integer aggregates; ``cum_per_unit_
    milli`` is the half-up milli division by the cohort size.  The
    DENOMINATOR (a count) is positive but the NUMERATOR
    ``cum_v·2000 + n`` is SIGNED (negative cumulative value), so both
    faces carry the explicit truncate-vs-floor correction (the
    dyadic_ewma/DiD convention; without it ``cum_v=-1, n=3`` rendered
    −332 instead of half-up −333 on both engines — parity held, the
    stated convention didn't; r11 find).

    Scale shape: one (unit, bucket) aggregate over raw events, one
    unit-keyed min join (the retention_matrix shape), one (cohort, age)
    aggregate, then the running sum over the |cohorts|×|ages| matrix —
    nothing above matrix cardinality shuffles after the second agg."""
    from pyspark.sql.window import Window

    per = df.groupBy(
        F.col(unit_col).alias("u"), F.col(bucket_col).alias("b")
    ).agg(F.sum(F.col(value_col).cast("long")).alias("v"))
    per = per.localCheckpoint(eager=False)
    first = per.groupBy("u").agg(F.min("b").alias("cohort"))
    sizes = first.groupBy("cohort").agg(F.count(F.lit(1)).alias("n_cohort"))
    cells = (
        per.join(first, "u")
        .groupBy("cohort", (F.col("b") - F.col("cohort")).alias("age"))
        .agg(F.sum("v").alias("cell_v"))
    )
    w = Window.partitionBy("cohort").orderBy("age").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        cells.withColumn("cum_v", F.sum("cell_v").over(w))
        .join(sizes, "cohort")
        .select(
            "cohort",
            F.col("age").cast("long").alias("age"),
            F.col("cell_v").cast("long").alias("bucket_value"),
            F.col("cum_v").cast("long").alias("cum_value"),
            F.col("n_cohort").cast("long").alias("n_cohort"),
            F.expr(
                "cast(((cast(cum_v as decimal(38,0)) * 2000 + n_cohort)"
                " div (cast(n_cohort as decimal(38,0)) * 2))"
                " - (case when (cast(cum_v as decimal(38,0)) * 2000 + n_cohort) < 0"
                "      and (cast(cum_v as decimal(38,0)) * 2000 + n_cohort)"
                "          % (cast(n_cohort as decimal(38,0)) * 2) != 0"
                "     then 1 else 0 end) as bigint)"
            ).alias("cum_per_unit_milli"),
        )
    )


def cohort_ltv_oracle_sql(
    events_sql: str,
    unit_col: str,
    bucket_col: str,
    value_col: str,
) -> str:
    """DuckDB replay of :func:`cohort_ltv` — same cohorting, matrix
    aggregate, running sum and half-up milli division with the signed
    truncate-vs-floor correction (DuckDB ``//`` truncates too)."""
    return f"""
WITH per AS (
  SELECT {unit_col} AS u, {bucket_col} AS b,
         CAST(sum(CAST({value_col} AS BIGINT)) AS BIGINT) AS v
  FROM ({events_sql}) GROUP BY 1, 2
),
first AS (SELECT u, min(b) AS cohort FROM per GROUP BY u),
sizes AS (SELECT cohort, count(*) AS n_cohort FROM first GROUP BY cohort),
cells AS (
  SELECT f.cohort, per.b - f.cohort AS age, CAST(sum(v) AS BIGINT) AS cell_v
  FROM per JOIN first f ON per.u = f.u GROUP BY 1, 2
),
cum AS (
  SELECT cohort, age, cell_v,
         sum(cell_v) OVER (PARTITION BY cohort ORDER BY age
                           ROWS UNBOUNDED PRECEDING) AS cum_v
  FROM cells
)
SELECT c.cohort AS cohort, CAST(age AS BIGINT) AS age, cell_v AS bucket_value,
       CAST(cum_v AS BIGINT) AS cum_value,
       CAST(n_cohort AS BIGINT) AS n_cohort,
       CAST(((CAST(cum_v AS HUGEINT) * 2000 + n_cohort)
            // (CAST(n_cohort AS HUGEINT) * 2))
            - (CASE WHEN (CAST(cum_v AS HUGEINT) * 2000 + n_cohort) < 0
                 AND (CAST(cum_v AS HUGEINT) * 2000 + n_cohort)
                     % (CAST(n_cohort AS HUGEINT) * 2) != 0
                THEN 1 ELSE 0 END) AS BIGINT) AS cum_per_unit_milli
FROM cum c JOIN sizes s ON c.cohort = s.cohort
"""


def gini_concentration(
    df: DataFrame,
    unit_col: str,
    value_col: str,
) -> DataFrame:
    """Gini coefficient of per-unit value totals in EXACT integers — the
    concentration audit behind "is revenue/token volume a long tail or a
    whale problem": with per-unit sums ``x_1 ≤ … ≤ x_n`` (ties ranked by
    unit id — any total order gives the same Σi·x_i within a tie class
    since tied values are interchangeable),
    ``gini = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx)``.

    For non-negative totals the numerator is non-negative (Chebyshev's
    sum inequality), so the half-up milli division is truncation-safe on
    both engines; negative per-unit totals are excluded (Gini is
    undefined under mixed signs) and reported via ``n_excluded``.

    Scale shape: one (unit) aggregate over the raw events, then the
    global sort a Gini fundamentally needs is computed as a DISTRIBUTED
    two-pass rank — ``repartitionByRange(x, u)`` (a parallel range sort:
    every key in partition p precedes every key in p+1, and (x, u) is a
    strict total order since u is unique per row), a per-partition local
    ``row_number`` (the rank window is PARTITIONED, never global), then
    per-partition (count, Σx, Σj·x) rolled up with a running-offset
    correction ``Σi·x_i = Σ_p (Σj·x_j + offset_p·Σx_p)`` where offset_p
    is the row count of earlier partitions.  The only unpartitioned
    window left runs over ≤ |shuffle partitions| offset rows (bounded by
    config, not data) — at 100 TB with 1e9 units no single executor ever
    holds more than one range slice (r10 verdict task #5; AQE may merge
    ADJACENT range partitions, which preserves both the range order and
    the local sort, so the rollup stays exact)."""
    from pyspark.sql.window import Window

    per = df.groupBy(F.col(unit_col).alias("u")).agg(
        F.sum(F.col(value_col).cast("long")).alias("x")
    )
    per = per.localCheckpoint(eager=False)
    pos = per.filter(F.col("x") >= 0)
    ranged = pos.repartitionByRange(F.asc("x"), F.asc("u")).select(
        "x", "u", F.spark_partition_id().alias("__p")
    )
    lw = Window.partitionBy("__p").orderBy(F.asc("x"), F.asc("u"))
    per_part = (
        ranged.withColumn("__j", F.row_number().over(lw))
        .groupBy("__p")
        .agg(
            F.count(F.lit(1)).alias("__cnt"),
            F.sum("x").alias("__sx"),
            F.sum(F.expr("cast(__j as decimal(38,0)) * x")).alias("__jwx"),
        )
    )
    # offsets over ≤ |shuffle partitions| rows — bounded frame, not data-sized
    ow = Window.orderBy("__p").rowsBetween(Window.unboundedPreceding, -1)
    rolled = per_part.withColumn(
        "__off", F.coalesce(F.sum("__cnt").over(ow), F.lit(0)).cast("long")
    )
    return (
        rolled.agg(
            # coalesce: an all-negative/empty unit frame has zero partitions
            # here but the oracle's count(*) still reports 0, not NULL
            F.coalesce(F.sum("__cnt"), F.lit(0)).cast("long").alias("n_units"),
            F.sum("__sx").alias("total"),
            F.sum(
                F.expr("__jwx + cast(__off as decimal(38,0)) * __sx")
            ).alias("iwx"),
        )
        .crossJoin(
            F.broadcast(
                per.filter(F.col("x") < 0).agg(
                    F.count(F.lit(1)).alias("n_excluded")
                )
            )
        )
        .select(
            F.col("n_units").cast("long").alias("n_units"),
            F.col("total").cast("long").alias("total"),
            F.col("n_excluded").cast("long").alias("n_excluded"),
            F.expr(
                "cast(CASE WHEN total <= 0 THEN NULL ELSE"
                " ((cast(iwx as decimal(38,0)) * 2 - (cast(n_units as decimal(38,0)) + 1) * total)"
                "  * 2000 + cast(n_units as decimal(38,0)) * total)"
                " div (cast(n_units as decimal(38,0)) * total * 2) END as bigint)"
            ).alias("gini_milli"),
        )
    )


def gini_oracle_sql(
    events_sql: str,
    unit_col: str,
    value_col: str,
) -> str:
    """DuckDB replay of :func:`gini_concentration` — same rank order,
    integer moments and half-up milli division."""
    return f"""
WITH per AS (
  SELECT {unit_col} AS u, CAST(sum(CAST({value_col} AS BIGINT)) AS BIGINT) AS x
  FROM ({events_sql}) GROUP BY 1
),
ranked AS (
  SELECT x, CAST(row_number() OVER (ORDER BY x ASC, u ASC) AS HUGEINT) AS i
  FROM per WHERE x >= 0
),
m AS (
  SELECT CAST(count(*) AS HUGEINT) AS n, CAST(sum(x) AS HUGEINT) AS total,
         CAST(sum(i * x) AS HUGEINT) AS iwx
  FROM ranked
),
ex AS (SELECT count(*) AS n_excluded FROM per WHERE x < 0)
SELECT CAST(n AS BIGINT) AS n_units, CAST(total AS BIGINT) AS total,
       CAST(n_excluded AS BIGINT) AS n_excluded,
       CAST(CASE WHEN total <= 0 THEN NULL ELSE
            ((iwx * 2 - (n + 1) * total) * 2000 + n * total)
            // (n * total * 2) END AS BIGINT) AS gini_milli
FROM m, ex
"""
