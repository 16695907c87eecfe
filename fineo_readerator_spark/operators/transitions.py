"""Markov transition mining over event streams: per-user next-event
pairs, counted and normalized into a transition matrix.

The classic product-analytics / user-path operator (the aggregate form of
"what do users do after X?"): for every user's time-ordered event
sequence, count consecutive (prev_type → next_type) pairs and each pair's
share among all transitions leaving prev_type.  Downstream uses: funnel
discovery (vs ``ordered_funnel``'s FIXED step list), next-action
prediction baselines, anomaly screens on shifted transition mass.

Spark-first shape, built for the 100 TB regime:

- **One user-keyed shuffle.**  ``lead`` over (user, ordered by ts) is the
  same window sessionize runs; the pair counts that follow are a
  map-side-combined aggregate whose output is |event-type|² rows —
  metadata-sized regardless of corpus size.
- **Integer shares.**  ``share_ppm`` is the half-up parts-per-million of
  the transition among its prev_type's outgoing total, computed with the
  same pure-integer ``(n·2·10⁶ + tot) div (2·tot)`` arithmetic the skew
  report uses — no cross-engine float/decimal hazard by construction.
- **Total order.**  Ties on the timestamp break by the id column, so the
  pair sequence (and thus every count) is deterministic under any
  partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def event_transitions(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Transition matrix ``(prev_type, next_type, n, share_ppm)`` over each
    user's (ts, id)-ordered event sequence; ``share_ppm`` normalizes within
    ``prev_type`` (all outgoing transitions of a type sum to ~10⁶)."""
    w = Window.partitionBy(user_col).orderBy(F.asc(ts_col), F.asc(id_col))
    pairs = (
        df.select(
            F.col(type_col).alias("prev_type"),
            F.lead(type_col).over(w).alias("next_type"),
        )
        .filter(F.col("next_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wp = Window.partitionBy("prev_type")
    return pairs.withColumn("__tot", F.sum("n").over(wp)).select(
        "prev_type",
        "next_type",
        "n",
        F.expr(
            "(cast(n as decimal(38,0)) * 2000000 + __tot)"
            " div (cast(__tot as decimal(38,0)) * 2)"
        ).alias("share_ppm"),
    )


def path_ngrams(
    df: DataFrame,
    n: int = 3,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Length-``n`` event paths (the higher-order cousin of
    :func:`event_transitions`): every window of ``n`` consecutive events
    per user, rendered ``a>b>c``, counted.  Same single user-keyed window
    shuffle — the ``n-1`` leads share one ordering, so Catalyst runs one
    Window node — and the count output is at most |types|ⁿ rows."""
    if n < 2:
        raise ValueError(f"path length must be >= 2, got {n}")
    w = Window.partitionBy(user_col).orderBy(F.asc(ts_col), F.asc(id_col))
    steps = [F.col(type_col)] + [F.lead(type_col, i).over(w) for i in range(1, n)]
    return (
        df.select(F.concat_ws(">", *steps).alias("path"), steps[-1].alias("__last"))
        .filter(F.col("__last").isNotNull())
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def path_ngrams_oracle_sql(
    events_sql: str,
    n: int = 3,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> str:
    """DuckDB replay of :func:`path_ngrams` (concat_ws skips NULLs in both
    engines, so the ``__last IS NOT NULL`` gate is the only NULL filter
    needed — interior leads can't be NULL when the last one isn't)."""
    over = f"OVER (PARTITION BY {user_col} ORDER BY {ts_col} ASC, {id_col} ASC)"
    steps = [type_col] + [f"lead({type_col}, {i}) {over}" for i in range(1, n)]
    return f"""
WITH seq AS (
  SELECT concat_ws('>', {', '.join(steps)}) AS path,
         {steps[-1]} AS last_step
  FROM ({events_sql})
)
SELECT path, count(*) AS n FROM seq WHERE last_step IS NOT NULL GROUP BY path
"""


def linear_attribution(
    df: DataFrame,
    conversion_type: str,
    window_ms: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Multi-touch linear attribution: every conversion event splits 10⁶
    ppm of credit equally (floor division — quantization mass is lost
    deterministically, never re-assigned) across the same user's
    non-conversion events in the strictly-preceding ``window_ms``; output
    aggregates per touch type: ``(event_type, n_touches, n_conversions,
    credit_ppm)``.

    Scale shape: the touch×conversion candidate set is a USER-keyed
    equi-join with a time-range residual — per-user fan-out is bounded by
    activity inside the window, never |touches|×|conversions| globally
    (hot users are an AQE-skew concern, not a plan explosion); per-
    conversion touch counts are one window over the candidate rows; the
    final rollup is |types| rows.  Timestamps compare in epoch millis via
    the type-adaptive helper, so both parquet timestamp generations and
    the DuckDB oracle agree."""
    from fineo_readerator_spark.functions.scalars import epoch_millis

    if window_ms <= 0:
        raise ValueError(f"window_ms must be positive, got {window_ms}")
    base = df.select(
        F.col(user_col).alias("__u"),
        F.col(type_col).alias("__t"),
        F.col(id_col).alias("__id"),
        epoch_millis(df, ts_col).alias("__ms"),
    )
    conv = base.filter(F.col("__t") == conversion_type).select(
        F.col("__u"), F.col("__id").alias("__cid"), F.col("__ms").alias("__cms")
    )
    touch = base.filter(F.col("__t") != conversion_type)
    cand = touch.join(conv, "__u").filter(
        (F.col("__ms") >= F.col("__cms") - window_ms) & (F.col("__ms") < F.col("__cms"))
    )
    w = Window.partitionBy("__cid")
    return (
        cand.withColumn("__n", F.count(F.lit(1)).over(w))
        .withColumn("__credit", F.expr("1000000 div __n"))
        .groupBy(F.col("__t").alias(type_col))
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.countDistinct("__cid").alias("n_conversions"),
            F.sum("__credit").alias("credit_ppm"),
        )
    )


def linear_attribution_oracle_sql(
    events_sql: str,
    conversion_type: str,
    window_ms: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> str:
    """DuckDB replay of :func:`linear_attribution` — ``epoch_ms`` under the
    UTC session tz matches the Spark helper for both timestamp shapes;
    floor credit division and all counts are exact integers."""
    return f"""
WITH base AS (
  SELECT {user_col} AS u, {type_col} AS t, {id_col} AS id,
         epoch_ms({ts_col}) AS ms
  FROM ({events_sql})
),
conv AS (SELECT u, id AS cid, ms AS cms FROM base WHERE t = '{conversion_type}'),
cand AS (
  SELECT b.t, b.id, c.cid
  FROM base b JOIN conv c ON b.u = c.u
  WHERE b.t != '{conversion_type}'
    AND b.ms >= c.cms - {window_ms} AND b.ms < c.cms
),
credited AS (
  SELECT t, cid, 1000000 // (count(*) OVER (PARTITION BY cid)) AS credit
  FROM cand
)
SELECT t AS {type_col},
       count(*) AS n_touches,
       CAST(count(DISTINCT cid) AS BIGINT) AS n_conversions,
       CAST(sum(credit) AS BIGINT) AS credit_ppm
FROM credited GROUP BY t
"""


def event_transitions_oracle_sql(
    events_sql: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> str:
    """DuckDB replay of :func:`event_transitions` — same (ts, id) ordering,
    same pure-integer half-up ppm division (HUGEINT ≡ decimal(38,0): both
    truncate toward zero on positive operands)."""
    return f"""
WITH seq AS (
  SELECT {type_col} AS prev_type,
         lead({type_col}) OVER (PARTITION BY {user_col}
                                ORDER BY {ts_col} ASC, {id_col} ASC) AS next_type
  FROM ({events_sql})
),
pairs AS (
  SELECT prev_type, next_type, count(*) AS n
  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
)
SELECT prev_type, next_type, n,
       CAST((CAST(n AS HUGEINT) * 2000000 + sum(n) OVER (PARTITION BY prev_type))
            // (CAST(sum(n) OVER (PARTITION BY prev_type) AS HUGEINT) * 2)
            AS BIGINT) AS share_ppm
FROM pairs
"""
