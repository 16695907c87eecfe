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
