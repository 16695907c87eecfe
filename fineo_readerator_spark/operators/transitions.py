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


def session_cooccurrence(
    df: DataFrame,
    gap: int,
    user_col: str = "user_id",
    ts_col: str = "ts_ms",
    item_col: str = "event_type",
    k: int = 20,
    min_sessions: int = 2,
) -> DataFrame:
    """Session-level item co-occurrence ("co-visitation") ranked by LIFT —
    which item pairs appear in the same user session far above chance, the
    association-mining primitive behind related-items panels and
    behavioral segment discovery.  Lift is the integer-exact monotone core
    of PMI, the same no-logarithm trick as
    :func:`~fineo_readerator_spark.llm_ops.textstats.collocations`:
    ``n_ab·S·10⁶ / (n_a·n_b)`` in half-up ppm over decimal(38,0)
    intermediates, where S is the total session count and n_a the sessions
    containing item a.

    Scale shape: sessionization is the one user-keyed shuffle
    (``sessionize_batch``); the DISTINCT (user, session, item) frame is
    bounded by sessions × |item vocabulary|; the pair self-join is keyed
    on (user, session) — co-partitioned, with per-session fanout ≤
    |items-in-session|², bounded by the item vocabulary, never by corpus
    rows.  ``min_sessions`` prunes the pair tail before the two item-count
    joins; S rides along as a broadcast single-row frame.  Top-k is a
    TakeOrdered on (lift DESC, pair ASC).

    Profiled r12 (q_cooccur_lift, steady state, sf0.1): 1.26 s total over
    10 sequential single-task jobs; the three heaviest stages are ~450 ms
    broadcast-build futures (the item-count sides) of which the largest
    holds 408 ms of CPU on a ~1.3 MB shuffle read — AQE coalesces the
    byte-small sessionize exchange to one partition.  Spreading would
    amortize ≤ 0.4 s of CPU across the ~0.3-0.5 s 32-task floor while
    adding an exchange to every one of the 10 jobs: left narrow, the
    sequential broadcast-future chain is the operator's join contract."""
    from fineo_readerator_spark.operators.sessionize import sessionize_batch

    # NULL timestamps sort NULLS FIRST in Spark windows but NULLS LAST in
    # DuckDB's, and a NULL item can't co-occur — drop both up front so the
    # two faces never order them differently
    clean = df.select(user_col, ts_col, item_col).filter(
        F.col(ts_col).isNotNull() & F.col(item_col).isNotNull()
    )
    s = sessionize_batch(clean, user_col, ts_col, gap)
    items = (
        s.select(
            F.col(user_col).alias("__u"),
            F.col("session_idx").alias("__s"),
            F.col(item_col).alias("__item"),
        )
        .distinct()
        .localCheckpoint(eager=False)  # feeds S, per-item and pair counts
    )
    n_sessions = (
        items.select("__u", "__s").distinct().agg(F.count(F.lit(1)).alias("__S"))
    )
    per_item = items.groupBy("__item").agg(F.count(F.lit(1)).alias("__c"))
    pairs = (
        items.alias("a")
        .join(items.alias("b"), ["__u", "__s"])
        .filter(F.col("a.__item") < F.col("b.__item"))
        .groupBy(
            F.col("a.__item").alias("item_a"), F.col("b.__item").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_sessions)
    )
    joined = (
        pairs.join(
            per_item.select(F.col("__item").alias("item_a"), F.col("__c").alias("__ca")),
            "item_a",
        )
        .join(
            per_item.select(F.col("__item").alias("item_b"), F.col("__c").alias("__cb")),
            "item_b",
        )
        .crossJoin(F.broadcast(n_sessions))
    )
    lift = F.expr(
        "(cast(n_ab as decimal(38,0)) * __S * 2000000"
        " + cast(__ca as decimal(38,0)) * __cb)"
        " div (cast(__ca as decimal(38,0)) * __cb * 2)"
    )
    return (
        joined.select("item_a", "item_b", "n_ab", lift.alias("lift_ppm"))
        .orderBy(F.desc("lift_ppm"), "item_a", "item_b")
        .limit(k)
    )


def session_cooccurrence_oracle_sql(
    events_sql: str,
    gap: int,
    user_col: str = "user_id",
    ts_col: str = "ts_ms",
    item_col: str = "event_type",
    k: int = 20,
    min_sessions: int = 2,
) -> str:
    """DuckDB replay of :func:`session_cooccurrence` — same sessionize
    windows, DISTINCT grain, min_sessions cut and half-up HUGEINT lift."""
    return f"""
WITH e AS (SELECT {user_col} AS u, {ts_col} AS ms, {item_col} AS item
           FROM ({events_sql})
           WHERE {ts_col} IS NOT NULL AND {item_col} IS NOT NULL),
m AS (
  SELECT u, ms, item,
         CASE WHEN lag(ms) OVER w IS NULL OR ms - lag(ms) OVER w > {gap}
              THEN 1 ELSE 0 END AS ns
  FROM e WINDOW w AS (PARTITION BY u ORDER BY ms)
),
s AS (
  SELECT u, item,
         sum(ns) OVER (PARTITION BY u ORDER BY ms
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS sess
  FROM m
),
items AS (SELECT DISTINCT u, sess, item FROM s),
ns AS (SELECT count(*) AS S FROM (SELECT DISTINCT u, sess FROM items)),
per_item AS (SELECT item, count(*) AS c FROM items GROUP BY item),
pairs AS (
  SELECT a.item AS item_a, b.item AS item_b, count(*) AS n_ab
  FROM items a JOIN items b ON a.u = b.u AND a.sess = b.sess AND a.item < b.item
  GROUP BY 1, 2 HAVING count(*) >= {min_sessions}
)
SELECT item_a, item_b, n_ab,
       CAST((CAST(n_ab AS HUGEINT) * S * 2000000 + CAST(ca.c AS HUGEINT) * cb.c)
            // (CAST(ca.c AS HUGEINT) * cb.c * 2) AS BIGINT) AS lift_ppm
FROM pairs
JOIN per_item ca ON ca.item = pairs.item_a
JOIN per_item cb ON cb.item = pairs.item_b
CROSS JOIN ns
ORDER BY lift_ppm DESC, item_a, item_b
LIMIT {k}
"""
