"""Ordered event funnel — per-user multi-step conversion with ORDER
enforced (a click only counts if it happens at or after that user's first
view, a purchase only after that click, ...).

The shape quality_funnel (first-failing GATE per doc) and sessionize
don't cover: sequential milestone timestamps per entity.  Relationally it
is K chained windowed conditional-mins over ONE user partitioning —
``t_k = min(ts WHERE type = step_k AND ts >= t_{k-1}) OVER user`` — so
the whole funnel costs a single exchange on user plus one small
per-user collapse; the fact table is scanned once and never self-joined
(the naive step-wise join plan is K scans + K shuffles).

At 100 TB: the window state per user is bounded (K running minima); user
skew is bounded by per-user event counts, the same exposure sessionize
already accepts.  Counts are exact; conversions are single rounded
divisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def ordered_funnel(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_ms",
) -> DataFrame:
    """One-row funnel report over ``steps`` (ordered event types):
    ``n_users`` plus, per step, ``n_<step>`` (users whose first step-k
    event at/after their step-(k-1) milestone exists) and, from the
    second step on, ``conv_<step>`` = n_step / n_prev_step rounded 1e-6
    (NULL when the previous step converted nobody)."""
    if len(steps) < 2:
        raise ValueError(f"need at least 2 funnel steps, got {steps!r}")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be distinct, got {steps!r}")
    w = Window.partitionBy(user_col)
    ts = F.col(ts_col)
    out = df
    prev_t = None
    tcols = []
    for i, s in enumerate(steps):
        cond = F.col(type_col) == s
        if prev_t is not None:
            cond = cond & (ts >= F.col(prev_t))
        tcol = f"__t{i}"
        out = out.withColumn(tcol, F.min(F.when(cond, ts)).over(w))
        prev_t = tcol
        tcols.append(tcol)
    per_user = out.groupBy(user_col).agg(
        *[F.max(t).alias(t) for t in tcols]
    )
    aggs = [F.count(F.lit(1)).alias("n_users")] + [
        F.count(t).alias(f"n_{s}") for t, s in zip(tcols, steps)
    ]
    row = per_user.agg(*aggs)
    for prev, cur in zip(steps, steps[1:]):
        row = row.withColumn(
            f"conv_{cur}",
            F.when(
                F.col(f"n_{prev}") > 0,
                F.round(F.col(f"n_{cur}") / F.col(f"n_{prev}"), 6),
            ),
        )
    return row


def ordered_funnel_oracle_sql(
    events_sql: str,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_expr: str = "epoch_ms(ts)",
) -> str:
    """DuckDB replay of :func:`ordered_funnel`: identical chained windowed
    conditional-mins and rounded conversions."""
    parts = [f"e AS (SELECT {user_col} AS u, {type_col} AS et, {ts_expr} AS tsm"
             f" FROM ({events_sql}))"]
    prev_frame, prev_t = "e", None
    for i, s in enumerate(steps):
        cond = f"et = '{s}'"
        if prev_t is not None:
            cond += f" AND tsm >= {prev_t}"
        parts.append(
            f"w{i} AS (SELECT *, min(CASE WHEN {cond} THEN tsm END)"
            f" OVER (PARTITION BY u) AS t{i} FROM {prev_frame})"
        )
        prev_frame, prev_t = f"w{i}", f"t{i}"
    tmax = ", ".join(f"max(t{i}) AS t{i}" for i in range(len(steps)))
    parts.append(f"u AS (SELECT u AS uu, {tmax} FROM {prev_frame} GROUP BY 1)")
    counts = ", ".join(
        f"CAST(count(t{i}) AS BIGINT) AS n_{s}" for i, s in enumerate(steps)
    )
    convs = ", ".join(
        f"CASE WHEN count(t{i}) > 0 THEN round(count(t{i + 1}) / count(t{i}), 6) END"
        f" AS conv_{steps[i + 1]}"
        for i in range(len(steps) - 1)
    )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT CAST(count(*) AS BIGINT) AS n_users, {counts}, {convs} FROM u"
    )


def conversion_latency(
    df: DataFrame,
    start_type: str,
    end_type: str,
    user_col: str = "user_id",
    ts_col: str = "ts_ms",
    type_col: str = "event_type",
) -> DataFrame:
    """Time-to-convert distribution: per user, the gap from the FIRST
    ``start_type`` event to the first ``end_type`` event at-or-after it,
    summarized as exact p50/p90 percentiles — the latency companion to
    :func:`ordered_funnel`'s conversion counts (funnels say HOW MANY
    convert, this says HOW LONG the converting path takes).

    Exactness: deltas are integer milliseconds; ``percentile`` on integer
    inputs interpolates at exact halves (the q_percentiles precedent), so
    the doubles agree cross-engine.  Scale shape: one user-keyed
    conditional-min aggregate for the starts, one user-co-partitioned
    join + min for the first qualifying end — never an event self-join;
    the percentile runs over the |converting users| frame."""
    starts = (
        df.filter(F.col(type_col) == start_type)
        .groupBy(F.col(user_col).alias("__u"))
        .agg(F.min(ts_col).alias("__s"))
    )
    ends = (
        df.filter(F.col(type_col) == end_type)
        .select(F.col(user_col).alias("__u"), F.col(ts_col).alias("__e"))
        .join(starts, "__u")
        .filter(F.col("__e") >= F.col("__s"))
        .groupBy("__u")
        .agg(F.min("__e").alias("__e"), F.first("__s").alias("__s"))
    )
    deltas = ends.select((F.col("__e") - F.col("__s")).alias("__d"))
    return deltas.agg(
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        F.expr("percentile(__d, 0.5)").alias("p50_ms"),
        F.expr("percentile(__d, 0.9)").alias("p90_ms"),
        F.max("__d").cast("long").alias("max_ms"),
    )


def conversion_latency_oracle_sql(
    events_sql: str,
    start_type: str,
    end_type: str,
    user_col: str = "user_id",
    ts_col: str = "ts_ms",
    type_col: str = "event_type",
) -> str:
    """DuckDB replay of :func:`conversion_latency` — quantile_cont ≡
    Spark ``percentile`` on integer inputs."""
    return f"""
WITH ev AS ({events_sql}),
starts AS (
  SELECT {user_col} AS u, min({ts_col}) AS s
  FROM ev WHERE {type_col} = '{start_type}' GROUP BY 1
),
ends AS (
  SELECT ev.{user_col} AS u, min(ev.{ts_col}) AS e, min(starts.s) AS s
  FROM ev JOIN starts ON ev.{user_col} = starts.u
  WHERE ev.{type_col} = '{end_type}' AND ev.{ts_col} >= starts.s
  GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_converted,
       quantile_cont(e - s, 0.5) AS p50_ms,
       quantile_cont(e - s, 0.9) AS p90_ms,
       CAST(max(e - s) AS BIGINT) AS max_ms
FROM ends
"""
