"""Rolling z-score anomaly detection over dense bucketed series.

The monitoring primitive layered on :mod:`operators.gapfill`: given a
dense per-key time series of integer counts (gaps filled to 0 — a silent
feed IS an anomaly, so the series must be dense first), score each bucket
against the trailing-window distribution and flag |z| > threshold.

Scale shape: ONE window pass over the spine (three frame aggregates —
count/sum/sum-of-squares — share the same trailing frame and the same
key partitioning the gap-fill window already established, so Spark plans
a single Window operator with no extra shuffle).  Nothing corpus-sized:
the spine is |keys| × |buckets|.

Determinism: the trailing count/sum/sum-of-squares are EXACT integer
window aggregates (quadratic terms through decimal(38,0) so the variance
numerator ``cnt·Σx² − (Σx)²`` never rounds); z is the only float walk —
two exact-int casts, one subtraction, one sqrt, one division, rounded at
1e-6 — written with the same operation order in the DuckDB oracle, so
the full report is hash-compared.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def rolling_zscore(
    dense: DataFrame,
    value_col: str,
    bucket_col: str,
    key_cols: tuple[str, ...],
    window: int = 24,
    min_periods: int = 12,
    z_thresh: float = 3.0,
) -> DataFrame:
    """Score each bucket's INTEGER ``value_col`` against the trailing
    ``window`` buckets (current bucket excluded — it must not defend
    itself): adds

    - ``z`` — (x − mean) / sample-stddev of the trailing window, rounded
      1e-6; NULL while fewer than ``min_periods`` trailing buckets exist
      or when the trailing window is constant (stddev 0),
    - ``is_anomaly`` — ``|z| > z_thresh``, false where z is NULL.

    ``value_col`` must be integral (bucket counts): the trailing moments
    stay exact integers, which is what makes the float tail
    oracle-checkable.  For continuous values, bucket them to counts or
    pre-scale to a decimal grid first."""
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    if not 2 <= min_periods <= window:
        raise ValueError(
            f"min_periods must be in [2, window={window}], got {min_periods}"
        )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(bucket_col)
        .rowsBetween(-window, -1)
    )
    x = F.col(value_col).cast("long")
    # square in decimal: long*long silently wraps at ~3e9 counts/bucket,
    # while DuckDB's BIGINT sums widen to HUGEINT — decimal(38,0) matches
    # that exactness
    xd = x.cast("decimal(19,0)")
    cnt = F.count(x).over(w)
    s1 = F.sum(xd).over(w).cast("decimal(38,0)")
    s2 = F.sum(xd * xd).over(w).cast("decimal(38,0)")

    def _z(cnt: Column, s1: Column, s2: Column) -> Column:
        mean = s1.cast("double") / cnt.cast("double")
        num = (cnt * s2 - s1 * s1).cast("double")
        den = (cnt * (cnt - F.lit(1))).cast("double")
        sd = F.sqrt(num / den)
        return F.when(
            (cnt >= min_periods) & (num > 0),
            F.round((x.cast("double") - mean) / sd, 6),
        )

    out = dense.withColumn("z", _z(cnt, s1, s2))
    return out.withColumn(
        "is_anomaly", F.coalesce(F.abs(F.col("z")) > z_thresh, F.lit(False))
    )


def rolling_zscore_oracle_exprs(
    value_sql: str,
    window: int = 24,
    min_periods: int = 12,
    z_thresh: float = 3.0,
    over: str = "PARTITION BY event_type ORDER BY bucket",
) -> tuple[str, str]:
    """(z_sql, is_anomaly_sql) twins of :func:`rolling_zscore` for a DuckDB
    query over the same dense series — identical exact-integer moments and
    float operation order."""
    frame = f"OVER ({over} ROWS BETWEEN {window} PRECEDING AND 1 PRECEDING)"
    cnt = f"count({value_sql}) {frame}"
    s1 = f"sum({value_sql}) {frame}"
    # square in HUGEINT: DuckDB only widens at sum(), BIGINT*BIGINT raises
    # on overflow (mirrors the Spark side's decimal(19,0) squaring)
    xh = f"CAST({value_sql} AS HUGEINT)"
    s2 = f"sum({xh} * {xh}) {frame}"
    num = f"({cnt} * {s2} - {s1} * {s1})"
    den = f"({cnt} * ({cnt} - 1))"
    mean = f"(CAST({s1} AS DOUBLE) / CAST({cnt} AS DOUBLE))"
    sd = f"sqrt(CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE))"
    z = (
        f"CASE WHEN {cnt} >= {min_periods} AND {num} > 0"
        f" THEN round((CAST({value_sql} AS DOUBLE) - {mean}) / {sd}, 6) END"
    )
    return z, f"coalesce(abs({z}) > {z_thresh!r}, false)"


def cusum_shift(
    df: DataFrame,
    bucket_col: str,
    value_col: str,
) -> DataFrame:
    """CUSUM level-shift detection over a bucketed series: the bucket where
    the cumulative deviation from the global mean peaks — the classic
    change-point locator for "when did the feed's volume step?" (Page's
    cumulative-sum test, argmax form).

    Pure-integer statistic: with running sum S_k over k buckets, D buckets
    and total T, the deviation is ``S_k·D − k·T`` (the cross-multiplied
    form of ``S_k − k·(T/D)``) — no division anywhere, so the whole walk is
    oracle-exact.  Positive peak = the series ran ABOVE its mean up to the
    peak (a later drop); negative = below (a later rise).

    Output is ONE row: (n_buckets, total, peak_bucket, peak_cusum,
    direction).  Ties on |deviation| break to the earliest bucket.

    Scale shape: one map-side-combined bucket aggregate (the only
    corpus-sized pass), then a running-sum window over the BUCKET frame —
    metadata-sized (days/hours, not rows) — and a TakeOrdered peak pick."""
    per = df.groupBy(F.col(bucket_col).alias("bucket")).agg(
        F.sum(F.col(value_col).cast("long")).alias("v")
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    kw = Window.orderBy("bucket")
    cum = per.select(
        "bucket",
        F.sum("v").over(w).alias("s"),
        F.row_number().over(kw).cast("long").alias("k"),
    )
    tot = per.agg(
        F.count(F.lit(1)).alias("n_buckets"), F.sum("v").alias("total")
    )
    dev = cum.crossJoin(F.broadcast(tot)).select(
        "n_buckets",
        "total",
        "bucket",
        F.expr(
            "cast(s as decimal(38,0)) * n_buckets - cast(k as decimal(38,0)) * total"
        ).cast("long").alias("cusum"),
    )
    return (
        dev.orderBy(F.abs(F.col("cusum")).desc(), F.asc("bucket"))
        .limit(1)
        .select(
            "n_buckets",
            "total",
            F.col("bucket").alias("peak_bucket"),
            F.col("cusum").alias("peak_cusum"),
            F.when(F.col("cusum") >= 0, F.lit("above-then-drop"))
            .otherwise(F.lit("below-then-rise"))
            .alias("direction"),
        )
    )


def cusum_shift_oracle_sql(series_sql: str, bucket_col: str, value_col: str) -> str:
    """DuckDB replay of :func:`cusum_shift` (same cross-multiplied integer
    deviation; HUGEINT ≡ the Spark side's decimal(38,0) intermediates)."""
    return f"""
WITH per AS (
  SELECT {bucket_col} AS bucket, CAST(sum(CAST({value_col} AS BIGINT)) AS BIGINT) AS v
  FROM ({series_sql}) GROUP BY 1
),
cum AS (
  SELECT bucket,
         sum(v) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS s,
         CAST(row_number() OVER (ORDER BY bucket) AS BIGINT) AS k
  FROM per
),
tot AS (SELECT count(*) AS n_buckets, CAST(sum(v) AS BIGINT) AS total FROM per)
SELECT n_buckets, total, bucket AS peak_bucket,
       CAST(CAST(s AS HUGEINT) * n_buckets - CAST(k AS HUGEINT) * total AS BIGINT)
         AS peak_cusum,
       CASE WHEN CAST(s AS HUGEINT) * n_buckets - CAST(k AS HUGEINT) * total >= 0
            THEN 'above-then-drop' ELSE 'below-then-rise' END AS direction
FROM cum CROSS JOIN tot
ORDER BY abs(CAST(s AS HUGEINT) * n_buckets - CAST(k AS HUGEINT) * total) DESC,
         bucket ASC
LIMIT 1
"""


def dyadic_ewma(
    series: DataFrame,
    bucket_col: str,
    value_col: str,
    window: int = 8,
) -> DataFrame:
    """Exponentially-weighted moving average with α = 1/2 and a hard
    ``window``-bucket cutoff, computed in EXACT integers — the smoothed
    trend line behind alerting dashboards, without the cross-engine float
    hazard a true recursive EWMA carries (every engine accumulates
    ``(1-α)·prev`` in its own float order).

    Dyadic trick: with α = 1/2 the weight of the observation ``d`` buckets
    back is ``2^(window-1-d)``, an integer; absent buckets contribute 0,
    so the weight mass is the CONSTANT ``2^window - 1`` and
    ``ewma_milli = half-up(1000 · Σ v·w / (2^window − 1))`` is one integer
    division.  A true infinite-tail EWMA differs by < 2^-window of the
    scale — at window=8, under 0.4%.

    Negative value sums are supported: half-up is ``floor((2n+d)/2d)``,
    which needs FLOOR division for negative numerators — but BOTH engines
    truncate toward zero natively (Spark decimal ``div`` AND DuckDB
    ``//``, verified empirically: ``-469999 // 2 = -234999`` in DuckDB),
    so both faces carry an explicit truncate-vs-floor correction term.
    Without it the formula is off by one milli on exact negative values
    (r9 ADVICE find; the advisory's DuckDB-floors premise was inverted,
    the defect itself was real on both faces).

    Scale shape: each bucket row expands into ``window`` (target-bucket,
    weighted-value) contributions (a bounded explode, no window function
    over an unbounded frame), one bucket-keyed agg re-collapses them, and
    a semi-join keeps only observed buckets — all shuffles are on the
    bucket key; fanout is the constant ``window``."""
    if window < 1 or window > 62:
        raise ValueError(f"window must be in [1, 62], got {window}")
    per = series.groupBy(F.col(bucket_col).alias("bucket")).agg(
        F.sum(F.col(value_col).cast("long")).alias("v")
    )
    contribs = per.select(
        F.explode(F.sequence(F.lit(0), F.lit(window - 1))).alias("off"),
        "bucket",
        "v",
    ).select(
        (F.col("bucket") + F.col("off")).alias("t_bucket"),
        F.expr(
            "cast(v as decimal(38,0))"
            f" * cast(shiftleft(1L, cast({window - 1} - off as int))"
            "        as decimal(38,0))"
        ).alias("wv"),
    )
    observed = per.select("bucket")
    denom = (1 << window) - 1
    smoothed = (
        contribs.join(
            observed.select(F.col("bucket").alias("t_bucket")), "t_bucket", "left_semi"
        )
        .groupBy("t_bucket")
        .agg(F.sum("wv").alias("swv"))
    )
    # floor division on the decimal numerator: `div` truncates toward zero,
    # so subtract 1 when a NEGATIVE numerator has a nonzero remainder (the
    # oracle applies the identical correction — DuckDB `//` truncates too)
    d2 = denom * 2
    return (
        smoothed.join(per, smoothed["t_bucket"] == per["bucket"])
        .withColumn("__num", F.expr(f"swv * 2000 + {denom}"))
        .select(
            F.col("bucket"),
            F.col("v").cast("long").alias("n"),
            F.expr(
                f"cast(__num div {d2}"
                f" - (case when __num < 0 and __num % {d2} != 0"
                f"     then 1 else 0 end) as bigint)"
            ).alias("ewma_milli"),
        )
    )


def dyadic_ewma_oracle_sql(
    series_sql: str, bucket_col: str, value_col: str, window: int = 8
) -> str:
    """DuckDB replay of :func:`dyadic_ewma` — same bounded explode,
    semi-join to observed buckets and half-up integer division.  DuckDB's
    ``//`` truncates toward zero (verified empirically for BIGINT and
    HUGEINT alike — NOT floored), so the replay carries the same
    truncate-vs-floor correction the Spark face does; without it an exact
    negative sum like -235 at window=1 renders -234999 milli instead of
    -235000."""
    denom = (1 << window) - 1
    d2 = denom * 2
    return f"""
WITH per AS (
  SELECT {bucket_col} AS bucket, CAST(sum(CAST({value_col} AS BIGINT)) AS BIGINT) AS v
  FROM ({series_sql}) GROUP BY 1
),
contribs AS (
  SELECT bucket + off AS t_bucket,
         CAST(v AS HUGEINT) * (CAST(1 AS HUGEINT) << ({window} - 1 - off)) AS wv
  FROM per, unnest(generate_series(0, {window} - 1)) t(off)
),
smoothed AS (
  SELECT t_bucket, sum(wv) AS swv FROM contribs
  WHERE t_bucket IN (SELECT bucket FROM per)
  GROUP BY t_bucket
)
SELECT per.bucket, per.v AS n,
       CAST((swv * 2000 + {denom}) // {d2}
            - (CASE WHEN (swv * 2000 + {denom}) < 0
                     AND (swv * 2000 + {denom}) % {d2} != 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS ewma_milli
FROM smoothed JOIN per ON smoothed.t_bucket = per.bucket
"""


def mad_outliers(
    series: DataFrame,
    group_col: str,
    bucket_col: str,
    value_col: str,
    k_mad: int = 3,
) -> DataFrame:
    """Robust per-group outlier flags by Median Absolute Deviation — the
    breakdown-resistant twin of :func:`rolling_zscore`: mean/stddev move
    with the outlier being tested (one 1000× spike inflates σ enough to
    hide itself), median/MAD have a 50% breakdown point, the right default
    for spiky operational series.

    Flags ``|v − median| > k·MAD`` with MAD > 0 required (a constant
    series has MAD 0 — every deviation would be infinite-σ, so those
    groups flag nothing rather than everything).  Exact-percentile
    medians: Spark ``percentile`` ≡ DuckDB ``quantile_cont`` on integer
    inputs (half-step averages are exact doubles — the q_percentiles
    precedent), and the comparison cross-multiplies by 2 to stay on exact
    halves.  Scale shape: one (group, bucket) count agg; both median
    passes and the flag join run over the bucketed frame — |groups| ×
    |buckets| rows, never raw events."""
    per = series.groupBy(
        F.col(group_col).alias("g"), F.col(bucket_col).alias("bucket")
    ).agg(F.sum(F.col(value_col).cast("long")).alias("v"))
    med = per.groupBy("g").agg(F.expr("percentile(v, 0.5)").alias("med"))
    with_med = per.join(med, "g")
    mad = with_med.groupBy("g").agg(
        F.expr("percentile(abs(v - med), 0.5)").alias("mad")
    )
    out = with_med.join(mad, "g")
    # exact comparison: med is on the half grid, so MAD (a median of
    # half-grid deviations) can land on the QUARTER grid — after the ×2,
    # 2·|v−med| is an integer but 2·k·mad can still be a half (e.g. x.5).
    # Both are exact dyadic doubles, so the comparison stays exact on both
    # engines; the operands are NOT necessarily integers (r9 ADVICE: the
    # old "are integers" claim was wrong for quarter-grid MADs)
    flag = (F.col("mad") > 0) & (
        F.abs(F.col("v") - F.col("med")) * 2 > F.lit(2 * k_mad) * F.col("mad")
    )
    return out.select(
        F.col("g").alias(group_col),
        "bucket",
        "v",
        "med",
        "mad",
        flag.alias("is_outlier"),
    )


def mad_outliers_oracle_sql(
    series_sql: str,
    group_col: str,
    bucket_col: str,
    value_col: str,
    k_mad: int = 3,
) -> str:
    """DuckDB replay of :func:`mad_outliers` — quantile_cont medians and
    the same cross-multiplied exact-halves comparison."""
    return f"""
WITH per AS (
  SELECT {group_col} AS g, {bucket_col} AS bucket,
         CAST(sum(CAST({value_col} AS BIGINT)) AS BIGINT) AS v
  FROM ({series_sql}) GROUP BY 1, 2
),
med AS (SELECT g, quantile_cont(v, 0.5) AS med FROM per GROUP BY g),
wm AS (SELECT per.g, bucket, v, med FROM per JOIN med ON per.g = med.g),
mad AS (SELECT g, quantile_cont(abs(v - med), 0.5) AS mad FROM wm GROUP BY g)
SELECT wm.g AS {group_col}, bucket, v, wm.med, mad.mad,
       mad.mad > 0 AND abs(v - wm.med) * 2 > {2 * k_mad} * mad.mad AS is_outlier
FROM wm JOIN mad ON wm.g = mad.g
"""


def seasonal_decompose(
    series: DataFrame,
    bucket_col: str,
    value_col: str,
    period: int = 7,
    trend_window: int = 8,
) -> DataFrame:
    """Classical additive decomposition (trend + seasonal + residual) of a
    bucketed integer series, in EXACT integers end to end — the
    statsmodels-style report for "is Monday really lower, or is the trend
    falling?", without the float walks a moving-average/loess pipeline
    carries cross-engine.

    - trend: the :func:`dyadic_ewma` milli-line (α=1/2, ``trend_window``
      cutoff) — already oracle-exact;
    - detrended_milli = v·1000 − trend_milli (signed integer);
    - season: per ``bucket % period`` phase, the decomposition keeps the
      SUM form — ``season_sum_milli`` (Σ detrended over the phase) and
      ``n_phase`` — instead of dividing: a signed integer mean needs a
      rounding convention on negatives (both engines' native integer
      division truncates toward zero, so half-up formulas silently go
      off-by-one there — the dyadic_ewma correction), and keeping the
      sum avoids the convention entirely;
      ``season_sum/n_phase`` is the classic seasonal component;
    - residual_scaled = detrended·n_phase − season_sum (signed integer,
      zero divisions): the classic residual times n_phase.

    Scale shape: one bucket aggregate (the only corpus-sized pass), the
    EWMA's constant-fanout explode, and one phase-keyed agg over the
    bucket frame — everything past the first agg is |buckets|-sized."""
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    ew = dyadic_ewma(series, bucket_col, value_col, window=trend_window)
    det = ew.select(
        "bucket",
        "n",
        F.col("ewma_milli").alias("trend_milli"),
        (F.col("n") * 1000 - F.col("ewma_milli")).alias("detrended_milli"),
        F.pmod(F.col("bucket"), F.lit(period)).alias("phase"),
    )
    season = det.groupBy("phase").agg(
        F.sum("detrended_milli").cast("long").alias("season_sum_milli"),
        F.count(F.lit(1)).cast("long").alias("n_phase"),
    )
    return det.join(season, "phase").select(
        "bucket",
        "n",
        "trend_milli",
        "phase",
        "detrended_milli",
        "season_sum_milli",
        "n_phase",
        (
            F.col("detrended_milli") * F.col("n_phase")
            - F.col("season_sum_milli")
        ).cast("long").alias("residual_scaled"),
    )


def seasonal_decompose_oracle_sql(
    series_sql: str,
    bucket_col: str,
    value_col: str,
    period: int = 7,
    trend_window: int = 8,
) -> str:
    """DuckDB replay of :func:`seasonal_decompose` — the EWMA replay plus
    the same division-free phase aggregation."""
    ewma = dyadic_ewma_oracle_sql(series_sql, bucket_col, value_col, trend_window)
    return f"""
WITH ew AS MATERIALIZED ({ewma}),
det AS MATERIALIZED (
  SELECT bucket, n, ewma_milli AS trend_milli,
         n * 1000 - ewma_milli AS detrended_milli,
         -- ((x % p) + p) % p: DuckDB % is a SIGNED remainder while the
         -- Spark side uses pmod — they differ on negative buckets
         ((bucket % {period}) + {period}) % {period} AS phase
  FROM ew
),
season AS (
  SELECT phase, CAST(sum(detrended_milli) AS BIGINT) AS season_sum_milli,
         CAST(count(*) AS BIGINT) AS n_phase
  FROM det GROUP BY phase
)
SELECT bucket, n, trend_milli, det.phase, detrended_milli,
       season_sum_milli, n_phase,
       CAST(detrended_milli * n_phase - season_sum_milli AS BIGINT)
         AS residual_scaled
FROM det JOIN season ON det.phase = season.phase
"""


def trend_slopes(
    series: DataFrame,
    group_col: str,
    bucket_col: str,
    value_col: str,
) -> DataFrame:
    """Per-group ordinary-least-squares trend line over a bucketed integer
    series — the "which metrics are growing, and how fast" report
    (slope/intercept/R² per key) that rolling z-scores and CUSUM don't
    answer: they flag level CHANGES, this quantifies sustained DIRECTION.

    Determinism is the :func:`rolling_zscore` contract: all five moments
    (n, Σx, Σy, Σxy, Σx², Σy²) are EXACT decimal(38,0)/HUGEINT integers —
    buckets are rebased to each group's first bucket so the quadratic
    terms stay small and the intercept is the fitted value AT that first
    bucket — and only the final slope/intercept/R² touch doubles, with
    the same operation order on both engines, rounded 1e-6.  A
    single-bucket group has zero x-variance → NULL slope/intercept/R²;
    a zero y-variance (flat) group gets slope 0 and NULL R² (0/0).

    Scale shape: one (group, bucket) aggregate (the only corpus-sized
    pass), one group-keyed min join, one moments aggregate — everything
    past the first agg is |groups|×|buckets|-sized."""
    per = series.groupBy(
        F.col(group_col).alias("g"), F.col(bucket_col).alias("b")
    ).agg(F.sum(F.col(value_col).cast("long")).alias("y"))
    base = per.groupBy("g").agg(F.min("b").alias("b0"))
    xy = per.join(base, "g").select(
        "g", (F.col("b") - F.col("b0")).cast("decimal(38,0)").alias("x"),
        F.col("y").cast("decimal(38,0)").alias("y"),
    )
    m = xy.groupBy("g").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * y")).alias("sxy"),
        F.sum(F.expr("x * x")).alias("sxx"),
        F.sum(F.expr("y * y")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = F.when(
        denx > 0, F.round(num.cast("double") / denx.cast("double"), 6)
    )
    out = m.withColumn("slope", slope)
    # 1e-9 pre-round before the final 1e-6 round (the theil_sen float
    # discipline): the three-op double tail (slope·sx, subtract, divide)
    # runs bit-identically on both engines, but its result can land within
    # an ulp of an exact 1e-6 half (small n divides a 6-digit slope:
    # e.g. −172.06704249999999 for the exact half −172.0670425), where
    # Spark's shortest-repr HALF_UP and DuckDB's multiply-then-round
    # disagree on the last digit.  Snapping to the 1e-9 grid first makes
    # both faces round the same exact-half value (fuzz-found, r11).
    intercept = F.when(
        F.col("slope").isNotNull(),
        F.round(
            F.round(
                (F.col("sy").cast("double") - F.col("slope") * F.col("sx").cast("double"))
                / F.col("n").cast("double"),
                9,
            ),
            6,
        ),
    )
    r2 = F.when(
        (denx > 0) & (deny > 0),
        F.round(
            (num * num).cast("double") / (denx * deny).cast("double"), 6
        ),
    )
    return out.select(
        F.col("g").alias(group_col),
        F.col("n").cast("long").alias("n_buckets"),
        "slope",
        intercept.alias("intercept"),
        r2.alias("r2"),
    )


def trend_slopes_oracle_sql(
    series_sql: str,
    group_col: str,
    bucket_col: str,
    value_col: str,
) -> str:
    """DuckDB replay of :func:`trend_slopes` — HUGEINT moments, the same
    rounded-slope-feeds-intercept operation order."""
    return f"""
WITH per AS (
  SELECT {group_col} AS g, {bucket_col} AS b,
         CAST(sum(CAST({value_col} AS BIGINT)) AS BIGINT) AS y
  FROM ({series_sql}) GROUP BY 1, 2
),
base AS (SELECT g, min(b) AS b0 FROM per GROUP BY g),
xy AS (
  SELECT per.g, CAST(per.b - base.b0 AS HUGEINT) AS x, CAST(y AS HUGEINT) AS y
  FROM per JOIN base ON per.g = base.g
),
m AS (
  SELECT g, CAST(count(*) AS HUGEINT) AS n,
         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
         sum(x * x) AS sxx, sum(y * y) AS syy
  FROM xy GROUP BY g
),
s AS (
  SELECT g, n, sx, sy,
         n * sxy - sx * sy AS num,
         n * sxx - sx * sx AS denx,
         n * syy - sy * sy AS deny
  FROM m
),
sl AS (
  SELECT *, CASE WHEN denx > 0
                 THEN round(CAST(num AS DOUBLE) / CAST(denx AS DOUBLE), 6)
            END AS slope
  FROM s
)
SELECT g AS {group_col}, CAST(n AS BIGINT) AS n_buckets, slope,
       CASE WHEN slope IS NOT NULL
            THEN round(round((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
                             / CAST(n AS DOUBLE), 9), 6) END AS intercept,
       CASE WHEN denx > 0 AND deny > 0
            THEN round(CAST(num * num AS DOUBLE)
                       / CAST(denx * deny AS DOUBLE), 6) END AS r2
FROM sl
"""


def theil_sen_slopes(
    series: DataFrame,
    group_col: str,
    bucket_col: str,
    value_col: str,
    max_buckets_per_group: int = 5_000,
) -> DataFrame:
    """Theil–Sen robust trend per group: the MEDIAN of all pairwise
    slopes ``(y_j−y_i)/(x_j−x_i)`` — the regression twin of
    :func:`mad_outliers`: one wild bucket drags an OLS slope
    (:func:`trend_slopes`) arbitrarily, but Theil–Sen tolerates ~29%
    contamination, the right default for spiky operational series.

    Determinism: pairwise slopes are one double division each, rounded
    1e-9 (identical inputs → identical doubles both engines); the median
    interpolation formula could differ in the last ulp between engines,
    which the 1e-9 pre-round plus the final 1e-6 round absorbs (the
    repo's rounding-boundary argument).

    Scale shape: the pair join runs over the BUCKETED frame, never raw
    events — one (group, bucket) aggregate first, then a group-keyed
    self-join bounded by |buckets|² per group (days/hours: hundreds of
    pairs), then one group-keyed median.  ``n_pairs`` is reported so a
    caller can see the support.

    ``max_buckets_per_group`` gates the quadratic term (the
    ``minhash_audit`` refusal stance): |buckets|²/group is fine for
    daily/hourly grains but a caller passing second-granularity buckets
    over months would silently build billions of pairs per group — count
    first, raise with the observed cardinality, let the caller re-bucket
    or raise the bound deliberately.  The default 5,000 (≈12.5M pairs per
    group worst case) covers >13 years daily / ~7 months hourly.

    NOTE: the gate is a DELIBERATE EAGER action — calling this function
    runs the (group, bucket) aggregate immediately (one ``.first()`` on a
    checkpointed frame the returned plan then reuses), so building the
    plan without consuming it still pays that job, and the check reflects
    cardinality at BUILD time.  That is the point: refuse to even
    construct a |buckets|²-per-group join over an unbounded frame.
    Callers needing a fully lazy plan should pre-validate and inline the
    pair join themselves (r10 ADVICE notes the contract change)."""
    if max_buckets_per_group < 2:
        raise ValueError(
            f"max_buckets_per_group must be >= 2, got {max_buckets_per_group}"
        )
    per = series.groupBy(
        F.col(group_col).alias("g"), F.col(bucket_col).alias("b")
    ).agg(F.sum(F.col(value_col).cast("long")).alias("y"))
    per = per.localCheckpoint(eager=False)
    widest = per.groupBy("g").count().agg(F.max("count")).first()[0]
    if widest is not None and widest > max_buckets_per_group:
        raise ValueError(
            f"theil_sen_slopes: widest group holds {widest:,} buckets "
            f"(> max_buckets_per_group={max_buckets_per_group:,}); the pair "
            "join is |buckets|^2 per group. Re-bucket to a coarser grain or "
            "raise max_buckets_per_group deliberately."
        )
    a = per.select("g", F.col("b").alias("bi"), F.col("y").alias("yi"))
    b = per.select("g", F.col("b").alias("bj"), F.col("y").alias("yj"))
    pairs = (
        a.join(b, "g")
        .filter(F.col("bi") < F.col("bj"))
        .select(
            "g",
            F.round(
                (F.col("yj") - F.col("yi")).cast("double")
                / (F.col("bj") - F.col("bi")).cast("double"),
                9,
            ).alias("s"),
        )
    )
    return pairs.groupBy(F.col("g").alias(group_col)).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(F.expr("percentile(s, 0.5)"), 6).alias("ts_slope"),
    )


def theil_sen_oracle_sql(
    series_sql: str,
    group_col: str,
    bucket_col: str,
    value_col: str,
) -> str:
    """DuckDB replay of :func:`theil_sen_slopes` — same 1e-9 pre-rounded
    pairwise slopes and quantile_cont median."""
    return f"""
WITH per AS (
  SELECT {group_col} AS g, {bucket_col} AS b,
         CAST(sum(CAST({value_col} AS BIGINT)) AS BIGINT) AS y
  FROM ({series_sql}) GROUP BY 1, 2
),
pairs AS (
  SELECT a.g,
         round(CAST(b.y - a.y AS DOUBLE) / CAST(b.b - a.b AS DOUBLE), 9) AS s
  FROM per a JOIN per b ON a.g = b.g AND a.b < b.b
)
SELECT g AS {group_col}, CAST(count(*) AS BIGINT) AS n_pairs,
       round(quantile_cont(s, 0.5), 6) AS ts_slope
FROM pairs GROUP BY g
"""


def binary_changepoint(
    series: DataFrame,
    group_col: str,
    bucket_col: str,
    value_col: str,
) -> DataFrame:
    """Single most-likely change point per group by binary segmentation —
    the offline answer to :func:`cusum_shift`'s online question: WHERE did
    the level shift, not just whether one is in progress.  For every
    candidate split after ordered bucket ``t`` the score is the
    between-segment sum-of-squares reduction ``n1·n2·(m1−m2)²/n``; the
    argmax is the classic first step of binary segmentation (Scott &
    Knott), and one split is the SQL-expressible, oracle-checkable unit —
    recursing on the halves is a driver loop over this operator.

    Exact integer arithmetic end to end: with ``d = S1·n2 − S2·n1`` the
    score ordering equals the ordering of ``d²/(n1·n2)`` (the constant
    ``n`` drops), compared via the scaled TRUNCATING division
    ``score_scaled = (d²·10⁶) div (n1·n2)`` — the numerator is a square,
    so never negative and both engines' truncate-toward-zero agree; ties
    break on the earliest split.  ``d²·10⁶`` must fit decimal(38,0), so
    |d| ≤ ~3.16e15 (|d| ≤ Σ|y|·n per group); DuckDB's HUGEINT tolerates
    ~4× more, so near the ceiling the faces would diverge (Spark NULLs or
    errors while the oracle still answers).  A LAZY runtime gate raises
    on any |d| > 3e15 at execution time instead — fail loud on both
    engines' common ground, no eager job at plan-build time (r10 ADVICE;
    contrast theil_sen's deliberate eager cardinality check, which gates
    a quadratic JOIN rather than a per-row overflow).  Segment sums stay
    UNDIVIDED
    (``left_sum``/``right_sum`` + counts, the seasonal_decompose stance)
    so negative value sums need no rounding convention anywhere.

    Scale shape: one (group, bucket) aggregate (the only corpus-sized
    pass), one cumulative window + one total join over the bucketed
    frame, one argmax window — |groups|×|buckets| rows after the first
    agg.  Single-bucket groups have no candidate split and are absent
    from the output."""
    from pyspark.sql import Window

    per = series.groupBy(
        F.col(group_col).alias("g"), F.col(bucket_col).alias("b")
    ).agg(F.sum(F.col(value_col).cast("long")).alias("y"))
    w = Window.partitionBy("g").orderBy("b")
    cum = per.select(
        "g",
        "b",
        F.sum("y").over(w).alias("s1"),
        F.row_number().over(w).alias("t"),
    )
    tot = per.groupBy("g").agg(
        F.sum("y").alias("s"), F.count(F.lit(1)).alias("n")
    )
    cand = (
        cum.join(tot, "g")
        .filter(F.col("t") < F.col("n"))
        .withColumn(
            "__d",
            F.expr(
                "cast(s1 as decimal(38,0)) * (n - t)"
                " - (cast(s as decimal(38,0)) - s1) * t"
            ),
        )
        # decimal(38,0) headroom gate for d^2 * 1e6 (see docstring): lazy,
        # per-row, fires at execution time only when the data actually
        # exceeds the exact-arithmetic envelope — no job at build time
        .withColumn(
            "__d",
            F.expr(
                "CASE WHEN abs(__d) > cast(3000000000000000 as decimal(38,0))"
                " THEN raise_error(concat('binary_changepoint: |d| = ',"
                " cast(abs(__d) as string), ' exceeds the decimal(38,0)"
                " headroom for d^2*1e6 (|d| <= 3e15); rescale value_col or"
                " coarsen buckets')) ELSE __d END"
            ),
        )
        .withColumn(
            "score_scaled",
            F.expr(
                "cast((__d * __d * 1000000)"
                " div (cast(t as decimal(38,0)) * (n - t)) as bigint)"
            ),
        )
    )
    pick = Window.partitionBy("g").orderBy(
        F.desc("score_scaled"), F.asc("t")
    )
    return (
        cand.withColumn("__rk", F.row_number().over(pick))
        .filter(F.col("__rk") == 1)
        .select(
            F.col("g").alias(group_col),
            F.col("b").alias("split_bucket"),
            F.col("t").cast("long").alias("n_left"),
            (F.col("n") - F.col("t")).cast("long").alias("n_right"),
            F.col("s1").cast("long").alias("left_sum"),
            (F.col("s") - F.col("s1")).cast("long").alias("right_sum"),
            "score_scaled",
        )
    )


def binary_changepoint_oracle_sql(
    series_sql: str,
    group_col: str,
    bucket_col: str,
    value_col: str,
) -> str:
    """DuckDB replay of :func:`binary_changepoint` — HUGEINT cumulative
    moments, the same scaled truncating division (the numerator is a
    square, so truncate-toward-zero agrees on both engines) and
    earliest-split tie-break."""
    return f"""
WITH per AS (
  SELECT {group_col} AS g, {bucket_col} AS b,
         CAST(sum(CAST({value_col} AS BIGINT)) AS BIGINT) AS y
  FROM ({series_sql}) GROUP BY 1, 2
),
cum AS (
  SELECT g, b,
         CAST(sum(y) OVER (PARTITION BY g ORDER BY b) AS HUGEINT) AS s1,
         CAST(row_number() OVER (PARTITION BY g ORDER BY b) AS HUGEINT) AS t
  FROM per
),
tot AS (SELECT g, CAST(sum(y) AS HUGEINT) AS s, CAST(count(*) AS HUGEINT) AS n
        FROM per GROUP BY g),
cand AS (
  SELECT cum.g, b, t, n, s1, s,
         (s1 * (n - t) - (s - s1) * t) AS d
  FROM cum JOIN tot ON cum.g = tot.g
  WHERE t < n
),
scored AS (
  SELECT g, b, t, n, s1, s,
         CAST((d * d * 1000000) // (t * (n - t)) AS BIGINT) AS score_scaled,
         row_number() OVER (PARTITION BY g
                            ORDER BY (d * d * 1000000) // (t * (n - t)) DESC,
                                     t ASC) AS rk
  FROM cand
)
SELECT g AS {group_col}, b AS split_bucket,
       CAST(t AS BIGINT) AS n_left, CAST(n - t AS BIGINT) AS n_right,
       CAST(s1 AS BIGINT) AS left_sum, CAST(s - s1 AS BIGINT) AS right_sum,
       score_scaled
FROM scored WHERE rk = 1
"""
