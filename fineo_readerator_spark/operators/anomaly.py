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
