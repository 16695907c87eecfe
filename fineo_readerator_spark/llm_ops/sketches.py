"""Distinct-count sketches: a portable, deterministic HyperLogLog.

Why not ``approx_count_distinct``?  Spark's built-in HLL++ is the right
production choice (and is what a user should reach for), but its register
layout and hash are engine-internal, so its output can't be replayed by the
DuckDB oracle or by a second engine reading the same data.  This HLL uses the
portable md5 leaf hash (see llm_ops.dedup._md5_long) and pure integer
register arithmetic, so the SAME estimate comes out of Spark, DuckDB and
Python — sketch results become comparable and mergeable across engines, which
is exactly what a multi-engine 100 TB pipeline needs.

Scale shape: one map-side-combined aggregation to 128 registers (bytes of
state per partition), then a single-row fold — the same two-level shape as
``approx_count_distinct``.  Register max() is associative/commutative, so the
shuffle carries at most #partitions × 128 longs.

Determinism details:
- bucket = low 7 bits of the 60-bit hash; suffix = high 53 bits.
- rho = leading zeros of the 53-bit suffix + 1 (via length(bin(x)) — integer
  string length, no float log).
- The harmonic sum  Σ 2^-M_j  is computed as the INTEGER  Σ 2^(54-M_j)
  (scaled by 2^54): max 128·2^54 < 2^62, exact in int64 and order-independent,
  where a float sum would depend on aggregation order.
- Only the final division and the small-range ln() touch floating point; the
  result is rounded to 2 decimals, far coarser than any cross-libm ulp.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fineo_readerator_spark.llm_ops.dedup import _md5_long

_P = 7  # register index bits
_M = 1 << _P  # 128 registers
_W = 53  # suffix width: 60-bit md5 leaf minus 7 index bits
_ALPHA = 0.7213 / (1 + 1.079 / _M)  # bias constant for m >= 128


def _rho(suffix: Column) -> Column:
    """Leading-zero rank of a value in a ``_W``-bit window: _W+1 for zero,
    else _W - bitlength + 1.  bin() gives the bit length as a string length —
    exact integer arithmetic on both engines."""
    return (
        F.when(suffix == 0, F.lit(_W + 1))
        .otherwise(F.lit(_W + 1) - F.length(F.bin(suffix)))
        .cast("int")
    )


def hll_registers(df: DataFrame, key: Column) -> DataFrame:
    """(bucket, m_j) rows for non-empty registers — the mergeable sketch
    state.  Missing buckets mean register value 0."""
    h = _md5_long(key)
    return (
        df.select(
            h.bitwiseAND(F.lit(_M - 1)).alias("bucket"),
            _rho(F.shiftright(h, _P)).alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("m_j"))
    )


def hll_estimate(df: DataFrame, key: Column) -> DataFrame:
    """Single-row DataFrame: (est_distinct double, registers_set long).

    Standard HLL estimator with the small-range (linear counting)
    correction; no large-range correction is needed at 60 hash bits."""
    regs = hll_registers(df, key)
    return regs.agg(
        F.expr(
            f"""
            round(CASE WHEN {_ALPHA!r}D * {_M} * {_M} * {1 << (_W + 1)}
                       / (sum(shiftleft(1L, {_W + 1} - m_j)) + ({_M} - count(*)) * {1 << (_W + 1)}L)
                       <= 2.5D * {_M} AND count(*) < {_M}
                  THEN {_M} * ln({_M} * CAST(1.0 AS DOUBLE) / ({_M} - count(*)))
                  ELSE {_ALPHA!r}D * {_M} * {_M} * {1 << (_W + 1)}
                       / (sum(shiftleft(1L, {_W + 1} - m_j)) + ({_M} - count(*)) * {1 << (_W + 1)}L)
                  END, 2)
            """
        ).alias("est_distinct"),
        F.count("*").cast("long").alias("registers_set"),
    )


def hll_oracle_sql(source_sql: str, key_expr: str) -> str:
    """DuckDB replay of ``hll_estimate`` over ``SELECT {key_expr} FROM
    (source_sql)`` — identical hash, registers and estimator arithmetic."""
    from fineo_readerator_spark.llm_ops.dedup_oracles import _hexparse

    h = _hexparse(f"md5({key_expr})", 1, 15)
    big = 1 << (_W + 1)
    est = (
        f"CAST({_ALPHA!r} AS DOUBLE) * {_M} * {_M} * {big}"
        f" / (sum(1::BIGINT << ({_W + 1} - m_j)) + ({_M} - count(*)) * {big}::BIGINT)"
    )
    return f"""
WITH h AS (
  SELECT {h} AS h FROM ({source_sql})
),
regs AS (
  SELECT h & {_M - 1} AS bucket,
         max(CASE WHEN (h >> {_P}) = 0 THEN {_W + 1}
                  ELSE {_W + 1} - length(bin(h >> {_P})) END) AS m_j
  FROM h GROUP BY 1
)
SELECT round(CASE WHEN {est} <= CAST(2.5 AS DOUBLE) * {_M} AND count(*) < {_M}
             THEN {_M} * ln({_M} * CAST(1.0 AS DOUBLE) / ({_M} - count(*)))
             ELSE {est} END, 2) AS est_distinct,
       count(*) AS registers_set
FROM regs
"""
