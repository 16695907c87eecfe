"""Scalar function surface.

The reference's only custom scalar is a base64 decoder UDF
(`fineo-adapter-drill/.../udf/conv/Base64Decoder.java:13-40`) plus CAST
insertion and ``TO_DATE(bigint)`` for directory pruning
(`FileSystemTimestampHandler.java:97-102`); everything else is stock engine
built-ins.  Here all of them are JVM-side Catalyst expressions — no Python
UDFs in any hot path.

Stored event timestamps have shipped in two physical shapes across driver
testdata generations — parquet ``TIMESTAMP(MICROS)`` (reads as Spark
``TIMESTAMP_NTZ``, the current fixtures) and ``TIMESTAMP(NANOS)`` read as
epoch-nanos longs under ``spark.sql.legacy.parquet.nanosAsLong`` (rounds
1-2).  The metric layer's contract is epoch-millis BIGINT either way
(`FineoTable.java:96`), so ``epoch_millis``/``epoch_ms_sql`` inspect the
actual column dtype and emit the matching conversion; both stay inside
whole-stage codegen.  Under the UTC session tz (set by ``ensure_io_confs``)
``unix_millis(cast(ts as timestamp))`` matches DuckDB ``epoch_ms(ts)``
exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def fineo_base64_decode(col: Column | str) -> Column:
    """Base64 text → BINARY (Spark built-in ``unbase64``)."""
    return F.unbase64(F.col(col) if isinstance(col, str) else col)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _int_div(col: Column, divisor: int) -> Column:
    # plain `/` is double division and rounds at ~1e-4 of a unit for epoch
    # nanos — off-by-one at .999999 boundaries; decimal division is exact.
    return (_c(col).cast("decimal(38,0)") / F.lit(divisor)).cast("long")


def nanos_to_millis(col: Column | str) -> Column:
    """Epoch-nanos long → epoch-millis long (truncating integer division;
    matches DuckDB ``epoch_ms(ts)`` for post-1970 data)."""
    return _int_div(_c(col), 1_000_000)


def nanos_to_ts(col: Column | str) -> Column:
    """Epoch-nanos long → TimestampType (micros precision)."""
    return F.timestamp_micros(_int_div(_c(col), 1_000))


def nanos_to_date(col: Column | str) -> Column:
    """Epoch-nanos long → DateType (UTC)."""
    return nanos_to_ts(col).cast("date")


_TIME_TYPES = (T.TimestampType, T.TimestampNTZType)


def epoch_ms_sql(dtype: T.DataType, col: str, per_milli: int = 1_000_000) -> str:
    """SQL text converting a stored time column to epoch-millis BIGINT,
    chosen by the column's ACTUAL dtype (timestamp vs raw integer units).

    The integer leg uses ``div`` (exact for non-negative epochs); the
    timestamp leg needs the UTC session tz for NTZ columns to resolve to the
    same instant DuckDB sees."""
    if isinstance(dtype, _TIME_TYPES):
        return f"unix_millis(cast({col} as timestamp))"
    if isinstance(dtype, (T.LongType, T.IntegerType, T.DecimalType)):
        return f"{col} div {per_milli}"
    raise TypeError(f"cannot derive epoch millis from {col}: {dtype.simpleString()}")


def epoch_millis(df: DataFrame, col: str = "ts", per_milli: int = 1_000_000) -> Column:
    """Column form of :func:`epoch_ms_sql`: epoch-millis BIGINT from whatever
    physical shape ``df[col]`` has (timestamp[us|ns] or raw-unit integer)."""
    return F.expr(epoch_ms_sql(df.schema[col].dataType, col, per_milli))
