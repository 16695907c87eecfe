"""Scalar function surface.

The reference's only custom scalar is a base64 decoder UDF
(`fineo-adapter-drill/.../udf/conv/Base64Decoder.java:13-40`) plus CAST
insertion and ``TO_DATE(bigint)`` for directory pruning
(`FileSystemTimestampHandler.java:97-102`); everything else is stock engine
built-ins.  Here all of them are JVM-side Catalyst expressions — no Python
UDFs in any hot path.

The nanos helpers exist because the engine reads parquet
``TIMESTAMP(NANOS)`` columns as raw epoch-nanos longs
(``spark.sql.legacy.parquet.nanosAsLong``): integer arithmetic keeps the
conversion inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


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
