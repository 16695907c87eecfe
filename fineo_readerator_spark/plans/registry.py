"""Query registry plumbing shared by the driver-contract query modules."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

from fineo_readerator_spark.session import ensure_io_confs


@dataclass
class QueryDef:
    """One driver-checkable query: a Spark builder plus (when the semantics
    are SQL-expressible) a DuckDB oracle over the same parquet tables.

    Column names/aliases MUST match between the two — the driver sorts
    columns by name before hashing values.
    """

    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str] = None
    # headline queries run in bench.py
    bench: bool = False


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read a driver table, normalizing time columns to TIMESTAMP_NTZ.

    The driver's fixtures have shipped time columns in two physical shapes
    across generations (TIMESTAMP(MICROS) → TIMESTAMP_NTZ today; rounds 1-2
    TIMESTAMP(NANOS), readable only as epoch-nanos longs under the
    nanosAsLong legacy conf).  Queries compare these columns against
    ``timestamp_ntz`` literals, so a long-typed generation is normalized
    here — one cast folded into the scan projection — instead of breaking
    every comparison site (the round-3 failure mode, VERDICT r3 #1)."""
    ensure_io_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    time_cols = {
        "events": ["ts"],
        "orders": ["o_orderdate"],
        "lineitem": ["l_shipdate", "l_commitdate", "l_receiptdate"],
    }.get(table, [])
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    for c in time_cols:
        if c in df.columns and isinstance(df.schema[c].dataType, T.LongType):
            # epoch-nanos long -> micros -> TIMESTAMP, then NTZ (UTC session
            # tz makes the wall-clock identical to what DuckDB reads)
            df = df.withColumn(
                c, F.timestamp_micros(F.expr(f"{c} div 1000")).cast("timestamp_ntz")
            )
    return df
