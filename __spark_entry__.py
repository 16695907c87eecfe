"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship metric-table query on sf0.001;
``queries()`` / ``oracle_sql()`` expose the full driver-checkable inventory
(see fineo_readerator_spark/plans/).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from fineo_readerator_spark.plans.queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the fineo metric-table read —
    two overlapping stores recombined (alias/cast projection, anti-overlap
    cutover, union, timestamp sort)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return QUERIES["m_union_overlap"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL-expressible ops,
    which the driver checks rows-only)."""
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
