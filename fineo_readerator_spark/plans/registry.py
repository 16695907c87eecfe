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
    ensure_io_confs(spark)
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")
