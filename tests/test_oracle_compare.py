"""The r9 harness-hardening contract: the oracle comparators must REJECT
result-type drift that value-str comparison cannot see (q_skew_report went
driver-red twice on exactly this while every local replay "matched").

Pure unit tests — Spark kinds come from hand-built StructTypes (no session),
DuckDB kinds from planned relations (no data).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import types as T

from fineo_readerator_spark.oracle_compare import (
    container_columns,
    duck_kind,
    kind_mismatches,
    spark_kind,
)


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def _duck(con, sql):
    rel = con.sql(sql)
    return list(rel.columns), list(rel.types)


def test_planted_decimal_vs_double_rejected(con):
    """A Spark DOUBLE against a DuckDB DECIMAL must flag — their canonical
    value renderings differ ('0.25' vs '0.250000') under driver hashing."""
    schema = T.StructType([T.StructField("share", T.DoubleType())])
    cols, types = _duck(con, "SELECT CAST(0.25 AS DECIMAL(10,6)) AS share")
    assert kind_mismatches(schema, cols, types) == [("share", "float64", "decimal(6)")]


def test_planted_hugeint_vs_bigint_rejected(con):
    """The exact q_skew_report hazard: an un-cast DuckDB sum() is HUGEINT
    (Arrow decimal128) against Spark's BIGINT."""
    schema = T.StructType([T.StructField("n_total", T.LongType())])
    cols, types = _duck(con, "SELECT sum(x) AS n_total FROM (VALUES (1),(2)) t(x)")
    assert kind_mismatches(schema, cols, types) == [("n_total", "int64", "hugeint")]


def test_planted_decimal_scale_drift_rejected(con):
    schema = T.StructType([T.StructField("v", T.DecimalType(38, 6))])
    cols, types = _duck(con, "SELECT CAST(1 AS DECIMAL(10,2)) AS v")
    assert kind_mismatches(schema, cols, types) == [("v", "decimal(6)", "decimal(2)")]


def test_planted_int_width_drift_rejected(con):
    schema = T.StructType([T.StructField("rank", T.IntegerType())])
    cols, types = _duck(con, "SELECT CAST(1 AS BIGINT) AS rank")
    assert kind_mismatches(schema, cols, types) == [("rank", "int32", "int64")]


def test_matching_kinds_pass(con):
    schema = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("b", T.DoubleType()),
            T.StructField("c", T.StringType()),
            T.StructField("d", T.ArrayType(T.LongType())),
            T.StructField("e", T.DecimalType(20, 2)),
            T.StructField("f", T.TimestampType()),  # tz-aware vs naive: sanctioned
            T.StructField("g", T.BooleanType()),
            T.StructField("h", T.DateType()),
        ]
    )
    cols, types = _duck(
        con,
        "SELECT 1::BIGINT a, 1.5::DOUBLE b, 'x' c, [1::BIGINT] d, "
        "CAST(1 AS DECIMAL(12,2)) e, CAST('2020-01-01' AS TIMESTAMP) f, "
        "TRUE g, current_date h",
    )
    assert kind_mismatches(schema, cols, types) == []


def test_nested_kinds_recursive(con):
    assert spark_kind(T.ArrayType(T.DecimalType(10, 3))) == "list<decimal(3)>"
    assert (
        spark_kind(T.StructType([T.StructField("x", T.LongType())])) == "struct<x:int64>"
    )
    cols, types = _duck(con, "SELECT [{'x': 1::BIGINT}] AS v")
    assert duck_kind(types[0]) == "list<struct<x:int64>>"
    # a nested width drift still flags
    schema = T.StructType(
        [T.StructField("v", T.ArrayType(T.StructType([T.StructField("x", T.IntegerType())])))]
    )
    assert kind_mismatches(schema, cols, types) == [
        ("v", "list<struct<x:int32>>", "list<struct<x:int64>>")
    ]


def test_container_columns_flags_planted_offenders():
    # the r9 s_embed_int8 shape: a qvec array<int> in the final output
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("qvec", T.ArrayType(T.IntegerType())),
            T.StructField("meta", T.MapType(T.StringType(), T.LongType())),
            T.StructField("pt", T.StructType([T.StructField("x", T.DoubleType())])),
            T.StructField("err", T.DoubleType()),
        ]
    )
    assert container_columns(schema) == [
        ("qvec", "list<int32>"),
        ("meta", "map<string,int64>"),
        ("pt", "struct<x:float64>"),
    ]


def test_container_columns_clean_schema_passes():
    schema = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.StringType())]
    )
    assert container_columns(schema) == []
