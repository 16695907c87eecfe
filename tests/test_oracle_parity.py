"""Mirror of the driver's t2 gate: every registry query vs its DuckDB oracle
(row count + schema-width + order-insensitive values) at sf0.001 for speed;
the driver runs the same thing at sf0.01."""

from __future__ import annotations

import math

import duckdb
import pytest

from fineo_readerator_spark.oracle_compare import container_columns, kind_mismatches
from fineo_readerator_spark.plans.queries import QUERIES

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.17g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _rows(tuples):
    return sorted(tuple(_norm(v) for v in row) for row in tuples)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    q = QUERIES[name]
    sdf = q.fn(spark, sf_dir)
    # r10 gate: no container-typed output anywhere in the registry — the
    # driver's pandas canonicalizer crashes on unhashable lists (r9:
    # s_embed_int8), and the str()-compare below cannot see that class
    containers = container_columns(sdf.schema)
    assert not containers, f"container-typed output columns: {containers}"
    got_cols = list(sdf.columns)
    got = [tuple(r) for r in sdf.collect()]
    if q.oracle is None:
        assert len(got) >= 0  # rows-only check
        return
    rel = duck.sql(q.oracle)
    exp_cols, exp_types = list(rel.columns), list(rel.types)
    exp = rel.fetchall()
    assert sorted(got_cols) == sorted(exp_cols), f"column names differ: {got_cols} vs {exp_cols}"
    # r9 hardening: exact result-TYPE agreement — str()-compare is blind to
    # DECIMAL-vs-DOUBLE / HUGEINT-vs-BIGINT drift, the driver's hash is not
    tmis = kind_mismatches(sdf.schema, exp_cols, exp_types)
    assert not tmis, f"result dtypes differ (spark_kind vs duckdb_kind): {tmis}"
    # driver compares columns sorted by name — do the same
    gidx = [got_cols.index(c) for c in sorted(got_cols)]
    eidx = [exp_cols.index(c) for c in sorted(exp_cols)]
    got_sorted = _rows([tuple(row[i] for i in gidx) for row in got])
    exp_sorted = _rows([tuple(row[i] for i in eidx) for row in exp])
    assert len(got_sorted) == len(exp_sorted), f"row count {len(got_sorted)} vs {len(exp_sorted)}"
    if got_sorted != exp_sorted:
        diffs = [(g, e) for g, e in zip(got_sorted, exp_sorted) if g != e][:5]
        raise AssertionError(f"value mismatch, first diffs: {diffs}")
