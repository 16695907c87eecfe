"""Property-based fuzz of the round-9 robust-stats and graph operators
against their DuckDB oracles / direct Python models — the r10 verdict's
adversarial-conventions sweep over the late session-2 code, modeled on the
fuzzer that caught IEEE -0.0 in the int8 error audit:

- ``trend_slopes``: the float TAIL (slope -> intercept -> r2, each a
  double division rounded 1e-6) must agree with the HUGEINT-moments
  oracle on random gappy/negative/flat/single-bucket series — the
  integer moments are exact by construction, so any divergence is
  operation-order or rounding-convention drift in the tail.
- ``theil_sen_slopes``: the MEDIAN INTERPOLATION (Spark ``percentile``
  vs DuckDB ``quantile_cont`` at even pair counts) over 1e-9-pre-rounded
  pairwise slopes, including duplicate-slope pileups from small value
  ranges.
- ``kcore_peel``: random directed multigraphs (self-loops, duplicate and
  reversed edges) vs BOTH a direct Python bounded-peel model AND the
  materialized-CTE oracle chain ``kcore_peel_oracle_sql`` (the same CTE
  structure s_kcore_layout ships, minus the knn-graph source).
"""

from __future__ import annotations

import os
from collections import Counter

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_EXAMPLES = int(os.environ.get("FUZZ_EXAMPLES", "10"))

# grouped integer series: duplicate (g, bucket) rows sum, values span
# negatives, groups can be single-bucket (NULL slope) or flat (NULL r2)
series_rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),
        st.integers(0, 40),
        st.integers(-1000, 1000),
    ),
    min_size=1,
    max_size=40,
)

# adversarial variant: tiny value range forces duplicate pairwise slopes
# and exact-half medians — the interpolation convention's worst case
dense_rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.integers(0, 12),
        st.integers(-3, 3),
    ),
    min_size=2,
    max_size=30,
)


def _series_tables(spark, rows):
    df = spark.createDataFrame(rows, "g string, day long, v long")
    con = duckdb.connect()
    vals = ", ".join(f"('{g}', {b}, {v})" for g, b, v in rows)
    con.execute(f"CREATE TABLE t AS SELECT * FROM (VALUES {vals}) s(g, day, v)")
    return df, con


def _canon(rows):
    # floats through repr-stable normalization; None stays None
    return sorted(
        tuple(round(v, 9) if isinstance(v, float) else v for v in row)
        for row in rows
    )


@settings(
    max_examples=_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.one_of(series_rows, dense_rows))
def test_trend_slopes_float_tail_matches_duckdb(spark, rows):
    from fineo_readerator_spark.operators.anomaly import (
        trend_slopes,
        trend_slopes_oracle_sql,
    )

    df, con = _series_tables(spark, rows)
    got = _canon(
        tuple(r) for r in trend_slopes(df, "g", "day", "v").collect()
    )
    exp = _canon(
        tuple(r)
        for r in con.sql(
            trend_slopes_oracle_sql("SELECT g, day, v FROM t", "g", "day", "v")
        ).fetchall()
    )
    assert got == exp


@settings(
    max_examples=_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.one_of(series_rows, dense_rows))
def test_theil_sen_median_matches_duckdb(spark, rows):
    from fineo_readerator_spark.operators.anomaly import (
        theil_sen_oracle_sql,
        theil_sen_slopes,
    )

    df, con = _series_tables(spark, rows)
    got = _canon(
        tuple(r) for r in theil_sen_slopes(df, "g", "day", "v").collect()
    )
    exp = _canon(
        tuple(r)
        for r in con.sql(
            theil_sen_oracle_sql("SELECT g, day, v FROM t", "g", "day", "v")
        ).fetchall()
    )
    assert got == exp


edge_lists = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)),
    min_size=1,
    max_size=40,
)


def _kcore_model(edges, k, n_rounds):
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    alive = {n for e in und for n in e}
    for _ in range(n_rounds):
        live = [e for e in und if e[0] in alive and e[1] in alive]
        deg = Counter()
        for u, v in live:
            deg[u] += 1
            deg[v] += 1
        alive = {n for n in alive if deg[n] >= k}
    live = [e for e in und if e[0] in alive and e[1] in alive]
    deg = Counter()
    for u, v in live:
        deg[u] += 1
        deg[v] += 1
    return {n: deg.get(n, 0) for n in alive}


@settings(
    max_examples=_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=edge_lists,
    k=st.sampled_from([1, 2, 3]),
    n_rounds=st.sampled_from([1, 2, 3]),
)
def test_kcore_peel_matches_model_and_oracle(spark, edges, k, n_rounds):
    from fineo_readerator_spark.llm_ops.similarity import (
        kcore_peel,
        kcore_peel_oracle_sql,
    )

    df = spark.createDataFrame(edges, "vec_id long, nbr_id long")
    got = {r.vec_id: r.core_degree for r in kcore_peel(df, k, n_rounds).collect()}
    assert got == _kcore_model(edges, k, n_rounds)

    con = duckdb.connect()
    vals = ", ".join(f"({a}, {b})" for a, b in edges)
    con.execute(
        f"CREATE TABLE e AS SELECT * FROM (VALUES {vals}) s(vec_id, nbr_id)"
    )
    oracle = dict(
        con.sql(
            kcore_peel_oracle_sql("SELECT vec_id, nbr_id FROM e", k, n_rounds)
        ).fetchall()
    )
    assert got == oracle


def test_kcore_peel_empty_core_is_empty_frame(spark):
    # every node peels at k=3 on a path graph — both faces must return zero
    # rows, not error (the LEFT JOIN's empty-alive edge)
    from fineo_readerator_spark.llm_ops.similarity import (
        kcore_peel,
        kcore_peel_oracle_sql,
    )

    df = spark.createDataFrame([(1, 2), (2, 3)], "vec_id long, nbr_id long")
    assert kcore_peel(df, k=3, n_rounds=2).count() == 0
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE e AS SELECT * FROM (VALUES (1, 2), (2, 3)) s(vec_id, nbr_id)"
    )
    assert (
        con.sql(
            kcore_peel_oracle_sql("SELECT vec_id, nbr_id FROM e", 3, 2)
        ).fetchall()
        == []
    )


@settings(
    max_examples=_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.one_of(series_rows, dense_rows))
def test_binary_changepoint_matches_duckdb(spark, rows):
    """r10: the changepoint's integer score (d²·10⁶ div n₁n₂) and
    earliest-split tie-break over random gappy/negative series — negative
    value sums make d negative, the square must keep the division
    never-negative on both engines."""
    from fineo_readerator_spark.operators.anomaly import (
        binary_changepoint,
        binary_changepoint_oracle_sql,
    )

    df, con = _series_tables(spark, rows)
    got = sorted(
        tuple(r) for r in binary_changepoint(df, "g", "day", "v").collect()
    )
    exp = sorted(
        tuple(r)
        for r in con.sql(
            binary_changepoint_oracle_sql(
                "SELECT g, day, v FROM t", "g", "day", "v"
            )
        ).fetchall()
    )
    assert got == exp


@settings(
    max_examples=_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.one_of(series_rows, dense_rows))
def test_gini_distributed_rank_matches_duckdb(spark, rows):
    """r11: gini's Σi·x_i now comes from a range-partitioned two-pass rank
    (local row_number + per-partition offsets) instead of a global
    single-partition window — fuzz that the distributed decomposition is
    EXACT against the oracle's plain global rank over random gappy/
    negative/duplicate-unit event sets (duplicate (g, day) rows sum into
    one unit total; negative totals must land in n_excluded on both
    faces).  The (g, day) pair is treated as the unit key via a derived
    unit id so tie-break order (x, u) is exercised across partitions."""
    from fineo_readerator_spark.operators.cohort import (
        gini_concentration,
        gini_oracle_sql,
    )

    df, con = _series_tables(spark, rows)
    # unit = g||day — many units, values collide heavily (rank ties)
    units = df.selectExpr("concat(g, '#', day) AS u", "v")
    got = sorted(
        tuple(r) for r in gini_concentration(units, "u", "v").collect()
    )
    exp = sorted(
        tuple(r)
        for r in con.sql(
            gini_oracle_sql("SELECT g || '#' || day AS u, v FROM t", "u", "v")
        ).fetchall()
    )
    assert got == exp


@settings(
    max_examples=_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.one_of(series_rows, dense_rows))
def test_diff_in_diff_signed_division_matches_duckdb(spark, rows):
    """r11: DiD's one division is SIGNED (negative effects are half the
    point) and carries the explicit truncate-vs-floor correction on both
    faces — fuzz the full 4-cell rational over random gappy/negative
    series, where treatment/period predicates derive from the fuzzed
    group and bucket so empty cells (zero-row output) and negative
    numerators both occur."""
    import pyspark.sql.functions as F

    from fineo_readerator_spark.operators.cohort import (
        diff_in_diff,
        diff_in_diff_oracle_sql,
    )

    df, con = _series_tables(spark, rows)
    got = sorted(
        tuple(r)
        for r in diff_in_diff(
            df.selectExpr("concat(g, '#', day % 3) AS u", "day", "v"),
            "u",
            "day",
            "v",
            treat_pred=F.expr("u like 'a%'"),
            post_pred=F.expr("day >= 20"),
        ).collect()
    )
    exp = sorted(
        tuple(r)
        for r in con.sql(
            diff_in_diff_oracle_sql(
                "SELECT g || '#' || (day % 3) AS u, day, v FROM t",
                "u",
                "v",
                treat_sql="u LIKE 'a%'",
                post_sql="day >= 20",
            )
        ).fetchall()
    )
    assert got == exp


@settings(
    max_examples=_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.one_of(series_rows, dense_rows))
def test_cohort_ltv_matches_duckdb(spark, rows):
    """r11: the LTV curve's running sum + half-up per-unit milli division
    over random gappy/negative series — negative cumulative values make
    ``cum_v * 2000 + n`` signed, so any truncate-vs-floor drift between
    the faces shows up here; the (g, day%5)-derived unit key produces
    many single-bucket cohorts and sparse ages."""
    from fineo_readerator_spark.operators.cohort import (
        cohort_ltv,
        cohort_ltv_oracle_sql,
    )

    df, con = _series_tables(spark, rows)
    got = sorted(
        tuple(r)
        for r in cohort_ltv(
            df.selectExpr("concat(g, '#', day % 5) AS u", "day", "v"),
            "u",
            "day",
            "v",
        ).collect()
    )
    exp = sorted(
        tuple(r)
        for r in con.sql(
            cohort_ltv_oracle_sql(
                "SELECT g || '#' || (day % 5) AS u, day, v FROM t",
                "u",
                "day",
                "v",
            )
        ).fetchall()
    )
    assert got == exp
