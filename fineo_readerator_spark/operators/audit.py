"""Data-quality audit: declarative expectation checks over pipeline tables.

Before a corpus snapshot is promoted (or a TPC-H-shaped fact load lands), a
pipeline runs a battery of cheap invariant checks — null fractions, value
ranges, primary-key uniqueness, referential integrity — and gates promotion
on the results (the Deequ/Great-Expectations shape, re-expressed as plain
DataFrame aggregates so Catalyst fuses them).

Scale shape, per check family:

- **row checks** (null / range / custom predicate): ALL checks against one
  table fold into a SINGLE aggregate pass — one scan, one map-side-combined
  reduction to one row, then a row-local unpivot to (check, violations)
  rows.  N checks never means N scans.
- **uniqueness**: count vs count-distinct of the key in one aggregate (the
  partial aggregation dedups per-partition before the shuffle).
- **referential integrity**: a left join against the DISTINCT parent keys
  with a match marker — one scan of the child, parent reduced to its key
  column; violations and total come from the same aggregate (an anti-join
  formulation would need a second scan for the denominator).

Every result row is (table_name, check_name, violations, total, passed) —
metadata-sized regardless of input scale, so the gate itself is a driver-side
decision over a handful of rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_RESULT_COLS = ["table_name", "check_name", "violations", "total", "passed"]


def _finalize(df: DataFrame, table_name: str) -> DataFrame:
    return df.select(
        F.lit(table_name).alias("table_name"),
        F.col("check_name"),
        F.col("violations").cast("long").alias("violations"),
        F.col("total").cast("long").alias("total"),
        (F.col("violations") == 0).alias("passed"),
    )


def row_checks(df: DataFrame, table_name: str, checks: dict[str, Column]) -> DataFrame:
    """One result row per named violation predicate (True = violating row).

    All predicates evaluate in a single scan+aggregate; the unpivot to rows
    happens on the one-row aggregate output."""
    if not checks:
        raise ValueError("row_checks needs at least one named predicate")
    agg = df.agg(
        F.count(F.lit(1)).alias("__total"),
        *[
            F.count(F.when(pred, F.lit(1))).alias(f"__v_{name}")
            for name, pred in checks.items()
        ],
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("check_name"), F.col(f"__v_{name}").alias("violations")
            )
            for name in checks
        ]
    )
    rows = agg.select(F.col("__total").alias("total"), F.explode(pairs).alias("kv")).select(
        F.col("kv.check_name").alias("check_name"), F.col("kv.violations"), "total"
    )
    return _finalize(rows, table_name)


def unique_check(df: DataFrame, table_name: str, key_cols: list[str], name: str) -> DataFrame:
    """Violations = rows beyond the first per key (total − distinct keys)."""
    agg = df.agg(
        F.count(F.lit(1)).alias("total"),
        F.count_distinct(*[F.col(c) for c in key_cols]).alias("__d"),
    )
    rows = agg.select(
        F.lit(name).alias("check_name"),
        (F.col("total") - F.col("__d")).alias("violations"),
        "total",
    )
    return _finalize(rows, table_name)


def fk_check(
    child: DataFrame,
    parent: DataFrame,
    table_name: str,
    child_key: str,
    parent_key: str,
    name: str,
) -> DataFrame:
    """Violations = child rows whose key has no match in the parent.

    NULL child keys are orphans here (they reference nothing); add an
    explicit ``row_checks`` null check when NULLs should be reported
    separately."""
    keys = parent.select(F.col(parent_key).alias("__pk")).distinct().withColumn(
        "__hit", F.lit(1)
    )
    joined = child.select(F.col(child_key).alias("__ck")).join(
        keys, F.col("__ck") == F.col("__pk"), "left"
    )
    agg = joined.agg(
        F.count(F.lit(1)).alias("total"),
        F.count(F.when(F.col("__hit").isNull(), F.lit(1))).alias("violations"),
    )
    rows = agg.select(F.lit(name).alias("check_name"), "violations", "total")
    return _finalize(rows, table_name)


def audit_report(*parts: DataFrame) -> DataFrame:
    """Union check results into one deterministic report."""
    if not parts:
        raise ValueError("audit_report needs at least one check result")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(*_RESULT_COLS).orderBy("table_name", "check_name")


def column_profile(
    df: DataFrame, table_name: str, cols: list[str] | None = None
) -> DataFrame:
    """Per-column profiling report — the first thing a pipeline looks at
    on an unfamiliar table (and the statistics a quality gate's thresholds
    are calibrated FROM): for every column, null count, exact distinct
    count, and min/max rendered as strings (min/max taken on the NATIVE
    type — casting before the aggregate would order numerics
    lexicographically).

    One row per column: (table_name, col_name, n_nulls, n_distinct,
    min_val, max_val).

    Scale shape: ONE aggregate pass — all per-column aggregates fold into
    a single map-side-combined reduction to one row, then a row-local
    ``stack`` unpivot (the row_checks pattern).  The exact
    count-distincts make Catalyst EXPAND the input ×C before the partial
    aggregate, which is the honest cost of exactness on a wide table; at
    100 TB profile a column subset, or trade exactness for
    ``approx_count_distinct`` (not oracle-replayable, so the registered
    query stays exact)."""
    cols = cols or df.columns
    if not cols:
        raise ValueError("column_profile needs at least one column")
    aggs = [F.count(F.lit(1)).alias("__total")]
    for i, c in enumerate(cols):
        aggs += [
            F.count(F.col(c)).alias(f"__c{i}"),
            F.count_distinct(F.col(c)).alias(f"__d{i}"),
            F.min(F.col(c)).cast("string").alias(f"__lo{i}"),
            F.max(F.col(c)).cast("string").alias(f"__hi{i}"),
        ]
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __total - __c{i}, __d{i}, __lo{i}, __hi{i}"
        for i, c in enumerate(cols)
    )
    return row.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS (col_name, n_nulls, n_distinct, min_val, max_val)"
    ).select(
        F.lit(table_name).alias("table_name"),
        "col_name",
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_val",
        "max_val",
    )


def column_profile_oracle_sql(
    source_sql: str, table_name: str, cols: list[str]
) -> str:
    """DuckDB replay of :func:`column_profile` — one UNION ALL branch per
    column (the oracle pays C scans so the Spark side can be checked at
    its one-pass shape)."""
    branches = [
        f"""SELECT '{table_name}' AS table_name, '{c}' AS col_name,
       CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(min({c}) AS VARCHAR) AS min_val,
       CAST(max({c}) AS VARCHAR) AS max_val
FROM ({source_sql})"""
        for c in cols
    ]
    return "\nUNION ALL\n".join(branches)
