"""Scale-pattern operators: bucketed co-located joins and skew salting.

These are the shuffle-avoidance tools a 100 TB deployment reaches for:

- **Bucketing**: persist both sides of a recurring large join bucketed (and
  sorted) on the join key; Spark's bucketed scan then feeds a sort-merge
  join with NO exchange on either side — the join cost becomes a streamed
  merge per bucket pair.  This is the Spark-native answer to the reference's
  hash-key co-location in DynamoDB (compound hash key routes one org+metric
  to one partition, `DynamoFineoCompoundKeyMapper.java:21-37`).
- **Salting**: when one group key dominates (one org, one metric), a single
  reducer drowns.  Two-phase aggregation over (key, salt) spreads the hot
  key across ``salt_buckets`` reducers, then re-aggregates the partials;
  ``salted_join`` does the same for joins AQE's runtime skew handling
  can't reach (stream-static joins, misleading stats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# aggregate -> (partial expr builder, final expr builder); every entry is
# algebraic (partials re-aggregate losslessly)
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    path: str,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (+ sorted) catalog table at ``path``.

    Joins/aggregations between tables bucketed identically on their key run
    exchange-free; keep ``num_buckets`` identical across tables you intend
    to co-locate.

    The pre-write ``repartition(num_buckets, bucket_cols)`` uses the same
    Murmur3 hash as the bucket assignment, so each task holds exactly one
    bucket and every bucket lands in ONE file.  That matters twice at scale:
    no small-file explosion (tasks × buckets files otherwise), and Spark's
    bucketed scan only reports the ``sortBy`` order for single-file buckets —
    with it, the co-located sort-merge join drops its Sort nodes too, not
    just the Exchanges."""
    df = df.repartition(num_buckets, *[df[c] for c in bucket_cols])
    writer = df.write.format("parquet").mode(mode).option("path", path)
    writer = writer.bucketBy(num_buckets, *bucket_cols)
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.saveAsTable(table)


def register_bucketed(
    spark: SparkSession,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    path: str,
    sort_cols: list[str] | None = None,
) -> None:
    """Attach an ALREADY-WRITTEN bucketed layout to this session's catalog.

    ``write_bucketed`` both writes and registers, but the catalog entry dies
    with the session while the files (bucket ids encoded in their names)
    persist.  A new session re-attaches with external-table DDL instead of
    rewriting the data — at 100 TB the layout is built once per corpus
    version and every later session is metadata-only."""
    schema = spark.read.parquet(path).schema
    cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema)
    sort = ", ".join(sort_cols or bucket_cols)
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {table} ({cols}) USING PARQUET "
        f"CLUSTERED BY ({', '.join(bucket_cols)}) SORTED BY ({sort}) "
        f"INTO {num_buckets} BUCKETS LOCATION '{path}'"
    )


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two identically-bucketed catalog tables on their bucket key.

    The ``merge`` hint pins sort-merge join (broadcast would hide the
    co-location); with matching bucketing the executed plan has no Exchange
    under the join — assert it with ``assert_no_exchange_under_join``."""
    left = spark.table(left_table).hint("merge")
    right = spark.table(right_table)
    return left.join(right, on=on, how=how)


def assert_no_exchange_under_join(df: DataFrame) -> None:
    """Plan check: a co-located join must not shuffle either side."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "SortMergeJoin" not in plan:
        raise AssertionError(f"expected SortMergeJoin in plan:\n{plan}")
    if "Exchange" in plan:
        raise AssertionError(f"bucketed join still shuffles:\n{plan}")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 32,
    seed: int = 42,
) -> DataFrame:
    """Skew-safe aggregation: ``aggs`` maps output alias -> (column, fn) with
    fn in {sum, count, min, max} (algebraic, so partials re-aggregate
    exactly).  Phase 1 aggregates on (keys, salt) — the hot key fans out over
    ``salt_buckets`` reducers; phase 2 folds the partials per key.  Results
    are identical to the unsalted aggregation for every supported fn."""
    unknown = {fn for _, fn in aggs.values()} - set(_ALGEBRAIC)
    if unknown:
        raise ValueError(f"non-algebraic aggregate(s) {sorted(unknown)}; supported: {sorted(_ALGEBRAIC)}")
    salted = df.withColumn("__salt", (F.rand(seed) * salt_buckets).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[_ALGEBRAIC[fn][0](col).alias(alias) for alias, (col, fn) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[_ALGEBRAIC[fn][1](alias).alias(alias) for alias, (_, fn) in aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_from: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` is skewed on the join key and ``small`` is too
    large to broadcast: big rows take a deterministic salt from
    ``salt_from`` (any well-distributed column — MUST be deterministic per
    row so task retries re-derive the same salt), the small side replicates
    ``n_salt``-fold, and the join key widens to (on..., salt) — the hot
    key's rows spread over ``n_salt`` reducers instead of drowning one.

    AQE's skew-join handles most batch cases at runtime; this is for the
    shapes AQE can't touch (stream-static joins, badly-split stats).  Only
    inner/left joins are legal: the replicated small side would multiply
    its unmatched rows under right/full semantics."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salt)).cast("int")
    )
    replicated = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    # merge hint: broadcast would make the salting pointless, shuffle-hash
    # re-concentrates per-key; sort-merge on the widened key is the shape
    # the salt exists for
    return salted_big.join(replicated.hint("merge"), on + ["__salt"], how).drop("__salt")


def key_skew_report(
    df: DataFrame,
    key_cols: list[str],
    k: int = 10,
) -> DataFrame:
    """Shuffle-key skew diagnostics — the report you read BEFORE choosing
    between plain groupBy, AQE skew handling and :func:`salted_agg`: the
    top-``k`` heaviest keys with their row share (parts-per-million),
    alongside the global shape (total rows, distinct keys, max/avg skew
    ratio in ppm).  A skew_ratio_ppm near 1_000_000 means the key
    partitions evenly; 100_000_000 means the top key drowns a reducer and
    the salted/bucketed paths are worth their cost.

    Ratios are BIGINT parts-per-million, never floats: ``share_ppm =
    round_half_up(n_rows · 10⁶ / n_total)`` computed as the pure integer
    ``(n·2·10⁶ + total) div (2·total)`` over decimal(38,0) intermediates —
    float (or DECIMAL-vs-DOUBLE cross-engine) arithmetic can render the
    same ratio differently between engines, integers cannot.

    Scale shape: ONE map-side-combined per-key count (the same shuffle the
    diagnosed aggregation itself would run), then two metadata-sized
    follow-ups over the count frame — a single-row global rollup (crossed
    back in via broadcast) and a TakeOrdered top-k.  The count frame is
    lineage-cut so the two consumers don't recount the corpus."""
    counts = (
        df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    ).localCheckpoint(eager=False)
    # skew_ratio = max / (total/keys) = max·keys/total; ·10⁶ and half-up
    # rounded in exact integer arithmetic (decimal(38,0) headroom: the
    # max·keys·2e6 product overflows BIGINT at ~10¹² rows × 10⁹ keys)
    totals = counts.agg(
        F.sum("n_rows").alias("n_total"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n_rows").alias("__max"),
    ).select(
        "n_total",
        "n_keys",
        F.expr(
            "(cast(__max as decimal(38,0)) * n_keys * 2000000 + n_total)"
            " div (cast(n_total as decimal(38,0)) * 2)"
        ).alias("skew_ratio_ppm"),
    )
    # top-k via orderBy+limit (TakeOrdered: per-partition k-row heaps, never
    # a global sort or single-partition window over the key-count frame —
    # high-cardinality keys make that frame large); the rank window then
    # runs over the k surviving rows only
    # NULL keys are real buckets (same stance as categorical_drift); Spark's
    # asc is NULLS FIRST, so the oracle pins NULLS FIRST explicitly too
    order = [F.desc("n_rows")] + [F.asc_nulls_first(c) for c in key_cols]
    top = (
        counts.orderBy(*order)
        .limit(k)
        .withColumn("rank", F.row_number().over(Window.orderBy(*order)).cast("long"))
    )
    return (
        top.crossJoin(F.broadcast(totals))
        .select(
            *key_cols,
            "rank",
            "n_rows",
            F.expr(
                "(cast(n_rows as decimal(38,0)) * 2000000 + n_total)"
                " div (cast(n_total as decimal(38,0)) * 2)"
            ).alias("share_ppm"),
            "n_total",
            "n_keys",
            "skew_ratio_ppm",
        )
        .orderBy("rank")
    )


def key_skew_oracle_sql(
    corpus_sql: str,
    key_cols: list[str],
    k: int = 10,
) -> str:
    """DuckDB replay of :func:`key_skew_report` — the same pure-integer
    half-up ppm division (HUGEINT here, decimal(38,0) Spark-side; both
    truncate toward zero on positive operands, so the values are
    bit-identical with no decimal-vs-double rendering hazard).  BIGINT
    casts on the outputs keep the fetched dtypes aligned too."""
    keys = ", ".join(key_cols)
    order_keys = ", ".join(f"{c} ASC NULLS FIRST" for c in key_cols)
    return f"""
WITH counts AS (
  SELECT {keys}, count(*) AS n_rows FROM ({corpus_sql}) GROUP BY {keys}
),
totals AS (
  SELECT CAST(sum(n_rows) AS BIGINT) AS n_total, count(*) AS n_keys,
         CAST((CAST(max(n_rows) AS HUGEINT) * count(*) * 2000000 + sum(n_rows))
              // (CAST(sum(n_rows) AS HUGEINT) * 2) AS BIGINT) AS skew_ratio_ppm
  FROM counts
),
top AS (
  SELECT {keys}, n_rows,
         row_number() OVER (ORDER BY n_rows DESC, {order_keys}) AS rank
  FROM counts
)
SELECT {keys}, rank, n_rows,
       CAST((CAST(n_rows AS HUGEINT) * 2000000 + n_total)
            // (CAST(n_total AS HUGEINT) * 2) AS BIGINT) AS share_ppm,
       n_total, n_keys, skew_ratio_ppm
FROM top, totals WHERE rank <= {k} ORDER BY rank
"""
