"""Relational capability queries (joins/aggregates/windows/set-ops).

The reference inherits this surface wholesale from stock Drill/Calcite
(SURVEY.md §2.4-2.5: no custom join/agg/window code exists); in Spark it is
the native DataFrame API.  These queries pin that parity against the DuckDB
oracle on the driver's TPC-H-ish tables and double as the bench workload.

Determinism conventions (the driver hash-compares values):
- Monetary aggregates go through ``decimal(18,2)`` so sums are exact in both
  engines, then cast to double at the end (exact → identical bits).
- Averages are double divisions of exact decimal sums — identical inputs →
  identical result; rounded for belt-and-braces.
- Every top-k has a full deterministic sort (measure + key tiebreak).
- orders/lineitem date columns are millis-precision naive timestamps
  (TIMESTAMP_NTZ in Spark, TIMESTAMP in DuckDB); comparisons use wall-clock
  literals on both sides, epoch extraction under the UTC session zone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fineo_readerator_spark.functions.scalars import epoch_millis
from fineo_readerator_spark.plans.registry import QueryDef, load


def _ts(y: int, m: int, d: int):
    """TIMESTAMP_NTZ literal: orders/lineitem date columns are millis-precision
    naive timestamps (timestamp[ms] parquet → TIMESTAMP_NTZ in Spark, naive
    TIMESTAMP in DuckDB); events.ts converts via the type-adaptive
    ``epoch_millis`` helper."""
    return F.expr(f"timestamp_ntz'{y:04d}-{m:02d}-{d:02d} 00:00:00'")


D_1995_03_15 = "1995-03-15 00:00:00"
D_1996_01_01 = "1996-01-01 00:00:00"
D_1996_04_01 = "1996-04-01 00:00:00"
D_1996_07_01 = "1996-07-01 00:00:00"
D_1997_01_01 = "1997-01-01 00:00:00"
D_2000_12_01 = "2000-12-01 00:00:00"


def _ntz(d: str):
    return F.expr(f"timestamp_ntz'{d}'")


def _epoch_ms(col: str):
    """NTZ wall-clock → epoch millis under the UTC session zone (matches
    DuckDB ``epoch_ms`` on its naive TIMESTAMP)."""
    return F.unix_millis(F.col(col).cast("timestamp"))

# exact-decimal building blocks, same SQL text in Spark and DuckDB
DEC_PRICE = "cast(l_extendedprice as decimal(18,2))"
DISC = "cast(1 - l_discount as decimal(4,2))"
TAX = "cast(1 + l_tax as decimal(4,2))"
REVENUE = f"cast(sum({DEC_PRICE} * {DISC}) as double)"


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 adapted: map-side partial aggregation → 6-group final agg;
    one scan, no join, whole-stage codegen throughout."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= _ntz(D_2000_12_01))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr("cast(sum(cast(l_quantity as decimal(18,2))) as double)").alias("sum_qty"),
            F.expr(f"cast(sum({DEC_PRICE}) as double)").alias("sum_base_price"),
            F.expr(f"cast(sum({DEC_PRICE} * {DISC}) as double)").alias("sum_disc_price"),
            F.expr(f"cast(sum({DEC_PRICE} * {DISC} * {TAX}) as double)").alias("sum_charge"),
            F.expr(
                "round(cast(sum(cast(l_quantity as decimal(18,2))) as double) / count(*), 6)"
            ).alias("avg_qty"),
            F.expr(f"round(cast(sum({DEC_PRICE}) as double) / count(*), 6)").alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       cast(sum(cast(l_quantity as decimal(18,2))) as double) AS sum_qty,
       cast(sum({DEC_PRICE}) as double) AS sum_base_price,
       cast(sum({DEC_PRICE} * {DISC}) as double) AS sum_disc_price,
       cast(sum({DEC_PRICE} * {DISC} * {TAX}) as double) AS sum_charge,
       round(cast(sum(cast(l_quantity as decimal(18,2))) as double) / count(*), 6) AS avg_qty,
       round(cast(sum({DEC_PRICE}) as double) / count(*), 6) AS avg_price,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 adapted: selective dim filter → fact joins → top-10.
    The filtered customer side broadcasts (AQE converts at runtime)."""
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < _ntz(D_1995_03_15))
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > _ntz(D_1995_03_15))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.expr(REVENUE).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            _epoch_ms("o_orderdate").alias("orderdate_ms"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


Q3_ORACLE = f"""
SELECT l_orderkey, {REVENUE} AS revenue,
       epoch_ms(o_orderdate) AS orderdate_ms, o_orderpriority
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey LIMIT 10
"""


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 adapted: 6-way join with tiny-dim broadcasts."""
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ntz(D_1996_01_01)) & (F.col("o_orderdate") < _ntz(D_1997_01_01))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.expr(REVENUE).alias("revenue"))
    )


Q5_ORACLE = f"""
SELECT n_name, {REVENUE} AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 adapted: returned-item revenue by customer, top 20."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ntz(D_1996_01_01)) & (F.col("o_orderdate") < _ntz(D_1996_07_01))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.expr(REVENUE).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


Q10_ORACLE = f"""
SELECT c_custkey, c_name, {REVENUE} AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_returnflag = 'R' AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey LIMIT 20
"""


def q_exists_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS subquery → left-semi join (TPC-H Q4 shape)."""
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ntz(D_1996_01_01)) & (F.col("o_orderdate") < _ntz(D_1996_04_01))
    )
    big = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


Q_EXISTS_ORACLE = f"""
SELECT o_orderpriority, count(*) AS order_count
FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
GROUP BY o_orderpriority
"""


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS → left-anti join: customers with no orders."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


Q_ANTI_ORACLE = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def q_outer_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserved through aggregation (null-safe counts/sums)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("order_cnt"),
            F.expr("cast(coalesce(sum(cast(o_totalprice as decimal(18,2))), 0) as double)").alias(
                "total_spent"
            ),
        )
    )


Q_OUTER_ORACLE = """
SELECT c_custkey, count(o_orderkey) AS order_cnt,
       cast(coalesce(sum(cast(o_totalprice as decimal(18,2))), 0) as double) AS total_spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
"""


def q_window_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number window: latest 3 events per user."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        # rn as long: DuckDB row_number is BIGINT and the driver's value
        # hashing is type-representation-sensitive
        .select(
            "user_id", "event_id", epoch_millis(ev, "ts").alias("ts_ms"),
            F.col("rn").cast("long").alias("rn"),
        )
    )


Q_WINDOW_TOPN_ORACLE = """
SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, rn FROM (
  SELECT user_id, event_id, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id) AS rn
  FROM events
) WHERE rn <= 3
"""


def q_window_rank_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-function breadth on one window: rank / dense_rank /
    percent_rank / cume_dist / ntile over per-nation account balances —
    the remaining ANSI window-rank surface beyond row_number.
    percent_rank and cume_dist are single divisions of exact integer
    ranks/counts (IEEE-exact on both engines); the total order
    (c_acctbal DESC, c_custkey) leaves no tie ambiguity."""
    cust = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), "c_custkey")
    return cust.select(
        "c_custkey",
        "c_nationkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


Q_WINDOW_RANK_ORACLE = """
SELECT c_custkey, c_nationkey,
       rank() OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cdist,
       ntile(4) OVER w AS quartile
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
"""


def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-customer revenue (unbounded-preceding frame, exact decimal)."""
    orders = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.expr("cast(o_totalprice as decimal(18,2))")).over(w).cast("double").alias("running_total"),
    )


Q_WINDOW_RUNNING_ORACLE = """
SELECT o_orderkey, o_custkey,
       cast(sum(cast(o_totalprice as decimal(18,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as double) AS running_total
FROM orders
"""


def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — expands to a two-phase aggregate, no driver collect."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count("*").alias("n"),
    )


Q_DISTINCT_ORACLE = """
SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
       count(DISTINCT l_partkey) AS n_part, count(*) AS n
FROM lineitem GROUP BY l_returnflag
"""


def q_grouping_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority", "o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.expr("cast(sum(cast(o_totalprice as decimal(18,2))) as double)").alias("total"),
        )
        .filter(F.col("n") > 100)
    )


Q_HAVING_ORACLE = """
SELECT o_orderpriority, o_orderstatus, count(*) AS n,
       cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS total
FROM orders GROUP BY o_orderpriority, o_orderstatus HAVING count(*) > 100
"""


_SCALAR_EXPRS = [
    ("p_partkey", "p_partkey"),
    ("upper(p_brand)", "brand_u"),
    ("substring(p_type, 1, 4)", "type4"),
    ("cast(length(p_name) as bigint)", "name_len"),  # int64 both sides
    ("CASE WHEN p_size < 10 THEN 'S' WHEN p_size < 30 THEN 'M' ELSE 'L' END", "size_bucket"),
    ("p_partkey % 7", "k7"),
    ("abs(p_size - 25)", "size_dist"),
    ("concat(p_brand, ':', p_type)", "brand_type"),
]


def q_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/math/CASE scalar surface — all JVM built-ins, identical SQL text
    runs on the oracle side."""
    part = load(spark, sf_dir, "part")
    return part.select(*[F.expr(e).alias(a) for e, a in _SCALAR_EXPRS])


Q_SCALAR_ORACLE = "SELECT " + ", ".join(f"{e} AS {a}" for e, a in _SCALAR_EXPRS) + " FROM part"


def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL over nation keys."""
    cust_nk = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    supp_nk = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    both = cust_nk.intersect(supp_nk).select(F.lit("both").alias("tag"), "nk")
    cust_only = cust_nk.subtract(supp_nk).select(F.lit("cust_only").alias("tag"), "nk")
    supp_only = supp_nk.subtract(cust_nk).select(F.lit("supp_only").alias("tag"), "nk")
    return both.unionAll(cust_only).unionAll(supp_only)


Q_SETOPS_ORACLE = """
SELECT 'both' AS tag, nk FROM (SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey FROM supplier)
UNION ALL
SELECT 'cust_only' AS tag, nk FROM (SELECT c_nationkey AS nk FROM customer EXCEPT SELECT s_nationkey FROM supplier)
UNION ALL
SELECT 'supp_only' AS tag, nk FROM (SELECT s_nationkey AS nk FROM supplier EXCEPT SELECT c_nationkey FROM customer)
"""


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped percentiles (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``: same linear-interpolation definition, so the oracle
    matches bit-for-bit).  At true scale swap in ``approx_percentile``
    (t-digest) — same plan shape, bounded memory."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("p50"),
        F.expr("percentile(l_quantity, 0.95)").alias("p95"),
        F.expr("percentile(l_extendedprice, 0.99)").alias("p99_price"),
    )


Q_PERCENTILES_ORACLE = """
SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS p50,
       quantile_cont(l_quantity, 0.95) AS p95,
       quantile_cont(l_extendedprice, 0.99) AS p99_price
FROM lineitem GROUP BY l_returnflag
"""


def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers whose orders exceed a quantity threshold
    (agg-filtered IN-subquery → semi join → 3-way join → re-aggregation)."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey")
    )
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
    )


Q18_ORACLE = """
SELECT c_name, c_custkey, o_orderkey, o_totalprice, round(sum(l_quantity), 2) AS sum_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_totalprice
"""


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured surface: extract a typed field from the JSON ``props``
    column and filter on it — the Spark-native answer to the reference's
    dynamic ANY-typed unknown fields (the ``_fm`` world) when the payload is
    JSON text."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return ev.select(
        epoch_millis(ev, "ts").alias("tsm"), "event_id", k.alias("k")
    ).filter(F.col("k") >= 50)


Q_JSON_ORACLE = """
SELECT epoch_ms(ts) AS tsm, event_id, CAST(props->>'k' AS INT) AS k
FROM events WHERE CAST(props->>'k' AS INT) >= 50
"""


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click event picks up the user's most recent
    purchase value at that moment (point-in-time correctness; DuckDB's
    native ASOF JOIN is the oracle)."""
    from fineo_readerator_spark.operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    ev = ev.select(
        "event_id", "user_id", "event_type", epoch_millis(ev, "ts").alias("timestamp"), "value"
    )
    clicks = ev.filter("event_type = 'click'").select("event_id", "user_id", "timestamp")
    purchases = ev.filter("event_type = 'purchase'").select("user_id", "timestamp", "value")
    return asof_join(
        clicks, purchases, on="user_id", left_ts="timestamp", right_ts="timestamp",
        right_cols=["value"],
    )


Q_ASOF_ORACLE = """
SELECT l.event_id, l.user_id, epoch_ms(l.ts) AS "timestamp",
       epoch_ms(r.ts) AS timestamp_right, r.value AS value_right
FROM (SELECT * FROM events WHERE event_type = 'click') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned range join (attribution windows): clicks landing inside the
    hour after each purchase by the same user.  The bin equi-join replaces
    the inequality join Spark would otherwise run as a nested loop."""
    from fineo_readerator_spark.operators.rangejoin import point_in_interval_join

    HOUR = 3600_000
    ev = load(spark, sf_dir, "events")
    ev = ev.select(
        "event_id", "user_id", "event_type", epoch_millis(ev, "ts").alias("tsm")
    )
    clicks = ev.filter("event_type = 'click'").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("tsm").alias("click_ts")
    )
    windows = ev.filter("event_type = 'purchase'").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("tsm").alias("w_start"),
        (F.col("tsm") + HOUR).alias("w_end"),
    )
    hits = point_in_interval_join(
        clicks, windows, on="user_id", point_ts="click_ts",
        start_ts="w_start", end_ts="w_end", granularity=HOUR,
    )
    return hits.groupBy("purchase_id").agg(F.count("*").alias("n_clicks"))


Q_RANGE_ORACLE = """
SELECT p.event_id AS purchase_id, count(*) AS n_clicks
FROM (SELECT event_id, user_id, epoch_ms(ts) AS tsm FROM events WHERE event_type = 'purchase') p
JOIN (SELECT event_id, user_id, epoch_ms(ts) AS tsm FROM events WHERE event_type = 'click') c
  ON c.user_id = p.user_id AND c.tsm >= p.tsm AND c.tsm < p.tsm + 3600000
GROUP BY p.event_id
"""


def _hourly_agg(ev: DataFrame, with_val: bool = True) -> DataFrame:
    """Shared hourly per-event_type aggregate feeding the gap-fill family
    (q_gap_fill / q_gap_interpolate / q_anomaly_zscore / st_anomaly's
    oracle): exact count plus (optionally) the 1e-6-rounded decimal value
    sum, so the double walk is oracle-checked."""
    aggs = [F.count(F.lit(1)).alias("n")]
    if with_val:
        aggs.append(
            F.round(
                F.sum(F.round(F.col("value"), 6).cast("decimal(25,6)")).cast(
                    "double"
                ),
                6,
            ).alias("val")
        )
    return ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(*aggs)


def _hourly_agg_sql(with_val: bool = True) -> str:
    """DuckDB twin of :func:`_hourly_agg` as an ``agg`` CTE."""
    val = (
        ",\n         round(CAST(sum(CAST(round(CAST(value AS DOUBLE), 6)"
        " AS DECIMAL(25,6))) AS DOUBLE), 6) AS val"
        if with_val
        else ""
    )
    return (
        "agg AS (\n  SELECT event_type, date_trunc('hour', ts) AS bucket,"
        f" count(*) AS n{val}\n  FROM events GROUP BY 1, 2\n)"
    )


# the dense-spine CTEs shared by every gap-fill-family oracle: one bounds
# row, keys × hourly sequence
_SPINE_SQL = """bounds AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM agg),
spine AS (
  SELECT k.event_type, g.b AS bucket
  FROM (SELECT DISTINCT event_type FROM agg) k
  CROSS JOIN (SELECT unnest(generate_series((SELECT lo FROM bounds),
                                            (SELECT hi FROM bounds),
                                            INTERVAL 1 HOUR)) AS b) g
)"""


def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly series per event_type with gap flags and LOCF
    (operators.gapfill.gap_fill — the time_bucket_gapfill/locf surface):
    buckets with no events appear with n=0, is_gap=true and the last
    observed hourly value carried forward.  Spine explodes in-plan from a
    broadcast one-row bounds frame; fill is one left join + one running
    window — no collect, no UDF.  Value sums go through 1e-6-rounded
    decimal partials so the double walk is oracle-checked."""
    from fineo_readerator_spark.operators.gapfill import gap_fill

    agg = _hourly_agg(load(spark, sf_dir, "events"))
    return gap_fill(
        agg, "bucket", ("event_type",), fill_cols=("val",), step="1 hour",
        count_col="n",
    ).select(
        "event_type", "bucket", "n", "val", "val_locf", "is_gap"
    ).orderBy("event_type", "bucket")


Q_GAPFILL_ORACLE = f"""
WITH {_hourly_agg_sql()},
{_SPINE_SQL}
SELECT s.event_type, s.bucket, coalesce(a.n, 0) AS n, a.val,
       last_value(a.val IGNORE NULLS) OVER (
         PARTITION BY s.event_type ORDER BY s.bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS val_locf,
       (a.n IS NULL) AS is_gap
FROM spine s LEFT JOIN agg a ON s.event_type = a.event_type AND s.bucket = a.bucket
ORDER BY s.event_type, s.bucket
"""


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP multi-level aggregation (subtotals + grand total) — Spark
    built-in grouping sets; GROUPING() marks the rolled-up levels so NULL
    group values stay distinguishable from NULL data."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count("*").alias("n"),
            # grouping() is byte in Spark, BIGINT in DuckDB; align on int64
            F.grouping("l_returnflag").cast("long").alias("g_rf"),
            F.grouping("l_linestatus").cast("long").alias("g_ls"),
        )
    )


Q_ROLLUP_ORACLE = """
SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n,
       grouping(l_returnflag) AS g_rf, grouping(l_linestatus) AS g_ls
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction (o_orderdate is TIMESTAMP_NTZ)."""
    orders = load(spark, sf_dir, "orders")
    ts = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(ts).cast("long").alias("y"),
        F.month(ts).cast("long").alias("m"),
        F.dayofmonth(ts).cast("long").alias("d"),
        F.date_format(ts, "yyyy-MM").alias("ym"),
    )


Q_DATE_ORACLE = """
SELECT o_orderkey, year(o_orderdate) AS y, month(o_orderdate) AS m,
       day(o_orderdate) AS d, strftime(o_orderdate, '%Y-%m') AS ym
FROM orders
"""


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: quantity by line status across explicit return-flag columns
    (Spark relational pivot ≡ the SQL conditional-aggregation shape — one
    scan, one shuffle on the grouping key, no per-flag passes)."""
    li = load(spark, sf_dir, "lineitem")
    qty = F.expr("cast(sum(cast(l_quantity as decimal(18,2))) as double)")
    return (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(qty)
        .select(
            "l_linestatus",
            F.col("A").alias("qty_a"),
            F.col("N").alias("qty_n"),
            F.col("R").alias("qty_r"),
        )
    )


Q_PIVOT_ORACLE = """
SELECT l_linestatus,
       cast(sum(cast(l_quantity as decimal(18,2))) FILTER (l_returnflag = 'A') as double) AS qty_a,
       cast(sum(cast(l_quantity as decimal(18,2))) FILTER (l_returnflag = 'N') as double) AS qty_n,
       cast(sum(cast(l_quantity as decimal(18,2))) FILTER (l_returnflag = 'R') as double) AS qty_r
FROM lineitem GROUP BY l_linestatus
"""


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^2 grouping-set combinations with GROUPING() markers so
    rolled-up NULLs stay distinguishable from NULL data."""
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.expr("cast(sum(cast(l_extendedprice as decimal(18,2))) as double)").alias("sum_price"),
        F.count("*").alias("n"),
        F.grouping("l_returnflag").cast("long").alias("g_rf"),
        F.grouping("l_linestatus").cast("long").alias("g_ls"),
    )


Q_CUBE_ORACLE = """
SELECT l_returnflag, l_linestatus,
       cast(sum(cast(l_extendedprice as decimal(18,2))) as double) AS sum_price,
       count(*) AS n,
       grouping(l_returnflag) AS g_rf, grouping(l_linestatus) AS g_ls
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization rollup: split each user's event stream into
    sessions separated by >30 min of inactivity, one row per session with
    count and bounds.  One shuffle on user_id; both window passes and the
    final aggregation reuse that partitioning (operators/sessionize.py)."""
    from fineo_readerator_spark.operators.sessionize import session_stats

    ev = load(spark, sf_dir, "events")
    ev = ev.select("user_id", epoch_millis(ev, "ts").alias("ts_ms"))
    return session_stats(ev, "user_id", "ts_ms", 1_800_000).select(
        "user_id",
        "session_idx",
        "n_events",
        F.col("start_ts").alias("start_ms"),
        F.col("end_ts").alias("end_ms"),
    )


Q_SESSIONIZE_ORACLE = """
WITH e AS (SELECT user_id, epoch_ms(ts) AS ts_ms FROM events),
m AS (
  SELECT user_id, ts_ms,
         CASE WHEN lag(ts_ms) OVER w IS NULL OR ts_ms - lag(ts_ms) OVER w > 1800000
              THEN 1 ELSE 0 END AS ns
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms)
),
s AS (
  SELECT user_id, ts_ms,
         CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts_ms
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
              AS BIGINT) AS session_idx
  FROM m
)
SELECT user_id, session_idx, count(*) AS n_events,
       min(ts_ms) AS start_ms, max(ts_ms) AS end_ms
FROM s GROUP BY user_id, session_idx
"""


def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily cohort retention matrix (operators.cohort.retention_matrix):
    users grouped by first-seen day, fraction returning at each day
    offset.  One (user, day) distinct + a user-keyed first-seen agg;
    the matrix join is user-co-partitioned and cohort sizes join back as
    a broadcast (bounded by the date range, never the corpus)."""
    from fineo_readerator_spark.operators.cohort import retention_matrix

    ev = load(spark, sf_dir, "events")
    act = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("bucket")
    )
    return retention_matrix(act, "user_id", "bucket", granularity_days=1)


def _q_retention_oracle() -> str:
    from fineo_readerator_spark.operators.cohort import retention_oracle_sql

    return retention_oracle_sql("SELECT user_id, ts FROM events")


def q_gap_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap fill with LINEAR interpolation (operators.gapfill interp_cols —
    the TimescaleDB ``interpolate()`` companion to q_gap_fill's locf):
    gap buckets get the straight line between surrounding observations
    over epoch millis; before-first/after-last stay NULL.  Same spine +
    one window pass, two extra frame aggregates, zero extra shuffles."""
    from fineo_readerator_spark.operators.gapfill import gap_fill

    agg = _hourly_agg(load(spark, sf_dir, "events"))
    return gap_fill(
        agg, "bucket", ("event_type",), step="1 hour",
        count_col="n", interp_cols=("val",),
    ).select(
        "event_type", "bucket", "n", "val", "val_interp", "is_gap"
    ).orderBy("event_type", "bucket")


Q_GAP_INTERP_ORACLE = f"""
WITH {_hourly_agg_sql()},
{_SPINE_SQL},
j AS (
  SELECT s.event_type, s.bucket, coalesce(a.n, 0) AS n, a.val,
         (a.n IS NULL) AS is_gap, epoch_ms(s.bucket) AS t,
         CASE WHEN a.val IS NOT NULL THEN epoch_ms(s.bucket) END AS obs_t
  FROM spine s LEFT JOIN agg a ON s.event_type = a.event_type AND s.bucket = a.bucket
),
w AS (
  SELECT *,
    last_value(val IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY bucket
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
    last_value(obs_t IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY bucket
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
    first_value(val IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY bucket
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    first_value(obs_t IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY bucket
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
  FROM j
)
SELECT event_type, bucket, n, val,
       CASE WHEN val IS NOT NULL THEN val
            ELSE round(pv + (nv - pv) * (CAST(t - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE)), 6)
       END AS val_interp,
       is_gap
FROM w
ORDER BY event_type, bucket
"""


def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flags over the DENSE hourly count series
    (operators.anomaly.rolling_zscore over operators.gapfill — a silent
    feed is an anomaly, so gaps fill to 0 first): each bucket scored
    against its trailing 24 buckets, |z| > 3 flagged.  One window pass
    over the spine; exact-integer moments make the float z-tail
    hash-comparable."""
    from fineo_readerator_spark.operators.anomaly import rolling_zscore
    from fineo_readerator_spark.operators.gapfill import gap_fill

    agg = _hourly_agg(load(spark, sf_dir, "events"), with_val=False)
    dense = gap_fill(
        agg, "bucket", ("event_type",), step="1 hour", count_col="n"
    )
    return rolling_zscore(
        dense, "n", "bucket", ("event_type",), window=24, min_periods=12,
        z_thresh=3.0,
    ).select("event_type", "bucket", "n", "z", "is_anomaly").orderBy(
        "event_type", "bucket"
    )


def _q_anomaly_oracle() -> str:
    from fineo_readerator_spark.operators.anomaly import rolling_zscore_oracle_exprs

    z, flag = rolling_zscore_oracle_exprs("n", window=24, min_periods=12,
                                          z_thresh=3.0)
    return f"""
WITH {_hourly_agg_sql(with_val=False)},
{_SPINE_SQL},
dense AS (
  SELECT s.event_type, s.bucket, coalesce(a.n, 0) AS n
  FROM spine s LEFT JOIN agg a ON s.event_type = a.event_type AND s.bucket = a.bucket
)
SELECT event_type, bucket, CAST(n AS BIGINT) AS n, {z} AS z, {flag} AS is_anomaly
FROM dense ORDER BY event_type, bucket
"""


def q_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling DAU/WAU stickiness (operators.cohort.stickiness): rolling
    distinct doesn't decompose over window frames, so the deduped activity
    frame explodes ×7 to the report days each row supports — one
    (report_day, user) distinct + count, never a per-day self-join."""
    from fineo_readerator_spark.operators.cohort import stickiness

    ev = load(spark, sf_dir, "events")
    act = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("bucket")
    )
    return stickiness(act, "user_id", "bucket", window_days=7)


def _q_stickiness_oracle() -> str:
    from fineo_readerator_spark.operators.cohort import stickiness_oracle_sql

    return stickiness_oracle_sql("SELECT user_id, ts FROM events")


def q_user_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view→click→purchase (operators.funnel.
    ordered_funnel): per user, chained windowed conditional-mins under ONE
    exchange on user — a click counts only at/after that user's first
    view, a purchase only after that click.  No fact-table self-join."""
    from fineo_readerator_spark.operators.funnel import ordered_funnel

    ev = load(spark, sf_dir, "events")
    ev = ev.select(
        "user_id", "event_type", epoch_millis(ev, "ts").alias("ts_ms")
    )
    return ordered_funnel(ev, ["view", "click", "purchase"])


def _q_user_funnel_oracle() -> str:
    from fineo_readerator_spark.operators.funnel import ordered_funnel_oracle_sql

    return ordered_funnel_oracle_sql(
        "SELECT user_id, event_type, ts FROM events",
        ["view", "click", "purchase"],
    )


def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS statistic between the value distributions of click
    and purchase events (llm_ops.sampling.ks_statistic): corpus reduces to
    ≤ #bins rows in one map-side-combined agg; the ECDF gap is compared as
    exact cross-multiplied integers, divided once."""
    from fineo_readerator_spark.llm_ops.sampling import ks_statistic

    return ks_statistic(
        load(spark, sf_dir, "events"), "value", "event_type",
        "click", "purchase", bin_width=1.0,
    )


def _q_ks_oracle() -> str:
    from fineo_readerator_spark.llm_ops.sampling import ks_oracle_sql

    return ks_oracle_sql(
        "SELECT event_type, value FROM events", "value", "event_type",
        "click", "purchase", bin_width=1.0,
    )


def q_entity_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution (operators.entity.entity_match): a "dirty" feed of
    lowercased customer mentions (every third customer, ids offset) linked
    back to the reference table by blocked Levenshtein best-match —
    blocking on (nation, name-suffix) keeps candidates an equi-join, the
    skew gate bounds the hottest block, and the true match wins at
    distance 1 (the case-folded initial)."""
    from fineo_readerator_spark.operators.entity import entity_match

    cust = load(spark, sf_dir, "customer")
    blk = F.substring(F.col("c_name"), -3, 3).alias("blk")
    dirty = cust.filter(F.col("c_custkey") % 3 == 0).select(
        (F.col("c_custkey") + 1_000_000).alias("mention_id"),
        F.lower(F.col("c_name")).alias("mention"),
        "c_nationkey",
        blk,
    )
    ref = cust.select("c_custkey", "c_name", "c_nationkey", blk)
    return entity_match(
        dirty,
        ref,
        ["c_nationkey", "blk"],
        "mention_id",
        "c_custkey",
        "mention",
        "c_name",
        k=1,
        max_distance=5,
        max_block_rows=100_000,
    ).orderBy("mention_id")


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form rollup/cube specialize):
    ((returnflag, linestatus), (returnflag), (linestatus), ()) in ONE
    aggregate pass, with grouping_id disambiguating NULL-as-subtotal from
    NULL-as-value — the remaining ANSI grouping surface beside q_rollup /
    q_cube.  Exact decimal sums cast to double last."""
    li = load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("__gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
               count(*) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM __gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), (l_linestatus), ())
        ORDER BY gid, l_returnflag, l_linestatus
        """
    )


Q_GROUPING_SETS_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid,
       count(*) AS n,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                        (l_returnflag), (l_linestatus), ())
ORDER BY gid, l_returnflag, l_linestatus
"""


def q_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto contribution report over event revenue: per event_type exact
    cent totals, half-up ppm share, CUMULATIVE share in (revenue DESC,
    type) order, and the 80%-head flag (a row is head while the cumulative
    share BEFORE it is under 800000 ppm — the crossing row included).
    Cumulative ppm comes from exact cumulative cent sums, never from
    summing rounded shares.  One map-side-combined type aggregate; the
    window and rollup run over |types| rows."""
    ev = load(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.sum(F.expr("cast(floor(value * 100) as bigint)")).alias("cents")
    )
    w = Window.orderBy(F.desc("cents"), "event_type").rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = per.agg(F.sum("cents").alias("__tot"))
    cum = per.select(
        "event_type",
        "cents",
        F.sum("cents").over(w).alias("__cum"),
        F.row_number()
        .over(Window.orderBy(F.desc("cents"), "event_type"))
        .cast("long")
        .alias("rank"),
    )
    ppm = (
        "(cast({n} as decimal(38,0)) * 2000000 + __tot)"
        " div (cast(__tot as decimal(38,0)) * 2)"
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "rank",
            "event_type",
            "cents",
            F.expr(ppm.format(n="cents")).alias("share_ppm"),
            F.expr(ppm.format(n="__cum")).alias("cum_ppm"),
            F.expr(
                f"({ppm.format(n='__cum - cents')}) < 800000"
            ).alias("in_head"),
        )
        .orderBy("rank")
    )


Q_PARETO_ORACLE = """
WITH per AS (
  SELECT event_type, CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY event_type
),
cum AS (
  SELECT event_type, cents,
         sum(cents) OVER (ORDER BY cents DESC, event_type
                          ROWS UNBOUNDED PRECEDING) AS c,
         row_number() OVER (ORDER BY cents DESC, event_type) AS rank
  FROM per
),
tot AS (SELECT CAST(sum(cents) AS BIGINT) AS t FROM per)
SELECT rank, event_type, cents,
       CAST((CAST(cents AS HUGEINT) * 2000000 + t) // (CAST(t AS HUGEINT) * 2)
            AS BIGINT) AS share_ppm,
       CAST((CAST(c AS HUGEINT) * 2000000 + t) // (CAST(t AS HUGEINT) * 2)
            AS BIGINT) AS cum_ppm,
       (CAST((c - cents) AS HUGEINT) * 2000000 + t) // (CAST(t AS HUGEINT) * 2)
         < 800000 AS in_head
FROM cum CROSS JOIN tot
ORDER BY rank
"""


def q_cusum_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point locator (operators.anomaly.cusum_shift) over
    daily event volume: the day where cumulative deviation from the global
    mean peaks — pure cross-multiplied integers, one bucket aggregate plus
    a metadata-sized running-sum window."""
    from fineo_readerator_spark.functions import epoch_millis
    from fineo_readerator_spark.operators.anomaly import cusum_shift

    ev = load(spark, sf_dir, "events")
    # integer `div`, never `/`: the repo's epoch-arithmetic rule (double
    # rounding is off-by-one at exact bucket boundaries)
    series = ev.select(epoch_millis(ev, "ts").alias("ms")).select(
        F.expr("ms div 86400000").alias("day"), F.lit(1).alias("one")
    )
    return cusum_shift(series, "day", "one")


def _q_cusum_shift_oracle() -> str:
    from fineo_readerator_spark.operators.anomaly import cusum_shift_oracle_sql

    return cusum_shift_oracle_sql(
        "SELECT epoch_ms(ts) // 86400000 AS day, 1 AS one FROM events",
        "day",
        "one",
    )


def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue-cents per cohort age (operators.cohort.
    cohort_ltv): users cohort on their first active day, value runs a
    per-cohort cumulative curve with half-up per-unit milli — the LTV
    twin of q_retention's activity counts.  One raw aggregate, then
    |cohorts|×|ages| matrix math."""
    from fineo_readerator_spark.functions import epoch_millis
    from fineo_readerator_spark.operators.cohort import cohort_ltv

    ev = load(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        epoch_millis(ev, "ts").alias("ms"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    ).select("user_id", F.expr("ms div 86400000").alias("day"), "cents")
    return cohort_ltv(base, "user_id", "day", "cents").orderBy("cohort", "age")


def _q_cohort_ltv_oracle() -> str:
    from fineo_readerator_spark.operators.cohort import cohort_ltv_oracle_sql

    return (
        cohort_ltv_oracle_sql(
            "SELECT user_id, epoch_ms(ts) // 86400000 AS day,"
            " CAST(round(value * 100, 0) AS BIGINT) AS cents FROM events",
            "user_id",
            "day",
            "cents",
        ).rstrip()
        # ordinals: a bare `cohort` is ambiguous to DuckDB's binder (both
        # join sides carry one)
        + "\nORDER BY 1, 2"
    )


def q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration across users (operators.cohort.
    gini_concentration): exact-integer Gini over per-user cents totals —
    whale-vs-long-tail in one row; the global sort runs on user TOTALS,
    never raw events."""
    from fineo_readerator_spark.operators.cohort import gini_concentration

    ev = load(spark, sf_dir, "events")
    base = ev.select(
        "user_id", F.round(F.col("value") * 100, 0).cast("long").alias("cents")
    )
    return gini_concentration(base, "user_id", "cents")


def _q_gini_oracle() -> str:
    from fineo_readerator_spark.operators.cohort import gini_oracle_sql

    return gini_oracle_sql(
        "SELECT user_id, CAST(round(value * 100, 0) AS BIGINT) AS cents"
        " FROM events",
        "user_id",
        "cents",
    )


def q_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences (operators.cohort.diff_in_diff) on event
    revenue-cents per user: treatment = even user_id, post = day ≥ 19738
    (the fixture window's midpoint) — the rollout-causality read.  Four
    exact cell aggregates, one signed half-up division carrying the
    truncate-vs-floor correction on both faces."""
    from fineo_readerator_spark.functions import epoch_millis
    from fineo_readerator_spark.operators.cohort import diff_in_diff

    ev = load(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        epoch_millis(ev, "ts").alias("ms"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    ).select(
        "user_id", F.expr("ms div 86400000").alias("day"), "cents"
    )
    return diff_in_diff(
        base,
        "user_id",
        "day",
        "cents",
        treat_pred=F.col("user_id") % 2 == 0,
        post_pred=F.col("day") >= 19738,
    )


def _q_did_oracle() -> str:
    from fineo_readerator_spark.operators.cohort import diff_in_diff_oracle_sql

    return diff_in_diff_oracle_sql(
        "SELECT user_id, epoch_ms(ts) // 86400000 AS day,"
        " CAST(round(value * 100, 0) AS BIGINT) AS cents FROM events",
        "user_id",
        "cents",
        treat_sql="user_id % 2 = 0",
        post_sql="day >= 19738",
    )


def q_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-segmentation change point per event type (operators.anomaly.
    binary_changepoint): the split of the daily series that maximizes the
    between-segment sum-of-squares reduction — WHERE the level shifted,
    the offline complement to q_cusum_shift's running deviation peak.
    Exact integers end to end (the score compares d²·10⁶ div n₁n₂, a
    never-negative truncating division); one bucket aggregate, then
    |types|×|days|-sized windows."""
    from fineo_readerator_spark.functions import epoch_millis
    from fineo_readerator_spark.operators.anomaly import binary_changepoint

    ev = load(spark, sf_dir, "events")
    series = ev.select(
        "event_type", epoch_millis(ev, "ts").alias("ms")
    ).select(
        "event_type", F.expr("ms div 86400000").alias("day"), F.lit(1).alias("one")
    )
    return binary_changepoint(series, "event_type", "day", "one").orderBy(
        "event_type"
    )


def _q_changepoint_oracle() -> str:
    from fineo_readerator_spark.operators.anomaly import (
        binary_changepoint_oracle_sql,
    )

    return (
        binary_changepoint_oracle_sql(
            "SELECT event_type, epoch_ms(ts) // 86400000 AS day, 1 AS one"
            " FROM events",
            "event_type",
            "day",
            "one",
        ).rstrip()
        + "\nORDER BY event_type"
    )


def q_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition matrix over user event paths (operators.
    transitions.event_transitions): per-user (ts, event_id)-ordered
    next-event pairs, counted and normalized to half-up integer ppm within
    each prev_type — funnel DISCOVERY (vs q_user_funnel's fixed step
    list).  One user-keyed window shuffle; the matrix is |types|² rows."""
    from fineo_readerator_spark.operators.transitions import event_transitions

    return event_transitions(load(spark, sf_dir, "events")).orderBy(
        "prev_type", "next_type"
    )


def _q_transitions_oracle() -> str:
    from fineo_readerator_spark.operators.transitions import (
        event_transitions_oracle_sql,
    )

    return (
        event_transitions_oracle_sql("SELECT * FROM events")
        + " ORDER BY prev_type, next_type"
    )


def q_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third-order user paths (operators.transitions.path_ngrams): every
    3-event window per user rendered 'a>b>c' and counted — path DISCOVERY
    beyond the pairwise transition matrix; one window shuffle, ≤ |types|³
    output rows."""
    from fineo_readerator_spark.operators.transitions import path_ngrams

    return path_ngrams(load(spark, sf_dir, "events"), n=3).orderBy("path")


def _q_event_paths_oracle() -> str:
    from fineo_readerator_spark.operators.transitions import path_ngrams_oracle_sql

    return path_ngrams_oracle_sql("SELECT * FROM events", n=3) + " ORDER BY path"


def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch linear attribution (operators.transitions.
    linear_attribution): each purchase splits 10⁶ ppm of credit equally
    across the same user's non-purchase events in the preceding 24 h —
    user-keyed equi-join with a time-range residual, one per-conversion
    window, |types| output rows."""
    from fineo_readerator_spark.operators.transitions import linear_attribution

    return linear_attribution(
        load(spark, sf_dir, "events"), "purchase", 24 * 3600 * 1000
    ).orderBy("event_type")


def _q_attribution_oracle() -> str:
    from fineo_readerator_spark.operators.transitions import (
        linear_attribution_oracle_sql,
    )

    return (
        linear_attribution_oracle_sql(
            "SELECT * FROM events", "purchase", 24 * 3600 * 1000
        )
        + " ORDER BY event_type"
    )


def q_entity_soundex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution blocked on a PHONETIC key — the one-liner the
    entity_match doctrine promises (functions.phonetic.soundex_key): a
    dirty feed of part mentions (p_name with a trailing typo, ids offset)
    links back to the part table inside soundex(first-word) blocks.
    Spark's side is the native codegen'd ``soundex``; the oracle replays
    it with the fuzz-verified DuckDB replica (this DuckDB ships no
    soundex), so the blocking key itself is oracle-exact.  Soundex of the
    first name word buckets the ~92 TPC-H color words into a few dozen
    codes — blocks stay O(corpus/codes) and the skew gate bounds the
    hottest one."""
    from fineo_readerator_spark.functions.phonetic import soundex_key
    from fineo_readerator_spark.operators.entity import entity_match

    part = load(spark, sf_dir, "part")
    dirty = part.filter(F.col("p_partkey") % 3 == 0).select(
        (F.col("p_partkey") + 9_000_000).alias("mention_id"),
        F.concat(F.col("p_name"), F.lit("x")).alias("mention"),
    )
    dirty = dirty.withColumn("blk", soundex_key(F.expr("split_part(mention, ' ', 1)")))
    ref = part.select(
        "p_partkey",
        "p_name",
        soundex_key(F.expr("split_part(p_name, ' ', 1)")).alias("blk"),
    )
    return entity_match(
        dirty,
        ref,
        ["blk"],
        "mention_id",
        "p_partkey",
        "mention",
        "p_name",
        k=1,
        max_distance=4,
        max_block_rows=500_000,
    ).orderBy("mention_id")


def _q_entity_soundex_oracle() -> str:
    from fineo_readerator_spark.functions.phonetic import soundex_oracle_expr
    from fineo_readerator_spark.operators.entity import entity_match_oracle_sql

    dirty_blk = soundex_oracle_expr("split_part(p_name || 'x', ' ', 1)")
    ref_blk = soundex_oracle_expr("split_part(p_name, ' ', 1)")
    return entity_match_oracle_sql(
        "SELECT p_partkey + 9000000 AS mention_id, p_name || 'x' AS mention,"
        f" {dirty_blk} AS blk FROM part WHERE p_partkey % 3 = 0",
        f"SELECT p_partkey, p_name, {ref_blk} AS blk FROM part",
        ["blk"],
        "mention_id",
        "p_partkey",
        "mention",
        "p_name",
        k=1,
        max_distance=4,
    )


def _q_entity_match_oracle() -> str:
    from fineo_readerator_spark.operators.entity import entity_match_oracle_sql

    blk = "substr(c_name, length(c_name) - 2, 3) AS blk"
    return entity_match_oracle_sql(
        "SELECT c_custkey + 1000000 AS mention_id, lower(c_name) AS mention,"
        f" c_nationkey, {blk} FROM customer WHERE c_custkey % 3 = 0",
        f"SELECT c_custkey, c_name, c_nationkey, {blk} FROM customer",
        ["c_nationkey", "blk"],
        "mention_id",
        "c_custkey",
        "mention",
        "c_name",
        k=1,
        max_distance=5,
    )


def q_cooccur_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-level event-type co-occurrence ranked by integer lift
    (operators.transitions.session_cooccurrence): which event types land
    in the same 30-min user session far above chance — the co-visitation
    primitive behind related-items panels, here run on the behavioral
    stream.  One user-keyed sessionize shuffle; the pair self-join is
    (user, session)-co-partitioned with fanout bounded by the event-type
    vocabulary, and lift is half-up ppm over decimal(38,0) — no floats."""
    from fineo_readerator_spark.operators.transitions import session_cooccurrence

    ev = load(spark, sf_dir, "events")
    ev = ev.select("user_id", epoch_millis(ev, "ts").alias("ts_ms"), "event_type")
    return session_cooccurrence(ev, gap=1_800_000, k=20, min_sessions=2)


def _q_cooccur_lift_oracle() -> str:
    from fineo_readerator_spark.operators.transitions import (
        session_cooccurrence_oracle_sql,
    )

    return session_cooccurrence_oracle_sql(
        "SELECT user_id, epoch_ms(ts) AS ts_ms, event_type FROM events",
        gap=1_800_000,
        k=20,
        min_sessions=2,
    )


def q_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dyadic EWMA trend line over daily event volume (operators.anomaly.
    dyadic_ewma): α=1/2 exponential smoothing with an 8-day cutoff,
    computed in EXACT integers (weights are powers of two, the absent-day
    mass is a constant) — a recursive float EWMA would accumulate in
    engine-specific order and violate the repo's determinism rule.  All
    shuffles are day-keyed; per-day fanout is the constant window."""
    from fineo_readerator_spark.functions import epoch_millis as _em
    from fineo_readerator_spark.operators.anomaly import dyadic_ewma

    ev = load(spark, sf_dir, "events")
    series = ev.select(_em(ev, "ts").alias("ms")).select(
        F.expr("ms div 86400000").alias("day"), F.lit(1).alias("one")
    )
    return dyadic_ewma(series, "day", "one", window=8).orderBy("bucket")


def _q_ewma_smooth_oracle() -> str:
    from fineo_readerator_spark.operators.anomaly import dyadic_ewma_oracle_sql

    return (
        dyadic_ewma_oracle_sql(
            "SELECT epoch_ms(ts) // 86400000 AS day, 1 AS one FROM events",
            "day",
            "one",
            window=8,
        )
        + " ORDER BY bucket"
    )


def q_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery — top-2 customers by account balance per
    nation, written as the per-row subquery a SQL user reaches for before
    learning window functions.  Catalyst DECORRELATES it (the
    DecorrelateInnerQuery rewrite) into the same shuffle-once top-k shape
    as q_window_topn, so supporting the syntax costs nothing at scale;
    balances are exact integer cents (floor·100) on both engines."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("__lat_customer")
    load(spark, sf_dir, "nation").createOrReplaceTempView("__lat_nation")
    return spark.sql(
        """
        SELECT n.n_name, c.c_custkey, c.c_name, c.acctbal_cents
        FROM __lat_nation n,
        LATERAL (
          SELECT c_custkey, c_name,
                 CAST(floor(c_acctbal * 100) AS BIGINT) AS acctbal_cents
          FROM __lat_customer WHERE c_nationkey = n.n_nationkey
          ORDER BY acctbal_cents DESC, c_custkey LIMIT 2
        ) c
        ORDER BY n.n_name, c.acctbal_cents DESC, c.c_custkey
        """
    )


Q_LATERAL_TOPN_ORACLE = """
SELECT n.n_name, c.c_custkey, c.c_name, c.acctbal_cents
FROM nation n,
LATERAL (
  SELECT c_custkey, c_name,
         CAST(floor(c_acctbal * 100) AS BIGINT) AS acctbal_cents
  FROM customer WHERE c_nationkey = n.n_nationkey
  ORDER BY acctbal_cents DESC, c_custkey LIMIT 2
) c
ORDER BY n.n_name, c.acctbal_cents DESC, c.c_custkey
"""


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust daily-volume outlier flags per event type (operators.anomaly.
    mad_outliers): median/MAD with a 50% breakdown point where
    q_anomaly_zscore's mean/σ move with the spike being tested.  Exact
    percentile medians on integer counts (the q_percentiles precedent) and
    a cross-multiplied exact-halves comparison; every pass runs over the
    |types| × |days| bucketed frame, never raw events."""
    from fineo_readerator_spark.functions import epoch_millis
    from fineo_readerator_spark.operators.anomaly import mad_outliers

    ev = load(spark, sf_dir, "events")
    series = ev.select(
        "event_type", epoch_millis(ev, "ts").alias("ms")
    ).select("event_type", F.expr("ms div 86400000").alias("day"), F.lit(1).alias("one"))
    return mad_outliers(series, "event_type", "day", "one").orderBy(
        "event_type", "bucket"
    )


def _q_mad_outliers_oracle() -> str:
    from fineo_readerator_spark.operators.anomaly import mad_outliers_oracle_sql

    return (
        mad_outliers_oracle_sql(
            "SELECT event_type, epoch_ms(ts) // 86400000 AS day, 1 AS one"
            " FROM events",
            "event_type",
            "day",
            "one",
        )
        + " ORDER BY event_type, bucket"
    )


def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of daily event volume (operators.
    anomaly.seasonal_decompose): dyadic-EWMA trend, per-weekday seasonal
    kept in division-free SUM form (a signed integer mean needs a
    negative-rounding convention — both engines truncate natively, so
    half-up formulas go off-by-one on negatives without the dyadic_ewma
    correction; the sum form avoids it), residual as the scaled integer
    detrended·n_phase − season_sum.  One corpus-sized bucket agg; everything after is
    |days|-sized."""
    from fineo_readerator_spark.functions import epoch_millis
    from fineo_readerator_spark.operators.anomaly import seasonal_decompose

    ev = load(spark, sf_dir, "events")
    series = ev.select(epoch_millis(ev, "ts").alias("ms")).select(
        F.expr("ms div 86400000").alias("day"), F.lit(1).alias("one")
    )
    return seasonal_decompose(series, "day", "one", period=7).orderBy("bucket")


def _q_seasonal_decompose_oracle() -> str:
    from fineo_readerator_spark.operators.anomaly import (
        seasonal_decompose_oracle_sql,
    )

    return (
        seasonal_decompose_oracle_sql(
            "SELECT epoch_ms(ts) // 86400000 AS day, 1 AS one FROM events",
            "day",
            "one",
            period=7,
        )
        + " ORDER BY bucket"
    )


def q_convert_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution view→purchase (operators.funnel.
    conversion_latency): per user, first purchase at-or-after the first
    view, summarized as exact integer-millisecond p50/p90 — the latency
    companion to q_user_funnel's conversion counts.  One user-keyed
    conditional-min agg + one user-co-partitioned join; no event
    self-join."""
    from fineo_readerator_spark.functions import epoch_millis
    from fineo_readerator_spark.operators.funnel import conversion_latency

    ev = load(spark, sf_dir, "events")
    ev = ev.select("user_id", "event_type", epoch_millis(ev, "ts").alias("ts_ms"))
    return conversion_latency(ev, "view", "purchase")


def _q_convert_latency_oracle() -> str:
    from fineo_readerator_spark.operators.funnel import (
        conversion_latency_oracle_sql,
    )

    return conversion_latency_oracle_sql(
        "SELECT user_id, event_type, epoch_ms(ts) AS ts_ms FROM events",
        "view",
        "purchase",
    )


def q_trend_slopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS trend over daily volume (operators.anomaly.
    trend_slopes): slope/intercept/R² per type — sustained DIRECTION
    where z-score/CUSUM flag level changes.  Exact HUGEINT/decimal(38,0)
    moments over day-rebased buckets; only the final three stats touch
    doubles, identical op order both engines (the rolling_zscore
    contract)."""
    from fineo_readerator_spark.functions import epoch_millis
    from fineo_readerator_spark.operators.anomaly import trend_slopes

    ev = load(spark, sf_dir, "events")
    series = ev.select("event_type", epoch_millis(ev, "ts").alias("ms")).select(
        "event_type", F.expr("ms div 86400000").alias("day"), F.lit(1).alias("one")
    )
    return trend_slopes(series, "event_type", "day", "one").orderBy("event_type")


def _q_trend_slopes_oracle() -> str:
    from fineo_readerator_spark.operators.anomaly import trend_slopes_oracle_sql

    return (
        trend_slopes_oracle_sql(
            "SELECT event_type, epoch_ms(ts) // 86400000 AS day, 1 AS one"
            " FROM events",
            "event_type",
            "day",
            "one",
        )
        + " ORDER BY event_type"
    )


def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust daily trend per event type (operators.anomaly.
    theil_sen_slopes) beside q_trend_slopes' OLS: median of pairwise
    slopes tolerates ~29% contaminated buckets where one wild day drags
    OLS arbitrarily.  The pair join runs on the |types|×|days| bucketed
    frame, never raw events."""
    from fineo_readerator_spark.functions import epoch_millis
    from fineo_readerator_spark.operators.anomaly import theil_sen_slopes

    ev = load(spark, sf_dir, "events")
    series = ev.select("event_type", epoch_millis(ev, "ts").alias("ms")).select(
        "event_type", F.expr("ms div 86400000").alias("day"), F.lit(1).alias("one")
    )
    return theil_sen_slopes(series, "event_type", "day", "one").orderBy(
        "event_type"
    )


def _q_theil_sen_oracle() -> str:
    from fineo_readerator_spark.operators.anomaly import theil_sen_oracle_sql

    return (
        theil_sen_oracle_sql(
            "SELECT event_type, epoch_ms(ts) // 86400000 AS day, 1 AS one"
            " FROM events",
            "event_type",
            "day",
            "one",
        )
        + " ORDER BY event_type"
    )


RELATIONAL_QUERIES = [
    QueryDef("q1_pricing_summary", q1_pricing_summary, Q1_ORACLE, bench=True),
    QueryDef("q3_shipping_priority", q3_shipping_priority, Q3_ORACLE, bench=True),
    QueryDef("q5_local_supplier", q5_local_supplier, Q5_ORACLE, bench=True),
    QueryDef("q10_returned_items", q10_returned_items, Q10_ORACLE, bench=True),
    QueryDef("q18_large_volume", q18_large_volume, Q18_ORACLE),
    QueryDef("q_json_extract", q_json_extract, Q_JSON_ORACLE),
    QueryDef("q_percentiles", q_percentiles, Q_PERCENTILES_ORACLE),
    QueryDef("q_exists_semi", q_exists_semi, Q_EXISTS_ORACLE),
    QueryDef("q_anti_join", q_anti_join, Q_ANTI_ORACLE),
    QueryDef("q_outer_agg", q_outer_agg, Q_OUTER_ORACLE),
    QueryDef("q_window_topn", q_window_topn, Q_WINDOW_TOPN_ORACLE, bench=True),
    QueryDef("q_window_running", q_window_running, Q_WINDOW_RUNNING_ORACLE),
    QueryDef("q_window_rank_funcs", q_window_rank_funcs, Q_WINDOW_RANK_ORACLE),
    QueryDef("q_distinct_agg", q_distinct_agg, Q_DISTINCT_ORACLE),
    QueryDef("q_grouping_having", q_grouping_having, Q_HAVING_ORACLE),
    QueryDef("q_scalar_funcs", q_scalar_funcs, Q_SCALAR_ORACLE),
    QueryDef("q_setops", q_setops, Q_SETOPS_ORACLE),
    QueryDef("q_rollup", q_rollup, Q_ROLLUP_ORACLE),
    QueryDef("q_gap_fill", q_gap_fill, Q_GAPFILL_ORACLE),
    QueryDef("q_gap_interpolate", q_gap_interpolate, Q_GAP_INTERP_ORACLE),
    QueryDef("q_anomaly_zscore", q_anomaly_zscore, _q_anomaly_oracle()),
    QueryDef("q_retention", q_retention, _q_retention_oracle()),
    QueryDef("q_user_funnel", q_user_funnel, _q_user_funnel_oracle()),
    QueryDef("q_stickiness", q_stickiness, _q_stickiness_oracle()),
    QueryDef("q_ks_drift", q_ks_drift, _q_ks_oracle()),
    QueryDef("q_asof_join", q_asof_join, Q_ASOF_ORACLE),
    QueryDef("q_range_join", q_range_join, Q_RANGE_ORACLE),
    QueryDef("q_date_funcs", q_date_funcs, Q_DATE_ORACLE),
    QueryDef("q_sessionize", q_sessionize, Q_SESSIONIZE_ORACLE),
    QueryDef("q_pivot", q_pivot, Q_PIVOT_ORACLE),
    QueryDef("q_cube", q_cube, Q_CUBE_ORACLE),
    QueryDef("q_entity_match", q_entity_match, _q_entity_match_oracle()),
    QueryDef("q_entity_soundex", q_entity_soundex, _q_entity_soundex_oracle()),
    QueryDef("q_transitions", q_transitions, _q_transitions_oracle(), bench=True),
    QueryDef("q_cusum_shift", q_cusum_shift, _q_cusum_shift_oracle()),
    QueryDef("q_changepoint", q_changepoint, _q_changepoint_oracle(), bench=True),
    QueryDef("q_did", q_did, _q_did_oracle()),
    QueryDef("q_cohort_ltv", q_cohort_ltv, _q_cohort_ltv_oracle()),
    QueryDef("q_gini", q_gini, _q_gini_oracle(), bench=True),
    QueryDef("q_cooccur_lift", q_cooccur_lift, _q_cooccur_lift_oracle(), bench=True),
    QueryDef("q_ewma_smooth", q_ewma_smooth, _q_ewma_smooth_oracle()),
    QueryDef("q_lateral_topn", q_lateral_topn, Q_LATERAL_TOPN_ORACLE),
    QueryDef("q_mad_outliers", q_mad_outliers, _q_mad_outliers_oracle(), bench=True),
    QueryDef("q_seasonal_decompose", q_seasonal_decompose, _q_seasonal_decompose_oracle(), bench=True),
    QueryDef("q_convert_latency", q_convert_latency, _q_convert_latency_oracle()),
    QueryDef("q_trend_slopes", q_trend_slopes, _q_trend_slopes_oracle()),
    QueryDef("q_theil_sen", q_theil_sen, _q_theil_sen_oracle()),
    QueryDef("q_pareto", q_pareto, Q_PARETO_ORACLE),
    QueryDef("q_grouping_sets", q_grouping_sets, Q_GROUPING_SETS_ORACLE),
    QueryDef("q_event_paths", q_event_paths, _q_event_paths_oracle()),
    QueryDef("q_attribution", q_attribution, _q_attribution_oracle()),
]
