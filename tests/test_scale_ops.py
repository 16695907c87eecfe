"""Scale-pattern operators: bucketed co-located joins (exchange-free plan)
and salted skew-safe aggregation (identical results to unsalted)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from fineo_readerator_spark.operators.scale import (
    assert_no_exchange_under_join,
    colocated_join,
    salted_agg,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("buckets")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8, str(tmp / "orders"))
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        ["o_orderkey"],
        8,
        str(tmp / "lineitem"),
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    joined = colocated_join(spark, left, right, ["o_orderkey"])
    assert_no_exchange_under_join(joined)
    # and it computes the same thing as the plain join
    plain = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .join(
            spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .count()
    )
    assert joined.count() == plain


def test_salted_agg_matches_unsalted(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    aggs = {
        "sum_qty": ("l_quantity", "sum"),
        "n": ("l_quantity", "count"),
        "min_price": ("l_extendedprice", "min"),
        "max_price": ("l_extendedprice", "max"),
    }
    salted = salted_agg(li, ["l_returnflag"], aggs, salt_buckets=16)
    plain = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.count("l_quantity").alias("n"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )
    got = {r.l_returnflag: (float(r.sum_qty), r.n, r.min_price, r.max_price) for r in salted.collect()}
    exp = {r.l_returnflag: (float(r.sum_qty), r.n, r.min_price, r.max_price) for r in plain.collect()}
    assert got == exp


def test_salted_agg_rejects_non_algebraic(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    with pytest.raises(ValueError):
        salted_agg(li, ["l_returnflag"], {"avg_qty": ("l_quantity", "avg")})


def test_colocated_query_plan_is_exchange_free(spark):
    """The registered q_colocated_join runs its fact-fact join without a
    shuffle on either side (the layout is what the driver exercises)."""
    from fineo_readerator_spark.plans.scale_queries import (
        ensure_bucketed_layout,
    )

    sf = "/root/testdata/sf0.001"
    t_orders, t_lineitem = ensure_bucketed_layout(spark, sf)
    joined = colocated_join(spark, t_orders, t_lineitem, ["o_orderkey"])
    assert_no_exchange_under_join(joined)


def test_bucketed_layout_reattaches_without_rewrite(spark):
    """A fresh session (catalog empty, files fresh) re-registers the layout
    via DDL: same bucket spec, same exchange-free plan, no data rewrite."""
    from fineo_readerator_spark.plans.scale_queries import (
        _layout_root,
        _table_names,
        ensure_bucketed_layout,
        q_colocated_join,
    )

    sf = "/root/testdata/sf0.001"
    ensure_bucketed_layout(spark, sf)  # built (or fresh from a prior test)
    before = sorted(
        (p.name, p.stat().st_mtime_ns)
        for p in _layout_root(sf).rglob("*.parquet")
    )
    # simulate the driver's new session: catalog entries gone, files kept
    for t in _table_names(sf):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    t_orders, t_lineitem = ensure_bucketed_layout(spark, sf)
    after = sorted(
        (p.name, p.stat().st_mtime_ns)
        for p in _layout_root(sf).rglob("*.parquet")
    )
    assert before == after, "re-attach must not rewrite the layout"
    joined = colocated_join(spark, t_orders, t_lineitem, ["o_orderkey"])
    assert_no_exchange_under_join(joined)
    assert q_colocated_join(spark, sf).count() == 5


def test_salted_join_matches_plain_join(spark, sf_dir):
    from fineo_readerator_spark.operators.scale import salted_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    dim = ev.groupBy("event_type").agg(F.avg("value").alias("type_avg"))
    salted = salted_join(ev, dim, ["event_type"], salt_from="event_id")
    plain = ev.join(dim, "event_type")
    assert salted.count() == plain.count()
    got = {
        r.event_type: (r.n, round(r.avg_dev, 6))
        for r in salted.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.avg(F.col("value") - F.col("type_avg")).alias("avg_dev"))
        .collect()
    }
    exp = {
        r.event_type: (r.n, round(r.avg_dev, 6))
        for r in plain.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.avg(F.col("value") - F.col("type_avg")).alias("avg_dev"))
        .collect()
    }
    assert got == exp
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan and "__salt" in plan
    assert "BroadcastHashJoin" not in plan


def test_salted_join_rejects_replicating_outer(spark, sf_dir):
    from fineo_readerator_spark.operators.scale import salted_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    with pytest.raises(ValueError):
        salted_join(ev, ev.limit(5), ["event_type"], salt_from="event_id", how="full")


def test_key_skew_report_values_and_takeordered_plan(spark):
    """Skew diagnostics: shares/ratio from exact counts; the top-k must be
    a TakeOrdered (per-partition heaps), never a global-sort/row_number
    over the full key-count frame."""
    from fineo_readerator_spark.operators.scale import key_skew_report

    rows = [(i, "hot") for i in range(90)] + [(i, f"k{i % 5}") for i in range(10)]
    df = spark.createDataFrame(rows, "id long, key string")
    out = key_skew_report(df, ["key"], k=3)
    got = [(r.key, r.rank, r.n_rows, r.share_ppm) for r in out.collect()]
    assert got[0] == ("hot", 1, 90, 900000)
    top = out.first()
    assert top.n_total == 100 and top.n_keys == 6
    # max/avg = 90 / (100/6) = 5.4 -> 5_400_000 ppm; pure-integer output
    assert top.skew_ratio_ppm == 5_400_000
    assert dict(out.dtypes)["share_ppm"] == "bigint"
    assert dict(out.dtypes)["skew_ratio_ppm"] == "bigint"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrdered" in plan


def test_key_skew_report_half_up_ppm_boundary(spark):
    """r9 determinism fix: ratios are BIGINT ppm via integer half-up
    division — 1 row of 128 is 7812.5 ppm, which must round UP to 7813
    identically in Spark and the DuckDB oracle (truncation would say
    7812; float/DECIMAL arithmetic could render either)."""
    import duckdb
    import pyarrow as pa

    from fineo_readerator_spark.operators.scale import (
        key_skew_oracle_sql,
        key_skew_report,
    )

    keys = ["big"] * 127 + ["small"]
    df = spark.createDataFrame([(i, k) for i, k in enumerate(keys)], "id long, key string")
    out = {r.key: r for r in key_skew_report(df, ["key"], k=2).collect()}
    assert out["small"].share_ppm == 7813  # half-up, not 7812
    assert out["big"].share_ppm == 992188  # 992187.5 -> up
    con = duckdb.connect()
    con.register("corpus", pa.table({"id": list(range(len(keys))), "key": keys}))
    exp = {
        r[0]: r
        for r in con.execute(
            key_skew_oracle_sql("SELECT key FROM corpus", ["key"], k=2)
        ).fetchall()
    }
    for k_ in ("big", "small"):
        assert (out[k_].share_ppm, out[k_].skew_ratio_ppm) == (exp[k_][3], exp[k_][6])


def test_key_skew_report_null_key_parity(spark):
    """Review regression: Spark asc (NULLS FIRST) vs DuckDB ASC (NULLS
    LAST) diverged on a NULL key at the top-k boundary; the oracle now
    pins NULLS FIRST and both engines agree a NULL key is a real bucket."""
    import duckdb
    import pyarrow as pa

    from fineo_readerator_spark.operators.scale import (
        key_skew_oracle_sql,
        key_skew_report,
    )

    keys = [None] * 10 + ["a"] * 10 + ["b"] * 3
    df = spark.createDataFrame([(i, k) for i, k in enumerate(keys)], "id long, key string")
    got = sorted(
        (r.key, r.rank, r.n_rows, r.share_ppm, r.n_total, r.n_keys, r.skew_ratio_ppm)
        for r in key_skew_report(df, ["key"], k=1).collect()
    )
    con = duckdb.connect()
    con.register("corpus", pa.table({"id": list(range(len(keys))), "key": keys}))
    exp = sorted(
        tuple(r)
        for r in con.execute(
            key_skew_oracle_sql("SELECT key FROM corpus", ["key"], k=1)
        ).fetchall()
    )
    assert got == exp and got[0][0] is None  # NULL key wins the tie at rank 1
