"""Unit semantics for the time-series operators: gap fill (LOCF +
linear interpolation), rolling z-score anomaly flags, cohort retention.
Oracle parity at query level runs in test_oracle_parity; these pin the
hand-computable edge semantics the oracles can't isolate."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from fineo_readerator_spark.operators.anomaly import rolling_zscore
from fineo_readerator_spark.operators.cohort import retention_matrix
from fineo_readerator_spark.operators.gapfill import gap_fill


def _t(h):
    return dt.datetime(2024, 1, 1, h, 0, 0)


def test_gap_fill_locf_and_interp_golden(spark):
    # key 'a': observations at hours 0 (val 10.0) and 4 (val 20.0) with a
    # 3-bucket gap to fill; key 'b' has a single observation so every other
    # bucket exercises the before-first / after-last edges
    df = spark.createDataFrame(
        [
            ("a", _t(0), 1, 10.0),
            ("a", _t(4), 2, 20.0),
            ("b", _t(1), 3, 7.0),
        ],
        "k string, bucket timestamp_ntz, n long, val double",
    )
    out = gap_fill(
        df, "bucket", ("k",), fill_cols=("val",), step="1 hour",
        count_col="n", interp_cols=("val",),
    )
    rows = {(r["k"], r["bucket"].hour): r for r in out.collect()}
    # global spine: hours 0..4 for both keys
    assert len(rows) == 10
    # gap rows: n coalesced to 0, original val NULL, locf carries, interp lerps
    g = rows[("a", 2)]
    assert g["is_gap"] and g["n"] == 0 and g["val"] is None
    assert g["val_locf"] == 10.0
    assert g["val_interp"] == pytest.approx(15.0)  # halfway between 10 and 20
    assert rows[("a", 1)]["val_interp"] == pytest.approx(12.5)
    # observed rows echo their own value
    assert rows[("a", 0)]["val_interp"] == 10.0 and not rows[("a", 0)]["is_gap"]
    # key b: before-first interp NULL, after-last interp NULL but locf holds
    assert rows[("b", 0)]["val_interp"] is None
    assert rows[("b", 0)]["val_locf"] is None
    assert rows[("b", 3)]["val_interp"] is None
    assert rows[("b", 3)]["val_locf"] == 7.0


def test_gap_fill_validates_inputs(spark):
    df = spark.createDataFrame(
        [("a", _t(0), 1)], "k string, bucket timestamp_ntz, n long"
    )
    with pytest.raises(ValueError, match="key column"):
        gap_fill(df, "bucket", (), count_col="n")
    # no fill/count columns is fine: dense spine + is_gap alone is useful
    bare = gap_fill(df, "bucket", ("k",))
    assert {r["is_gap"] for r in bare.collect()} == {False}


def test_gap_fill_observed_null_value_is_not_a_gap(spark):
    """Review regression: is_gap must be observation-based — an input row
    whose measure is NULL is an observed bucket, not a gap (the old probe
    on fill_cols[0] misclassified it)."""
    df = spark.createDataFrame(
        [("a", _t(0), 1.0), ("a", _t(1), None), ("a", _t(3), 4.0)],
        "k string, bucket timestamp_ntz, val double",
    )
    rows = {r["bucket"].hour: r for r in
            gap_fill(df, "bucket", ("k",), fill_cols=("val",)).collect()}
    assert rows[1]["is_gap"] is False   # observed, value just NULL
    assert rows[2]["is_gap"] is True    # genuinely absent
    assert rows[1]["val_locf"] == 1.0   # LOCF still skips the NULL value


def test_rolling_zscore_constant_and_spike(spark):
    # 13 buckets of 5 then a spike of 50: trailing window of the spike is
    # constant → stddev 0 → z NULL → not flagged; then a second spike over
    # a now-varying window IS flagged
    hr = lambda h: dt.datetime(2024, 1, 1) + dt.timedelta(hours=h)  # noqa: E731
    rows = [("a", hr(h), 5) for h in range(13)]
    rows.append(("a", hr(13), 50))
    rows += [("a", hr(14 + i), 5) for i in range(11)]
    rows.append(("a", hr(25), 50))
    df = spark.createDataFrame(rows, "k string, bucket timestamp_ntz, n long")
    out = {r["bucket"]: r for r in rolling_zscore(
        df, "n", "bucket", ("k",), window=24, min_periods=12, z_thresh=3.0
    ).collect()}
    first_spike = out[hr(13)]
    assert first_spike["z"] is None and first_spike["is_anomaly"] is False
    second_spike = out[hr(25)]
    assert second_spike["z"] is not None and second_spike["is_anomaly"]
    # warm-up rows (fewer than min_periods trailing) are unflagged NULLs
    assert out[_t(3)]["z"] is None and out[_t(3)]["is_anomaly"] is False


def test_rolling_zscore_validates_params(spark):
    df = spark.createDataFrame([("a", _t(0), 1)],
                               "k string, bucket timestamp_ntz, n long")
    with pytest.raises(ValueError, match="window"):
        rolling_zscore(df, "n", "bucket", ("k",), window=1)
    with pytest.raises(ValueError, match="min_periods"):
        rolling_zscore(df, "n", "bucket", ("k",), window=24, min_periods=30)


def test_retention_matrix_golden(spark):
    # u1 first seen day1, returns day2+day4; u2 first day1 only;
    # u3 first day2, returns day4 (offset 2)
    d = lambda n: dt.datetime(2024, 1, n)  # noqa: E731
    df = spark.createDataFrame(
        [(1, d(1)), (1, d(2)), (1, d(4)), (2, d(1)), (3, d(2)), (3, d(4)),
         (1, d(2))],  # duplicate activity row must not double-count
        "user_id long, bucket timestamp_ntz",
    )
    got = {(r["cohort"].day, r["bucket_offset"]):
           (r["n_active"], r["n_cohort"], r["retention"])
           for r in retention_matrix(df, "user_id", "bucket").collect()}
    assert got[(1, 0)] == (2, 2, 1.0)
    assert got[(1, 1)] == (1, 2, 0.5)
    assert got[(1, 3)] == (1, 2, 0.5)
    assert got[(2, 0)] == (1, 1, 1.0)
    assert got[(2, 2)] == (1, 1, 1.0)
    assert (1, 2) not in got  # no day-3 activity from cohort 1


def test_retention_matrix_off_grid_weekly_matches_oracle(spark):
    # off-grid returns (day diffs NOT multiples of granularity_days) are
    # where trunc-vs-round cast semantics diverge across engines: day-11
    # return at weekly granularity is 11/7 = 1.571 — floor must give 1 on
    # BOTH engines (DuckDB's CAST(double AS INT) alone would round to 2)
    import duckdb

    from fineo_readerator_spark.operators.cohort import retention_oracle_sql

    d = lambda n: dt.datetime(2024, 1, n)  # noqa: E731
    rows = [(1, d(1)), (1, d(12)), (2, d(1)), (2, d(4)), (3, d(2)), (3, d(25))]
    df = spark.createDataFrame(rows, "user_id long, bucket timestamp_ntz")
    got = sorted(
        (r["cohort"], r["bucket_offset"], r["n_active"], r["n_cohort"],
         r["retention"])
        for r in retention_matrix(df, "user_id", "bucket",
                                  granularity_days=7).collect()
    )
    assert (d(1), 1, 1, 2, 0.5) in got  # day-11 diff → floor(11/7) = 1
    con = duckdb.connect()
    vals = ", ".join(f"({u}, TIMESTAMP '{t:%Y-%m-%d %H:%M:%S}')"
                     for u, t in rows)
    sql = retention_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) t(user_id, ts)",
        bucket_expr="CAST(date_trunc('day', ts) AS TIMESTAMP)",
        granularity_days=7,
    )
    oracle = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == oracle


def test_retention_matrix_validates(spark):
    df = spark.createDataFrame([(1, _t(0))],
                               "user_id long, bucket timestamp_ntz")
    with pytest.raises(ValueError, match="granularity_days"):
        retention_matrix(df, "user_id", "bucket", granularity_days=0)


def test_ordered_funnel_enforces_order(spark):
    """u1 converts fully; u2 clicked BEFORE viewing (click must not count);
    u3 views only.  Conversions are ratios of the ordered counts."""
    from fineo_readerator_spark.operators.funnel import ordered_funnel

    rows = [
        (1, "view", 100), (1, "click", 200), (1, "purchase", 300),
        (2, "click", 100), (2, "view", 200), (2, "purchase", 300),
        (3, "view", 100),
        (4, "signup", 50),  # never in the funnel: counted in n_users only
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts_ms long")
    r = ordered_funnel(df, ["view", "click", "purchase"]).collect()[0]
    assert (r["n_users"], r["n_view"], r["n_click"], r["n_purchase"]) == (4, 3, 1, 1)
    # u2's purchase follows no ordered click -> only u1 purchases
    assert r["conv_click"] == pytest.approx(1 / 3, abs=1e-6)
    assert r["conv_purchase"] == 1.0


def test_ordered_funnel_same_timestamp_counts(spark):
    """ts >= t_prev: a step landing at the SAME millisecond as the previous
    milestone converts (the reference semantics of 'at or after')."""
    from fineo_readerator_spark.operators.funnel import ordered_funnel

    df = spark.createDataFrame(
        [(1, "view", 100), (1, "click", 100)],
        "user_id long, event_type string, ts_ms long",
    )
    r = ordered_funnel(df, ["view", "click"]).collect()[0]
    assert r["n_click"] == 1 and r["conv_click"] == 1.0


def test_ordered_funnel_validates(spark):
    from fineo_readerator_spark.operators.funnel import ordered_funnel

    df = spark.createDataFrame([(1, "view", 1)],
                               "user_id long, event_type string, ts_ms long")
    with pytest.raises(ValueError, match="at least 2"):
        ordered_funnel(df, ["view"])
    with pytest.raises(ValueError, match="distinct"):
        ordered_funnel(df, ["view", "view"])


def test_ks_statistic_bounds(spark):
    """Identical distributions → 0; disjoint supports → 1; NULLs ignored."""
    from fineo_readerator_spark.llm_ops.sampling import ks_statistic

    same = spark.createDataFrame(
        [("a", float(v)) for v in (1, 2, 3)] + [("b", float(v)) for v in (1, 2, 3)]
        + [("a", None), ("c", 9.0)],
        "g string, v double",
    )
    r = ks_statistic(same, "v", "g", "a", "b").collect()[0]
    assert (r["n_a"], r["n_b"], r["ks_stat"]) == (3, 3, 0.0)
    disjoint = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 10.0), ("b", 11.0)], "g string, v double"
    )
    r = ks_statistic(disjoint, "v", "g", "a", "b").collect()[0]
    assert r["ks_stat"] == 1.0
    with pytest.raises(ValueError, match="bin_width"):
        ks_statistic(same, "v", "g", "a", "b", bin_width=0)


def test_ks_statistic_empty_group_is_null_not_crash(spark):
    """Review regression: an empty comparison group returned DIVIDE_BY_ZERO
    under ANSI mode; it must report NULL ks_stat with exact counts."""
    from fineo_readerator_spark.llm_ops.sampling import ks_statistic

    df = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "g string, v double")
    r = ks_statistic(df, "v", "g", "a", "b").collect()[0]
    assert (r["n_a"], r["n_b"], r["ks_stat"]) == (2, 0, None)


def test_kmv_null_keys_excluded(spark):
    """Review regression: NULL keys occupied a top-k slot on the Spark side
    (NULLS FIRST) but not in DuckDB (NULLS LAST), inflating the estimate;
    contract is count-distinct semantics — NULLs excluded."""
    from fineo_readerator_spark.llm_ops.sketches import kmv_distinct

    rows = [(f"t{i}",) for i in range(10)] + [(None,)]
    df = spark.createDataFrame(rows, "text string")
    r = kmv_distinct(df, F.col("text"), k=4).collect()[0]
    assert r["n_kept"] == 4  # the NULL never entered the sketch
    exact = kmv_distinct(df, F.col("text"), k=64).collect()[0]
    assert (exact["n_kept"], exact["est_distinct"]) == (10, 10.0)


def test_stickiness_golden(spark):
    """u1 active days 1+2, u2 day 1 only, window 2: day1 DAU=2 WAU=2;
    day2 DAU=1 (u1) but WAU=2 (u2's day-1 activity supports day 2)."""
    from fineo_readerator_spark.operators.cohort import stickiness

    d = lambda n: dt.datetime(2024, 1, n)  # noqa: E731
    df = spark.createDataFrame(
        [(1, d(1)), (1, d(2)), (2, d(1)), (1, d(1))],  # dup row ignored
        "user_id long, bucket timestamp_ntz",
    )
    got = {r["bucket"].day: (r["dau"], r["wau"], r["stickiness"])
           for r in stickiness(df, window_days=2).collect()}
    assert got[1] == (2, 2, 1.0)
    assert got[2] == (1, 2, 0.5)
    assert set(got) == {1, 2}  # day 3 has no same-day activity: absent
    with pytest.raises(ValueError, match="window_days"):
        stickiness(df, window_days=0)


def test_mad_outliers_hand_values(spark):
    """Group 'b' (counts 1..6 then 100): med=4, MAD=2, only the spike
    crosses 3*MAD.  Group 'a' (constant 5s + one spike) has MAD=0 and must
    flag NOTHING — the zero-MAD guard, where a z-score would flag all."""
    from fineo_readerator_spark.operators.anomaly import mad_outliers

    rows = [("a", d, 5) for d in range(6)] + [("a", 6, 50)]
    rows += [("b", d, d + 1) for d in range(6)] + [("b", 6, 100)]
    df = spark.createDataFrame(rows, "g string, day long, v long")
    out = mad_outliers(df, "g", "day", "v").collect()
    flagged = {(r.g, r.bucket) for r in out if r.is_outlier}
    assert flagged == {("b", 6)}
    b6 = next(r for r in out if r.g == "b" and r.bucket == 6)
    assert (b6.med, b6.mad) == (4.0, 2.0)
    a_rows = [r for r in out if r.g == "a"]
    assert all(r.mad == 0.0 and not r.is_outlier for r in a_rows)


def test_dyadic_ewma_fuzz_vs_python(spark):
    """Random gappy integer series through dyadic_ewma must match a direct
    Python evaluation of the dyadic weight formula (exact integers end to
    end, so equality is exact)."""
    import random

    from fineo_readerator_spark.operators.anomaly import dyadic_ewma

    rng = random.Random(7)
    for trial in range(6):
        w = rng.choice([1, 2, 5, 8])
        days = sorted(rng.sample(range(0, 40), rng.randint(1, 12)))
        # negative values included: half-up is floor((2n+d)/2d), and the
        # Spark face's truncate-vs-floor correction must match Python //
        # (r9 ADVICE find — bare decimal `div` diverged for negative sums)
        vals = {d: rng.randint(-1000, 1000) for d in days}
        rows = [(d, v) for d, v in vals.items()]
        df = spark.createDataFrame(rows, "day long, one long")
        got = {r.bucket: (r.n, r.ewma_milli)
               for r in dyadic_ewma(df, "day", "one", window=w).collect()}
        denom = (1 << w) - 1
        exp = {}
        for d in days:
            swv = sum(
                vals.get(d - off, 0) * (1 << (w - 1 - off)) for off in range(w)
            )
            exp[d] = (vals[d], (swv * 2000 + denom) // (denom * 2))
        assert got == exp, f"trial {trial} window {w}"


def test_mad_outliers_fuzz_vs_python(spark):
    """Random grouped series through mad_outliers must match a direct
    Python median/MAD evaluation (statistics.median interpolates at even
    counts exactly like percentile/quantile_cont on integer inputs)."""
    import random
    import statistics

    from fineo_readerator_spark.operators.anomaly import mad_outliers

    rng = random.Random(11)
    for trial in range(3):
        rows = []
        model = {}
        for g in ("a", "b", "c")[: rng.randint(1, 3)]:
            days = sorted(rng.sample(range(0, 30), rng.randint(1, 9)))
            vals = {d: rng.randint(0, 50) for d in days}
            model[g] = vals
            rows += [(g, d, v) for d, v in vals.items()]
        df = spark.createDataFrame(rows, "g string, day long, v long")
        got = {(r.g, r.bucket): (r.v, r.med, r.mad, r.is_outlier)
               for r in mad_outliers(df, "g", "day", "v").collect()}
        exp = {}
        for g, vals in model.items():
            med = float(statistics.median(vals.values()))
            mad = float(statistics.median(abs(v - med) for v in vals.values()))
            for d, v in vals.items():
                flag = mad > 0 and abs(v - med) * 2 > 6 * mad
                exp[(g, d)] = (v, med, mad, flag)
        assert got == exp, f"trial {trial}"


def test_seasonal_decompose_reconstruction(spark):
    """Per-phase identities: residual_scaled sums to 0 within each phase
    (the classical zero-mean-residual property, exact in the scaled
    integer form), and detrended = v*1000 - trend everywhere; period gate
    raises."""
    import random

    import pytest as _pt

    from fineo_readerator_spark.operators.anomaly import seasonal_decompose

    rng = random.Random(3)
    rows = [(d, 10 + (d % 7) * 3 + rng.randint(0, 2)) for d in range(21)]
    df = spark.createDataFrame(rows, "day long, one long")
    out = seasonal_decompose(df, "day", "one", period=7).collect()
    assert len(out) == 21
    from collections import defaultdict

    per_phase = defaultdict(int)
    for r in out:
        assert r.detrended_milli == r.n * 1000 - r.trend_milli
        per_phase[r.phase] += r.residual_scaled
    assert all(v == 0 for v in per_phase.values())
    with _pt.raises(ValueError, match="period"):
        seasonal_decompose(df, "day", "one", period=1)


def test_conversion_latency_hand_values(spark):
    """User 1 converts 100ms after first view (a later purchase is
    ignored); user 2's purchase BEFORE the view doesn't count, the one
    after does; user 3 never converts."""
    from fineo_readerator_spark.operators.funnel import conversion_latency

    rows = [
        (1, "view", 1000), (1, "purchase", 1100), (1, "purchase", 5000),
        (2, "purchase", 500), (2, "view", 2000), (2, "purchase", 2400),
        (3, "view", 10), (3, "click", 20),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts_ms long")
    r = conversion_latency(df, "view", "purchase").collect()[0]
    assert r.n_converted == 2
    assert (r.p50_ms, r.max_ms) == (250.0, 400)


def test_trend_slopes_hand_values(spark):
    """Group 'up' is exactly y = 2x + 3 (slope 2, intercept 3 at the
    rebased first day, R^2 = 1); group 'flat' is constant (slope 0, R^2
    NULL: zero y-variance); group 'one' has a single bucket (all NULL)."""
    from fineo_readerator_spark.operators.anomaly import trend_slopes

    rows = (
        [("up", 100 + d, 3 + 2 * d) for d in range(5)]
        + [("flat", 200 + d, 7) for d in range(4)]
        + [("one", 300, 9)]
    )
    df = spark.createDataFrame(rows, "g string, day long, v long")
    out = {r.g: r for r in trend_slopes(df, "g", "day", "v").collect()}
    up = out["up"]
    assert (up.slope, up.intercept, up.r2) == (2.0, 3.0, 1.0)
    flat = out["flat"]
    assert (flat.slope, flat.intercept, flat.r2) == (0.0, 7.0, None)
    one = out["one"]
    assert (one.slope, one.intercept, one.r2) == (None, None, None)
    assert one.n_buckets == 1


def test_theil_sen_resists_outlier_where_ols_drifts(spark):
    """y = 2x with one wild bucket: Theil-Sen stays exactly 2.0 while the
    OLS slope drifts away — the robustness contract, plus n_pairs =
    C(n, 2)."""
    from fineo_readerator_spark.operators.anomaly import theil_sen_slopes, trend_slopes

    rows = [("a", d, 2 * d + 1) for d in range(9)] + [("a", 9, 500)]
    df = spark.createDataFrame(rows, "g string, day long, v long")
    ts = theil_sen_slopes(df, "g", "day", "v").collect()[0]
    assert ts.n_pairs == 45
    assert ts.ts_slope == 2.0
    ols = trend_slopes(df, "g", "day", "v").collect()[0]
    assert abs(ols.slope - 2.0) > 5  # the wild point dragged OLS far off


def test_dyadic_ewma_negative_sums_match_oracle_and_floor(spark):
    """r10 regression (ADVICE find, corrected): for NEGATIVE bucket sums the
    half-up formula floor((2n+d)/2d) needs FLOOR division, but BOTH engines
    truncate toward zero natively (Spark decimal `div` AND DuckDB `//` —
    empirically verified; the advisory had DuckDB's semantics inverted), so
    an exact value like -235 at window=1 rendered -234999 milli instead of
    -235000 on both faces.  Both now carry an explicit trunc-vs-floor
    correction; this pins spark == duckdb == python-floor on a negative
    series including the exact-integer edge."""
    import duckdb

    from fineo_readerator_spark.operators.anomaly import (
        dyadic_ewma,
        dyadic_ewma_oracle_sql,
    )

    rows = [(0, -235), (1, -7), (2, 3), (5, -500), (6, 499)]
    for w in (1, 2, 8):
        df = spark.createDataFrame(rows, "day long, one long")
        got = sorted(
            (r.bucket, r.n, r.ewma_milli)
            for r in dyadic_ewma(df, "day", "one", window=w).collect()
        )
        con = duckdb.connect()
        vals = ", ".join(f"({d}, {v})" for d, v in rows)
        sql = dyadic_ewma_oracle_sql(
            f"SELECT * FROM (VALUES {vals}) t(day, one)", "day", "one", w
        )
        oracle = sorted(tuple(r) for r in con.execute(sql).fetchall())
        assert got == oracle, f"window {w}: spark vs duckdb"
        denom = (1 << w) - 1
        vmap = dict(rows)
        model = sorted(
            (
                d,
                vmap[d],
                (
                    sum(vmap.get(d - off, 0) * (1 << (w - 1 - off)) for off in range(w))
                    * 2000
                    + denom
                )
                // (denom * 2),
            )
            for d in vmap
        )
        assert got == model, f"window {w}: spark vs python floor"
    # the motivating exact-integer edge: window=1 is the identity line
    w1 = {b: m for b, _, m in sorted(
        (r.bucket, r.n, r.ewma_milli)
        for r in dyadic_ewma(
            spark.createDataFrame(rows, "day long, one long"), "day", "one", window=1
        ).collect()
    )}
    assert w1[0] == -235000


def test_theil_sen_bucket_cardinality_gate(spark):
    """r10 gate (verdict task): the Theil–Sen pair join is |buckets|²/group
    — an over-bucketed frame (e.g. second-granularity over months) must
    refuse with the observed cardinality instead of silently building
    billions of pairs; a frame inside the bound still computes."""
    from fineo_readerator_spark.operators.anomaly import theil_sen_slopes

    rows = [("a", b, b * 2) for b in range(30)]
    df = spark.createDataFrame(rows, "g string, day long, v long")
    ok = theil_sen_slopes(df, "g", "day", "v").collect()
    assert ok[0].n_pairs == 30 * 29 // 2 and ok[0].ts_slope == 2.0

    with pytest.raises(ValueError, match=r"30 buckets.*max_buckets_per_group=10"):
        theil_sen_slopes(df, "g", "day", "v", max_buckets_per_group=10).collect()
    with pytest.raises(ValueError, match="must be >= 2"):
        theil_sen_slopes(df, "g", "day", "v", max_buckets_per_group=1)


def test_binary_changepoint_hand_step(spark):
    """Group 'a': 5 days at 10 then 5 days at 100 — the split must land
    after day 4 (t=5) with exact segment sums; group 'b' has a single
    bucket (no candidate split) and must be absent."""
    from fineo_readerator_spark.operators.anomaly import binary_changepoint

    rows = [("a", d, 10) for d in range(5)] + [("a", d, 100) for d in range(5, 10)]
    rows += [("b", 0, 7)]
    df = spark.createDataFrame(rows, "g string, day long, v long")
    out = {r.g: r for r in binary_changepoint(df, "g", "day", "v").collect()}
    assert set(out) == {"a"}
    a = out["a"]
    assert (a.split_bucket, a.n_left, a.n_right) == (4, 5, 5)
    assert (a.left_sum, a.right_sum) == (50, 500)
    # score = d^2*1e6 div (n1*n2), d = 50*5 - 500*5 = -2250
    assert a.score_scaled == (2250 * 2250 * 1_000_000) // 25


def test_binary_changepoint_tie_breaks_earliest(spark):
    # a flat series scores 0 at every split: earliest split must win
    from fineo_readerator_spark.operators.anomaly import binary_changepoint

    df = spark.createDataFrame(
        [("a", d, 5) for d in range(4)], "g string, day long, v long"
    )
    r = binary_changepoint(df, "g", "day", "v").collect()[0]
    assert (r.split_bucket, r.score_scaled) == (0, 0)


def test_diff_in_diff_hand_values(spark):
    """Treatment rises 10 -> 30 (+20), control 10 -> 15 (+5): DiD = +15
    (15000 milli); flipping the periods gives exactly -15000, pinning the
    signed floor-corrected division; a missing cell yields zero rows."""
    from fineo_readerator_spark.operators.cohort import diff_in_diff

    rows = [
        (1, 0, 10), (1, 1, 30),   # treated unit
        (2, 0, 10), (2, 1, 15),   # control unit
    ]
    df = spark.createDataFrame(rows, "user_id long, day long, v long")
    out = diff_in_diff(
        df, "user_id", "day", "v",
        treat_pred=F.col("user_id") == 1,
        post_pred=F.col("day") == 1,
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.treat_post_sum, r.treat_pre_sum, r.ctrl_post_sum, r.ctrl_pre_sum) == (30, 10, 15, 10)
    assert r.did_milli == 15000
    flipped = diff_in_diff(
        df, "user_id", "day", "v",
        treat_pred=F.col("user_id") == 1,
        post_pred=F.col("day") == 0,
    ).collect()[0]
    assert flipped.did_milli == -15000
    # missing control-pre cell -> effect undefined -> zero rows
    nocell = diff_in_diff(
        df.filter(~((F.col("user_id") == 2) & (F.col("day") == 0))),
        "user_id", "day", "v",
        treat_pred=F.col("user_id") == 1,
        post_pred=F.col("day") == 1,
    )
    assert nocell.count() == 0


def test_diff_in_diff_negative_fraction_floor(spark):
    """A DiD of -5/3 must render half-up as -1667 milli on BOTH faces —
    without the floor correction both engines' truncating division gives
    -1666 (the dyadic_ewma off-by-one, signed-path regression)."""
    import duckdb

    from fineo_readerator_spark.operators.cohort import (
        diff_in_diff,
        diff_in_diff_oracle_sql,
    )

    # treated: 0 -> -5 over 3 units each period... construct simply:
    # treated units average -5/3 post, 0 pre; control flat 0
    rows = [(u, 0, 0) for u in (1, 2, 3)] + [(1, 1, -5), (2, 1, 0), (3, 1, 0)]
    rows += [(10, 0, 0), (10, 1, 0)]
    df = spark.createDataFrame(rows, "user_id long, day long, v long")
    got = diff_in_diff(
        df, "user_id", "day", "v",
        treat_pred=F.col("user_id") < 10,
        post_pred=F.col("day") == 1,
    ).collect()[0]
    assert got.did_milli == -1667  # half-up(-5000/3) toward -inf at halves? exact: -1666.67 -> -1667
    con = duckdb.connect()
    vals = ", ".join(f"({u}, {d}, {v})" for u, d, v in rows)
    oracle = con.sql(
        diff_in_diff_oracle_sql(
            f"SELECT * FROM (VALUES {vals}) t(user_id, day, v)",
            "user_id", "v", "user_id < 10", "day = 1",
        )
    ).fetchall()[0]
    assert tuple(got) == tuple(oracle)


def test_cohort_ltv_hand_values(spark):
    """Two users cohort on day 0 (one churns), one on day 1: the day-0
    cohort's curve accumulates 10 -> 40 over ages 0/1 with per-unit milli
    5000 -> 20000; the day-1 cohort is its own curve."""
    from fineo_readerator_spark.operators.cohort import cohort_ltv

    rows = [(1, 0, 10), (1, 1, 30), (2, 0, 0), (3, 1, 7)]
    df = spark.createDataFrame(rows, "user_id long, day long, v long")
    out = {(r.cohort, r.age): r for r in
           cohort_ltv(df, "user_id", "day", "v").collect()}
    assert (out[(0, 0)].cum_value, out[(0, 0)].n_cohort,
            out[(0, 0)].cum_per_unit_milli) == (10, 2, 5000)
    assert (out[(0, 1)].bucket_value, out[(0, 1)].cum_value,
            out[(0, 1)].cum_per_unit_milli) == (30, 40, 20000)
    assert (out[(1, 0)].cum_value, out[(1, 0)].n_cohort) == (7, 1)


def test_cohort_ltv_negative_half_up(spark):
    """r11 find: the LTV numerator cum_v*2000 + n is SIGNED; without the
    floor correction both engines rendered -1/3 as -332 milli instead of
    half-up -333, and the exact -5/2 = -2500 as -2499.  Pin both."""
    from fineo_readerator_spark.operators.cohort import cohort_ltv

    # cohort of 3, cum_v = -1 at age 0 -> half-up(-333.33) = -333
    rows = [(u, 0, v) for u, v in [("a", -1), ("b", 0), ("c", 0)]]
    r = cohort_ltv(
        spark.createDataFrame(rows, "u string, day long, v long"),
        "u", "day", "v",
    ).collect()[0]
    assert (r.n_cohort, r.cum_value, r.cum_per_unit_milli) == (3, -1, -333)

    # cohort of 2, cum_v = -5 -> EXACT -2500 (truncation gave -2499)
    rows = [("a", 0, -2), ("b", 0, -3)]
    r = cohort_ltv(
        spark.createDataFrame(rows, "u string, day long, v long"),
        "u", "day", "v",
    ).collect()[0]
    assert r.cum_per_unit_milli == -2500


def test_gini_concentration_hand_values(spark):
    """Equal totals -> gini 0; one whale holding everything -> (n-1)/n;
    negative totals are excluded and counted."""
    from fineo_readerator_spark.operators.cohort import gini_concentration

    eq = spark.createDataFrame([(u, 5) for u in range(4)], "u long, v long")
    r = gini_concentration(eq, "u", "v").collect()[0]
    assert (r.n_units, r.gini_milli, r.n_excluded) == (4, 0, 0)

    whale = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (4, 100)], "u long, v long"
    )
    r = gini_concentration(whale, "u", "v").collect()[0]
    assert r.gini_milli == 750  # (n-1)/n = 3/4

    mixed = spark.createDataFrame([(1, 5), (2, 5), (3, -2)], "u long, v long")
    r = gini_concentration(mixed, "u", "v").collect()[0]
    assert (r.n_units, r.n_excluded, r.gini_milli) == (2, 1, 0)


def test_gini_rank_is_distributed(spark):
    """r10 verdict task #5: the Σi·x_i rank must never be a
    single-partition global sort over the unit frame.  Pin (a) the plan —
    the unit frame goes through rangepartitioning, and the only
    SinglePartition exchange feeds the bounded per-partition-offset
    window (≤ |shuffle partitions| rows) / final one-row aggregate, never
    a Sort over unit rows — and (b) exactness across many range
    partitions against a local computation."""
    import pyspark.sql.functions as F
    from fineo_readerator_spark.operators.cohort import gini_concentration

    wide = spark.range(20_000).select(
        F.col("id").alias("u"), (F.col("id") % 97).cast("long").alias("v")
    )
    out = gini_concentration(wide, "u", "v")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    # the unit-frame sort must happen INSIDE the range exchange; any plan
    # text before the rangepartitioning marker sorting on x would be the
    # old global single-partition window
    assert "Sort [x" not in plan.split("rangepartitioning")[0], (
        "unit-frame sort must happen inside the range exchange, not globally"
    )
    # exactness over many partitions
    got = out.collect()[0]
    per = {u: (u % 97) for u in range(20_000)}
    pos = sorted((x, u) for u, x in per.items())
    n, tot = len(pos), sum(x for x, _ in pos)
    iwx = sum((i + 1) * x for i, (x, _) in enumerate(pos))
    exp = ((2 * iwx - (n + 1) * tot) * 2000 + n * tot) // (n * tot * 2)
    assert (got.n_units, got.total, got.gini_milli) == (n, tot, exp)
