"""As-of join: backward match, ties, tolerance, no-match NULLs."""

from __future__ import annotations

from fineo_readerator_spark.operators.asof import asof_join


def _mk(spark):
    left = spark.createDataFrame(
        [(1, "u1", 100), (2, "u1", 205), (3, "u1", 50), (4, "u2", 100), (5, "u3", 100)],
        "id long, k string, ts long",
    )
    right = spark.createDataFrame(
        [("u1", 100, 1.0), ("u1", 200, 2.0), ("u2", 90, 9.0)], "k string, ts long, v double"
    )
    return left, right


def test_backward_match_and_ties(spark):
    left, right = _mk(spark)
    out = {r.id: (r.ts_right, r.v_right) for r in
           asof_join(left, right, "k", "ts", "ts", ["v"]).collect()}
    assert out[1] == (100, 1.0)   # tie: ts == rts matches
    assert out[2] == (200, 2.0)   # latest of the two earlier rights
    assert out[3] == (None, None)  # nothing at or before ts=50
    assert out[4] == (90, 9.0)
    assert out[5] == (None, None)  # key with no right rows at all


def test_tolerance_window(spark):
    left, right = _mk(spark)
    out = {r.id: (r.ts_right, r.v_right) for r in
           asof_join(left, right, "k", "ts", "ts", ["v"], tolerance=5).collect()}
    assert out[1] == (100, 1.0)  # exact-ts match within tolerance
    assert out[2] == (200, 2.0)  # tolerance is inclusive: 205 - 200 = 5 <= 5
    out4 = {r.id: (r.ts_right, r.v_right) for r in
            asof_join(left, right, "k", "ts", "ts", ["v"], tolerance=4).collect()}
    assert out4[2] == (None, None)  # 205 - 200 = 5 > 4 → dropped


def test_all_left_rows_survive(spark):
    left, right = _mk(spark)
    assert asof_join(left, right, "k", "ts", "ts", ["v"]).count() == left.count()
