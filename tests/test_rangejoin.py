"""Binned point-in-interval join: bin-boundary correctness, half-open ends,
left semantics, brute-force equivalence."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from fineo_readerator_spark.operators.rangejoin import point_in_interval_join


def test_boundaries_and_left(spark):
    points = spark.createDataFrame(
        [(1, "u1", 100), (2, "u1", 149), (3, "u1", 150), (4, "u2", 100)],
        "pid long, k string, ts long",
    )
    ivals = spark.createDataFrame([(10, "u1", 100, 150)], "iid long, k string, s long, e long")
    got = {(r.pid, r.iid) for r in
           point_in_interval_join(points, ivals, "k", "ts", "s", "e", granularity=7).collect()}
    assert got == {(1, 10), (2, 10)}  # start inclusive, end exclusive
    left = point_in_interval_join(points, ivals, "k", "ts", "s", "e", granularity=7, how="left")
    assert left.count() == 4  # unmatched points survive with NULL interval cols


def test_matches_brute_force(spark):
    rng = random.Random(7)
    points = spark.createDataFrame(
        [(i, f"u{rng.randrange(4)}", rng.randrange(0, 1000)) for i in range(200)],
        "pid long, k string, ts long",
    )
    ivals = spark.createDataFrame(
        [
            (i, f"u{rng.randrange(4)}", s, s + rng.randrange(1, 200))
            for i, s in ((i, rng.randrange(0, 1000)) for i in range(60))
        ],
        "iid long, k string, s long, e long",
    )
    for g in (10, 64, 500):
        got = {(r.pid, r.iid) for r in
               point_in_interval_join(points, ivals, "k", "ts", "s", "e", granularity=g).collect()}
        brute = {
            (r.pid, r.iid)
            for r in points.alias("p")
            .join(
                ivals.withColumnRenamed("k", "k2").alias("i"),
                (F.col("k") == F.col("k2")) & (F.col("ts") >= F.col("s")) & (F.col("ts") < F.col("e")),
            )
            .collect()
        }
        assert got == brute, f"granularity={g}"


def test_rejects_bad_inputs(spark):
    df = spark.createDataFrame([(1, "a", 2)], "pid long, k string, ts long")
    iv = spark.createDataFrame([(1, "a", 0, 5)], "pid long, k string, s long, e long")
    with pytest.raises(ValueError):  # colliding non-key column pid
        point_in_interval_join(df, iv, "k", "ts", "s", "e", granularity=10)
    with pytest.raises(ValueError):
        point_in_interval_join(df, iv.withColumnRenamed("pid", "iid"), "k", "ts", "s", "e", granularity=0)
