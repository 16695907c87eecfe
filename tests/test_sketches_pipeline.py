"""Sketches (HLL, Bloom, Count-Min) and pipeline-prep operators
(chunking, packing, stratified-k, domain mix, decontamination)."""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F

from fineo_readerator_spark.llm_ops.sketches import (
    bloom_build,
    bloom_probe,
    countmin_build,
    countmin_estimate,
    hll_estimate,
)
from fineo_readerator_spark.llm_ops.sampling import (
    domain_mix,
    pack_sequences,
    stratified_fixed_k,
)
from fineo_readerator_spark.llm_ops.textstats import (
    chunk_documents,
    contamination_pairs,
)


@pytest.fixture(scope="module")
def keys(spark):
    return spark.range(0, 2000).select(F.concat(F.lit("k"), F.col("id")).alias("k"))


def test_hll_estimate_within_tolerance(spark, keys):
    row = hll_estimate(keys, F.col("k")).collect()[0]
    # m=128 registers -> ~9% standard error; allow 3 sigma
    assert abs(row["est_distinct"] - 2000) / 2000 < 0.3
    assert row["registers_set"] <= 128


def test_hll_is_duplicate_insensitive(spark, keys):
    doubled = keys.unionAll(keys)
    a = hll_estimate(keys, F.col("k")).collect()[0]["est_distinct"]
    b = hll_estimate(doubled, F.col("k")).collect()[0]["est_distinct"]
    assert a == b


def test_bloom_no_false_negatives(spark):
    blocked = spark.createDataFrame([("alpha",), ("beta",), ("gamma",)], "k string")
    bloom = bloom_build(blocked, F.col("k"))
    probe = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma"), (4, "delta"), (5, "zzz")], "id long, k string"
    )
    out = {r["id"]: r["bloom_maybe"] for r in bloom_probe(probe, "id", F.col("k"), bloom).collect()}
    assert out[1] and out[2] and out[3]  # members always hit
    # non-members MAY false-positive but with 3 keys in 1024 bits they won't
    assert not out[4] and not out[5]


def test_bloom_empty_blocklist_rejects_everything(spark):
    bloom = bloom_build(spark.createDataFrame([], "k string"), F.col("k"))
    probe = spark.createDataFrame([(1, "x")], "id long, k string")
    assert bloom_probe(probe, "id", F.col("k"), bloom).collect()[0]["bloom_maybe"] is False


def test_countmin_overestimates_only(spark):
    df = spark.createDataFrame(
        [("a",)] * 100 + [("b",)] * 10 + [("c",)] * 1, "k string"
    )
    sketch = countmin_build(df, F.col("k"))
    est = {
        r["k"]: r["est_count"]
        for r in countmin_estimate(sketch, df.distinct(), "k").collect()
    }
    assert est["a"] >= 100 and est["b"] >= 10 and est["c"] >= 1
    # 3 keys in 4x512 cells: collisions are essentially impossible
    assert est == {"a": 100, "b": 10, "c": 1}


def test_chunk_documents_reconstructs_text(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(100))), (2, "one two"), (3, "")],
        "doc_id long, text string",
    )
    out = chunk_documents(df, chunk_tokens=10, stride=10)  # non-overlapping
    rows = sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk_tokens"], r["chunk_text"])
        for r in out.collect()
    )
    doc1 = [r for r in rows if r[0] == 1]
    assert len(doc1) == 10 and all(r[2] == 10 for r in doc1)
    assert " ".join(r[3] for r in doc1) == " ".join(f"w{i}" for i in range(100))
    assert [r[2] for r in rows if r[0] == 2] == [2]
    # empty doc still yields one (empty) chunk, never disappears
    assert [r[2] for r in rows if r[0] == 3] == [0]


def test_chunk_overlap_stride(spark):
    df = spark.createDataFrame([(1, " ".join("abcde"))], "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=3, stride=2).collect()
    texts = {r["chunk_idx"]: r["chunk_text"] for r in out}
    assert texts == {0: "a b c", 1: "c d e", 2: "e"}


def test_pack_sequences_overflow_bound(spark):
    df = spark.createDataFrame(
        [(i, "s", 30) for i in range(10)], "doc_id long, source string, n_tokens long"
    )
    out = pack_sequences(df, "doc_id", "n_tokens", budget=100, part_cols=["source"])
    bins = (
        out.groupBy("bin_id").agg(F.sum("n_tokens").alias("t")).orderBy("bin_id").collect()
    )
    # greedy fill: docs never split; a bin overflows by at most one doc
    assert all(r["t"] < 100 + 30 for r in bins)
    assert out.count() == 10  # no doc lost


def test_stratified_fixed_k_exact_count_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(90)], "doc_id long, source string"
    )
    out = stratified_fixed_k(df, ["source"], "doc_id", k=5)
    got = out.groupBy("source").count().collect()
    assert {r["source"]: r["count"] for r in got} == {"s0": 5, "s1": 5, "s2": 5}
    # repartitioning must not change the kept set
    ids1 = sorted(r["doc_id"] for r in out.collect())
    ids2 = sorted(
        r["doc_id"]
        for r in stratified_fixed_k(df.repartition(7), ["source"], "doc_id", k=5).collect()
    )
    assert ids1 == ids2


def test_stratified_k_partial_topk_before_shuffle(spark):
    """Skew-safety pin: the rank filter must compile to a map-side
    WindowGroupLimit BELOW the exchange, so a single giant stratum shuffles
    at most k rows per map partition (not the whole stratum)."""
    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(90)], "doc_id long, source string"
    )
    out = stratified_fixed_k(df, ["source"], "doc_id", k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    pre_exchange = plan.split("Exchange", 1)[-1]
    assert "WindowGroupLimit" in pre_exchange


def test_weighted_stratified_k_favors_heavy_rows(spark):
    """A-ES weighted sampling: exactly k per stratum, deterministic under
    repartitioning, heavy rows win far more often than light ones, and
    NULL/non-positive weights are excluded."""
    from fineo_readerator_spark.llm_ops.sampling import weighted_stratified_k

    # 100 light rows (w=1) + 10 heavy rows (w=1000) in one stratum
    rows = [(i, "s", 1.0) for i in range(100)] + [
        (100 + i, "s", 1000.0) for i in range(10)
    ]
    rows += [(990, "s", None), (991, "s", 0.0), (992, "s", -3.0)]
    df = spark.createDataFrame(rows, "doc_id long, source string, w double")
    out = weighted_stratified_k(df, ["source"], "doc_id", "w", k=8)
    ids = sorted(r["doc_id"] for r in out.collect())
    assert len(ids) == 8 and not {990, 991, 992} & set(ids)
    heavy = sum(1 for i in ids if 100 <= i < 110)
    assert heavy >= 6  # 10 heavy rows carry ~99% of the total weight
    ids2 = sorted(
        r["doc_id"]
        for r in weighted_stratified_k(
            df.repartition(7), ["source"], "doc_id", "w", k=8
        ).collect()
    )
    assert ids == ids2
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan.split("Exchange", 1)[-1]


def test_k_anonymize_suppresses_rare_combos(spark):
    """Rows in quasi-identifier groups under k vanish; survivors carry the
    group size; NULL attribute values form a real group (null-safe join)."""
    from fineo_readerator_spark.llm_ops.sampling import k_anonymize

    rows = [(i, "en", "web") for i in range(10)]
    rows += [(100, "en", "rare"), (101, "de", None), (102, "de", None), (103, "de", None)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, src string")
    out = k_anonymize(df, ["lang", "src"], k=3)
    got = {r.doc_id: r.qi_group_n for r in out.collect()}
    assert 100 not in got  # singleton combo suppressed
    assert all(got[i] == 10 for i in range(10))
    assert got[101] == 3 and got[103] == 3  # NULL src group counted + kept
    # no count window in the plan: the group count must be a partial-agg
    # groupBy joined back, not a single-reducer window
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_domain_mix_hits_targets(spark):
    df = spark.createDataFrame(
        [(i, f"s{i % 2}") for i in range(1000)], "doc_id long, source string"
    )
    out = domain_mix(df, "source", "doc_id", {"s0": 0.8, "s1": 0.2}, total=100)
    counts = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    # hash sampling is binomial around the target: 80 and 20 within wide bands
    assert 55 <= counts["s0"] <= 105 and 8 <= counts["s1"] <= 35
    # absent strata are dropped entirely
    out2 = domain_mix(df, "source", "doc_id", {"s0": 1.0}, total=100)
    assert out2.filter(F.col("source") == "s1").count() == 0


def test_contamination_finds_planted_overlap(spark):
    base = " ".join(f"tok{i}" for i in range(60))
    train = spark.createDataFrame(
        [(1, base), (2, "completely different words " * 10)], "doc_id long, text string"
    )
    eval_df = spark.createDataFrame(
        [(100, " ".join(f"tok{i}" for i in range(40)))], "doc_id long, text string"
    )
    pairs = contamination_pairs(train, eval_df, min_shared=3).collect()
    assert [(r["train_id"], r["eval_id"]) for r in pairs] == [(1, 100)]
    assert pairs[0]["n_shared"] >= 3


def test_bloom_member_sql_no_false_negatives_and_selective(spark, sf_dir):
    from pyspark.sql import functions as F

    from fineo_readerator_spark.llm_ops.sketches import bloom_member_sql, bloom_words

    cust = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    words = bloom_words(cust, F.col("c_custkey"))
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    passed = orders.filter(F.expr(bloom_member_sql(words, "o_custkey")))
    true_match = orders.join(cust, orders.o_custkey == cust.c_custkey)
    n_orders, n_passed, n_true = orders.count(), passed.count(), true_match.count()
    # no false negatives: every truly-matching order passes the filter
    assert passed.join(cust, passed.o_custkey == cust.c_custkey).count() == n_true
    # selective: the filter kills a meaningful share of non-matching rows
    assert n_true <= n_passed < n_orders


def test_hll_rolling_merge_semantics(spark):
    """Rolling merge must equal the single-shot estimate over the same
    window: day 2's 3-day rolling registers = registers of days 0..2
    merged, so the estimates agree exactly; a bucket with no preceding
    days equals its own per-day estimate."""
    from pyspark.sql import functions as F

    from fineo_readerator_spark.llm_ops.sketches import (
        hll_estimate,
        hll_rolling,
    )

    rows = [(d, f"u{d}_{i}") for d in (0, 1, 2) for i in range(40 * (d + 1))]
    df = spark.createDataFrame(rows, "day long, k string")
    roll = {r.day: r.est_distinct
            for r in hll_rolling(df, F.col("k"), "day", window=3).collect()}
    assert set(roll) == {0, 1, 2}
    # day 2 window covers everything: must equal the global estimate
    glob = hll_estimate(df, F.col("k")).collect()[0].est_distinct
    assert roll[2] == glob
    # day 0 has no history: equals its own single-day estimate
    d0 = hll_estimate(df.filter("day = 0"), F.col("k")).collect()[0].est_distinct
    assert roll[0] == d0

    import pytest as _pt

    with _pt.raises(ValueError, match="window"):
        hll_rolling(df, F.col("k"), "day", window=0)


def test_quantile_sketch_audit_hand_values(spark):
    """Values 1..100, width 10: the 50th value (50) lands in bin 5, so the
    p50 estimate is that bin's upper edge 60.0 vs exact interpolated 50.5
    -> err 9.5 (the one-sided ≤width overshoot the audit prices); p90:
    value 90 -> bin 9 -> est 100.0 vs exact 90.1."""
    from fineo_readerator_spark.llm_ops.sketches import quantile_sketch_audit

    df = spark.range(1, 101).selectExpr("cast(id as double) as value")
    out = {r.q: r for r in quantile_sketch_audit(
        df, "value", width=10.0, quantiles=(0.5, 0.9)
    ).collect()}
    assert out[0.5].n_rows == 100
    assert (out[0.5].est, out[0.5].exact_p, out[0.5].err) == (60.0, 50.5, 9.5)
    assert (out[0.9].est, out[0.9].exact_p, out[0.9].err) == (100.0, 90.1, 9.9)
