"""Unit tests for deterministic sampling, heavy-hitter and batch-session
operators: partition-invariance of hash sampling, per-stratum accounting,
tie-break determinism, and gaps-and-islands session edges."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from fineo_readerator_spark.llm_ops.sampling import (
    _BUCKETS,
    hash_sample,
    ngram_topk,
    stratified_sample,
    topk_frequent,
)
from fineo_readerator_spark.operators.sessionize import session_stats, sessionize_batch


def _py_bucket(key, seed=42) -> int:
    return int(hashlib.md5(f"{seed}|{key}".encode()).hexdigest()[:15], 16) % _BUCKETS


def test_hash_sample_matches_python_and_is_partition_invariant(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    kept = sorted(r.k for r in hash_sample(df, "k", 0.25).collect())
    expected = sorted(k for k in range(2000) if _py_bucket(k) < int(0.25 * _BUCKETS))
    assert kept == expected
    # repartitioning must not change the kept set (df.sample() would)
    kept_repart = sorted(r.k for r in hash_sample(df.repartition(13), "k", 0.25).collect())
    assert kept_repart == kept
    # fraction is approximately honored
    assert 0.2 < len(kept) / 2000 < 0.3


def test_stratified_sample_drops_unlisted_strata(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(400)], "k long, s string"
    )
    out = stratified_sample(df, "s", {"a": 1.0}, "k").collect()
    assert all(r.s == "a" for r in out)
    assert len(out) == 200  # fraction 1.0 keeps the whole stratum


def test_topk_frequent_tie_break(spark):
    rows = [("u1", "x")] * 3 + [("u1", "a")] * 2 + [("u1", "b")] * 2 + [("u1", "c")]
    df = spark.createDataFrame(rows, "u string, item string")
    out = topk_frequent(df, ["u"], "item", 2).orderBy("rank").collect()
    # ties (a=2, b=2) break on item value: a wins rank 2
    assert [(r.item, r.cnt, r.rank) for r in out] == [("x", 3, 1), ("a", 2, 2)]


def test_ngram_topk_counts_document_frequency(spark):
    df = spark.createDataFrame(
        [("w w w w",), ("w w w",)], "text string"
    )  # "w w w" appears twice inside doc 1 but counts once per doc
    out = ngram_topk(df, "text", n=3, k=5).collect()
    assert [(r.ngram, r.cnt) for r in out] == [("w w w", 2)]


def test_sessionize_batch_gap_edges(spark):
    # gap boundary: delta == gap stays in-session, delta > gap starts a new one
    rows = [(1, 0), (1, 100), (1, 101), (1, 250), (2, 0)]
    df = spark.createDataFrame(rows, "k long, ts long")
    out = {
        (r.k, r.ts): r.session_idx
        for r in sessionize_batch(df, "k", "ts", gap=100).collect()
    }
    assert out == {(1, 0): 0, (1, 100): 0, (1, 101): 0, (1, 250): 1, (2, 0): 0}


def test_session_stats_tied_timestamps_one_session(spark):
    rows = [(1, 10), (1, 10), (1, 10), (1, 500)]
    df = spark.createDataFrame(rows, "k long, ts long")
    out = sorted(
        (r.session_idx, r.n_events, r.start_ts, r.end_ts)
        for r in session_stats(df, "k", "ts", gap=100).collect()
    )
    assert out == [(0, 3, 10, 10), (1, 1, 500, 500)]


def test_sessionize_single_shuffle(spark):
    """Both window passes and the session rollup reuse one hash partitioning
    on the key: exactly one Exchange in the whole plan."""
    df = spark.createDataFrame([(1, 10), (1, 20), (2, 5)], "k long, ts long")
    plan = session_stats(df, "k", "ts", gap=100)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_sample_pushes_filter_into_scan(spark, sf_dir, tmp_path):
    # the sampling predicate is a plain projection+filter: no shuffle in plan
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = hash_sample(docs, "doc_id", 0.5)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_train_val_test_split_stable_and_proportional(spark, sf_dir):
    from pyspark.sql import functions as F

    from fineo_readerator_spark.llm_ops.sampling import train_val_test_split

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = train_val_test_split(docs, "doc_id")
    b = train_val_test_split(docs.repartition(13), "doc_id")
    # stable under repartitioning: identical assignment per doc
    assert (
        a.select("doc_id", "split")
        .exceptAll(b.select("doc_id", "split"))
        .count()
        == 0
    )
    counts = {r.split: r.n for r in a.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = sum(counts.values())
    assert 0.6 < counts.get("train", 0) / n < 0.95
    assert counts.get("val", 0) > 0 and counts.get("test", 0) > 0
    # appending rows never reassigns existing ones
    grown = train_val_test_split(
        docs.unionByName(docs.withColumn("doc_id", F.col("doc_id") + 1_000_000)), "doc_id"
    )
    assert (
        grown.filter(F.col("doc_id") < 1_000_000)
        .select("doc_id", "split")
        .exceptAll(a.select("doc_id", "split"))
        .count()
        == 0
    )


def test_train_val_test_split_rejects_bad_fractions(spark, sf_dir):
    import pytest

    from fineo_readerator_spark.llm_ops.sampling import train_val_test_split

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with pytest.raises(ValueError):
        train_val_test_split(docs, "doc_id", fractions=(0.9, 0.2, 0.1))


def test_categorical_drift_psi_semantics(spark):
    import math

    from fineo_readerator_spark.llm_ops.sampling import categorical_drift

    a = spark.createDataFrame([("x",)] * 80 + [("y",)] * 20, "c string")
    b = spark.createDataFrame([("x",)] * 20 + [("y",)] * 70 + [("z",)] * 10, "c string")
    rows = {r.category: r for r in categorical_drift(a, b, "c").collect()}
    assert set(rows) == {"x", "y", "z"}  # union of categories, incl. one-sided
    # identical distributions -> psi ~ 0; here x collapsed 80% -> 20%: big term
    assert rows["x"].psi_term > 0.5
    # smoothing keeps the a-side-absent z finite and positive-signed toward b
    assert math.isfinite(rows["z"].psi_term) and rows["z"].share_a < rows["z"].share_b
    # self-drift is ~zero on every term
    self_rows = categorical_drift(a, a, "c").collect()
    assert all(abs(r.psi_term) < 1e-9 for r in self_rows)


def test_categorical_drift_null_category_is_one_bucket(spark):
    """NULL categories are a real bucket (missing values drifting IS
    drift): the null-safe join must produce ONE NULL row, never two
    spurious one-sided rows that inflate PSI (review r6 finding)."""
    from fineo_readerator_spark.llm_ops.sampling import categorical_drift

    a = spark.createDataFrame([("x",), (None,), (None,)], "c string")
    b = spark.createDataFrame([("x",), (None,)], "c string")
    rows = categorical_drift(a, b, "c").collect()
    cats = [r.category for r in rows]
    assert cats.count(None) == 1 and len(rows) == 2
    null_row = next(r for r in rows if r.category is None)
    # shares reflect BOTH sides of the same bucket (2/3 vs 1/2, smoothed)
    assert null_row.share_a > null_row.share_b > 0
    assert abs(null_row.psi_term) < 0.1  # barely-moved NULL share: small term


def test_windowed_drift_psi_terms(spark):
    """Per-window PSI vs a static baseline: the category grid covers
    window-absent categories, and the baseline total must NOT be inflated
    by the window count (regression: nb was summed over the grid)."""
    import math

    from fineo_readerator_spark.llm_ops.sampling import windowed_drift

    wc = spark.createDataFrame(
        [(0, "a", 8), (0, "b", 2), (1000, "a", 5)],  # window 1000 lacks 'b'
        "window_start long, cat string, n long",
    )
    baseline = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 5, "cat string"
    )
    rows = {(r["window_start"], r["cat"]): r.asDict() for r in
            windowed_drift(wc, baseline, "cat").collect()}
    assert set(rows) == {(0, "a"), (0, "b"), (1000, "a"), (1000, "b")}
    # k=0.5, C=2: window 1000 has na=5; 'b' scores with count 0
    p = (0 + 0.5) / (5 + 0.5 * 2)
    q = (5 + 0.5) / (10 + 0.5 * 2)  # nb=10 (NOT 20 = nb x windows)
    r = rows[(1000, "b")]
    assert r["share_win"] == round(p, 6) and r["share_base"] == round(q, 6)
    assert r["psi_term"] == round((p - q) * math.log(p / q), 6)


def test_quality_resample_buckets_and_fractions(spark):
    from fineo_readerator_spark.llm_ops.sampling import quality_resample

    # 300 rows, scores spread uniformly over [0, 1): terciles land near
    # 1/3 and 2/3 (sketch estimate is at most one 0.02-bin high)
    rows = [(i, (i % 100) / 100.0) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, score double")
    out = quality_resample(df, "score", "doc_id")
    got = {r["doc_id"]: r["bucket"] for r in out.collect()}
    # every head-bucket row is kept (fraction 1.0): reconstruct membership
    heads = [r["doc_id"] for r in out.collect() if r["bucket"] == "head"]
    assert len(heads) >= 90  # ~a third of 300, all kept
    # scores >= ~2/3 are head; scores < ~1/3 that survive are tail
    assert all((d % 100) / 100.0 >= 0.62 for d in heads)
    tails = [d for d, b in got.items() if b == "tail"]
    assert 0 < len(tails) < 100 * 0.25  # ~10% of the tail third survives
    # deterministic: rerun yields the same membership
    again = {r["doc_id"]: r["bucket"] for r in quality_resample(df, "score", "doc_id").collect()}
    assert again == got


def test_quality_resample_validates_fractions(spark):
    import pytest

    from fineo_readerator_spark.llm_ops.sampling import quality_resample

    df = spark.createDataFrame([(1, 0.5)], "doc_id long, score double")
    with pytest.raises(ValueError, match="head/middle/tail"):
        quality_resample(df, "score", "doc_id", fractions={"head": 1.0})


def test_windowed_drift_null_category_is_a_real_bucket(spark):
    """NULL categories must flow through the grid joins (null-safe keys in
    Spark, IS NOT DISTINCT FROM in the oracle) as one real bucket, not
    split into spurious one-sided rows."""
    from fineo_readerator_spark.llm_ops.sampling import windowed_drift

    wc = spark.createDataFrame(
        [(0, None, 4), (0, "a", 6)], "window_start long, cat string, n long"
    )
    baseline = spark.createDataFrame([("a",), (None,), (None,)], "cat string")
    rows = {r["cat"]: r.asDict() for r in windowed_drift(wc, baseline, "cat").collect()}
    assert set(rows) == {None, "a"}
    # NULL bucket: window count 4 of 10, baseline 2 of 3, C=2, k=0.5
    r = rows[None]
    assert r["share_win"] == round((4 + 0.5) / (10 + 1.0), 6)
    assert r["share_base"] == round((2 + 0.5) / (3 + 1.0), 6)


def test_write_jsonl_shards_layout_and_determinism(spark, tmp_path):
    """One gzip'd JSONL file per shard dir, rows key-sorted within a shard,
    valid one-object-per-line JSON, and a re-export under a DIFFERENT input
    partitioning is byte-identical."""
    import gzip
    import json
    from pathlib import Path

    from fineo_readerator_spark.llm_ops.sampling import write_jsonl_shards

    rows = [(i, f"text {i}", f"s{i % 3}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")

    def export(dest, frame):
        write_jsonl_shards(frame, "doc_id", 4, str(dest))
        out = {}
        for d in sorted(Path(dest).glob("shard=*")):
            files = [f for f in d.iterdir() if f.name.endswith(".gz")]
            assert len(files) == 1, f"expected one file in {d.name}"
            out[d.name] = gzip.decompress(files[0].read_bytes())
        return out

    a = export(tmp_path / "a", df)
    assert len(a) == 4
    seen = []
    for payload in a.values():
        ids = [json.loads(line)["doc_id"] for line in payload.decode().splitlines()]
        assert ids == sorted(ids)  # key-sorted within the shard
        seen.extend(ids)
    assert sorted(seen) == list(range(40))  # complete, no dup rows
    b = export(tmp_path / "b", df.repartition(7))
    assert a == b  # byte-identical under a different input partitioning


def test_leakage_safe_split_keeps_clusters_together(spark, sf_dir):
    from pyspark.sql import functions as F

    from fineo_readerator_spark.llm_ops.sampling import leakage_safe_split

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "n_chars"
    )
    # exact twins with UNRELATED ids: a row-hash split strands some pairs
    # on opposite sides; the cluster-keyed split must never
    corpus = docs.unionByName(
        docs.withColumn("doc_id", F.col("doc_id") * 7 + 1_000_001)
    )
    out = leakage_safe_split(corpus, "doc_id").cache()
    # every cluster lands on exactly one side
    assert (
        out.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("s"))
        .filter(F.col("s") > 1)
        .count()
        == 0
    )
    # twins share a cluster, hence a side
    pairs = out.alias("a").join(
        out.alias("b"),
        F.col("a.doc_id") * 7 + 1_000_001 == F.col("b.doc_id"),
    )
    assert pairs.count() > 0
    assert pairs.filter(F.col("a.split") != F.col("b.split")).count() == 0
    # all three sides populated and deterministic under repartitioning
    sides = {r.split for r in out.select("split").distinct().collect()}
    assert sides == {"train", "val", "test"}
    again = leakage_safe_split(corpus.repartition(13), "doc_id")
    assert (
        out.select("doc_id", "split")
        .exceptAll(again.select("doc_id", "split"))
        .count()
        == 0
    )


def test_dsir_select_favors_target_like_docs(spark):
    """With an English target corpus, the English raw doc must outscore the
    German one (its hashed-token ratios are target-heavy), and scores are
    anchored at the ppm scale: a doc of only target-unseen tokens sits
    below 1e6, target-typical tokens above."""
    from fineo_readerator_spark.llm_ops.sampling import dsir_select
    import pytest as _pt

    raw = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "der hund lief schnell davon")],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(10, "the dog sat on the rug"), (11, "the bird sat near the mat")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.score_ppm for r in dsir_select(raw, target, k=10).collect()}
    assert set(rows) == {1, 2}
    assert rows[1] > rows[2]
    with _pt.raises(ValueError, match="n_buckets"):
        dsir_select(raw, target, n_buckets=1)
