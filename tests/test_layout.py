"""Compaction + sort-clustered rewrite: file-count reduction and the
min/max disjointness that makes parquet stats skipping work."""

from __future__ import annotations

from pathlib import Path

import pyarrow.parquet as pq

from fineo_readerator_spark.operators.layout import compact


def _parquet_files(path: str) -> list[Path]:
    return sorted(p for p in Path(path).glob("*.parquet") if p.stat().st_size > 0)


def test_compact_reduces_files_and_sorts_disjoint(spark, sf_dir, tmp_path):
    frag = str(tmp_path / "frag")
    out = str(tmp_path / "compact")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    events.repartition(64).write.parquet(frag)
    assert len(_parquet_files(frag)) == 64

    compact(spark, frag, out, target_bytes=64 * 1024, sort_cols=["user_id"])
    files = _parquet_files(out)
    assert 1 < len(files) < 64

    # every output file owns a DISJOINT user_id slice (range partitioning +
    # in-file sort): parquet min/max stats then skip whole files for
    # point/range predicates
    spans = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index("user_id")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        spans.append((min(mins), max(maxs)))
    spans.sort()
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi <= lo, f"overlapping file spans: {spans}"

    # content unchanged
    assert spark.read.parquet(out).count() == events.count()

    # and the selective read pushes its filter to the pruned scan
    plan = (
        spark.read.parquet(out)
        .filter("user_id = 42")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(user_id), EqualTo(user_id,42)" in plan


def test_compact_unsorted_only_fixes_file_count(spark, sf_dir, tmp_path):
    frag = str(tmp_path / "frag2")
    out = str(tmp_path / "compact2")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev.repartition(32).write.parquet(frag)
    n = compact(spark, frag, out, target_bytes=10 * 1024 * 1024)
    assert n == 1 and len(_parquet_files(out)) == 1
    assert spark.read.parquet(out).count() == ev.count()


def test_zorder_compaction_narrows_both_dimensions(spark, sf_dir, tmp_path):
    from fineo_readerator_spark.operators.layout import compact_zorder

    frag = str(tmp_path / "zfrag")
    out = str(tmp_path / "zout")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev.repartition(32).write.parquet(frag)
    compact_zorder(spark, frag, out, ["user_id", "event_id"], target_bytes=8 * 1024)
    files = _parquet_files(out)
    assert len(files) > 3
    assert spark.read.parquet(out).count() == ev.count()

    g = ev.agg({"user_id": "max", "event_id": "max"}).first()
    gmin = ev.agg({"user_id": "min", "event_id": "min"}).first()
    spans = {"user_id": [], "event_id": []}
    for f in files:
        md = pq.ParquetFile(f).metadata
        for col in spans:
            idx = md.schema.names.index(col)
            st = md.row_group(0).column(idx).statistics
            mn, mx = st.min, st.max
            for rg in range(1, md.num_row_groups):
                s2 = md.row_group(rg).column(idx).statistics
                mn, mx = min(mn, s2.min), max(mx, s2.max)
            spans[col].append(mx - mn)
    for col, gspan in (
        ("user_id", g["max(user_id)"] - gmin["min(user_id)"]),
        ("event_id", g["max(event_id)"] - gmin["min(event_id)"]),
    ):
        avg_span = sum(spans[col]) / len(spans[col])
        # every file covering the full range would give ratio 1.0; z-order
        # must narrow BOTH dimensions at once (1-D sort narrows only one)
        assert avg_span / gspan < 0.65, (col, avg_span, gspan)


def test_zorder_rejects_key_overflow_and_handles_empty(spark, tmp_path):
    import pytest

    from fineo_readerator_spark.operators.layout import compact_zorder, zorder_column

    df = spark.createDataFrame([(1, 2, 3, 4)], "a long, b long, c long, d long")
    with pytest.raises(ValueError, match="63"):
        zorder_column(df, ["a", "b", "c", "d"], bits=16)  # 64 bits: sign flip
    assert zorder_column(df, ["a", "b", "c", "d"], bits=15) is not None

    # empty source: plain rewrite, no crash
    src, dst = str(tmp_path / "esrc"), str(tmp_path / "edst")
    spark.createDataFrame([], "a long, b long").write.parquet(src)
    compact_zorder(spark, src, dst, ["a", "b"])
    assert spark.read.parquet(dst).count() == 0


def test_zorder_drops_all_null_column_keeps_the_rest(spark):
    from fineo_readerator_spark.operators.layout import zorder_column

    df = spark.createDataFrame(
        [(1, None), (2, None), (9, None)], "a long, b long"
    )
    z = zorder_column(df, ["a", "b"])
    assert z is not None  # b is blind, a still clusters
    vals = [r[0] for r in df.select(z).collect()]
    assert vals == sorted(vals) or sorted(vals) == sorted(set(vals))  # monotone in a
    all_null = spark.createDataFrame([(None, None)], "a long, b long")
    assert zorder_column(all_null, ["a", "b"]) is None


def test_compact_refuses_dest_equal_or_under_src(spark, sf_dir, tmp_path):
    import pytest

    from fineo_readerator_spark.operators.layout import compact, compact_zorder

    src = str(tmp_path / "src")
    spark.range(10).write.parquet(src)
    # equal, trailing-slash-equal, file://-qualified-equal, nested dests,
    # and dest as an ANCESTOR of src (overwriting the parent deletes src too)
    for dest in (src, src + "/", f"file://{src}", src + "/compacted", str(tmp_path)):
        with pytest.raises(ValueError, match="overlap"):
            compact(spark, src, dest)
        with pytest.raises(ValueError, match="overlap"):
            compact_zorder(spark, src, dest, ["id"], bits=8)
    # a sibling whose name shares the prefix is NOT nested
    assert compact(spark, src, src + "_out") >= 1


def test_zorder_key_matches_duckdb_replica(spark):
    """The Morton-key arithmetic (driver-collected double bounds, IEEE
    scaling, truncating cast, shift interleave) must replay exactly in the
    oracle's SQL form — fuzzed over random two-column integer frames."""
    import random

    import duckdb
    import pandas as pd

    from fineo_readerator_spark.operators.layout import zorder_column

    rng = random.Random(17)
    for bits in (8, 16):
        rows = [
            (i, rng.randint(-1000, 10_000), rng.randint(0, 500))
            for i in range(200)
        ]
        df = spark.createDataFrame(rows, "id long, a long, b long")
        zk = zorder_column(df, ["a", "b"], bits=bits)
        got = {r.id: r.z for r in df.withColumn("z", zk).select("id", "z").collect()}
        top = (1 << bits) - 1
        scaled = {
            c: (
                f"CAST(trunc(least(greatest((CAST({c} AS DOUBLE) - mn_{c})"
                f" / (CASE WHEN mx_{c} = mn_{c} THEN 1.0 ELSE mx_{c} - mn_{c} END),"
                f" 0.0), 1.0) * {top}) AS BIGINT)"
            )
            for c in ("a", "b")
        }
        terms = " + ".join(
            f"(((s{j} >> {i}) & 1) << {i * 2 + jx})"
            for i in range(bits)
            for jx, j in enumerate(("a", "b"))
        )
        con = duckdb.connect()
        con.register("t", pd.DataFrame(rows, columns=["id", "a", "b"]))
        sql = f"""
WITH bnd AS (
  SELECT CAST(min(a) AS DOUBLE) AS mn_a, CAST(max(a) AS DOUBLE) AS mx_a,
         CAST(min(b) AS DOUBLE) AS mn_b, CAST(max(b) AS DOUBLE) AS mx_b
  FROM t
),
sc AS (SELECT id, {scaled['a']} AS sa, {scaled['b']} AS sb FROM t CROSS JOIN bnd)
SELECT id, {terms} AS z
FROM sc
"""
        exp = dict(con.execute(sql).fetchall())
        assert got == exp
