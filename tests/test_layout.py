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
