"""Layout maintenance: small-file compaction and sort-clustered rewrite.

Streaming sinks and per-batch ingest leave directories of tiny files; at
100 TB that is a listing/open-cost problem (every query pays per-file
overhead) and it defeats parquet row-group statistics.  ``compact``
rewrites a directory into size-targeted files; with ``sort_cols`` it
range-partitions + sorts, so each output file (and each row group inside
it) owns a disjoint slice of the sort key — point/range predicates then
skip whole files via min/max stats instead of scanning everything.  This
is the 1-D analog of z-order clustering; the reference has no equivalent
(its historical layout is produced once by batch ETL), so this extends the
engine for the ingest-heavy pipelines it targets.
"""

from __future__ import annotations

import math
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def _dir_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes under ``path`` in ONE Hadoop FileSystem call
    (``getContentSummary``) — a per-file ``getFileStatus`` loop would be
    thousands of sequential driver round-trips on exactly the
    many-small-files directories this module exists to fix."""
    from fineo_readerator_spark.session import hadoop_fs

    fs, p = hadoop_fs(spark, path)
    return fs.getContentSummary(p).getLength()


def _assert_dest_outside_src(spark: SparkSession, src_path: str, dest_path: str) -> None:
    """``mode('overwrite')`` onto the path a lazy read is still scanning
    either fails mid-write or destroys the source, depending on
    format/committer — refuse up front.  Paths are compared fully
    qualified + normalized through the Hadoop Path machinery so
    ``file:///a/b`` and ``/a/b/`` compare equal."""
    from fineo_readerator_spark.session import hadoop_fs

    src_fs, sp = hadoop_fs(spark, src_path)
    dest_fs, dp = hadoop_fs(spark, dest_path)
    # each path qualifies against its OWN filesystem — qualifying dest with
    # the source fs throws Hadoop's "Wrong FS" on legal cross-fs compactions
    src = str(src_fs.makeQualified(sp))
    dest = str(dest_fs.makeQualified(dp))
    nested = lambda inner, outer: inner == outer or inner.startswith(outer.rstrip("/") + "/")  # noqa: E731
    # overwrite of dest destroys src when either contains the other: dest
    # under src overwrites what the lazy read is scanning; dest as an
    # ANCESTOR of src deletes the whole subtree src lives in
    if nested(dest, src) or nested(src, dest):
        raise ValueError(
            f"dest_path {dest_path!r} and src_path {src_path!r} overlap "
            "(equal, nested, or ancestor): compaction overwrites the "
            "destination while lazily reading the source — write to a "
            "sibling path and swap afterwards"
        )


def compact(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    target_bytes: int = 128 * 1024 * 1024,
    sort_cols: Optional[list[str]] = None,
    fmt: str = "parquet",
) -> int:
    """Rewrite ``src_path`` into ``dest_path`` as ~``target_bytes`` files;
    returns the number of output files requested.

    With ``sort_cols``: ``repartitionByRange`` + ``sortWithinPartitions``
    — one range-shuffle total, yielding globally sorted output where every
    file's [min, max] on the sort key is disjoint from its neighbors'
    (pinned by tests/test_layout.py).  Without: a plain ``repartition``
    (round-robin) that only fixes the file-count problem."""
    _assert_dest_outside_src(spark, src_path, dest_path)
    df = spark.read.format(fmt).load(src_path)
    n_files = max(1, math.ceil(_dir_bytes(spark, src_path) / target_bytes))
    if sort_cols:
        out = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(*sort_cols)
    else:
        out = df.repartition(n_files)
    out.write.format(fmt).mode("overwrite").save(dest_path)
    return n_files


def zorder_column(df: DataFrame, cols: list[str], bits: int = 16):
    """Z-order (Morton) key over ``cols`` as a Catalyst column: each column
    scales to a ``bits``-bit integer against its driver-collected min/max
    (one aggregate job, metadata-sized result), and the bit-interleave is a
    codegen'd sum of shift terms — no UDF, no Python per row.

    Sorting by this key clusters rows so every output file covers a narrow
    range of EVERY participating column — the multi-dimensional version of
    the 1-D sort-clustered rewrite, for tables filtered on more than one
    column (tenant + time, label + id).  Interleaving from the HIGH bit
    down makes the key's prefix alternate dimensions, which is what gives
    all columns balanced locality.  Returns ``None`` for an empty input
    (no bounds to scale against); ``len(cols) * bits`` must fit in the 63
    value bits of a signed long."""
    from pyspark.sql import functions as F

    if len(cols) * bits > 63:
        raise ValueError(
            f"z-order key needs {len(cols) * bits} bits but a signed long "
            f"holds 63: bit 63 flips the sign (mis-sorting those rows first) "
            f"and higher shifts wrap; use bits <= {63 // len(cols)} for "
            f"{len(cols)} columns"
        )
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__mn_{c}"), F.max(c).alias(f"__mx_{c}")]
    b = df.agg(*aggs).first()
    top = (1 << bits) - 1
    # an all-NULL column carries zero skipping information — drop IT, not
    # the whole key (conflating "one blind column" with "empty input" would
    # silently lose clustering on the populated columns too)
    live = [c for c in cols if b[f"__mn_{c}"] is not None]
    if not live:
        return None  # empty input (or all columns NULL): no meaningful key
    scaled = []
    for c in live:
        mn, mx = float(b[f"__mn_{c}"]), float(b[f"__mx_{c}"])
        if not (math.isfinite(mn) and math.isfinite(mx)):
            raise ValueError(
                f"z-order column {c!r} has non-finite bounds ({mn}, {mx}); "
                "filter NaN/inf rows before clustering"
            )
        span = (mx - mn) or 1.0
        scaled.append(
            f"CAST(least(greatest((CAST({c} AS DOUBLE) - {mn!r}) / {span!r}, 0.0D), 1.0D)"
            f" * {top} AS BIGINT)"
        )
    n = len(live)
    terms = []
    for i in range(bits):  # bit i of each column -> interleaved position
        for j, s in enumerate(scaled):
            terms.append(f"shiftleft(shiftright({s}, {i}) & 1L, {i * n + j})")
    return F.expr("(" + " + ".join(terms) + ")")


def compact_zorder(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    zorder_cols: list[str],
    target_bytes: int = 128 * 1024 * 1024,
    bits: int = 16,
    fmt: str = "parquet",
) -> int:
    """Like ``compact(..., sort_cols=...)`` but clustered on the Morton key
    of several columns: one range exchange on the z-key, then an in-file
    sort, so parquet min/max stats skip files for predicates on ANY of the
    participating columns."""
    _assert_dest_outside_src(spark, src_path, dest_path)
    df = spark.read.format(fmt).load(src_path)
    n_files = max(1, math.ceil(_dir_bytes(spark, src_path) / target_bytes))
    z = zorder_column(df, zorder_cols, bits)
    if z is None:  # empty source: nothing to cluster, plain rewrite
        out = df.repartition(n_files)
    else:
        out = (
            df.withColumn("__z", z)
            .repartitionByRange(n_files, "__z")
            .sortWithinPartitions("__z")
            .drop("__z")
        )
    out.write.format(fmt).mode("overwrite").save(dest_path)
    return n_files
