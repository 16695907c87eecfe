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
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(hconf).getContentSummary(p).getLength()


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
    df = spark.read.format(fmt).load(src_path)
    n_files = max(1, math.ceil(_dir_bytes(spark, src_path) / target_bytes))
    if sort_cols:
        out = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(*sort_cols)
    else:
        out = df.repartition(n_files)
    out.write.format(fmt).mode("overwrite").save(dest_path)
    return n_files
