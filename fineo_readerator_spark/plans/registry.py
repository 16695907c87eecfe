"""Query registry plumbing shared by the driver-contract query modules."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

from fineo_readerator_spark.session import ensure_io_confs


@dataclass
class QueryDef:
    """One driver-checkable query: a Spark builder plus (when the semantics
    are SQL-expressible) a DuckDB oracle over the same parquet tables.

    Column names/aliases MUST match between the two — the driver sorts
    columns by name before hashing values.
    """

    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str] = None
    # headline queries run in bench.py
    bench: bool = False


def source_fingerprint(sf_dir: str, table: str) -> str:
    """Identity of a driver table's parquet on disk: resolved path plus
    per-file (name, size, mtime).  Snapshot caches embed this so a
    regenerated fixture at the same path rebuilds the cache instead of
    serving stale data, and two sf dirs sharing a basename can never serve
    each other's snapshot."""
    import hashlib
    from pathlib import Path

    src = Path(sf_dir).resolve() / f"{table}.parquet"
    h = hashlib.sha1(str(src).encode())
    files = [src] if src.is_file() else (sorted(src.rglob("*")) if src.exists() else [])
    for f in files:
        if f.is_file():
            st = f.stat()
            h.update(f"{f.name}:{st.st_size}:{st.st_mtime_ns};".encode())
    return h.hexdigest()


def snapshot_is_fresh(path, fingerprint: str) -> bool:
    """True when the snapshot at ``path`` was built from sources matching
    ``fingerprint`` (the stamp is written LAST, so it doubles as the
    build-completed marker)."""
    import json
    from pathlib import Path

    try:
        meta = json.loads((Path(path) / "_src_fingerprint.json").read_text())
        return meta.get("fingerprint") == fingerprint
    except (OSError, ValueError):
        return False


def stamp_snapshot(path, fingerprint: str) -> None:
    import json
    from pathlib import Path

    (Path(path) / "_src_fingerprint.json").write_text(
        json.dumps({"fingerprint": fingerprint})
    )


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read a driver table, normalizing time columns to TIMESTAMP_NTZ.

    The driver's fixtures have shipped time columns in two physical shapes
    across generations (TIMESTAMP(MICROS) → TIMESTAMP_NTZ today; rounds 1-2
    TIMESTAMP(NANOS), readable only as epoch-nanos longs under the
    nanosAsLong legacy conf).  Queries compare these columns against
    ``timestamp_ntz`` literals, so a long-typed generation is normalized
    here — one cast folded into the scan projection — instead of breaking
    every comparison site (the round-3 failure mode, VERDICT r3 #1)."""
    ensure_io_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    time_cols = {
        "events": ["ts"],
        "orders": ["o_orderdate"],
        "lineitem": ["l_shipdate", "l_commitdate", "l_receiptdate"],
    }.get(table, [])
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    for c in time_cols:
        if c in df.columns and isinstance(df.schema[c].dataType, T.LongType):
            # epoch-nanos long -> micros -> TIMESTAMP, then NTZ (UTC session
            # tz makes the wall-clock identical to what DuckDB reads)
            df = df.withColumn(
                c, F.timestamp_micros(F.expr(f"{c} div 1000")).cast("timestamp_ntz")
            )
    return df
