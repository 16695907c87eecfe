"""Sequential driver-window replay: run a whole round's 50-query window in
ONE vanilla SparkSession, in driver order, comparing each result against its
DuckDB oracle — the shared-session conditions the per-query harness
(scripts/verify_oracles.py) can't reproduce.

Exists because CORRECTNESS_r07 flagged q_skew_report hash-red while every
standalone replay (all SFs, bit-exact floats, vanilla session) matched: if a
query's result can drift when it runs mid-window after 30+ other queries in
the same JVM (cached relations, GC'd checkpoint blocks, accumulated session
state), only a sequential replay of the exact window shows it.

Usage:
    python scripts/verify_window.py                    # current first-50 window
    python scripts/verify_window.py CORRECTNESS_r07.json   # replay a recorded window
    python scripts/verify_window.py --all              # every registry query, in order
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

import __spark_entry__ as entry_mod
from fineo_readerator_spark.oracle_compare import kind_mismatches

WINDOW = 50


def window_names(argv: list[str], qs: dict) -> list[str]:
    """The ordered query-name window to replay: a recorded round's
    CORRECTNESS json (its key order IS the driver's execution order),
    --all, or the registry's current first-50 (what the NEXT driver
    snapshot will run)."""
    if argv and argv[0] == "--all":
        return list(qs)
    if argv:
        with open(argv[0]) as f:
            recorded = list(json.load(f))
        missing = [n for n in recorded if n not in qs]
        if missing:
            print(f"WARNING: recorded names no longer in registry: {missing}")
        return [n for n in recorded if n in qs]
    return list(qs)[:WINDOW]


def main() -> int:
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    names = window_names(sys.argv[1:], qs)
    print(f"replaying {len(names)} queries sequentially in one session")

    # deliberately vanilla: no engine confs, mirroring the driver's harness
    spark = (
        SparkSession.builder.appName("verify-window")
        .master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "12g")
        .getOrCreate()
    )

    import duckdb

    con = duckdb.connect()
    sf = "/root/testdata/sf0.01"
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    bad = 0
    for i, name in enumerate(names, 1):
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf)
            scols = sorted(sdf.columns)
            got = sorted(tuple(str(r[c]) for c in scols) for r in sdf.collect())
        except Exception as e:  # noqa: BLE001 — report and keep replaying
            print(f"[{i:2}/{len(names)}] {name}: SPARK-ERROR "
                  f"{type(e).__name__}: {str(e)[:200]}")
            bad += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"[{i:2}/{len(names)}] {name}: rows-only ({len(got)} rows, {dt:.1f}s)")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols, dtypes = list(rel.columns), list(rel.types)
            rows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"[{i:2}/{len(names)}] {name}: ORACLE-ERROR {str(e)[:200]}")
            bad += 1
            continue
        if sorted(dcols) != scols:
            print(f"[{i:2}/{len(names)}] {name}: COLUMN-NAME MISMATCH "
                  f"spark={scols} oracle={sorted(dcols)}")
            bad += 1
            continue
        tmis = kind_mismatches(sdf.schema, dcols, dtypes)
        if tmis:
            print(f"[{i:2}/{len(names)}] {name}: TYPE-MISMATCH {tmis}")
            bad += 1
            continue
        idx = [dcols.index(c) for c in scols]
        exp = sorted(tuple(str(r[i2]) for i2 in idx) for r in rows)
        if got == exp:
            print(f"[{i:2}/{len(names)}] {name}: MATCH ({len(got)} rows, {dt:.1f}s)")
        else:
            bad += 1
            diff = [(g, e) for g, e in zip(got, exp) if g != e][:2]
            print(f"[{i:2}/{len(names)}] {name}: MISMATCH rows "
                  f"{len(got)} vs {len(exp)} first-diff={diff}")
    print("BAD:", bad)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
