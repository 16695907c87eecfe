"""Driver-faithful oracle cross-check (see .claude/skills/verify/SKILL.md).

Runs every queries() entry at sf0.01 on a VANILLA SparkSession (like the
driver does — entry() never runs first) and compares against oracle_sql()
through DuckDB with columns sorted by name.
"""
import sys, time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

import __spark_entry__ as entry_mod
from fineo_readerator_spark.oracle_compare import container_columns, kind_mismatches

# deliberately vanilla: no engine confs, mirroring the driver's harness
spark = (
    SparkSession.builder.appName("verify-vanilla")
    .master("local[8]")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "12g")
    .getOrCreate()
)

import duckdb

con = duckdb.connect()
sf = "/root/testdata/sf0.01"
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
only = sys.argv[1:]
bad = 0
for name, fn in qs.items():
    if only and name not in only:
        continue
    t0 = time.time()
    try:
        sdf = fn(spark, sf)
        # r10 gate: any container-typed output crashes the driver's pandas
        # canonicalizer (unhashable list) before values even compare
        containers = container_columns(sdf.schema)
        if containers:
            print(f"{name}: CONTAINER-OUTPUT {containers}")
            bad += 1
            continue
        scols = sorted(sdf.columns)
        got = sorted(tuple(str(r[c]) for c in scols) for r in sdf.collect())
    except Exception as e:
        print(f"{name}: SPARK-ERROR {type(e).__name__}: {str(e)[:200]}")
        bad += 1
        continue
    dt = time.time() - t0
    if name in oracles:
        try:
            rel = con.sql(oracles[name])
            dcols, dtypes = list(rel.columns), list(rel.types)
            rows = rel.fetchall()
        except Exception as e:
            print(f"{name}: ORACLE-ERROR {str(e)[:200]}")
            bad += 1
            continue
        if sorted(dcols) != scols:
            print(f"{name}: COLUMN-NAME MISMATCH spark={scols} oracle={sorted(dcols)}")
            bad += 1
            continue
        # r9 hardening: exact result-TYPE agreement (q_skew_report went
        # driver-red on an un-cast HUGEINT that value-str compare couldn't see)
        tmis = kind_mismatches(sdf.schema, dcols, dtypes)
        if tmis:
            print(f"{name}: TYPE-MISMATCH {tmis}")
            bad += 1
            continue
        idx = [dcols.index(c) for c in scols]
        exp = sorted(tuple(str(r[i]) for i in idx) for r in rows)
        if got == exp:
            print(f"{name}: MATCH ({len(got)} rows, {dt:.1f}s)")
        else:
            bad += 1
            diff = [(g, e) for g, e in zip(got, exp) if g != e][:2]
            print(f"{name}: MISMATCH rows {len(got)} vs {len(exp)} first-diff={diff}")
    else:
        print(f"{name}: rows-only ({len(got)} rows, {dt:.1f}s)")
print("BAD:", bad)
