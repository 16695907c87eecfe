#!/usr/bin/env python
"""Dump .explain("formatted") for named queries to files.

    python scripts/dump_plans.py <out_dir> <suffix> name1 name2 ...

Writes <out_dir>/<name>_<suffix>.txt for each query, built at
$SPARK_GRAFT_SF_DIR (default sf0.1).  Run from the repo root whose plans you
want (the script resolves the registry relative to its own location, so a
copy of the tree dumps that copy's plans).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from fineo_readerator_spark.plans.queries import QUERIES  # noqa: E402
from fineo_readerator_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir, suffix, *names = sys.argv[1:]
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = QUERIES[name].fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR building {name}: {type(exc).__name__}: {exc}"
        Path(out_dir, f"{name}_{suffix}.txt").write_text(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)")


if __name__ == "__main__":
    main()
