#!/usr/bin/env python
"""Same-session alternating A/B between two trees (the r11 protocol).

    python scripts/ab_bench.py <tree_a> <tree_b> <rounds> <q1,q2,...>

Alternates full bench.py invocations of tree A and tree B (each run gated on
1-min load < 0.30 with settle sleeps), restricted to the named queries via
SPARK_GRAFT_BENCH_ONLY, and reports the per-query MIN across rounds for each
tree.  Cross-day comparisons are not evidence (the sandbox's per-core
throughput swings 1.5-2x day to day); this alternation is the only valid
protocol.  Raw per-run JSON lines go to stdout as they arrive.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _wait_idle(limit: float = 0.30, settle: int = 20, timeout: int = 600) -> float:
    t0 = time.time()
    while time.time() - t0 < timeout:
        load = os.getloadavg()[0]
        if load < limit:
            return load
        time.sleep(settle)
    return os.getloadavg()[0]


def _run(tree: str, only: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_ONLY"] = only
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    out = subprocess.run(
        [sys.executable, "bench.py"], cwd=tree, env=env,
        capture_output=True, text=True, timeout=3600,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    tree_a, tree_b, rounds, only = (
        sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4],
    )
    mins: dict[str, dict[str, float]] = {"a": {}, "b": {}}
    for rnd in range(rounds):
        for key, tree in (("a", tree_a), ("b", tree_b)):
            load = _wait_idle()
            res = _run(tree, only)
            print(json.dumps({"round": rnd, "tree": key, "gate_load": round(load, 2), **res}))
            sys.stdout.flush()
            for q, t in res["queries"].items():
                mins[key][q] = min(mins[key].get(q, float("inf")), t)
            time.sleep(25)
    print("== per-query min across rounds ==")
    for q in sorted(set(mins["a"]) | set(mins["b"])):
        a, b = mins["a"].get(q), mins["b"].get(q)
        delta = f"{(b - a) / a * 100:+.1f}%" if a and b else "n/a"
        print(f"{q:25s} A={a:.3f}  B={b:.3f}  B-vs-A {delta}")
    print(f"{'TOTAL':25s} A={sum(mins['a'].values()):.3f}  B={sum(mins['b'].values()):.3f}")


if __name__ == "__main__":
    main()
