"""One scaling-efficiency session using tools/bench_scaling.py's runners,
WITHOUT overwriting BENCH/BASELINE.md (that file is the curated
multi-session history; results from this script are appended there by
hand). Prints one JSON line.

Usage: python tools/bench_scaling_session.py [n_small n_big rounds]
Env: SPARK_GRAFT_AMPLIFY_FRONTIER etc. pass through to run_level.
"""
from __future__ import annotations

import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_scaling import hw_ceiling, run_level  # noqa: E402


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    factor = n_big / n_small
    hw = hw_ceiling(n_small, n_big)
    smalls, bigs = [], []
    for _ in range(rounds):
        smalls.append(run_level(n_small))
        print(json.dumps(smalls[-1]), flush=True)
        bigs.append(run_level(n_big))
        print(json.dumps(bigs[-1]), flush=True)
    out = {"hw_ceiling": round(hw, 3), "factor": factor, "eff": {}}
    for key in ("frontier_urls_per_sec", "pages_parsed_per_sec"):
        ts = max(r["throughput"].get(key, 0) for r in smalls)
        tb = max(r["throughput"].get(key, 0) for r in bigs)
        if ts:
            sp = tb / ts
            out["eff"][key] = {
                "small_best": ts,
                "big_best": tb,
                "speedup": round(sp, 3),
                "raw_eff": round(sp / factor, 3),
                "vs_hw": round(sp / hw, 3),
            }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
