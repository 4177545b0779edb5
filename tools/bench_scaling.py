"""Scaling-efficiency evidence (BASELINE.json north_rule).

No real cluster exists in this sandbox, so the two-cluster-size criterion is
evidenced by running the SAME bench jobs on the SAME input at two
parallelism levels (local[8] vs local[32]) and reporting throughput at both
plus scaling efficiency  eff = (thr_4N / thr_N) / 4.

Each level runs in its own process (fresh JVM). Results → BENCH/BASELINE.md.

Usage: python tools/bench_scaling.py [n_small n_big]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env.pop("WBX_INPUT_PARTITIONS", None)  # let bench derive 2*CPUS
    env.setdefault("SPARK_GRAFT_REPS", "1")  # interleaved rounds instead
    env.setdefault("SPARK_GRAFT_SUITE", "0")  # headline jobs only
    # amplify so compute dominates fixed per-job overheads at the small level
    env.setdefault("SPARK_GRAFT_AMPLIFY_FRONTIER", "60")
    env.setdefault("SPARK_GRAFT_AMPLIFY_PAGES", "30")
    # a faithful N-core "cluster": pin the whole JVM (GC/shuffle threads
    # included) to N cpus, else local[8] borrows the other 24 cores
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable, os.path.join(REPO, "bench.py")]
    out = subprocess.run(
        cmd, capture_output=True, text=True, env=env, timeout=1800
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def best(runs: list[dict]) -> dict:
    """Per-level best across interleaved rounds: the sandbox host's
    effective CPU speed drifts several-fold over minutes, so levels are run
    alternately and each level keeps its fastest observation."""
    return max(runs, key=lambda r: r["throughput"]["frontier_urls_per_sec"])


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    factor = n_big / n_small

    smalls, bigs = [], []
    for _ in range(rounds):
        smalls.append(run_level(n_small))
        bigs.append(run_level(n_big))
    small, big = best(smalls), best(bigs)

    # report each job's per-level best, not one run's mixed numbers
    for key in ("frontier_urls_per_sec", "pages_parsed_per_sec"):
        small["throughput"][key] = max(r["throughput"][key] for r in smalls)
        big["throughput"][key] = max(r["throughput"][key] for r in bigs)

    rows = []
    for key, unit in [
        ("frontier_urls_per_sec", "URLs/s"),
        ("pages_parsed_per_sec", "pages/s"),
    ]:
        ts, tb = small["throughput"][key], big["throughput"][key]
        eff = (tb / ts) / factor
        rows.append((key, unit, ts, tb, round(eff, 3)))

    md = [
        "# BENCH — scaling efficiency evidence (north_rule)",
        "",
        f"Same jobs, same input (sf={small['sf']}), two parallelism levels:",
        f"`local[{n_small}]` vs `local[{n_big}]` (factor {factor:g}×), fresh JVM each,",
        "best-of-REPS wall time per job (the sandbox host shows CPU-steal noise;",
        "see tools/bench_scaling.py).",
        "",
        "| job | local[%d] | local[%d] | speedup | efficiency (target ≥0.8) |"
        % (n_small, n_big),
        "|---|---|---|---|---|",
    ]
    for key, unit, ts, tb, eff in rows:
        md.append(
            f"| {key} | {ts:,} {unit} | {tb:,} {unit} | {tb/ts:.2f}× | **{eff}** |"
        )
    md += [
        "",
        "Raw bench lines:",
        "```json",
        json.dumps(small),
        json.dumps(big),
        "```",
        "",
        "Determinism cross-check: `frontier_crawl_round` output is byte-identical",
        "between the two levels (verified in tests/test_frontier.py and the",
        "tools/check_entry.py probe) — ordering never depends on parallelism.",
    ]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "w") as f:
        f.write("\n".join(md) + "\n")
    print(json.dumps({"small": small, "big": big, "efficiency": {r[0]: r[4] for r in rows}}))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
