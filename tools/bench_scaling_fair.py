"""Fairness-gated scaling session: like bench_scaling_session, but every
bench leg is bracketed by a short pure-CPU burn probe at the SAME core
count, so legs that ran during an external host-throttle phase can be
identified and excluded by measurement instead of guesswork.

Why: the sandbox host's effective CPU delivery swings several-fold over
minutes (documented across rounds in BENCH/BASELINE.md). Interleaved
best-of sessions mitigate but cannot detect a phase that covers a whole
leg — session AA's parse job posted an impossible raw efficiency of 1.11,
proving its 4-core legs were throttled. The burn probe is the same
independent control bench_scaling already uses for the hardware ceiling;
bracketing each leg with it turns "the weather looked bad" into a
per-observation number.

Selection rule (fixed before measuring): a leg is FAIR if
min(pre, post) burn >= fair_frac * (session max burn at that core count).
Efficiency is reported over fair legs only (best observation per level),
alongside the all-legs numbers so nothing is hidden.

Usage: python tools/bench_scaling_fair.py [n_small n_big rounds fair_frac]
Env passes through to run_level (SPARK_GRAFT_SEEN_BASE etc.).
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_scaling import hw_throughput, run_level  # noqa: E402


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    fair_frac = float(sys.argv[4]) if len(sys.argv) > 4 else 0.93
    factor = n_big / n_small

    legs: list[dict] = []
    for rnd in range(rounds):
        for cpus in (n_small, n_big):
            pre = hw_throughput(cpus, cpus, 5)
            obs = run_level(cpus)
            post = hw_throughput(cpus, cpus, 5)
            leg = {
                "round": rnd,
                "cpus": cpus,
                "burn_pre": round(pre),
                "burn_post": round(post),
                "burn_min": round(min(pre, post)),
                "throughput": obs["throughput"],
                "queries": obs["queries"],
            }
            legs.append(leg)
            print(json.dumps(leg), flush=True)

    out: dict = {"factor": factor, "fair_frac": fair_frac, "eff": {}}
    for cpus in (n_small, n_big):
        peak = max(l["burn_min"] for l in legs if l["cpus"] == cpus)
        for l in legs:
            if l["cpus"] == cpus:
                l["fair"] = l["burn_min"] >= fair_frac * peak
    out["burn_peaks"] = {
        str(cpus): max(l["burn_min"] for l in legs if l["cpus"] == cpus)
        for cpus in (n_small, n_big)
    }
    for key in ("frontier_urls_per_sec", "pages_parsed_per_sec"):
        def best(cpus, only_fair):
            vals = [
                l["throughput"].get(key, 0)
                for l in legs
                if l["cpus"] == cpus and (l["fair"] or not only_fair)
            ]
            return max(vals) if vals else 0

        ts_f, tb_f = best(n_small, True), best(n_big, True)
        ts_a, tb_a = best(n_small, False), best(n_big, False)
        if ts_a:
            out["eff"][key] = {
                "fair_small_best": ts_f,
                "fair_big_best": tb_f,
                "fair_raw_eff": round(tb_f / ts_f / factor, 3) if ts_f else None,
                "all_small_best": ts_a,
                "all_big_best": tb_a,
                "all_raw_eff": round(tb_a / ts_a / factor, 3),
            }
    out["n_fair"] = {
        str(cpus): sum(1 for l in legs if l["cpus"] == cpus and l["fair"])
        for cpus in (n_small, n_big)
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
