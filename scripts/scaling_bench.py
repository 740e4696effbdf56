#!/usr/bin/env python
"""Scaling-efficiency evidence (north rule: efficiency >= 0.8 from N to 4N).

No real cluster exists in this sandbox, so the two-cluster-size criterion is
evidenced by running the IDENTICAL job (scripts/run_pipeline.py, same input,
same partition count) at two parallelism levels — local[N] and local[4N] —
in separate JVMs, and reporting throughput at both plus

    efficiency = (throughput_4N / throughput_N) / 4.

Usage: python scripts/scaling_bench.py [--n-low 8] [--turns 600000]
Appends a markdown row set to BENCH_SCALING.md and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(master: str, turns: int, engine: str, n_cpus: int, repeats: int = 1) -> dict:
    # taskset pins the whole process tree (JVM + Python workers) to exactly
    # n_cpus cores — otherwise local[8] on a 32-core box borrows extra cores
    # for GC/shuffle threads and the comparison is not N vs 4N.
    cmd = [
        "taskset", "-c", f"0-{n_cpus - 1}",
        sys.executable,
        os.path.join(REPO, "scripts", "run_pipeline.py"),
        "--synth", str(turns),
        "--engine", engine,
        "--master", master,
        "--partitions", "128",
        # repeats=1: within one JVM a second repeat of the SAME DataFrame
        # action reuses the first repeat's map-stage shuffle files (event-log
        # verified round 4: the repeat job's map stage has zero tasks), so
        # "min of 2 in-JVM repeats" measured a partially-cached run.  Fresh
        # single-repeat JVMs (warmup still on) are the honest steady state;
        # noise is absorbed by best-of-k ACROSS invocations instead.
        "--repeats", str(repeats),
    ]
    out = subprocess.run(
        cmd,
        capture_output=True,
        text=True,
        cwd=REPO,
        check=True,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-low", type=int, default=8)
    ap.add_argument("--turns", type=int, default=6_000_000)
    ap.add_argument("--engine", default="arrow")
    ap.add_argument("--repeats", type=int, default=1)
    args = ap.parse_args()
    n_hi = args.n_low * 4

    lo = run_once(f"local[{args.n_low}]", args.turns, args.engine, args.n_low, args.repeats)
    hi = run_once(f"local[{n_hi}]", args.turns, args.engine, n_hi, args.repeats)
    eff = (hi["turns_per_sec"] / lo["turns_per_sec"]) / 4.0
    result = {
        "metric": "scaling_efficiency_NtoN4",
        "engine": args.engine,
        "n_turns": args.turns,
        "low_parallelism": args.n_low,
        "high_parallelism": n_hi,
        "throughput_low": lo["turns_per_sec"],
        "throughput_high": hi["turns_per_sec"],
        "wall_low_sec": lo["wall_sec"],
        "wall_high_sec": hi["wall_sec"],
        "efficiency": round(eff, 3),
        "passes_0.8_gate": eff >= 0.8,
    }
    print(json.dumps(result))
    md = (
        f"\n| {args.engine} | {args.turns} | local[{args.n_low}] "
        f"{lo['turns_per_sec']} turns/s | local[{n_hi}] {hi['turns_per_sec']} turns/s "
        f"| {round(eff, 3)} |"
    )
    path = os.path.join(REPO, "BENCH_SCALING.md")
    if not os.path.exists(path):
        with open(path, "w") as f:
            f.write(
                "# Scaling evidence (local[N] vs local[4N], same input & partitions)\n\n"
                "efficiency = (throughput_4N / throughput_N) / 4; gate >= 0.8\n\n"
                "| engine | turns | low | high | efficiency |\n|---|---|---|---|---|"
            )
    with open(path, "a") as f:
        f.write(md)


if __name__ == "__main__":
    main()
