#!/usr/bin/env python
"""Stage-level profile of the local[8] -> local[32] scaling ceiling
(r3 verdict item 5: replace the asserted "same-box memory bandwidth
ceiling" with per-stage task-metric evidence naming the saturated
resource).

Runs the IDENTICAL pipeline job (scripts/run_pipeline.py, unchanged, via a
temp SPARK_CONF_DIR that turns on spark.eventLog) CPU-pinned at two
parallelism levels, then parses the event logs: per stage, the summed task
Executor Run Time, Executor CPU Time, JVM GC Time, shuffle bytes, and the
derived signals

- cpu_ms / n_rows-equivalent: if the SAME stage burns more CPU-seconds at
  32 threads than at 8 for identical work, cores are executing stall
  cycles (memory-bandwidth / virtualized-host contention) — memory stalls
  are on-CPU, so they inflate CPU time, not the run-cpu gap;
- run_ms - cpu_ms: off-CPU blocking (scheduler, locks, disk);
- gc_ms share: collector pressure.

All stages are reported sorted by cost (AQE materializes each query stage
as its own job, so per-job filtering can't isolate one action; the
profiled invocation uses --repeats 1, leaving the 20k-turn warmup stages
visibly tiny next to the timed run's).

Usage: python scripts/profile_scaling.py [--turns 25600000] [--engine native]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_profiled(n_cpus: int, turns: int, engine: str) -> dict:
    evdir = tempfile.mkdtemp(prefix=f"spark-events-{n_cpus}-")
    confdir = tempfile.mkdtemp(prefix=f"spark-conf-{n_cpus}-")
    with open(os.path.join(confdir, "spark-defaults.conf"), "w") as f:
        f.write(
            f"spark.eventLog.enabled true\n"
            f"spark.eventLog.dir file://{evdir}\n"
            f"spark.eventLog.compress false\n"
        )
    env = dict(os.environ, SPARK_CONF_DIR=confdir)
    cmd = [
        "taskset", "-c", f"0-{n_cpus - 1}",
        sys.executable, os.path.join(REPO, "scripts", "run_pipeline.py"),
        "--synth", str(turns), "--engine", engine,
        "--master", f"local[{n_cpus}]", "--partitions", "128", "--repeats", "1",
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, env=env, check=True)
    result = json.loads(
        [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    )
    result["stages"] = parse_event_log(evdir)
    return result


def parse_event_log(evdir: str) -> list[dict]:
    entries = glob.glob(os.path.join(evdir, "*"))
    assert entries, f"no event log in {evdir}"
    newest = max(entries, key=os.path.getmtime)
    # Spark 4 writes a rolling event-log DIRECTORY (eventlog_v2_<app>/events_*)
    files = (
        sorted(glob.glob(os.path.join(newest, "events_*")))
        if os.path.isdir(newest)
        else [newest]
    )
    stage_names: dict[int, str] = {}
    agg: dict[int, dict] = {}

    def _lines():
        for p in files:
            with open(p) as f:
                yield from f

    if True:
        for line in _lines():
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            kind = ev.get("Event")
            if kind == "SparkListenerJobStart":
                for s in ev.get("Stage Infos", []):
                    stage_names[s["Stage ID"]] = s.get("Stage Name", "")
            elif kind == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                tm = ev.get("Task Metrics") or {}
                a = agg.setdefault(
                    sid,
                    {"n_tasks": 0, "run_ms": 0, "cpu_ms": 0.0, "gc_ms": 0,
                     "shuffle_write_b": 0, "shuffle_read_b": 0},
                )
                a["n_tasks"] += 1
                a["run_ms"] += tm.get("Executor Run Time", 0)
                a["cpu_ms"] += tm.get("Executor CPU Time", 0) / 1e6
                a["gc_ms"] += tm.get("JVM GC Time", 0)
                sw = tm.get("Shuffle Write Metrics") or {}
                a["shuffle_write_b"] += sw.get("Shuffle Bytes Written", 0)
                sr = tm.get("Shuffle Read Metrics") or {}
                a["shuffle_read_b"] += sr.get("Remote Bytes Read", 0) + sr.get(
                    "Local Bytes Read", 0
                )
    # AQE materializes each query stage as its own job, so per-job filtering
    # cannot isolate "the" action; instead report every stage (the profiled
    # invocation runs --repeats 1, so besides the visibly tiny 20k-turn
    # warmup stages each stage appears once) sorted by cost.
    rows = []
    for sid in sorted(agg, key=lambda s: -agg[s]["run_ms"]):
        a = agg[sid]
        rows.append({
            "stage_id": sid,
            "name": stage_names.get(sid, "")[:60],
            **{k: (round(v, 1) if isinstance(v, float) else v) for k, v in a.items()},
            "blocked_ms": round(a["run_ms"] - a["cpu_ms"], 1),
        })
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=25_600_000)
    ap.add_argument("--engine", default="native")
    ap.add_argument("--levels", type=int, nargs=2, default=(8, 32))
    args = ap.parse_args()
    out = {}
    for n in args.levels:
        r = run_profiled(n, args.turns, args.engine)
        out[f"local[{n}]"] = r
        print(f"== local[{n}]: wall {r['wall_sec']}s, {r['turns_per_sec']} turns/s",
              file=sys.stderr)
        for s in r["stages"]:
            print(f"   stage {s['stage_id']:3d} tasks={s['n_tasks']:4d} "
                  f"run={s['run_ms']/1000:8.1f}s cpu={s['cpu_ms']/1000:8.1f}s "
                  f"gc={s['gc_ms']/1000:6.1f}s blocked={s['blocked_ms']/1000:8.1f}s "
                  f"sw={s['shuffle_write_b']>>20}MB sr={s['shuffle_read_b']>>20}MB "
                  f"{s['name'][:40]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
