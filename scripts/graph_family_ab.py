#!/usr/bin/env python
"""Staged graph-family A/B (r7 verdict next-round item 2's done-bar).

Three legs over the SAME sf-dir input, each in a FRESH pinned JVM
(in-JVM repeats of an identical plan reuse map-stage shuffle files —
the r4 methodology correction), interleaved cold/staged so host drift
hits both arms:

  cold    — the 10 plain-graph family entries exactly as the registry
            runs them: each pays its own capped_conv_surfaces probe and
            its own detector-lineage materialization (13-probe shape).
  staged  — graph_family_staged(): ONE graph_snapshots build (one probe,
            one detector materialization, capped table + edges written
            as parquet snapshots) feeding all 10 consumers.  Root wiped
            first, so the timing is the self-contained build+derive.
  derive  — graph_family_staged() from EXISTING snapshots (root built
            by a prior leg): the marginal nightly-job cost — what a
            maintained-snapshot deployment actually pays per run.

Each child prints one JSON line {mode, wall_s, probes, n_rows}; the
parent prints a summary JSON document.  Probe counts come from
CAP_PATH_STATS deltas around the timed section, so the "13 probes -> 1"
collapse is part of the measured record, not just the unit test.

Usage: python scripts/graph_family_ab.py --sf-dir /root/testdata/sf0.1 \
           --cpus 32 [--child MODE --root DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FAMILY = [
    "kg_entity_pagerank",
    "kg_triangle_counts",
    "kg_khop_counts",
    "kg_khop_kmv",
    "kg_common_neighbors",
    "kg_export_neighbors",
    "kg_degree_distribution",
    "kg_kcore",
    "kg_edge_lift",
    "kg_communities",
]


def child(mode: str, sf_dir: str, cpus: int, root: str) -> None:
    import __spark_entry__ as entrymod
    from kie_invoice_minimal_spark.operators import graph_analytics as GA
    from kie_invoice_minimal_spark.session import get_spark
    from kie_invoice_minimal_spark.sources.transcripts import synth_transcripts
    from kie_invoice_minimal_spark.plans.pipeline import extract_triples_df

    spark = get_spark(
        app_name=f"graph-family-ab-{mode}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 32),
    )
    spark.sparkContext.setLogLevel("ERROR")

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    # warm python workers + codegen untimed (same warmup as bench.py)
    mat(extract_triples_df(synth_transcripts(spark, 20_000), engine="arrow"))

    if mode == "staged":
        shutil.rmtree(root, ignore_errors=True)

    before = dict(GA.CAP_PATH_STATS)
    t0 = time.time()
    if mode == "cold":
        q = entrymod.queries()
        n = 0
        for name in FAMILY:
            df = q[name](spark, sf_dir)
            mat(df)
            n += 1
    else:  # staged (wiped root) or derive (existing root)
        fam = GA.graph_family_staged(spark, sf_dir, root)
        n = 0
        for name in FAMILY:
            mat(fam[name])
            n += 1
    wall = time.time() - t0
    probes = GA.CAP_PATH_STATS["probes"] - before["probes"]
    print(json.dumps(
        {"mode": mode, "wall_s": round(wall, 2), "probes": probes, "n_entries": n}
    ))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--child", default=None)
    ap.add_argument("--root", default="/tmp/graph_family_ab_root")
    args = ap.parse_args()

    if args.child:
        child(args.child, args.sf_dir, args.cpus, args.root)
        return

    def leg(mode: str) -> dict:
        cmd = [
            "taskset", "-c", f"0-{args.cpus - 1}",
            sys.executable, os.path.abspath(__file__),
            "--child", mode, "--sf-dir", args.sf_dir,
            "--cpus", str(args.cpus), "--root", args.root,
        ]
        out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, check=True)
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        rec = json.loads(line)
        print(f"  {rec}", file=sys.stderr)
        return rec

    shutil.rmtree(args.root, ignore_errors=True)
    # interleaved cold/staged (fresh JVM each), then derive×2 from the
    # root the last staged leg left behind
    legs = [leg(m) for m in ("cold", "staged", "cold", "staged")]
    legs += [leg("derive"), leg("derive")]

    def best(mode):
        return min(r["wall_s"] for r in legs if r["mode"] == mode)

    summary = {
        "sf_dir": args.sf_dir,
        "cpus": args.cpus,
        "legs": legs,
        "cold_min_s": best("cold"),
        "staged_min_s": best("staged"),
        "derive_min_s": best("derive"),
        "staged_over_cold": round(best("staged") / best("cold"), 3),
        "derive_over_cold": round(best("derive") / best("cold"), 3),
        "probes_cold": [r["probes"] for r in legs if r["mode"] == "cold"],
        "probes_staged": [r["probes"] for r in legs if r["mode"] != "cold"],
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
