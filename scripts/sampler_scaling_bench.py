#!/usr/bin/env python
"""Scaling bench for the r8 training-feed samplers on a LARGE synthetic
graph (the sf fixtures and the 6.4M-turn volume probe both yield tiny
edge sets because the synth vocabulary is bounded — this measures the
samplers' OWN cost drivers at realistic edge counts).

Graph: N_NODES nodes, ~AVG_DEG hash-drawn out-edges per node
(deterministic xxhash64 targets, no rand(), self-loops dropped, exact
duplicates deduped) — the same keyed-hash discipline as the samplers.

Method per BENCH_SCALING.md: fresh JVM per leg (in-JVM repeats reuse
shuffle files), taskset-pinned by the parent, untimed warmup, min-of-2
legs per (op, cpus), N->4N efficiency = (low_wall / high_wall) / 4 on
the same input.  One JSON summary on stdout; per-leg lines on stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_NODES = 100_000
AVG_DEG = 20


def child(op: str, cpus: int) -> None:
    from pyspark.sql import functions as F

    from kie_invoice_minimal_spark.operators.graph_analytics import (
        negative_sample,
        neighbor_sample,
        random_walks,
    )
    from kie_invoice_minimal_spark.session import get_spark

    spark = get_spark(
        app_name=f"sampler-scaling-{op}-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 4, 32),
    )
    spark.sparkContext.setLogLevel("ERROR")

    def edges(n_nodes: int, deg: int):
        return (
            spark.range(n_nodes)
            .select(F.format_string("n%06d", "id").alias("src"))
            .select(
                "src",
                F.explode(F.sequence(F.lit(0), F.lit(deg - 1))).alias("i"),
            )
            .select(
                "src",
                F.format_string(
                    "n%06d",
                    F.pmod(F.xxhash64("src", "i"), F.lit(n_nodes)),
                ).alias("dst"),
            )
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            # deterministic non-trivial weights so the walks' indexed
            # adjacency ordering (w DESC, dst) is exercised
            .withColumn(
                "w", (F.pmod(F.xxhash64("src", "dst"), F.lit(9)) + 1).cast("long")
            )
        )

    fn = {
        "neighbor": neighbor_sample,
        "negative": negative_sample,
        "walks": random_walks,
    }[op]

    # untimed warmup: same code path, 1% of the graph
    fn(edges(1_000, 4).localCheckpoint()).write.format("noop").mode(
        "overwrite"
    ).save()

    e = edges(N_NODES, AVG_DEG).localCheckpoint()  # input materialized untimed
    n_edges = e.count()
    t0 = time.time()
    fn(e).write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    print(json.dumps({"op": op, "cpus": cpus, "edges": n_edges, "wall_s": round(wall, 2)}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", nargs=2, default=None, metavar=("OP", "CPUS"))
    ap.add_argument("--low", type=int, default=2)
    ap.add_argument("--high", type=int, default=8)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    if args.child:
        child(args.child[0], int(args.child[1]))
        return

    def leg(op: str, cpus: int) -> dict:
        cmd = [
            "taskset", "-c", f"0-{cpus - 1}",
            sys.executable, os.path.abspath(__file__), "--child", op, str(cpus),
        ]
        out = subprocess.run(
            cmd, capture_output=True, text=True, cwd=REPO, check=True
        )
        rec = json.loads(out.stdout.strip().splitlines()[-1])
        print(f"leg {rec}", file=sys.stderr, flush=True)
        return rec

    summary = {"n_nodes": N_NODES, "avg_deg": AVG_DEG, "ops": {}}
    for op in ("neighbor", "negative", "walks"):
        lows, highs = [], []
        for _ in range(args.reps):  # interleaved so drift hits both arms
            lows.append(leg(op, args.low)["wall_s"])
            highs.append(leg(op, args.high)["wall_s"])
        lo, hi = min(lows), min(highs)
        eff = (lo / hi) / (args.high / args.low)
        summary["ops"][op] = {
            f"local[{args.low}]_s": lo,
            f"local[{args.high}]_s": hi,
            "eff": round(eff, 3),
            "low_legs": lows,
            "high_legs": highs,
        }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
