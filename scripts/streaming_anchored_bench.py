#!/usr/bin/env python
"""Anchored streaming throughput bench (r7 verdict item 8).

Round 7's streaming datapoint (52.0k/22.7k rows/s) ran only in a slow
window, so the raw rows/s was confounded with host drift (this box
drifts 25-40% within a session).  The fix, per the repo's same-session
A/B discipline: interleave every streaming measurement with a BATCH
anchor — the SAME mention-detection plan over the SAME parquet input,
run through the batch reader and a noop batch write — and report the
streaming-vs-batch RATIO alongside the raw numbers.  Host drift moves
numerator and denominator together, so the ratio is window-independent;
raw rows/s stays on the record for cross-round currency.

Layout per repetition (one pinned process, warmed untimed):

    anchor  ->  stream(mentions)  ->  anchor  ->  stream(triples)  ->  anchor

Each streaming leg is bracketed by two anchor legs; its ratio uses the
median of the bracketing anchors.  The anchor for ``mentions`` is the
exact batch twin (identical plan, batch source); ``triples`` has no
literal batch twin (watermark sessionization is stream-only semantics),
so its ratio is against the same mentions anchor — stable denominator,
honest label.

Usage: taskset -c 0-7 python scripts/streaming_anchored_bench.py \
           --turns 600000 --files 20 --cpus 8 --reps 3
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kie_invoice_minimal_spark.session import get_spark  # noqa: E402
from kie_invoice_minimal_spark.sources.transcripts import (  # noqa: E402
    TRANSCRIPT_SCHEMA,
)
from kie_invoice_minimal_spark.streaming.stream_pipeline import (  # noqa: E402
    streaming_mentions,
)
from streaming_bench import build_input, run_stream  # noqa: E402


def run_anchor(spark, input_dir: str) -> dict:
    """Batch twin of the mentions stream: same plan, batch source, noop
    sink.  One number the streaming legs can be divided by."""
    df = spark.read.schema(TRANSCRIPT_SCHEMA).parquet(input_dir)
    t0 = time.time()
    streaming_mentions(df).write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    rows = df.count()
    return {"wall_sec": round(wall, 2), "rows_per_sec": round(rows / wall, 1)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=600_000)
    ap.add_argument("--files", type=int, default=20)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--files-per-trigger", type=int, default=2)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark(
        app_name="streaming-anchored-bench",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="stream_anchor_")
    try:
        input_dir = build_input(spark, root, args.turns, args.files)
        # untimed warmup: python workers, codegen, stream machinery
        run_anchor(spark, input_dir)
        run_stream(spark, input_dir, root, "mentions", args.files)

        reps = []
        for i in range(args.reps):
            a1 = run_anchor(spark, input_dir)
            m = run_stream(
                spark, input_dir, root, "mentions", args.files_per_trigger
            )
            a2 = run_anchor(spark, input_dir)
            t = run_stream(
                spark, input_dir, root, "triples", args.files_per_trigger
            )
            a3 = run_anchor(spark, input_dir)
            anchor_m = statistics.median(
                [a1["rows_per_sec"], a2["rows_per_sec"]]
            )
            anchor_t = statistics.median(
                [a2["rows_per_sec"], a3["rows_per_sec"]]
            )
            reps.append(
                {
                    "rep": i,
                    "anchors_rows_per_sec": [
                        a1["rows_per_sec"],
                        a2["rows_per_sec"],
                        a3["rows_per_sec"],
                    ],
                    "mentions_rows_per_sec": m["rows_per_sec"],
                    "triples_rows_per_sec": t["rows_per_sec"],
                    "mentions_over_anchor": round(
                        m["rows_per_sec"] / anchor_m, 3
                    ),
                    "triples_over_anchor": round(
                        t["rows_per_sec"] / anchor_t, 3
                    ),
                    "triples_state_rows_max": t["state_rows_max"],
                    "triples_state_rows_final": t["state_rows_final"],
                }
            )
            print(json.dumps(reps[-1]), file=sys.stderr, flush=True)

        print(
            json.dumps(
                {
                    "turns": args.turns,
                    "cpus": args.cpus,
                    "files_per_trigger": args.files_per_trigger,
                    "reps": reps,
                    "median_mentions_over_anchor": statistics.median(
                        r["mentions_over_anchor"] for r in reps
                    ),
                    "median_triples_over_anchor": statistics.median(
                        r["triples_over_anchor"] for r in reps
                    ),
                },
                indent=1,
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
