#!/usr/bin/env python
"""Streaming throughput micro-bench (r3 verdict item 7).

Batch-side evidence discipline (pinned cores, warm, min-of-2) already
covers the batch pipeline; this gives the STREAMING variant the same: a
rows/s datapoint plus state-store growth over time for

- the stateless mention stream (pure incremental, no state), and
- the watermarked session-finalization triple path (``streaming_triples``)
  whose state the watermark must keep bounded.

Input is ``--files`` chunk files of ``synth_transcripts`` keys written in
ascending k order (ts = 2024-01-01 + k minutes), so event time advances
monotonically across micro-batches and sessions finalize 40 event-minutes
(30 min gap + 10 min watermark) behind the stream head — the realistic
"conversation goes quiet" regime.  Metrics come from StreamingQuery
progress records: per-batch input rows, trigger wall, and
stateOperators[].numRowsTotal (the state-store size trajectory).

Usage: taskset -c 0-7 python scripts/streaming_bench.py --turns 600000 \
           --files 20 --cpus 8
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kie_invoice_minimal_spark.session import get_spark  # noqa: E402
from kie_invoice_minimal_spark.sources.transcripts import (  # noqa: E402
    TRANSCRIPT_SCHEMA,
    derive_transcripts,
)
from kie_invoice_minimal_spark.streaming.stream_pipeline import (  # noqa: E402
    streaming_mentions,
    streaming_triples,
)


def build_input(spark, root: str, n_turns: int, n_files: int) -> str:
    """Write n_files chunk files in ascending-k order (ascending mtime, so
    the file source's maxFilesPerTrigger batches replay event time in
    order)."""
    input_dir = os.path.join(root, "input")
    chunk = n_turns // n_files
    for i in range(n_files):
        derive_transcripts(
            spark.range(i * chunk, (i + 1) * chunk).withColumnRenamed("id", "k")
        ).coalesce(1).write.mode("append").parquet(input_dir)
    return input_dir


def run_stream(spark, input_dir: str, root: str, which: str, files_per_trigger: int):
    src = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(input_dir)
    )
    out = streaming_mentions(src) if which == "mentions" else streaming_triples(src)
    ckpt = os.path.join(root, f"ckpt_{which}_{int(time.time() * 1000)}")
    t0 = time.time()
    q = (
        out.writeStream.format("noop")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    wall = time.time() - t0
    progress = [json.loads(p.json) for p in q.recentProgress]
    q.stop()
    batches = [p for p in progress if p.get("numInputRows", 0) > 0]
    rows = sum(p["numInputRows"] for p in batches)
    state = [
        (p["batchId"], p["stateOperators"][0]["numRowsTotal"])
        for p in batches
        if p.get("stateOperators")
    ]
    return {
        "path": which,
        "input_rows": rows,
        "wall_sec": round(wall, 2),
        "rows_per_sec": round(rows / wall, 1),
        "n_batches": len(batches),
        "max_batch_ms": max(p["durationMs"]["triggerExecution"] for p in batches),
        "state_rows_over_time": state,
        "state_rows_max": max((s for _, s in state), default=0),
        "state_rows_final": state[-1][1] if state else 0,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=600_000)
    ap.add_argument("--files", type=int, default=20)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--files-per-trigger", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark(
        app_name="streaming-bench",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="stream_bench_")
    try:
        input_dir = build_input(spark, root, args.turns, args.files)
        # warmup (python workers + codegen) on a small prefix, untimed
        run_stream(spark, input_dir, root, "mentions", args.files)
        results = [
            run_stream(spark, input_dir, root, "mentions", args.files_per_trigger),
            run_stream(spark, input_dir, root, "triples", args.files_per_trigger),
        ]
        print(json.dumps({"turns": args.turns, "cpus": args.cpus,
                          "files_per_trigger": args.files_per_trigger,
                          "results": results}, indent=1))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
