#!/usr/bin/env python
"""Compact a STOPPED novel-fact stream's fingerprint index.

The streaming sink (`streaming/stream_pipeline.run_novel_facts_to_parquet`)
grows one ``epoch=K`` directory per micro-batch; every batch re-lists all
of them.  Safe in-sink folding is impossible with plain parquet dirs (see
stream_pipeline.py's sink docstring), so this offline utility folds all
but the newest epoch into one negative-numbered epoch directory with a
write-then-atomic-rename whose every crash window reads as the OLD layout
(`streaming/compaction.py` documents the argument; the crash-residue tests
live in tests/test_fact_index_compaction.py).

STOP THE STREAM FIRST.  Usage:

    python scripts/compact_fact_index.py /path/to/index [--keep-latest 1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("index_dir")
    ap.add_argument("--keep-latest", type=int, default=1)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from kie_invoice_minimal_spark.session import get_spark
    from kie_invoice_minimal_spark.streaming.compaction import compact_fact_index

    spark = get_spark(app_name="compact-fact-index", master=args.master)
    stats = compact_fact_index(
        spark, args.index_dir, keep_latest=args.keep_latest
    )
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
