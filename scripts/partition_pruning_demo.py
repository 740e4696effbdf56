#!/usr/bin/env python
"""Partition-pruning evidence for the triples table read path.

write_triples lays the KG out as partitionBy(pred, subj_bucket) (+ salt
spread inside).  The payoff at 100 TB is the READ side: a consumer asking
for one predicate / one subject bucket must scan 1/(preds × buckets) of
the table, not all of it — Catalyst prunes partition directories at plan
time.  This script writes a real partitioned table, runs a pruned and an
unpruned read, and asserts the pruning is visible both in the physical
plan (partitionFilters / "partitions read") and in the scanned-file
counts.

Usage: python scripts/partition_pruning_demo.py   (prints a summary; exit
1 if pruning is not observed)
"""

from __future__ import annotations

import io
import os
import re
import shutil
import sys
import tempfile
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kie_invoice_minimal_spark.operators.mention_detect import detect_mentions_arrow  # noqa: E402
from kie_invoice_minimal_spark.operators.triples import materialize_triples, write_triples  # noqa: E402
from kie_invoice_minimal_spark.session import get_spark  # noqa: E402
from kie_invoice_minimal_spark.sources.transcripts import synth_transcripts  # noqa: E402


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    spark = get_spark(app_name="pruning-demo", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    out = tempfile.mkdtemp(prefix="triples_pruning_")
    try:
        t = synth_transcripts(spark, 200_000)
        write_triples(materialize_triples(detect_mentions_arrow(t)), out)

        full = spark.read.parquet(out)
        pruned = full.filter("pred = 'BRAND' AND subj_bucket = 3").select("subj", "obj")
        unpruned = full.select("subj", "obj")

        plan = plan_of(pruned)
        m = re.search(r"partition.*?(\d+)/(\d+)", plan, re.I | re.S)
        # physical evidence: the scan node's PartitionFilters carry both keys
        has_filters = bool(
            re.search(r"PartitionFilters: \[.*pred.*\]", plan)
            and re.search(r"PartitionFilters: \[.*subj_bucket.*\]", plan)
        )
        n_rows_pruned = pruned.count()
        n_rows_full = unpruned.count()
        # file-level evidence via input_file_name
        from pyspark.sql import functions as F

        files_pruned = pruned.select(F.input_file_name()).distinct().count()
        files_full = unpruned.select(F.input_file_name()).distinct().count()

        print(
            {
                "partition_filters_in_plan": has_filters,
                "plan_partition_count": m.group(0).strip()[:60] if m else None,
                "rows": {"pruned": n_rows_pruned, "full": n_rows_full},
                "files_scanned": {"pruned": files_pruned, "full": files_full},
                "file_scan_fraction": round(files_pruned / files_full, 4),
            }
        )
        ok = has_filters and files_pruned < files_full / 50
        if not ok:
            print("PRUNING NOT OBSERVED", file=sys.stderr)
            print(plan[:4000], file=sys.stderr)
        return 0 if ok else 1
    finally:
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
