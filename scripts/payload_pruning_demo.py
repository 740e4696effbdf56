#!/usr/bin/env python
"""Prove the multimodal payload-pruning claim (multimodal.py:14-16, r5
verdict item 5): a metadata-only query over a table whose rows carry a
large binary ``payload`` column must never read the payload column chunks.

Evidence, written to PAYLOAD_PRUNING.md:

1. Storage layout — pyarrow parquet metadata: total compressed bytes per
   column chunk, showing the payload column dominates the file.
2. Plan — the metadata-only aggregate's ``ReadSchema`` excludes payload
   (Catalyst column pruning reaches the scan).
3. Runtime, DECISIVE — a copy of the table with every payload column
   chunk's byte range OVERWRITTEN WITH ZEROS on disk (and the Hadoop
   ``.crc`` sidecars removed, whose 512-byte checksum blocks straddle
   chunk boundaries): the metadata-only aggregate still returns the
   correct values (Spark never touched a payload byte), while a
   payload-touching aggregate on the SAME files fails with a parquet
   page-decode error (the zeroed region is exactly where payload lives).
   This is stronger than byte counters: it proves NON-READING, not just
   fewer bytes.

Exits non-zero if ReadSchema still contains payload, the metadata query
fails on the zeroed files, or the payload query unexpectedly succeeds.

Usage: python scripts/payload_pruning_demo.py [sf_dir]
"""

from __future__ import annotations

import glob
import io
import re
import shutil
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from kie_invoice_minimal_spark.operators.multimodal import (  # noqa: E402
    mm_decode_metadata,
    with_payload,
)
from kie_invoice_minimal_spark.session import get_spark  # noqa: E402

TABLE = "/tmp/spark_graft_payload_demo"
ZAPPED = "/tmp/spark_graft_payload_zapped"


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _zap_payload_chunks(src: str, dst: str) -> int:
    """Copy the parquet dir, zero every payload column chunk's exact byte
    range (pyarrow metadata offsets), drop Hadoop .crc sidecars (their
    512-byte blocks straddle chunk boundaries and would fail ANY read).
    Returns total zeroed bytes."""
    import os

    import pyarrow.parquet as pq

    shutil.rmtree(dst, ignore_errors=True)
    shutil.copytree(src, dst)
    for crc in glob.glob(f"{dst}/.*.crc"):
        os.remove(crc)
    zapped = 0
    for f in glob.glob(f"{dst}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        ranges = []
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                if c.path_in_schema == "payload":
                    offs = [c.data_page_offset]
                    if c.dictionary_page_offset is not None:
                        offs.append(c.dictionary_page_offset)
                    ranges.append((min(offs), c.total_compressed_size))
        with open(f, "r+b") as fh:
            for off, size in ranges:
                fh.seek(off)
                fh.write(b"\x00" * size)
                zapped += size
    return zapped


def main(sf_dir: str = "/root/testdata/sf0.01") -> int:
    spark = get_spark(
        app_name="payload-pruning-demo", master="local[8]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Build the media table: metadata columns + the binary payload, stored
    # together (one parquet, payload in its own column chunk — the layout
    # multimodal.py's scale notes assume).
    shutil.rmtree(TABLE, ignore_errors=True)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    meta = mm_decode_metadata(spark, sf_dir)
    media = (
        with_payload(docs)
        .select("doc_id", "payload")
        .join(meta, "doc_id")
        .select("doc_id", "n_bytes", "width", "height", "n_frames", "payload")
    )
    media.write.mode("overwrite").parquet(TABLE)

    # 1. storage layout: per-column compressed bytes
    import pyarrow.parquet as pq

    col_bytes: dict[str, int] = {}
    for f in glob.glob(f"{TABLE}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                col_bytes[c.path_in_schema] = (
                    col_bytes.get(c.path_in_schema, 0) + c.total_compressed_size
                )
    total_bytes = sum(col_bytes.values())
    payload_bytes = col_bytes.get("payload", 0)

    # 2. plan: metadata-only aggregate prunes the payload column
    def meta_agg(df):
        return df.groupBy().agg(
            F.count("*").alias("n_docs"),
            F.sum("n_bytes").alias("total_payload_bytes"),
            F.max("n_frames").alias("max_frames"),
        )

    meta_plan = plan_of(meta_agg(spark.read.parquet(TABLE)))
    m = re.search(r"ReadSchema: (struct<[^\n]*)", meta_plan)
    read_schema = m.group(1) if m else "<missing>"
    pruned = "payload" not in read_schema

    # 3. runtime: the zeroed-chunk experiment
    zapped = _zap_payload_chunks(TABLE, ZAPPED)
    tz = spark.read.parquet(ZAPPED)
    expected = [tuple(r) for r in meta_agg(spark.read.parquet(TABLE)).collect()]
    try:
        got = [tuple(r) for r in meta_agg(tz).collect()]
        meta_ok = got == expected
        meta_note = f"returned {got[0]}, matching the intact table"
    except Exception as e:  # noqa: BLE001
        meta_ok, meta_note = False, f"FAILED: {str(e).splitlines()[0][:140]}"
    try:
        tz.select(F.sum(F.length("payload")).alias("b")).collect()
        payload_failed, payload_note = False, "SUCCEEDED — zap missed the chunks?!"
    except Exception as e:  # noqa: BLE001
        caused = [ln for ln in str(e).splitlines() if "Caused by" in ln]
        payload_failed = True
        payload_note = (caused[0] if caused else str(e).splitlines()[0])[:160]

    ok = pruned and meta_ok and payload_failed
    lines = [
        "# Payload column pruning — evidence (round 6)",
        "",
        "Claim under test (`operators/multimodal.py:14-16`): binary media",
        "payloads live in their own parquet column chunk, so metadata-only",
        "queries never read the payload bytes.  Generated by",
        "`scripts/payload_pruning_demo.py` (re-run to refresh; exits non-zero",
        "if pruning regresses).",
        "",
        "## 1. Storage layout (pyarrow parquet metadata)",
        "",
        "| column | compressed bytes | share |",
        "|---|---|---|",
    ]
    for name, b in sorted(col_bytes.items(), key=lambda kv: -kv[1]):
        lines.append(f"| {name} | {b:,} | {100.0 * b / total_bytes:.1f}% |")
    lines += [
        "",
        f"The payload column holds {100.0 * payload_bytes / total_bytes:.1f}% of "
        f"the table's {total_bytes:,} compressed bytes.",
        "",
        "## 2. Plan: metadata-only aggregate",
        "",
        f"`ReadSchema: {read_schema}`",
        "",
        f"payload column pruned from the scan: **{pruned}**",
        "",
        "## 3. Runtime: zeroed-payload-chunk experiment (decisive)",
        "",
        f"All payload column chunks ({zapped:,} bytes — their exact",
        "pyarrow-metadata byte ranges) overwritten with zeros in a copy of",
        "the files; Hadoop `.crc` sidecars removed so only parquet's own",
        "reads can fail.",
        "",
        f"- metadata-only aggregate over the zeroed files: **{'OK' if meta_ok else 'FAIL'}** — {meta_note}",
        f"- payload-touching aggregate over the same files: **{'failed as expected' if payload_failed else 'UNEXPECTED PASS'}** — `{payload_note}`",
        "",
        "Reading zero payload bytes is proven by construction: the bytes",
        "are garbage on disk, and the metadata query cannot tell.  At 100 TB",
        "of media this is the difference between a metadata sweep touching",
        "~GBs of statistics columns and dragging the full payload corpus",
        "through the scan.  (Byte-counter approaches were tried first:",
        "Hadoop FS statistics and AppStatusStore stage inputBytes both",
        "under-report local-mode parquet reads, so this experiment replaces",
        "them.)",
    ]
    with open("/root/repo/PAYLOAD_PRUNING.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(
        f"pruned={pruned} meta_on_zeroed={'OK' if meta_ok else 'FAIL'} "
        f"payload_on_zeroed={'failed-as-expected' if payload_failed else 'PASSED?!'}"
    )
    print("wrote PAYLOAD_PRUNING.md")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
