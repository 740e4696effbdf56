"""Structured Streaming variant: incremental appends produce the same
mention/label counts as the batch plan."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from kie_invoice_minimal_spark.operators.mention_detect import detect_mentions_native
from kie_invoice_minimal_spark.sources.transcripts import synth_transcripts
from kie_invoice_minimal_spark.streaming.stream_pipeline import run_stream_to_memory


def test_stream_matches_batch(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")

    # two incremental appends (two producers' worth of files)
    t = synth_transcripts(spark, 600)
    t.filter("turn_idx < 3").write.mode("append").parquet(in_dir)
    t.filter("turn_idx >= 3").write.mode("append").parquet(in_dir)

    q = run_stream_to_memory(spark, in_dir, ckpt, name="lc_test")
    try:
        q.processAllAvailable()
        got = {
            (r.window_start, r.mention_type): r.n
            for r in spark.sql("SELECT * FROM lc_test").collect()
        }
    finally:
        q.stop()

    batch = (
        detect_mentions_native(t.select("conv_id", "turn_idx", "text", "ts"), carry=("ts",))
        .groupBy(F.window("ts", "5 minutes").alias("w"), "mention_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "mention_type", "n")
    )
    want = {(r.ws, r.mention_type): r.n for r in batch.collect()}
    assert got == want
    assert len(got) > 0
