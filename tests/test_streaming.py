"""Structured Streaming variant: incremental appends produce the same
mention/label counts as the batch plan."""

from __future__ import annotations

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


def test_stateful_conversation_state(spark, tmp_path):
    """applyInPandasWithState: running per-conversation summaries across two
    incremental appends equal the batch recomputation."""
    from kie_invoice_minimal_spark.operators.mention_detect import detect_mentions_arrow
    from kie_invoice_minimal_spark.streaming.stateful import run_state_stream_to_memory

    in_dir = str(tmp_path / "in2")
    ckpt = str(tmp_path / "ckpt2")
    t = synth_transcripts(spark, 400)
    t.filter("turn_idx < 2").write.mode("append").parquet(in_dir)
    t.filter("turn_idx >= 2").write.mode("append").parquet(in_dir)

    q = run_state_stream_to_memory(spark, in_dir, ckpt, name="cs_test")
    try:
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT conv_id, max(n_turns) n_turns, max(n_mentions) n_mentions,"
            " max(max_turn) max_turn FROM cs_test GROUP BY conv_id"
        ).collect()
        got = {r.conv_id: (r.n_turns, r.n_mentions, r.max_turn) for r in rows}
    finally:
        q.stop()

    m = detect_mentions_arrow(t)
    mcounts = {r.conv_id: r.cnt for r in m.groupBy("conv_id").count().withColumnRenamed("count", "cnt").collect()}
    tstats = {
        r.conv_id: (r.n, r.mx)
        for r in t.groupBy("conv_id")
        .agg(F.count("*").alias("n"), F.max("turn_idx").alias("mx"))
        .collect()
    }
    want = {
        c: (tstats[c][0], mcounts.get(c, 0), tstats[c][1]) for c in tstats
    }
    assert got == want


def test_session_windows(spark, tmp_path):
    """Session windows close after the inactivity gap; counts match batch."""
    from kie_invoice_minimal_spark.streaming.stream_pipeline import (
        read_transcript_stream,
        streaming_session_counts,
    )

    in_dir = str(tmp_path / "in3")
    ckpt = str(tmp_path / "ckpt3")
    t = synth_transcripts(spark, 300)
    t.write.mode("append").parquet(in_dir)

    q = (
        streaming_session_counts(read_transcript_stream(spark, in_dir))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_test")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.conv_id, r.session_start, r.session_end): r.n_turns
            for r in spark.sql("SELECT * FROM sess_test").collect()
        }
    finally:
        q.stop()

    batch = (
        t.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "conv_id")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    want = {(r.conv_id, r.sw.start, r.sw.end): r.n for r in batch}
    assert got == want and len(got) > 0


def test_foreachbatch_parquet_sink(spark, tmp_path):
    """Exactly-once-style sink: streamed mentions across epochs equal the
    batch extraction; epoch dirs are idempotent units."""
    from kie_invoice_minimal_spark.operators.mention_detect import detect_mentions_arrow
    from kie_invoice_minimal_spark.streaming.stream_pipeline import (
        run_mentions_to_parquet,
    )

    in_dir = str(tmp_path / "in4")
    out_dir = str(tmp_path / "out4")
    ckpt = str(tmp_path / "ckpt4")
    t = synth_transcripts(spark, 300)
    t.filter("turn_idx < 2").write.mode("append").parquet(in_dir)
    t.filter("turn_idx >= 2").write.mode("append").parquet(in_dir)

    q = run_mentions_to_parquet(spark, in_dir, out_dir, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(
        (r.conv_id, r.turn_idx, r.pos, r.surface, r.mention_type)
        for r in spark.read.parquet(out_dir).collect()
    )
    want = sorted(
        (r.conv_id, r.turn_idx, r.pos, r.surface, r.mention_type)
        for r in detect_mentions_arrow(t).collect()
    )
    assert got == want and len(got) > 0


def test_streaming_triples_finalize_on_quiet(spark, tmp_path):
    """Append-mode streaming triples: sessions emit exactly once after the
    watermark passes, and the emitted rows equal the batch session-window
    computation.  A mention-free far-future 'kicker' turn advances the
    watermark so every fixture session closes."""
    from kie_invoice_minimal_spark.streaming.stream_pipeline import (
        read_transcript_stream,
        streaming_triples,
    )

    in_dir = str(tmp_path / "in5")
    ckpt = str(tmp_path / "ckpt5")
    t = synth_transcripts(spark, 300)
    t.write.mode("append").parquet(in_dir)

    q = (
        streaming_triples(read_transcript_stream(spark, in_dir))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("striples_test")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        # kicker: ts far past every fixture session.  It MUST carry a
        # mention — the watermark operator sits after the detector, so a
        # mention-free turn never reaches it and event time would not
        # advance.  Its own session never closes (nothing follows it), so
        # it cannot appear in the append output.
        kicker = spark.createDataFrame(
            [("conv-kick", 0, "user", "thuong hieu VinaMilk", None, "2026-01-01 00:00:00")],
            "conv_id string, turn_idx int, role string, text string, tool string, ts string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        kicker.write.mode("append").parquet(in_dir)
        q.processAllAvailable()
        # a batch evicts with the watermark computed from the PREVIOUS
        # batch's max event time, so a second kicker batch is needed for
        # the first kicker's watermark to take effect
        kicker.withColumn("turn_idx", F.lit(1)).write.mode("append").parquet(in_dir)
        q.processAllAvailable()
        got = {
            (r.subj, r.pred, r.obj, r.session_start)
            for r in spark.sql("SELECT * FROM striples_test").collect()
        }
    finally:
        q.stop()

    m = detect_mentions_native(t.select("conv_id", "turn_idx", "text", "ts"), carry=("ts",))
    batch = (
        m.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "conv_id", "mention_type")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("turn_idx", "pos", "surface"))),
                    lambda s: s["surface"],
                ),
                " ",
            ).alias("obj")
        )
        .select("conv_id", "mention_type", "obj", F.col("sw.start").alias("ws"))
    )
    want = {(r.conv_id, r.mention_type, r.obj, r.ws) for r in batch.collect()}
    assert got == want and len(got) > 0


def test_streaming_exact_dedup(spark, tmp_path):
    """Streamed bounded-state dedup: within the watermark horizon the stream
    keeps exactly one row per content fingerprint (the batch dd_exact
    semantics on this fixture, whose duplicates arrive close together)."""
    from kie_invoice_minimal_spark.streaming.stream_pipeline import (
        read_transcript_stream,
        streaming_exact_dedup,
    )

    in_dir = str(tmp_path / "in6")
    ckpt = str(tmp_path / "ckpt6")
    t = synth_transcripts(spark, 400)
    t.filter("turn_idx < 2").write.mode("append").parquet(in_dir)
    t.filter("turn_idx >= 2").write.mode("append").parquet(in_dir)

    q = (
        streaming_exact_dedup(read_transcript_stream(spark, in_dir))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sdedup_test")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT text_fp, count(*) AS n FROM sdedup_test GROUP BY 1").collect()
    finally:
        q.stop()
    # one row per fingerprint, and the fingerprint set equals the batch one
    assert all(r.n == 1 for r in got)
    batch_fps = {
        r.text_fp
        for r in t.select(
            F.conv(F.substring(F.md5(F.col("text")), 1, 15), 16, 10)
            .cast("bigint")
            .alias("text_fp")
        )
        .distinct()
        .collect()
    }
    assert {r.text_fp for r in got} == batch_fps


def test_streaming_redaction_matches_batch(spark, tmp_path):
    """The redaction projection (ta_redact_spans' body) is stateless, so it
    must produce identical rows when run over an incremental file stream —
    curation can happen inline at ingestion time."""
    from kie_invoice_minimal_spark.operators.text_analysis import redact_turns

    in_dir = str(tmp_path / "in_redact")
    t = synth_transcripts(spark, 400)
    t.filter("turn_idx < 2").write.mode("append").parquet(in_dir)
    t.filter("turn_idx >= 2").write.mode("append").parquet(in_dir)

    stream = spark.readStream.schema(t.schema).parquet(in_dir)
    q = (
        redact_turns(stream)
        .writeStream.format("memory")
        .queryName("redact_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {tuple(r) for r in spark.sql("SELECT * FROM redact_test").collect()}
    finally:
        q.stop()
    want = {tuple(r) for r in redact_turns(t).collect()}
    assert got == want
    assert any(r[3] > 0 or r[4] > 0 for r in got)  # redactions actually occur


def test_foreachbatch_restart_resumes_without_duplicates(spark, tmp_path):
    """Kill/restart discipline for the streaming sink (r6, closing the gap
    STREAMING.md documented): a NEW query started on the SAME checkpoint
    after a clean stop must process only the files that arrived while it
    was down, and the union of epoch outputs equals the batch extraction
    — no duplicates, no gaps."""
    from kie_invoice_minimal_spark.operators.mention_detect import (
        detect_mentions_arrow,
    )
    from kie_invoice_minimal_spark.streaming.stream_pipeline import (
        run_mentions_to_parquet,
    )

    in_dir = str(tmp_path / "in_restart")
    out_dir = str(tmp_path / "out_restart")
    ckpt = str(tmp_path / "ckpt_restart")
    t = synth_transcripts(spark, 400)
    t.filter("turn_idx < 2").write.mode("append").parquet(in_dir)

    q1 = run_mentions_to_parquet(spark, in_dir, out_dir, ckpt)
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()
    n_first = spark.read.parquet(out_dir).count()
    assert n_first > 0

    # new data lands while the query is DOWN; restart from the checkpoint
    t.filter("turn_idx >= 2").write.mode("append").parquet(in_dir)
    q2 = run_mentions_to_parquet(spark, in_dir, out_dir, ckpt)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    got = sorted(
        (r.conv_id, r.turn_idx, r.pos, r.surface, r.mention_type)
        for r in spark.read.parquet(out_dir).collect()
    )
    want = sorted(
        (r.conv_id, r.turn_idx, r.pos, r.surface, r.mention_type)
        for r in detect_mentions_arrow(t).collect()
    )
    assert len(got) > n_first  # the restart actually processed new files
    assert got == want  # exactly-once across the restart


def test_streaming_novel_facts_exactly_once_across_restart(spark, tmp_path):
    """Streaming twin of kg_triples_incremental: finalized session triples
    are fact-fingerprinted (md5(pred, obj)) and anti-joined against the
    persistent on-disk fact index, so a fact is emitted EXACTLY ONCE
    across micro-batches AND across a kill/restart.  Wave 2 re-asserts
    wave 1's facts from brand-new conversations; every one of them must
    be suppressed by the index built in wave 1's epochs."""
    import hashlib

    from kie_invoice_minimal_spark.operators.mention_detect import (
        detect_mentions_native,
    )
    from kie_invoice_minimal_spark.streaming.stream_pipeline import (
        run_novel_facts_to_parquet,
    )

    in_dir = str(tmp_path / "in_nf")
    out_dir = str(tmp_path / "out_nf")
    idx_dir = str(tmp_path / "idx_nf")
    ckpt = str(tmp_path / "ckpt_nf")

    def kicker(conv, ts, n=2):
        for i in range(n):
            spark.createDataFrame(
                [(conv, i, "user", "thuong hieu VinaMilk", None, ts)],
                "conv_id string, turn_idx int, role string, text string,"
                " tool string, ts string",
            ).withColumn("ts", F.col("ts").cast("timestamp")).write.mode(
                "append"
            ).parquet(in_dir)

    t1 = synth_transcripts(spark, 300)
    t1.write.mode("append").parquet(in_dir)
    q1 = run_novel_facts_to_parquet(spark, in_dir, out_dir, idx_dir, ckpt)
    try:
        q1.processAllAvailable()
        kicker("conv-kick-a", "2024-01-15 00:00:00")  # closes wave-1 sessions
        q1.processAllAvailable()
    finally:
        q1.stop()

    # wave 2 while DOWN: new conv ids, same facts, later event time
    t2 = t1.withColumn(
        "conv_id", F.concat(F.lit("w2-"), F.col("conv_id"))
    ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 30 DAYS"))
    t2.write.mode("append").parquet(in_dir)
    q2 = run_novel_facts_to_parquet(spark, in_dir, out_dir, idx_dir, ckpt)
    try:
        q2.processAllAvailable()
        kicker("conv-kick-b", "2024-06-01 00:00:00")  # closes wave-2 + kick-a
        q2.processAllAvailable()
    finally:
        q2.stop()

    got = spark.read.parquet(out_dir).collect()
    facts = [(r.pred, r.obj) for r in got]
    # exactly-once: no fact ever emitted twice, in any epoch of any run
    assert len(facts) == len(set(facts)) and len(facts) > 0

    # the emitted fact set == distinct facts of every CLOSED session
    # (wave 1 + kick-a + wave 2; conv-kick-b's session never closes);
    # session-window batch recompute, same shape as the streaming agg
    closed = t1.unionByName(
        spark.createDataFrame(
            [
                ("conv-kick-a", 0, "user", "thuong hieu VinaMilk", None,
                 "2024-01-15 00:00:00"),
                ("conv-kick-a", 1, "user", "thuong hieu VinaMilk", None,
                 "2024-01-15 00:00:00"),
            ],
            "conv_id string, turn_idx int, role string, text string,"
            " tool string, ts string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
    ).unionByName(t2)
    m = detect_mentions_native(
        closed.select("conv_id", "turn_idx", "text", "ts"), carry=("ts",)
    )
    want = {
        (r.mention_type, r.obj)
        for r in m.groupBy(
            F.session_window("ts", "30 minutes").alias("sw"),
            "conv_id",
            "mention_type",
        )
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("turn_idx", "pos", "surface"))
                    ),
                    lambda s: s["surface"],
                ),
                " ",
            ).alias("obj")
        )
        .select(F.col("mention_type"), "obj")
        .collect()
    }
    assert set(facts) == want

    # wave 2 actually exercised cross-epoch suppression: its sessions
    # re-asserted only known facts, so the restart run emitted nothing new
    w2_rows = [r for r in got if r.conv_id.startswith("w2-")]
    assert not w2_rows

    # and the index carries exactly one fp per emitted fact
    idx = spark.read.parquet(idx_dir).select("fp").collect()
    def fact_fp(p, o):
        return int(
            hashlib.md5(f"{p}\x01{o}".encode()).hexdigest()[:15], 16
        )
    assert sorted(r.fp for r in idx) == sorted(
        fact_fp(p, o) for p, o in facts
    )


def test_novel_facts_survives_torn_first_index_write(spark, tmp_path):
    """Crash residue from a torn FIRST index write (the epoch dir exists
    but holds only _temporary, no committed parquet) must read as "no
    index yet" — before the committed-file probe this wedged every retry
    of epoch 0 in an unreadable-schema crash loop."""
    import os

    from kie_invoice_minimal_spark.streaming.stream_pipeline import (
        run_novel_facts_to_parquet,
    )

    in_dir = str(tmp_path / "in_torn")
    out_dir = str(tmp_path / "out_torn")
    idx_dir = str(tmp_path / "idx_torn")
    ckpt = str(tmp_path / "ckpt_torn")
    os.makedirs(os.path.join(idx_dir, "epoch=0", "_temporary"))

    synth_transcripts(spark, 200).write.mode("append").parquet(in_dir)
    q = run_novel_facts_to_parquet(spark, in_dir, out_dir, idx_dir, ckpt)
    try:
        q.processAllAvailable()
        for i in range(2):  # kicker x2 advances the watermark
            spark.createDataFrame(
                [("conv-kick", i, "user", "thuong hieu VinaMilk", None,
                  "2024-06-01 00:00:00")],
                "conv_id string, turn_idx int, role string, text string,"
                " tool string, ts string",
            ).withColumn("ts", F.col("ts").cast("timestamp")).write.mode(
                "append"
            ).parquet(in_dir)
            q.processAllAvailable()
        assert q.exception() is None
    finally:
        q.stop()
    assert spark.read.parquet(out_dir).count() > 0
