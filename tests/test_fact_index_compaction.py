"""Stopped-stream fact-index compaction (r6 verdict item 4).

The novel-fact sink's index grows one ``epoch=K`` dir per micro-batch;
``compaction.compact_fact_index`` folds all but the newest into ONE
negative-numbered epoch while the stream is stopped.  These tests prove
the contract end to end:

- byte-identical novel-fact output across a restart with a compacted
  index vs an uncompacted CONTROL pipeline fed the identical input;
- every crash window reads as the OLD epoch layout (tmp residue ignored;
  post-rename/pre-delete duplicates harmless), never as fact loss.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kie_invoice_minimal_spark.sources.transcripts import synth_transcripts
from kie_invoice_minimal_spark.streaming.compaction import (
    TMP_NAME,
    _epoch_dirs,
    compact_fact_index,
)
from kie_invoice_minimal_spark.streaming.stream_pipeline import (
    run_novel_facts_to_parquet,
)


def _kick(spark, in_dir: str, conv: str, ts: str, n: int = 2) -> None:
    """Append a late-timestamp conversation so the watermark closes every
    earlier session (the same kicker as test_streaming)."""
    for i in range(n):
        spark.createDataFrame(
            [(conv, i, "user", "thuong hieu VinaMilk", None, ts)],
            "conv_id string, turn_idx int, role string, text string,"
            " tool string, ts string",
        ).withColumn("ts", F.col("ts").cast("timestamp")).write.mode(
            "append"
        ).parquet(in_dir)


def _drain(
    spark, dirs: dict, appends, kick: tuple[str, str], compact_k=None
) -> None:
    """Append input, run the novel-fact stream until drained, kick the
    watermark forward, drain again, stop.  ``compact_k`` feeds the sink's
    startup auto-compaction threshold (None = never compact — the
    pre-r8 control behavior every pre-existing test ran under)."""
    for df in appends:
        df.write.mode("append").parquet(dirs["in"])
    q = run_novel_facts_to_parquet(
        spark,
        dirs["in"],
        dirs["out"],
        dirs["idx"],
        dirs["ckpt"],
        compact_on_start_epochs=compact_k,
    )
    try:
        q.processAllAvailable()
        _kick(spark, dirs["in"], *kick)
        q.processAllAvailable()
    finally:
        q.stop()


def _facts(spark, out_dir: str) -> list[tuple]:
    return sorted(
        (r.subj, r.pred, r.obj, r.conv_id)
        for r in spark.read.parquet(out_dir).collect()
    )


def _fps(spark, idx_dir: str) -> list[int]:
    return sorted(
        r.fp for r in spark.read.parquet(idx_dir).select("fp").distinct().collect()
    )


def _mkdirs(tmp_path, tag: str) -> dict:
    return {
        k: str(tmp_path / f"{k}_{tag}")
        for k in ("in", "out", "idx", "ckpt")
    }


def test_compacted_index_yields_identical_novel_output(spark, tmp_path):
    """The headline contract: compact pipeline A's index between waves;
    pipeline B (identical input, never compacted) is the control.  The
    cumulative novel-fact output and the distinct fingerprint sets must
    be IDENTICAL — compaction is invisible to the sink."""
    A, B = _mkdirs(tmp_path, "a"), _mkdirs(tmp_path, "b")
    t1 = synth_transcripts(spark, 300)
    _drain(spark, A, [t1], ("kick-a1", "2024-01-15 00:00:00"))
    _drain(spark, B, [t1], ("kick-a1", "2024-01-15 00:00:00"))

    stats = compact_fact_index(spark, A["idx"])
    assert stats["target"] == -1 and len(stats["compacted"]) >= 2, stats
    # compacted layout: the negative target + the protected newest epoch(s)
    eps = sorted(_epoch_dirs(A["idx"]))
    assert eps[0] == -1 and all(e not in eps for e in stats["compacted"])
    assert _fps(spark, A["idx"]) == _fps(spark, B["idx"])

    # wave 2 (while stopped): new conv ids re-asserting wave-1 facts, plus
    # genuinely novel facts from a shifted corpus
    t2 = t1.withColumn("conv_id", F.concat(F.lit("w2-"), F.col("conv_id"))).withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 30 DAYS")
    )
    _drain(spark, A, [t2], ("kick-a2", "2024-06-01 00:00:00"))
    _drain(spark, B, [t2], ("kick-a2", "2024-06-01 00:00:00"))

    assert _facts(spark, A["out"]) == _facts(spark, B["out"])
    assert _fps(spark, A["idx"]) == _fps(spark, B["idx"])


def test_crash_residue_tmp_is_invisible_and_cleaned(spark, tmp_path):
    """Crash window 1 (before the atomic rename): a leftover _compact_tmp
    must change NOTHING for the reader, and the next compactor run wipes
    it and completes."""
    D = _mkdirs(tmp_path, "c")
    _drain(spark, D, [synth_transcripts(spark, 200)], ("kick-c", "2024-01-15 00:00:00"))
    before = _fps(spark, D["idx"])

    tmp = os.path.join(D["idx"], TMP_NAME)
    os.makedirs(tmp)
    with open(os.path.join(tmp, "part-junk.parquet"), "wb") as f:
        f.write(b"torn half-written residue, not a parquet footer")
    assert _fps(spark, D["idx"]) == before  # underscore path ignored

    stats = compact_fact_index(spark, D["idx"])
    assert stats["target"] == -1
    assert not os.path.exists(tmp)
    assert _fps(spark, D["idx"]) == before


def test_crash_window_after_rename_duplicates_are_harmless(spark, tmp_path):
    """Crash window 2 (consolidated renamed in, sources not yet deleted):
    the reader unions consolidated + sources; duplicate fingerprints are
    a no-op for the anti-join, so the fp set — and therefore the next
    wave's output — is unchanged."""
    E = _mkdirs(tmp_path, "d")
    _drain(spark, E, [synth_transcripts(spark, 200)], ("kick-d", "2024-01-15 00:00:00"))
    before = _fps(spark, E["idx"])
    stats = compact_fact_index(spark, E["idx"], _delete_sources=False)
    assert stats["target"] == -1
    eps = sorted(_epoch_dirs(E["idx"]))
    assert -1 in eps and set(stats["compacted"]) <= set(eps)  # both layers live
    assert _fps(spark, E["idx"]) == before

    # a restart over the torn layout suppresses every known fact
    t2 = (
        synth_transcripts(spark, 200)
        .withColumn("conv_id", F.concat(F.lit("re-"), F.col("conv_id")))
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 30 DAYS"))
    )
    _drain(spark, E, [t2], ("kick-d2", "2024-06-01 00:00:00"))
    re_rows = [
        r
        for r in spark.read.parquet(E["out"]).collect()
        if r.conv_id.startswith("re-")
    ]
    assert not re_rows


def test_compactor_noop_and_guardrails(spark, tmp_path):
    import pytest

    missing = str(tmp_path / "no_such_idx")
    assert compact_fact_index(spark, missing)["target"] is None
    # a single epoch (even several, all protected) is a no-op
    one = str(tmp_path / "one_idx")
    spark.createDataFrame([(1,)], "fp long").write.parquet(f"{one}/epoch=0")
    assert compact_fact_index(spark, one)["target"] is None
    with pytest.raises(ValueError, match="keep_latest"):
        compact_fact_index(spark, one, keep_latest=0)


def test_recompaction_targets_descend(spark, tmp_path):
    """A second compaction (after more epochs accrue) folds the previous
    negative target too, into a strictly lower negative — monotone, never
    colliding, always < every future epoch id."""
    idx = str(tmp_path / "re_idx")
    for e, fp in [(0, 10), (1, 11), (2, 12)]:
        spark.createDataFrame([(fp,)], "fp long").write.parquet(
            f"{idx}/epoch={e}"
        )
    s1 = compact_fact_index(spark, idx)
    assert s1["target"] == -1 and s1["compacted"] == [0, 1]
    for e, fp in [(3, 13), (4, 14)]:
        spark.createDataFrame([(fp,)], "fp long").write.parquet(
            f"{idx}/epoch={e}"
        )
    s2 = compact_fact_index(spark, idx)
    assert s2["target"] == -2 and s2["compacted"] == [-1, 2, 3]
    assert _fps(spark, idx) == [10, 11, 12, 13, 14]
    assert sorted(_epoch_dirs(idx)) == [-2, 4]


def test_startup_autocompaction_longrun_bounded_and_identical(spark, tmp_path):
    """r7 next-round item 5 (long-run contract): ≥30 micro-batches across
    restart cycles at K=8 — pipeline A auto-compacts at every startup,
    control B never compacts.  A's epoch-dir count stays BOUNDED
    (≤ K + batches-per-run) instead of growing with stream lifetime,
    while the cumulative novel-fact output and distinct fp sets stay
    byte-identical to the control."""
    from datetime import datetime, timedelta

    K = 8
    A, B = _mkdirs(tmp_path, "lrA"), _mkdirs(tmp_path, "lrB")
    n_cycles = 12
    a_epoch_highwater = 0
    total_batches = 0
    for i in range(n_cycles):
        wave = (
            synth_transcripts(spark, 40)
            .withColumn("conv_id", F.concat(F.lit(f"w{i}-"), F.col("conv_id")))
            .withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {30 * i} DAYS"))
        )
        kick_ts = (datetime(2024, 1, 15) + timedelta(days=30 * i)).strftime(
            "%Y-%m-%d %H:%M:%S"
        )
        _drain(spark, A, [wave], (f"kick-{i}", kick_ts), compact_k=K)
        _drain(spark, B, [wave], (f"kick-{i}", kick_ts), compact_k=None)
        eps_a = _epoch_dirs(A["idx"])
        a_epoch_highwater = max(a_epoch_highwater, len(eps_a))
        total_batches = max(eps_a.keys(), default=0)
    # ≥30 micro-batches actually ran (epoch ids are the batch counter)
    assert total_batches >= 30, total_batches
    # bounded: every start folds down past K, and one run adds only the
    # run's own batches; the control grew with stream lifetime
    batches_per_run = 4  # wave append + kick (+ watermark-close flushes)
    assert a_epoch_highwater <= K + batches_per_run, a_epoch_highwater
    assert len(_epoch_dirs(A["idx"])) < len(_epoch_dirs(B["idx"]))
    assert len(_epoch_dirs(B["idx"])) >= 30
    # compaction is invisible: identical novel output, identical fp set
    assert _facts(spark, A["out"]) == _facts(spark, B["out"])
    assert _fps(spark, A["idx"]) == _fps(spark, B["idx"])


def test_startup_autocompaction_heals_crash_residue(spark, tmp_path):
    """The crash-window contract re-run THROUGH the startup path: plant
    both compactor crash residues (pre-rename tmp junk AND post-rename
    undeleted sources) over an over-K index, then simply START the
    stream — startup compaction must wipe the residue, fold the layout,
    and the next wave's novel output must match a clean control."""
    C, D = _mkdirs(tmp_path, "crA"), _mkdirs(tmp_path, "crB")
    t1 = synth_transcripts(spark, 200)
    _drain(spark, C, [t1], ("kick-1", "2024-01-15 00:00:00"), compact_k=None)
    _drain(spark, D, [t1], ("kick-1", "2024-01-15 00:00:00"), compact_k=None)
    before = _fps(spark, C["idx"])

    # crash residue 1: torn tmp dir (pre-rename window)
    tmp = os.path.join(C["idx"], TMP_NAME)
    os.makedirs(tmp)
    with open(os.path.join(tmp, "part-junk.parquet"), "wb") as f:
        f.write(b"torn residue")
    # crash residue 2: a previous compaction that died post-rename —
    # negative target present AND its sources still on disk
    compact_fact_index(spark, C["idx"], _delete_sources=False)
    assert os.path.exists(os.path.join(C["idx"], "epoch=-1"))
    assert _fps(spark, C["idx"]) == before  # duplicates harmless

    t2 = (
        t1.withColumn("conv_id", F.concat(F.lit("w2-"), F.col("conv_id")))
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 30 DAYS"))
    )
    # K=0: any startup with >0 epochs compacts — forces the startup path
    _drain(spark, C, [t2], ("kick-2", "2024-06-01 00:00:00"), compact_k=0)
    _drain(spark, D, [t2], ("kick-2", "2024-06-01 00:00:00"), compact_k=None)
    assert not os.path.exists(tmp)  # residue wiped by the startup fold
    assert _facts(spark, C["out"]) == _facts(spark, D["out"])
    assert _fps(spark, C["idx"]) == _fps(spark, D["idx"])
