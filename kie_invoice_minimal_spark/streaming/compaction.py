"""Stopped-stream compaction of the novel-fact fingerprint index.

``run_novel_facts_to_parquet`` (stream_pipeline.py) grows its fact index
one ``epoch=K`` directory per micro-batch, and every batch re-lists all of
them — O(epochs) listing plus small-file accumulation on a long-running
stream.  Safe IN-SINK folding is impossible with plain parquet directories
(stream_pipeline.py:214-226 documents why: every ordering has a crash
window that either loses fingerprints or breaks the replay-exclusion
rule), which is exactly the transactionality Iceberg's MERGE/rewrite
supplies on the production path.  This module is the documented offline
half (r6 verdict item 4): a compact-WHILE-STOPPED utility whose every
crash window reads as the OLD epoch layout — never as fact loss.

Crash-safety argument, step by step (the order is load-bearing):

1. The consolidated fingerprint set (distinct fps of every source epoch)
   is written to ``<index>/_compact_tmp`` — a leading-underscore path
   that Spark's parquet reader IGNORES, so a crash here leaves residue
   that changes nothing (the next compactor run wipes it).
2. The tmp dir is renamed — one atomic same-filesystem os.rename — to
   ``epoch=<target>`` where target is a NEGATIVE epoch number (-1, then
   -2 on recompaction, monotonically decreasing).  Negative targets
   satisfy the sink's replay-exclusion filter ``epoch < current`` for
   EVERY future (and replayed) batch, and never collide with a real
   epoch.  A crash immediately after the rename leaves the consolidated
   dir AND all source dirs visible: the reader unions them, duplicate
   fingerprints are a no-op for an anti-join, output unchanged.
3. Only then are the source epoch dirs deleted, one rmtree each.  A
   crash mid-deletion is case 2 with fewer duplicates.

The HIGHEST-numbered epoch is always left untouched: foreachBatch is
at-least-once, so after a crash the stream may REPLAY its last epoch,
whose idempotence depends on the sink's own-epoch exclusion — folding
that epoch's fingerprints into a negative target would make the replay
anti-join against its own facts and emit a torn (empty) epoch.  Earlier
epochs are checkpoint-committed and cannot replay.

Run this ONLY while the stream is stopped: the sink re-resolves the index
from disk each epoch, so the next start transparently reads the compacted
layout (the stream-static join contract stream_pipeline.py states).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

TMP_NAME = "_compact_tmp"


def _epoch_dirs(index_dir: str) -> dict[int, str]:
    """{epoch value: absolute path} for every committed epoch partition."""
    out: dict[int, str] = {}
    try:
        entries = os.listdir(index_dir)
    except FileNotFoundError:
        return out
    for d in entries:
        if not d.startswith("epoch="):
            continue
        try:
            e = int(d.split("=", 1)[1])
        except ValueError:
            continue
        out[e] = os.path.join(index_dir, d)
    return out


def compact_fact_index(
    spark: SparkSession,
    index_dir: str,
    keep_latest: int = 1,
    _delete_sources: bool = True,
) -> dict:
    """Fold all but the ``keep_latest`` highest epochs of a STOPPED
    stream's fact index into one negative-numbered epoch directory.

    Returns a stats dict: {"compacted": [source epochs], "target": epoch
    or None, "n_fps": consolidated fingerprint count}.  No-op (target
    None) when fewer than two compactable epochs exist.  ``keep_latest``
    must stay ≥ 1 (the replay-safety floor documented in the module
    docstring); ``_delete_sources`` exists so the crash-residue test can
    freeze the post-rename/pre-delete window."""
    if keep_latest < 1:
        raise ValueError("keep_latest must be >= 1 (last epoch may replay)")
    tmp = os.path.join(index_dir, TMP_NAME)
    shutil.rmtree(tmp, ignore_errors=True)  # stale residue from a crash

    dirs = _epoch_dirs(index_dir)
    if not dirs:
        return {"compacted": [], "target": None, "n_fps": 0}
    protected = sorted(dirs)[-keep_latest:]
    sources = sorted(e for e in dirs if e not in protected)
    if len(sources) < 2:
        return {"compacted": [], "target": None, "n_fps": 0}
    target = min(-1, min(sources) - 1)  # -1 first, then below any negative

    fps = (
        spark.read.parquet(index_dir)
        .filter(F.col("epoch").isin(sources))
        .select("fp")
        .distinct()
    )
    n = fps.count()
    fps.write.mode("overwrite").parquet(tmp)
    os.rename(tmp, os.path.join(index_dir, f"epoch={target}"))
    if _delete_sources:
        for e in sources:
            shutil.rmtree(dirs[e], ignore_errors=True)
    return {"compacted": sources, "target": target, "n_fps": n}
