"""Snapshot checkpoints + resumable pipeline state — SURVEY.md S6/Stage 5.

The reference checkpoints model state to ``.pth`` and resumes with a
filtered load (``scripts/train_kie.py:256-308``, ``kie_utils.py:38-63``).
The engine's analog is *stage materialization*: every pipeline stage writes
its output table as a parquet snapshot plus a ``pipeline_state`` record
(stage name, status, row count, per-partition lineage counters, input
fingerprint).  A restarted run loads completed snapshots instead of
recomputing — kill the job between stages and the rerun produces identical
outputs (BASELINE.md resumability row).

On a real deployment the snapshot store is an Iceberg table and the state
row carries its snapshot id; parquet-dir-per-stage keeps the identical
semantics in this sandbox (atomicity via write-then-rename of the state
file, which is the same commit protocol Iceberg gives us for free).

Per-partition lineage: each stage's writer runs ``observe()`` row counters
and records rows-per-output-partition, the "per-partition lineage + counter
metrics" the north rule demands.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F


@dataclass
class Stage:
    name: str
    # fn(spark, {upstream_name: DataFrame}) -> DataFrame
    fn: Callable[[SparkSession, dict[str, DataFrame]], DataFrame]


_CODE_FP: list[str] = []  # per-process cache


def engine_code_fingerprint() -> str:
    """Deterministic md5 over the engine package's source bytes (sorted
    relpath + contents of every .py under kie_invoice_minimal_spark/) —
    the snapshot MANIFEST key (r6 ADVICE item 1): a resume must never
    silently load snapshots built by a DIFFERENT code version (a stale
    persistent root, a wipe=False derive path surviving a deploy), because
    stage semantics may have changed while the parquet looks perfectly
    healthy.  Computed once per process (~one read of the package
    source); recorded in every stage state and required to MATCH on
    resume — a mismatched (or missing, i.e. pre-manifest) fingerprint
    makes the stage read as incomplete, so it recomputes under the
    current code instead of resuming stale bytes.

    SCOPE (r7 ADVICE item 2): the fingerprint covers the ENGINE PACKAGE
    only (every .py under kie_invoice_minimal_spark/).  A stage callable
    defined OUTSIDE the package (user code, __spark_entry__.py) is
    additionally hashed per-stage at write time (its inspect.getsource
    bytes ride the stage state record — see _write_stage's stage_fn_
    fingerprint), so an out-of-package stage edit also invalidates its
    snapshot on resume; stages whose source inspect cannot see (REPL
    lambdas, exec'd code) record a non-reusable per-process marker and
    therefore never resume across processes — conservative, never
    stale."""
    if _CODE_FP:
        return _CODE_FP[0]
    import hashlib

    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    h = hashlib.md5()
    n_files = 0
    for dirpath, dirnames, filenames in sorted(os.walk(pkg_root)):
        dirnames.sort()
        for fn in sorted(filenames):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            rel = os.path.relpath(path, pkg_root)
            h.update(rel.encode())
            h.update(b"\0")
            with open(path, "rb") as f:
                h.update(f.read())
            h.update(b"\0")
            n_files += 1
    if n_files == 0:
        # spark-submit --py-files deployment: the package lives INSIDE a
        # zip, so os.walk over the in-zip path yields nothing — hashing
        # "no files" would give every zip deploy the SAME fingerprint and
        # silently degrade the manifest check to a pass-through.  Hash
        # the archive bytes instead: same contract (code changed <=>
        # fingerprint changed), since --py-files ships the whole zip.
        lower = pkg_root.lower()
        hashed_archive = False
        for ext in (".zip", ".egg"):
            # r7 ADVICE item 3: a path COMPONENT merely containing
            # ".zip"/".egg" is not an archive — without the isfile guard
            # open() raises IsADirectoryError/FileNotFoundError here and
            # crashes fingerprint computation instead of falling through
            # to the never-reusable uuid branch
            if ext in lower:
                archive = pkg_root[: lower.index(ext) + len(ext)]
                if not os.path.isfile(archive):
                    continue
                with open(archive, "rb") as f:
                    for chunk in iter(lambda: f.read(1 << 20), b""):
                        h.update(chunk)
                hashed_archive = True
                break
        if not hashed_archive:  # unlocatable source: never claim reusable
            import uuid

            h.update(f"unhashable-source-{uuid.uuid4().hex}".encode())
    _CODE_FP.append(h.hexdigest())
    return _CODE_FP[0]


_PROC_MARKER: list[str] = []  # per-process marker for uninspectable stage fns


def stage_fn_fingerprint(fn) -> str:
    """md5 of a stage callable's SOURCE TEXT — the per-stage half of the
    resume manifest (r7 ADVICE item 2): engine_code_fingerprint covers
    only the package's .py files, but CheckpointedPipeline accepts
    arbitrary callables, so a stage defined in user code
    (__spark_entry__.py, a notebook module) could change across a deploy
    while the engine fingerprint stayed put — and its stale snapshot
    would silently resume.  Hashing inspect.getsource closes that hole
    for every file-backed OUT-OF-PACKAGE callable; a callable defined
    INSIDE the package returns the constant "in-package" (every package
    source byte already moves engine_code_fingerprint, and hashing the
    same bytes twice would add nothing); callables whose source inspect
    cannot recover (REPL lambdas, exec'd code) get a process-stable but
    never-persistent-across-processes marker, so they recompute on every
    new process rather than ever resuming stale."""
    import hashlib
    import inspect

    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        src_file = inspect.getsourcefile(fn) or ""
        if os.path.abspath(src_file).startswith(pkg_root + os.sep):
            return "in-package"
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        if not _PROC_MARKER:
            import uuid

            _PROC_MARKER.append(uuid.uuid4().hex)
        return f"uninspectable-{_PROC_MARKER[0]}"
    return hashlib.md5(src.encode()).hexdigest()


class CheckpointedPipeline:
    """Ordered stages with parquet snapshots and JSON state records."""

    def __init__(self, spark: SparkSession, root: str, stages: list[Stage]):
        self.spark = spark
        self.root = root
        self.stages = stages
        os.makedirs(self._state_dir, exist_ok=True)

    @property
    def _state_dir(self) -> str:
        return os.path.join(self.root, "_pipeline_state")

    def _data_dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _state_path(self, stage: str) -> str:
        return os.path.join(self._state_dir, f"{stage}.json")

    def state(self, stage: str) -> dict | None:
        p = self._state_path(stage)
        if not os.path.exists(p):
            return None
        try:
            with open(p) as f:
                return json.load(f)
        except (json.JSONDecodeError, OSError):
            # a torn/corrupt state record (crash mid-commit) means the stage
            # did not complete — recompute rather than crash the resume
            return None

    def _stage_fn(self, stage: str):
        for st in self.stages:
            if st.name == stage:
                return st.fn
        return None

    def is_complete(self, stage: str) -> bool:
        """Complete AND built by THIS code version (see
        engine_code_fingerprint) AND by this stage callable's source (see
        stage_fn_fingerprint — out-of-package stage edits must also
        invalidate) — a stale or pre-manifest snapshot reads as
        incomplete and recomputes rather than resuming silently."""
        st = self.state(stage)
        fn = self._stage_fn(stage)
        return bool(
            st
            and st.get("status") == "complete"
            and st.get("code_fingerprint") == engine_code_fingerprint()
            and fn is not None
            and st.get("stage_fn_fingerprint") == stage_fn_fingerprint(fn)
        )

    def load(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(self._data_dir(stage))

    def _write_stage(self, name: str, df: DataFrame) -> DataFrame:
        t_start = time.time()
        out = self._data_dir(name)
        # counter metric riding the WRITE job itself (no extra action): the
        # Observation resolves once the write finishes, giving the row count
        # the writer actually produced
        obs = Observation(f"obs_{name}_{int(time.time()*1000)}")
        df.observe(obs, F.count(F.lit(1)).alias("n_rows")).write.mode(
            "overwrite"
        ).parquet(out)
        n_written = int(obs.get["n_rows"])
        t_written = time.time()
        # per-partition lineage comes from reading the snapshot back — it
        # describes the table AS STORED (what a resume will load), and the
        # observed write count cross-checks it: a mismatch means a torn or
        # concurrently-modified snapshot, surfaced instead of trusted
        back = self.spark.read.parquet(out)
        lineage = {
            os.path.basename(r.f): r.n
            for r in back.groupBy(F.input_file_name().alias("f"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        n_stored = int(sum(lineage.values()))
        if n_stored != n_written:
            raise RuntimeError(
                f"stage {name}: snapshot readback has {n_stored} rows but the "
                f"write job observed {n_written} — torn snapshot"
            )
        state = {
            "stage": name,
            "status": "complete",
            "snapshot_path": out,
            "n_rows": n_stored,
            "n_rows_observed": n_written,
            "n_partitions": len(lineage),
            "partition_rows": lineage,
            # per-stage wall time — the reference's @timer instrumentation
            # (backend_utils.py:30-40) lifted into the state record.
            # Split (r2 ADVICE): wall_write_sec is the stage's compute+write
            # job alone; wall_verify_sec is the snapshot readback + lineage
            # collect that resume-proofs it; wall_sec stays as the total for
            # backward compatibility with existing pipeline_state consumers.
            "wall_write_sec": round(t_written - t_start, 3),
            "wall_verify_sec": round(time.time() - t_written, 3),
            "wall_sec": round(time.time() - t_start, 3),
            "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            # resume manifest: stale-code snapshots must not resume —
            # engine package hash plus this stage callable's source hash
            # (out-of-package stages change without moving the package
            # fingerprint; r7 ADVICE item 2)
            "code_fingerprint": engine_code_fingerprint(),
            "stage_fn_fingerprint": stage_fn_fingerprint(self._stage_fn(name)),
        }
        tmp = self._state_path(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f, indent=1, sort_keys=True)
        os.replace(tmp, self._state_path(name))  # atomic commit
        return back

    def run(self, resume: bool = True) -> dict[str, DataFrame]:
        """Execute stages in order, skipping completed ones when resuming."""
        done: dict[str, DataFrame] = {}
        for st in self.stages:
            if resume and self.is_complete(st.name):
                done[st.name] = self.load(st.name)
                continue
            df = st.fn(self.spark, done)
            done[st.name] = self._write_stage(st.name, df)
        return done

    def invalidate(self, stage: str) -> None:
        """Drop a stage's snapshot + state (forces recompute downstream of a
        code/data change)."""
        p = self._state_path(stage)
        if os.path.exists(p):
            os.remove(p)
        d = self._data_dir(stage)
        if os.path.exists(d):
            shutil.rmtree(d)

    def metrics(self) -> list[dict]:
        """All stage state records (the pipeline_state table)."""
        out = []
        for st in self.stages:
            s = self.state(st.name)
            if s:
                out.append(s)
        return out


def kg_pipeline(
    spark: SparkSession,
    root: str,
    transcripts_provider: Callable[[SparkSession], DataFrame],
) -> CheckpointedPipeline:
    """The flagship staged pipeline: transcripts -> mentions -> entity_map ->
    triples (conversation triples ∪ alias triples)."""
    from ..operators.mention_detect import detect_mentions_arrow, with_mention_id
    from ..operators.triples import materialize_triples
    from ..plans.entity_linking import alias_triples, link_entities

    def s_transcripts(sp, _):
        return transcripts_provider(sp)

    def s_mentions(sp, up):
        # persisted mentions carry the stable 64-bit id (join-stable lineage
        # key across resumes)
        return with_mention_id(detect_mentions_arrow(up["transcripts"]))

    def s_entity_map(sp, up):
        return link_entities(up["mentions"])

    def s_triples(sp, up):
        conv = materialize_triples(up["mentions"])
        alias = alias_triples(up["entity_map"]).withColumn(
            "conv_id", F.lit(None).cast("string")
        )
        return conv.unionByName(alias)

    return CheckpointedPipeline(
        spark,
        root,
        [
            Stage("transcripts", s_transcripts),
            Stage("mentions", s_mentions),
            Stage("entity_map", s_entity_map),
            Stage("triples", s_triples),
        ],
    )
