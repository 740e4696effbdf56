"""Resumability: kill-and-restart between stages reproduces identical
triples; completed stages are loaded, not recomputed (BASELINE.md row 6)."""

from __future__ import annotations

import pytest

from kie_invoice_minimal_spark.sources.checkpoints import kg_pipeline
from kie_invoice_minimal_spark.sources.transcripts import synth_transcripts


def _provider(n):
    return lambda sp: synth_transcripts(sp, n)


def _triples(dfs):
    return sorted(map(tuple, dfs["triples"].collect()))


def test_full_run_then_resume_skips_recompute(spark, tmp_path):
    root = str(tmp_path / "ckpt")
    p1 = kg_pipeline(spark, root, _provider(400))
    out1 = _triples(p1.run())

    # second run must NOT recompute anything: poison the provider (the
    # transcripts stage calling it would raise) AND poison _write_stage
    # (ANY recomputed stage must write its snapshot, so a resume that
    # recomputes trips it).  The stage fns themselves are left alone —
    # under the r8 per-stage source manifest, REPLACING a stage fn is a
    # code change and legitimately forces recompute (see
    # test_changed_stage_fn_source_forces_recompute).
    def boom(sp):
        raise AssertionError("stage recomputed despite checkpoint")

    p2 = kg_pipeline(spark, root, boom)
    p2._write_stage = lambda name, df: (_ for _ in ()).throw(
        AssertionError(f"stage {name} recomputed despite checkpoint")
    )
    out2 = _triples(p2.run(resume=True))
    assert out1 == out2


def test_kill_midway_then_resume(spark, tmp_path):
    root = str(tmp_path / "ckpt2")
    full = kg_pipeline(spark, root, _provider(400))
    golden = _triples(full.run())

    # simulate a crash after 'mentions': drop the later snapshots
    full.invalidate("entity_map")
    full.invalidate("triples")
    assert full.is_complete("mentions") and not full.is_complete("entity_map")

    resumed = kg_pipeline(spark, root, _provider(400))
    out = _triples(resumed.run(resume=True))
    assert out == golden


def test_state_metrics(spark, tmp_path):
    root = str(tmp_path / "ckpt3")
    p = kg_pipeline(spark, root, _provider(200))
    p.run()
    ms = p.metrics()
    assert [m["stage"] for m in ms] == ["transcripts", "mentions", "entity_map", "triples"]
    for m in ms:
        assert m["status"] == "complete"
        assert m["n_rows"] == sum(m["partition_rows"].values())
        assert m["n_rows"] > 0
    assert ms[0]["n_rows"] == 200


@pytest.mark.parametrize("resume", [False])
def test_no_resume_recomputes(spark, tmp_path, resume):
    root = str(tmp_path / "ckpt4")
    p = kg_pipeline(spark, root, _provider(150))
    a = _triples(p.run(resume=False))
    b = _triples(p.run(resume=False))  # recompute everything, same result
    assert a == b


def test_torn_state_file_recomputes(spark, tmp_path):
    """A truncated state record (crash mid-commit) means the stage did not
    complete: resume must recompute it, not crash, and reproduce identical
    triples."""
    import os

    root = str(tmp_path / "ckpt5")
    p = kg_pipeline(spark, root, _provider(300))
    golden = _triples(p.run())

    state_path = p._state_path("entity_map")
    with open(state_path) as f:
        content = f.read()
    with open(state_path, "w") as f:
        f.write(content[: len(content) // 2])  # torn JSON
    assert p.state("entity_map") is None
    assert not p.is_complete("entity_map")

    resumed = kg_pipeline(spark, root, _provider(300))
    out = _triples(resumed.run(resume=True))
    assert out == golden
    # the torn record was recommitted whole
    assert resumed.is_complete("entity_map")
    assert resumed.state("entity_map")["n_rows_observed"] == resumed.state("entity_map")["n_rows"]


def test_observed_counter_in_state(spark, tmp_path):
    """Round-2 contract: every stage record carries the write-job Observation
    counter and it equals the readback count."""
    root = str(tmp_path / "ckpt6")
    p = kg_pipeline(spark, root, _provider(200))
    p.run()
    for m in p.metrics():
        assert m["n_rows_observed"] == m["n_rows"]


def test_stale_code_fingerprint_forces_recompute(spark, tmp_path):
    """r6 ADVICE item 1 (manifest half): a snapshot whose state record
    carries a DIFFERENT code fingerprint — a persistent root surviving a
    deploy — must read as incomplete and recompute under the current
    code, reproducing identical output and re-stamping the manifest.  A
    pre-manifest state record (no fingerprint key) is treated the same."""
    import json
    import os

    from kie_invoice_minimal_spark.sources.checkpoints import (
        engine_code_fingerprint,
    )

    root = str(tmp_path / "ckpt_fp")
    p1 = kg_pipeline(spark, root, _provider(300))
    golden = _triples(p1.run())
    fp = engine_code_fingerprint()
    assert all(m["code_fingerprint"] == fp for m in p1.metrics())

    # tamper: pretend 'mentions' was built by an older code version
    sp = os.path.join(root, "_pipeline_state", "mentions.json")
    st = json.load(open(sp))
    st["code_fingerprint"] = "deadbeef" * 4
    json.dump(st, open(sp, "w"))
    p2 = kg_pipeline(spark, root, _provider(300))
    assert not p2.is_complete("mentions")  # stale -> not resumable
    out = _triples(p2.run(resume=True))
    assert out == golden
    assert p2.state("mentions")["code_fingerprint"] == fp  # re-stamped

    # pre-manifest record (missing key) is equally non-resumable
    st = json.load(open(sp))
    del st["code_fingerprint"]
    json.dump(st, open(sp, "w"))
    assert not kg_pipeline(spark, root, _provider(300)).is_complete("mentions")


def _stage_rows_v1(sp, up):
    import pyspark.sql.functions as _F

    return sp.range(10).select(_F.col("id"), _F.lit("v1").alias("tag"))


def _stage_rows_v2(sp, up):
    import pyspark.sql.functions as _F

    return sp.range(10).select(_F.col("id"), _F.lit("v2").alias("tag"))


def test_changed_stage_fn_source_forces_recompute(spark, tmp_path):
    """r7 ADVICE item 2 (out-of-package half): a stage callable defined
    OUTSIDE the engine package (this test file stands in for user code /
    __spark_entry__.py) changes across a deploy WITHOUT moving
    engine_code_fingerprint — its stale snapshot must read as incomplete
    and recompute under the new source, while an identical-source rebuild
    resumes."""
    from kie_invoice_minimal_spark.sources.checkpoints import (
        CheckpointedPipeline,
        Stage,
        stage_fn_fingerprint,
    )

    root = str(tmp_path / "ckpt_fnfp")
    p1 = CheckpointedPipeline(spark, root, [Stage("rows", _stage_rows_v1)])
    out1 = p1.run()
    assert {r.tag for r in out1["rows"].collect()} == {"v1"}
    rec = p1.state("rows")["stage_fn_fingerprint"]
    assert rec == stage_fn_fingerprint(_stage_rows_v1)
    assert rec != "in-package" and not rec.startswith("uninspectable-")

    # same source object -> resumable (and the engine fp alone would say so)
    p_same = CheckpointedPipeline(spark, root, [Stage("rows", _stage_rows_v1)])
    assert p_same.is_complete("rows")

    # DIFFERENT source, same engine fingerprint -> stale, recomputes
    p2 = CheckpointedPipeline(spark, root, [Stage("rows", _stage_rows_v2)])
    assert not p2.is_complete("rows")
    out2 = p2.run(resume=True)
    assert {r.tag for r in out2["rows"].collect()} == {"v2"}
    assert p2.state("rows")["stage_fn_fingerprint"] == stage_fn_fingerprint(
        _stage_rows_v2
    )

    # in-package stage fns record the constant (covered by the engine fp)
    root2 = str(tmp_path / "ckpt_fnfp2")
    kp = kg_pipeline(spark, root2, _provider(50))
    kp.run()
    assert all(
        m["stage_fn_fingerprint"] == "in-package" for m in kp.metrics()
    )

    # uninspectable callables never resume across processes: the marker is
    # process-stable but embeds a per-process uuid
    fn = eval("lambda sp, up: sp.range(1)")
    m1, m2 = stage_fn_fingerprint(fn), stage_fn_fingerprint(fn)
    assert m1 == m2 and m1.startswith("uninspectable-")
