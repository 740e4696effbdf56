"""Staged EL pipeline (one materialized blocking→scorer→CC run) must
produce byte-identical outputs to the three self-contained cold queries
(r3 verdict item 4 — the production-path claim in SCALE.md §2)."""

from __future__ import annotations

import tempfile

from kie_invoice_minimal_spark.plans.entity_linking import staged_el_outputs

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_staged_outputs_equal_cold_queries(spark):
    outs = staged_el_outputs(spark, SF, tempfile.mkdtemp(prefix="el_staged_t_"))
    qs = entrymod.queries()
    for name in ("el_entity_map", "el_alias_triples", "kg_triples_canonical"):
        cold = qs[name](spark, SF)
        assert sorted(outs[name].columns) == sorted(cold.columns), name
        assert _rows(outs[name].select(*cold.columns)) == _rows(cold), name


def test_staged_resume_skips_completed_stages(spark):
    """A second run over the same root must load snapshots, not recompute:
    the pipeline_state records survive and the outputs stay identical."""
    root = tempfile.mkdtemp(prefix="el_staged_r_")
    first = {
        k: _rows(v) for k, v in staged_el_outputs(spark, SF, root).items()
    }
    second = staged_el_outputs(spark, SF, root)
    for k, v in second.items():
        assert _rows(v) == first[k], k
