"""Docs must not drift from the registry (r2 verdict item 6: BASELINE.md
said 70/70 after ta_vocab_topk made it 71).  Counts in README/BASELINE and
the PLANS.md table row count are checked against len(queries())."""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402


def _read(name: str) -> str:
    with open(os.path.join(REPO, name)) as f:
        return f.read()


def test_baseline_md_count_matches_registry():
    n = len(entrymod.queries())
    assert f"{n}/{n} queries OK" in _read("BASELINE.md")


def test_readme_count_matches_registry():
    n = len(entrymod.queries())
    assert f"{n} `queries()` entries" in _read("README.md")


def test_plans_table_covers_every_registered_query():
    names = set(entrymod.queries())
    rows = {
        m.group(1)
        for m in re.finditer(r"^\| (\w+) \| \d+ \|", _read("PLANS.md"), re.M)
    }
    missing = names - rows
    assert not missing, f"PLANS.md table missing: {sorted(missing)}"


def test_oracle_registry_is_consistent():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    # every oracle refers to a registered query, and (since approx_stats'
    # r4 KMV rewrite) every registered query has an oracle
    assert set(os_) <= set(qs)
    assert set(qs) - set(os_) == set()


def test_certification_window_holds_round4_critical_entries():
    """The driver snapshots exactly the first 50 queries() entries, so
    every round-4 value-changed operator and the 29 stale (r01/r02-last-
    certified) entries being refreshed MUST sit inside positions 0-49
    (see the queries() docstring).  This pins the ordering mechanically so
    a refactor cannot silently push a needs-certification entry past the
    cutoff."""
    names = list(entrymod.queries())
    first50 = set(names[:50])
    critical = {
        # value-changed, new, or newly oracle-paired in round 4
        "approx_stats", "ta_mixture_sample", "ta_curate_corpus_v2",
        "el_pipeline_staged", "kg_entity_pagerank", "dd_incremental",
        "kg_triangle_counts", "ev_funnel_stages",
        "kg_khop_counts", "ev_retention_cohorts", "kg_canonical_pagerank",
        "stats_linear_fit", "ta_doc_vectors", "ss_topk_docs",
        "kg_export_neighbors", "ta_ngram_lm_score",
        # stale tail: last driver-green row dated r01/r02 (incl.
        # ta_fingerprint, whose r3 separator change altered values)
        "dd_exact", "dd_simhash", "ss_topk_bruteforce", "ss_lsh_buckets",
        "ss_lsh_ann", "ta_curate_corpus", "ta_vocab_topk",
        "mm_decode_metadata", "g5_ordered_concat", "e3_minmax_normalize",
        "a5_group_standardize", "a6_readout", "o5_label_rollup",
        "a8_threshold_classify", "o4_error_analysis", "ta_token_stats",
        "ta_quality_score", "ta_lang_id", "ta_fingerprint",
        "mm_frame_sample", "r3_text_encode", "e4_graph_norm",
        "a10_accuracy", "o3_confusion_matrix", "o2_mention_output",
        "p8_trim_conversations", "rollup_doc_stats", "s2_json_props",
        "s3_mapping_join",
    }
    missing = critical - first50
    assert not missing, f"pushed past the 50-entry snapshot: {sorted(missing)}"
