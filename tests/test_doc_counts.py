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


def test_certification_window_holds_round7_critical_entries():
    """The driver snapshots exactly the first 50 queries() entries, so
    every round-7 changed/new operator and the r04-stale rotation tranche
    MUST sit inside positions 0-49 (see the queries() docstring).  This
    pins the ordering mechanically so a refactor cannot silently push a
    needs-certification entry past the cutoff."""
    names = list(entrymod.queries())
    first50 = set(names[:50])
    critical = {
        # changed in round 7: capped_conv_surfaces common-path refund +
        # PageRank headroom guard re-plan every comention-graph consumer
        "kg_entity_pagerank", "kg_canonical_pagerank",
        "kg_canonical_pagerank_staged", "kg_canonical_pagerank_derive",
        "kg_triangle_counts", "kg_khop_counts", "kg_khop_kmv",
        "kg_common_neighbors", "kg_export_neighbors",
        "kg_degree_distribution", "kg_edge_lift", "kg_kcore",
        "kg_communities",
        # changed in round 7: offset-overflow guard (r6 ADVICE item 3)
        "mm_frame_hash_dedup",
        # new in round 7: near-dup frame detection (r6 verdict item 5)
        "mm_frame_minhash_pairs",
        # new in round 7: the cap-coverage monitor
        "kg_conv_fanout",
        # the eighteen r04-stale entries (r6 verdict item 1)
        "mm_frame_sample", "r3_text_encode", "e4_graph_norm",
        "a10_accuracy", "o3_confusion_matrix", "o2_mention_output",
        "p8_trim_conversations", "rollup_doc_stats", "s2_json_props",
        "s3_mapping_join", "ta_mixture_sample", "ta_curate_corpus_v2",
        "ss_topk_docs", "el_entity_map", "ev_retention_cohorts",
        "stats_linear_fit", "dd_incremental", "ev_funnel_stages",
    }
    missing = critical - first50
    assert not missing, f"pushed past the 50-entry snapshot: {sorted(missing)}"
