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


def test_certification_window_holds_round6_critical_entries():
    """The driver snapshots exactly the first 50 queries() entries, so
    every round-6 changed/new operator and the final r03-stale tranche
    MUST sit inside positions 0-49 (see the queries() docstring).  This
    pins the ordering mechanically so a refactor cannot silently push a
    needs-certification entry past the cutoff."""
    names = list(entrymod.queries())
    first50 = set(names[:50])
    critical = {
        # changed in round 6: comention-edge per-conversation cap +
        # two-phase PageRank ranking re-plan every comention consumer
        "kg_entity_pagerank", "kg_canonical_pagerank",
        "kg_canonical_pagerank_staged", "kg_triangle_counts",
        "kg_khop_counts", "kg_khop_kmv", "kg_common_neighbors",
        "kg_export_neighbors",
        # changed in round 6: DECIMAL(38,0) overflow fix (r5 ADVICE 1)
        "ta_tfidf_topk",
        # new in round 6
        "kg_canonical_pagerank_derive", "mm_payload_dedup",
        "mm_frame_hash_dedup", "kg_degree_distribution",
        "kg_triples_incremental", "kg_edge_lift", "kg_kcore",
        "kg_communities", "ev_markov_transitions",
        # the final nine r03-stale entries (rotation debt paid this round)
        "anti_join_no_orders", "outer_join_order_counts",
        "ta_mixture_weights", "g6_stratified_split",
        "p4_threshold_fallback", "interval_overlap_join",
        "o3_confusion_pivot", "unpivot_readout", "topk_orders_per_cust",
    }
    missing = critical - first50
    assert not missing, f"pushed past the 50-entry snapshot: {sorted(missing)}"
