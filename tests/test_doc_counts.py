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


def test_certification_window_holds_round5_critical_entries():
    """The driver snapshots exactly the first 50 queries() entries, so
    every round-5 changed/new operator and the 40 stale (r03-last-
    certified) entries being refreshed MUST sit inside positions 0-49
    (see the queries() docstring).  This pins the ordering mechanically so
    a refactor cannot silently push a needs-certification entry past the
    cutoff."""
    names = list(entrymod.queries())
    first50 = set(names[:50])
    critical = {
        # changed or new in round 5
        "ta_doc_vectors", "approx_stats", "ta_ngram_lm_score",
        "kg_khop_counts", "el_pipeline_staged",
        "kg_canonical_pagerank_staged", "kg_khop_kmv",
        "kg_common_neighbors", "ta_tfidf_topk", "ta_chunk_dedup",
        "kg_entity_timeline", "kg_predicate_stats", "ev_windowed_anomaly",
        # stale tail: last driver-green row dated r03 (33 of 42; the
        # remaining nine rotate in round 6)
        "dd_band_clusters", "kg_triples_canonical", "el_alias_triples",
        "el_levenshtein_pairs", "ss_ivf_ann", "kg_mentions_rescan",
        "cc_event_pairs", "e2_band_self_join", "dd_lsh_verified_dups",
        "ss_lsh_multitable_ann", "ta_pack_sequences", "dd_contamination",
        "a2a3_message_pass", "g5_turn_rank", "g5_merge_conversations",
        "g4_realign_semi_join", "setop_split_check",
        "asof_click_after_view", "stats_percentiles", "w_ntile_lag",
        "w_range_frame", "cube_doc_stats", "grouping_sets_doc_stats",
        "tpch_q1_pricing",
        "sessionize_events",
        "ta_repetition_filter", "ta_redact_spans",
        "g3_nearest_neighbor",
        "dd_minhash_signatures", "dd_minhash_lsh_pairs",
        "dd_ngram_jaccard", "dd_embedding_cosine", "dd_dup_clusters",
    }
    missing = critical - first50
    assert not missing, f"pushed past the 50-entry snapshot: {sorted(missing)}"
