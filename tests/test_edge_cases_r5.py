"""Round-5 edge probes: every operator added or reworked in round 5 must
survive a degenerate corpus (empty tables, single-node graphs) without
crashing and with the semantically-correct empty/zero output — the same
discipline test_edge_cases_r3/r4 apply to earlier rounds."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    """An sf_dir whose documents/events tables exist but hold zero rows."""
    root = str(tmp_path_factory.mktemp("empty_sf_r5"))
    spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(os.path.join(root, "documents.parquet"))
    spark.createDataFrame(
        [],
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(os.path.join(root, "events.parquet"))
    return root


def test_r5_graph_ops_on_empty_corpus(spark, empty_sf, tmp_path):
    from kie_invoice_minimal_spark.operators.graph_analytics import (
        kg_canonical_pagerank_staged,
        kg_common_neighbors,
        kg_khop_kmv,
    )

    assert kg_khop_kmv(spark, empty_sf).count() == 0
    assert kg_common_neighbors(spark, empty_sf).count() == 0
    from kie_invoice_minimal_spark.operators.graph_analytics import (
        kg_entity_timeline,
        kg_predicate_stats,
    )

    assert kg_entity_timeline(spark, empty_sf).count() == 0
    assert kg_predicate_stats(spark, empty_sf).count() == 0
    assert (
        kg_canonical_pagerank_staged(spark, empty_sf, str(tmp_path / "pr")).count()
        == 0
    )


def test_r5_changed_ops_on_empty_corpus(spark, empty_sf):
    from kie_invoice_minimal_spark.operators.relational_ext import approx_stats
    from kie_invoice_minimal_spark.operators.text_analysis import (
        ta_chunk_dedup,
        ta_doc_vectors,
        ta_ngram_lm_score,
        ta_tfidf_topk,
    )

    assert ta_doc_vectors(spark, empty_sf).count() == 0
    assert ta_ngram_lm_score(spark, empty_sf).count() == 0
    assert approx_stats(spark, empty_sf).count() == 0
    assert ta_tfidf_topk(spark, empty_sf).count() == 0
    assert ta_chunk_dedup(spark, empty_sf).count() == 0
    from kie_invoice_minimal_spark.operators.relational_ext import (
        ev_windowed_anomaly,
    )

    assert ev_windowed_anomaly(spark, empty_sf).count() == 0


def test_khop_kmv_single_edge(spark):
    """A one-edge graph: both nodes' 2-balls are {a, b} — below k, so the
    estimate is EXACT (2), and n_1hop is 1."""
    from kie_invoice_minimal_spark.operators.graph_analytics import khop_kmv

    e = spark.createDataFrame(
        [("a", "b", 1), ("b", "a", 1)], "src string, dst string, w long"
    )
    got = {r.surface: (r.n_1hop, r.reach2_est) for r in khop_kmv(e).collect()}
    assert got == {"a": (1, 2), "b": (1, 2)}


def test_common_neighbors_no_shared_neighbors(spark):
    """A pure path graph has no pair with >= 2 shared neighbors (the
    middle node gives each end-pair exactly 1) — empty output, not a
    crash and not singleton noise."""
    from kie_invoice_minimal_spark.operators.graph_analytics import (
        common_neighbors,
    )

    rows = [("a", "b", 1), ("b", "a", 1), ("b", "c", 1), ("c", "b", 1)]
    e = spark.createDataFrame(rows, "src string, dst string, w long")
    assert common_neighbors(e).count() == 0


def test_capped_adjacency_empty_and_below_cap(spark):
    """capped_adjacency on an empty edge table is empty; below the cap it
    is the identity on (src, dst)."""
    from kie_invoice_minimal_spark.operators.graph_analytics import (
        capped_adjacency,
    )

    empty = spark.createDataFrame([], "src string, dst string, w long")
    assert capped_adjacency(empty).count() == 0
    e = spark.createDataFrame(
        [("a", "b", 2), ("a", "c", 1), ("b", "a", 2), ("c", "a", 1)],
        "src string, dst string, w long",
    )
    got = {(r.src, r.dst) for r in capped_adjacency(e).collect()}
    assert got == {("a", "b"), ("a", "c"), ("b", "a"), ("c", "a")}


def test_doc_vectors_v_str_has_fixed_dims(spark):
    """The scalar serialization still carries exactly DV_DIM integers for
    every document (the driver sees one string cell; the contract is that
    it round-trips to the full vector)."""
    from kie_invoice_minimal_spark.operators.text_analysis import (
        DV_DIM,
        ta_doc_vectors,
    )

    rows = ta_doc_vectors(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows[:50]:
        parts = r.v_str.split(" ")
        assert len(parts) == DV_DIM
        [int(p) for p in parts]  # every cell is an integer literal
