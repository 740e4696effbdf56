"""Round-4 edge probes: every new operator must survive a degenerate
corpus (empty tables, single rows, graphs with no triangles) without
crashing and with the semantically-correct empty/zero output — the same
discipline test_edge_cases_r3.py applies to the r3 curation ops."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    """An sf_dir whose documents/events tables exist but hold zero rows."""
    root = str(tmp_path_factory.mktemp("empty_sf"))
    spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(os.path.join(root, "documents.parquet"))
    spark.createDataFrame(
        [],
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(os.path.join(root, "events.parquet"))
    return root


def test_graph_ops_on_empty_corpus(spark, empty_sf):
    from kie_invoice_minimal_spark.operators.graph_analytics import (
        kg_entity_pagerank,
        kg_khop_counts,
        kg_triangle_counts,
    )

    assert kg_entity_pagerank(spark, empty_sf).count() == 0
    assert kg_triangle_counts(spark, empty_sf).count() == 0
    assert kg_khop_counts(spark, empty_sf).count() == 0


def test_event_ops_on_empty_corpus(spark, empty_sf):
    from kie_invoice_minimal_spark.operators.relational_ext import (
        ev_funnel_stages,
        ev_retention_cohorts,
        stats_linear_fit,
    )

    assert ev_funnel_stages(spark, empty_sf).count() == 0
    assert ev_retention_cohorts(spark, empty_sf).count() == 0
    assert stats_linear_fit(spark, empty_sf).count() == 0


def test_doc_ops_on_empty_corpus(spark, empty_sf):
    from kie_invoice_minimal_spark.operators.dedup import dd_incremental
    from kie_invoice_minimal_spark.operators.similarity import ss_topk_docs
    from kie_invoice_minimal_spark.operators.text_analysis import ta_doc_vectors

    assert ta_doc_vectors(spark, empty_sf).count() == 0
    assert ss_topk_docs(spark, empty_sf).count() == 0
    assert dd_incremental(spark, empty_sf).count() == 0


def test_triangle_free_graph_returns_zeros(spark, tmp_path):
    """A corpus whose co-mention graph is a path (no triangles) must give
    n_triangles = 0 for every node, not an empty table."""
    from kie_invoice_minimal_spark.operators.graph_analytics import (
        comention_edges,
    )
    from pyspark.sql import functions as F

    mentions = spark.createDataFrame(
        [("c1", 0, 0, "a", "BRAND"), ("c1", 0, 1, "b", "BRAND"),
         ("c2", 0, 0, "b", "BRAND"), ("c2", 0, 1, "c", "BRAND")],
        "conv_id string, turn_idx int, pos int, surface string, mention_type string",
    )
    e = comention_edges(mentions).localCheckpoint()
    # reuse the triangle core over this path graph: 0 triangles everywhere
    deg = e.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("deg"))
    assert deg.count() == 3
    und = e.filter(F.col("src") < F.col("dst"))
    assert und.count() == 2  # a-b, b-c; no closure


def test_linear_fit_single_point_group(spark, tmp_path):
    """n=1 gives a zero denominator — the slope must come back NULL (not
    crash, not Inf) in both engines' formulation."""
    import duckdb

    from kie_invoice_minimal_spark.operators.relational_ext import (
        STATS_LINFIT_SQL,
        stats_linear_fit,
    )

    root = str(tmp_path)
    ev = pd.DataFrame(
        {"event_id": [1], "ts": pd.to_datetime(["2024-01-01"]),
         "user_id": [1], "event_type": ["solo"], "value": [5.0], "props": [""]}
    )
    spark.createDataFrame(ev).write.mode("overwrite").parquet(
        os.path.join(root, "events.parquet")
    )
    rows = stats_linear_fit(spark, root).collect()
    assert len(rows) == 1 and rows[0].slope_per_sec is None

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{root}/events.parquet/*.parquet'"
    )
    drows = con.execute(STATS_LINFIT_SQL).fetchall()
    assert len(drows) == 1 and drows[0][2] is None
