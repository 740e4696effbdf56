"""Entity co-mention PageRank + incremental dedup (new round-4 operators)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kie_invoice_minimal_spark.operators.dedup import (
    INCR_MOD,
    INCR_REM,
    dd_incremental,
)
from kie_invoice_minimal_spark.operators.graph_analytics import (
    PR_ITERS,
    PR_SCALE,
    kg_entity_pagerank,
    pagerank,
)

SF = "/root/testdata/sf0.01"


def _star_edges(spark):
    """hub 'a' connected to b..e, plus one peripheral b-c edge; symmetric."""
    rows = [("a", x, 1) for x in "bcde"] + [(x, "a", 1) for x in "bcde"]
    rows += [("b", "c", 1), ("c", "b", 1)]
    return spark.createDataFrame(rows, "src string, dst string, w long")


def test_pagerank_ranks_the_hub_first(spark):
    pr = {r.surface: (r.pagerank_q, r.rank) for r in pagerank(_star_edges(spark)).collect()}
    assert pr["a"][1] == 1, pr
    assert pr["a"][0] > pr["b"][0] > pr["d"][0]  # hub > 2-deg > 1-deg
    # symmetric leaves tie in score; ranks stay distinct (broken by surface)
    assert pr["d"][0] == pr["e"][0] and pr["d"][1] != pr["e"][1]


def test_pagerank_mass_conserved_within_truncation(spark):
    """Integer PageRank only loses mass to DIV truncation: total score must
    sit within ITERS * (edges + nodes) score-units of N * SCALE."""
    df = pagerank(_star_edges(spark))
    total = df.agg(F.sum("pagerank_q")).collect()[0][0]
    n_nodes, n_edges = 5, 10
    slack = PR_ITERS * (n_edges + n_nodes) * 100
    assert abs(total - n_nodes * PR_SCALE) <= slack, total


def test_pagerank_deterministic_across_runs(spark):
    a = sorted(tuple(r) for r in kg_entity_pagerank(spark, SF).collect())
    b = sorted(tuple(r) for r in kg_entity_pagerank(spark, SF).collect())
    assert a == b and len(a) > 0


def test_pagerank_empty_edges(spark):
    empty = spark.createDataFrame([], "src string, dst string, w long")
    assert pagerank(empty).count() == 0


def test_incremental_dedup_invariants(spark):
    out = dd_incremental(spark, SF)
    rows = out.collect()
    assert rows
    # every output row is an incoming-batch doc
    assert all(r.doc_id % INCR_MOD == INCR_REM for r in rows)
    # matched_corpus_doc, when present, is a corpus doc with the same fp
    d = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", F.md5("text").alias("h"))
        .collect()
    )
    fp_of = {r.doc_id: r.h for r in d}
    corpus_by_fp = {}
    for r in d:
        if r.doc_id % INCR_MOD != INCR_REM:
            corpus_by_fp.setdefault(r.h, []).append(r.doc_id)
    for r in rows:
        expect = min(corpus_by_fp.get(fp_of[r.doc_id], [None] * 1) or [None])
        assert r.matched_corpus_doc == (
            min(corpus_by_fp[fp_of[r.doc_id]]) if fp_of[r.doc_id] in corpus_by_fp else None
        ), r
    # is_batch_dup count == batch size - distinct fps in batch
    batch_fps = [fp_of[r.doc_id] for r in rows]
    n_dups = sum(1 for r in rows if r.is_batch_dup)
    assert n_dups == len(batch_fps) - len(set(batch_fps))
