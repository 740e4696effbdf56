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


def test_triangle_counts_on_known_graphs(spark):
    from kie_invoice_minimal_spark.operators.graph_analytics import (
        kg_triangle_counts,
    )
    import itertools

    # independent brute-force over the sf0.001 co-mention graph
    from kie_invoice_minimal_spark.operators.graph_analytics import (
        comention_edges,
    )
    from kie_invoice_minimal_spark.operators.mention_detect import (
        detect_mentions_arrow,
    )
    from kie_invoice_minimal_spark.sources.transcripts import (
        transcripts_from_documents,
    )

    sf = "/root/testdata/sf0.001"
    e = comention_edges(
        detect_mentions_arrow(transcripts_from_documents(spark, sf))
    ).collect()
    adj = {}
    for r in e:
        adj.setdefault(r.src, set()).add(r.dst)
    expect = {n: 0 for n in adj}
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in (a, b, c):
                expect[n] += 1
    got = {r.surface: r.n_triangles for r in kg_triangle_counts(spark, sf).collect()}
    assert got == expect
    assert sum(got.values()) > 0  # non-vacuous


def test_triangle_closure_uses_degree_order_not_name_order(spark):
    """Regression pin for the wedge-closure direction: a triangle whose
    closing edge is oriented AGAINST name order (degree order differs)
    must still be counted.  Graph: z-a-m triangle plus extra edges pumping
    deg(a) so orientation is by degree rank, with closure m<->z oriented
    z->m by name... exercised through the same pairing code path via a
    synthetic mentions frame."""
    from kie_invoice_minimal_spark.operators.graph_analytics import (
        comention_edges,
    )
    from pyspark.sql import functions as F

    # conv1 co-mentions {a, m, z} (one triangle); conv2..4 pump deg(m)
    rows = [("c1", s) for s in ("a", "m", "z")]
    rows += [("c2", "m"), ("c2", "q1"), ("c3", "m"), ("c3", "q2"),
             ("c4", "m"), ("c4", "q3")]
    mentions = spark.createDataFrame(
        [(c, 0, 0, s, "BRAND") for c, s in rows],
        "conv_id string, turn_idx int, pos int, surface string, mention_type string",
    )
    e = comention_edges(mentions)
    # reuse the operator internals by running the registered query shape
    # over a temp view is overkill; instead count triangles directly on e
    # with the same code path:
    from kie_invoice_minimal_spark.operators import graph_analytics as GA

    und = e.filter(F.col("src") < F.col("dst")).select("src", "dst")
    deg = e.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("deg"))
    d1 = deg.select(F.col("node").alias("src"), F.col("deg").alias("dsrc"))
    d2 = deg.select(F.col("node").alias("dst"), F.col("deg").alias("ddst"))
    lt = (F.col("dsrc") < F.col("ddst")) | (
        (F.col("dsrc") == F.col("ddst")) & (F.col("src") < F.col("dst"))
    )
    oriented = und.join(d1, "src").join(d2, "dst").select(
        F.when(lt, F.col("src")).otherwise(F.col("dst")).alias("a"),
        F.when(lt, F.col("dst")).otherwise(F.col("src")).alias("b"),
    )
    o1 = oriented.select(F.col("a").alias("u"), F.col("b").alias("v"))
    o2 = oriented.select(F.col("a").alias("u"), F.col("b").alias("w"))
    tri = (
        o1.join(o2, "u")
        .filter(F.col("v") != F.col("w"))
        .join(
            oriented.select(F.col("a").alias("v"), F.col("b").alias("w")),
            ["v", "w"],
        )
    )
    # deg: a=2, z=2, m=5 -> wedge apex is a or z (lowest rank), closure
    # a/z -> m by degree even though 'm' < 'z' by name
    assert tri.count() == 1


def test_funnel_stage_ordering_invariants(spark):
    from kie_invoice_minimal_spark.operators.relational_ext import (
        ev_funnel_stages,
    )

    rows = ev_funnel_stages(spark, SF).collect()
    assert rows
    stages = {1: 0, 2: 0, 3: 0}
    for r in rows:
        assert r.t_view is not None
        if r.t_click is not None:
            assert r.t_click > r.t_view
        if r.t_purchase is not None:
            assert r.t_click is not None and r.t_purchase > r.t_click
        expect_stage = 1 + (r.t_click is not None) + (r.t_purchase is not None)
        assert r.stage == expect_stage
        stages[r.stage] += 1
    # funnel is non-degenerate on the fixture: every stage reached by some
    # user, and monotone non-increasing reach
    reach1 = stages[1] + stages[2] + stages[3]
    reach2 = stages[2] + stages[3]
    assert reach1 >= reach2 >= stages[3] > 0


def test_khop_counts_vs_bruteforce(spark):
    from kie_invoice_minimal_spark.operators.graph_analytics import (
        comention_edges,
        kg_khop_counts,
    )
    from kie_invoice_minimal_spark.operators.mention_detect import (
        detect_mentions_arrow,
    )
    from kie_invoice_minimal_spark.sources.transcripts import (
        transcripts_from_documents,
    )

    sf = "/root/testdata/sf0.001"
    e = comention_edges(
        detect_mentions_arrow(transcripts_from_documents(spark, sf))
    ).collect()
    adj = {}
    for r in e:
        adj.setdefault(r.src, set()).add(r.dst)
    expect = {}
    for u, nbrs in adj.items():
        two = set()
        for v in nbrs:
            two |= adj.get(v, set())
        two -= nbrs | {u}
        expect[u] = (len(nbrs), len(two))
    got = {
        r.surface: (r.n_1hop, r.n_2hop)
        for r in kg_khop_counts(spark, sf).collect()
    }
    assert got == expect
    assert any(v[1] > 0 for v in got.values())  # non-vacuous 2-hop


def test_retention_cohort_invariants(spark):
    from pyspark.sql import functions as F

    from kie_invoice_minimal_spark.operators.relational_ext import (
        ev_retention_cohorts,
    )

    rows = ev_retention_cohorts(spark, SF).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        assert r.week_offset >= 0
        by_cohort.setdefault(r.cohort_week, {})[r.week_offset] = r.n_users
    # offset 0 exists for every cohort (the first-event week itself) and is
    # the cohort maximum (retention can never exceed the cohort size)
    for cw, offs in by_cohort.items():
        assert 0 in offs, (cw, offs)
        assert offs[0] == max(offs.values()), (cw, offs)
    # offset-0 totals = number of distinct users
    n_users = (
        spark.read.parquet(f"{SF}/events.parquet")
        .agg(F.countDistinct("user_id"))
        .collect()[0][0]
    )
    assert sum(offs[0] for offs in by_cohort.values()) == n_users


def test_canonical_pagerank_merges_alias_mass(spark):
    """Canonicalization must shrink the node set (aliases merge) and every
    BRAND node in the canonical ranking must be a canonical surface."""
    from kie_invoice_minimal_spark.operators.graph_analytics import (
        kg_canonical_pagerank,
        kg_entity_pagerank,
    )

    import __spark_entry__ as em

    sf = "/root/testdata/sf0.001"
    raw = {r.surface for r in kg_entity_pagerank(spark, sf).collect()}
    canon_rows = kg_canonical_pagerank(spark, sf).collect()
    canon = {r.surface for r in canon_rows}
    assert len(canon) < len(raw)
    emap = {
        r.surface: r.canonical_surface
        for r in em.queries()["el_entity_map"](spark, sf).collect()
    }
    merged_away = {s for s, c in emap.items() if s != c}
    assert not (canon & merged_away)  # no non-canonical variant survives
    assert {c for c in emap.values() if c in raw} <= canon | (raw - set(emap))
