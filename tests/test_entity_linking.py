"""Entity linking: blocking recall, scorer precision, CC correctness,
end-to-end alias-cluster recovery vs the planted ALIAS_GROUPS truth."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from kie_invoice_minimal_spark.functions.rules import ALIAS_GROUPS
from kie_invoice_minimal_spark.operators.blocking import candidate_pairs, normalize_surface
from kie_invoice_minimal_spark.operators.connected_components import connected_components
from kie_invoice_minimal_spark.operators.gcn_scorer import accepted_edges, score_candidates
from kie_invoice_minimal_spark.operators.mention_detect import detect_mentions_arrow
from kie_invoice_minimal_spark.plans.entity_linking import alias_triples, link_entities
from kie_invoice_minimal_spark.sources.transcripts import synth_transcripts


def test_normalize_surface(spark):
    df = spark.createDataFrame(
        [("Hảo-Hảo",), ("Kinh-Đô",), ("Nestlé",), ("VINAMILK",), ("ace-cook",)],
        "s string",
    ).select(normalize_surface(F.col("s")).alias("n"))
    assert [r.n for r in df.collect()] == [
        "haohao", "kinhdo", "nestle", "vinamilk", "acecook",
    ]


def test_cc_simple_graph(spark):
    # components: {1,2,3,4}, {10,11}, {20} appears only via self-ref edge drop
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 20)], "u long, v long"
    )
    got = {
        (r.node, r.component) for r in connected_components(edges).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}


def test_cc_chain_and_star(spark):
    # long chain exercises multi-round convergence; star exercises hub skew
    chain = [(i, i + 1) for i in range(100, 140)]
    star = [(500, x) for x in range(501, 560)]
    edges = spark.createDataFrame(chain + star, "u long, v long")
    assign = {r.node: r.component for r in connected_components(edges).collect()}
    assert all(assign[i] == 100 for i in range(100, 141))
    assert all(assign[x] == 500 for x in [500, *range(501, 560)])


@pytest.fixture(scope="module")
def brand_mentions(spark):
    t = synth_transcripts(spark, 3000)
    return detect_mentions_arrow(t).filter(F.col("mention_type") == "BRAND").persist()


def test_blocking_recall(spark, brand_mentions):
    """Every true alias pair (same group) that co-occurs must be a candidate."""
    pairs = {
        (r.surface_a, r.surface_b)
        for r in candidate_pairs(brand_mentions).collect()
    }
    present = {r.surface for r in brand_mentions.select("surface").distinct().collect()}
    for grp in ALIAS_GROUPS:
        members = sorted(s for s in grp if s in present)
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                assert (min(a, b), max(a, b)) in pairs, (a, b)


def test_scorer_separates(spark, brand_mentions):
    """Accepted edges connect only same-group surfaces (precision == 1)."""
    truth = {}
    for gi, grp in enumerate(ALIAS_GROUPS):
        for s in grp:
            truth[s] = gi
    edges = accepted_edges(score_candidates(candidate_pairs(brand_mentions)))
    for r in edges.collect():
        assert truth[r.surface_a] == truth[r.surface_b], (
            r.surface_a, r.surface_b, r.score,
        )


def test_end_to_end_alias_clusters(spark, brand_mentions):
    """link_entities recovers exactly the planted partition (restricted to
    surfaces that occur in the corpus)."""
    emap = link_entities(brand_mentions).collect()
    got: dict[str, int] = {r.surface: r.entity_id for r in emap}
    present = set(got)
    # same group -> same entity; different group -> different entity
    for gi, grp in enumerate(ALIAS_GROUPS):
        members = [s for s in grp if s in present]
        ids = {got[m] for m in members}
        assert len(ids) == 1, (grp, ids)
    rep = {}
    for gi, grp in enumerate(ALIAS_GROUPS):
        members = [s for s in grp if s in present]
        if members:
            rep[gi] = got[members[0]]
    assert len(set(rep.values())) == len(rep)  # groups stay distinct
    # canonical surface is stable and within-group
    canon = {r.surface: r.canonical_surface for r in emap}
    for gi, grp in enumerate(ALIAS_GROUPS):
        members = [s for s in grp if s in present]
        cs = {canon[m] for m in members}
        assert len(cs) == 1 and cs.pop() in grp


def test_alias_triples(spark, brand_mentions):
    emap = link_entities(brand_mentions)
    rows = alias_triples(emap).collect()
    assert all(r.pred == "HAS_ALIAS" for r in rows)
    assert all(r.subj != r.obj for r in rows)
    assert len(rows) > 0


def test_block_size_cap(spark, brand_mentions):
    """Oversized blocks are dropped, not exploded (the spill-avoidance /
    hot-block policy): with a tiny cap, candidate volume shrinks."""
    full = candidate_pairs(brand_mentions).count()
    capped = candidate_pairs(brand_mentions, max_block_size=2).count()
    assert capped < full
    assert capped >= 0


def test_cc_random_graph_vs_union_find(spark):
    """Randomized CC vs a pure-Python union-find oracle."""
    import random

    rng = random.Random(42)
    edges = [(rng.randrange(400), rng.randrange(400)) for _ in range(300)]

    parent = list(range(400))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for u, v in edges:
        union(u, v)
    touched = {x for e in edges if e[0] != e[1] for x in e}
    # canonical min-id per component, restricted to nodes with real edges
    want = {}
    for x in sorted(touched):
        r = find(x)
        want.setdefault(r, x)
    want_assign = {x: want[find(x)] for x in touched}

    df = spark.createDataFrame(edges, "u long, v long")
    got = {r.node: r.component for r in connected_components(df).collect()}
    assert got == want_assign


def test_linking_at_cardinality(spark):
    """Linking quality holds at non-toy cardinality: 3k surfaces / 1k alias
    groups of random names — near-total group recovery, near-zero merges."""
    import random
    import string
    from collections import defaultdict

    rng = random.Random(7)
    rows, truth = [], {}
    for g in range(1000):
        base = "".join(rng.choice(string.ascii_lowercase) for _ in range(9))
        for v in [base.capitalize(), base.upper(), base + "-co"]:
            rows.append((f"c{g % 97}", g % 7, 0, 0, len(v), v, "BRAND"))
            truth[v] = g
    m = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, pos int, span_start int, span_end int,"
        " surface string, mention_type string",
    )
    emap = {r.surface: r.entity_id for r in link_entities(m).collect()}
    by_group, ent_groups = defaultdict(set), defaultdict(set)
    for s, gid in truth.items():
        by_group[gid].add(emap[s])
        ent_groups[emap[s]].add(gid)
    split = sum(1 for v in by_group.values() if len(v) > 1)
    merged = sum(1 for v in ent_groups.values() if len(v) > 1)
    assert split <= 50, split   # <= 5% LSH miss tolerance
    assert merged <= 10, merged  # <= 1% false-merge tolerance


def test_linking_partitioning_invariance(spark, brand_mentions):
    """The entity map must not depend on how the input happens to be
    partitioned (shuffle order, group arrival order)."""
    a = {
        (r.surface, r.canonical_surface)
        for r in link_entities(brand_mentions.repartition(3)).collect()
    }
    b = {
        (r.surface, r.canonical_surface)
        for r in link_entities(brand_mentions.repartition(17)).collect()
    }
    assert a == b and len(a) > 0


def test_cc_hub_stress_midsize(spark):
    """Skew stress at test scale: 50k edges with a 20k-spoke hub plus 100
    chains — the two-level salted min-agg must produce exact components
    (the committed-test version of the 1.9M-edge measurement in SCALE.md)."""
    hub = [(1, x) for x in range(2, 20_002)]
    chains = [
        (100_000 + c * 100 + i, 100_000 + c * 100 + i + 1)
        for c in range(100)
        for i in range(30)
    ]
    edges = spark.createDataFrame(hub + chains, "u long, v long")
    assign = {r.node: r.component for r in connected_components(edges).collect()}
    assert all(assign[x] == 1 for x in range(1, 20_002))
    for c in range(100):
        base = 100_000 + c * 100
        assert all(assign[base + i] == base for i in range(31))
