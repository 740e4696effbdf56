"""kg_negative_sample: deterministic hash-drawn negative edges (the
KGE/unsupervised-GNN corruption feed).  Pins (a) exact equality with a
pure-Python model of the draw/reject/dedup/top-k cascade, (b) the
no-false-negative property (a kept neg is never a true neighbor of src,
never src itself), (c) the per-edge k bound, (d) the rejection branch
actually firing on a planted clique, (e) replay determinism, (f) the
empty graph."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from kie_invoice_minimal_spark.operators.graph_analytics import (
    NEG_K,
    NEG_TRIALS,
    negative_sample,
)

US = "\x1f"


def _mdhash(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _model(edges: list[tuple[str, str]], k: int, trials: int) -> set:
    nodes = sorted({s for s, _ in edges})
    eset = set(edges)
    out = set()
    for s, d in edges:
        seen: dict = {}
        for t in range(trials):
            neg = nodes[_mdhash(f"ng{US}{s}{US}{d}{US}{t}") % len(nodes)]
            if neg == s or (s, neg) in eset:
                continue
            if neg not in seen:
                seen[neg] = t  # dedup: min trial wins
        kept = sorted((t, neg) for neg, t in seen.items())[:k]
        out |= {(s, d, t, neg) for t, neg in kept}
    return out


def _edges_df(spark, edges: list[tuple[str, str]]):
    rows = [(s, d, 1) for s, d in edges]
    return spark.createDataFrame(rows, "src string, dst string, w long")


def _planted_edges() -> list[tuple[str, str]]:
    """A 4-clique (draws frequently land on true neighbors or self —
    the rejection branch) plus a sparse tail of pairs (draws mostly
    survive — the keep branch)."""
    clique = ["a", "b", "c", "d"]
    edges = [(x, y) for x in clique for y in clique if x != y]
    for j in range(6):
        edges += [(f"p{j}", f"q{j}"), (f"q{j}", f"p{j}")]
    return edges


def test_matches_python_model_and_properties(spark):
    edges = _planted_edges()
    got = {
        (r.src, r.dst, r.trial, r.neg)
        for r in negative_sample(_edges_df(spark, edges)).collect()
    }
    want = _model(edges, NEG_K, NEG_TRIALS)
    assert got == want and len(got) > 0

    eset = set(edges)
    per_edge: dict = {}
    for s, d, _t, neg in got:
        assert neg != s and (s, neg) not in eset  # no false negatives
        per_edge[(s, d)] = per_edge.get((s, d), 0) + 1
    assert all(n <= NEG_K for n in per_edge.values())


def test_rejection_branch_fires_on_the_clique(spark):
    """On the planted graph some raw draws MUST be rejected (clique
    members are adjacent to 3 of the 15 other nodes and draw 6 times),
    i.e. the model's reject path is exercised, not vacuous."""
    edges = _planted_edges()
    nodes = sorted({s for s, _ in edges})
    eset = set(edges)
    rejected = sum(
        1
        for s, d in edges
        for t in range(NEG_TRIALS)
        if (lambda neg: neg == s or (s, neg) in eset)(
            nodes[_mdhash(f"ng{US}{s}{US}{d}{US}{t}") % len(nodes)]
        )
    )
    assert rejected > 0


def test_replay_is_byte_identical(spark):
    e = _edges_df(spark, _planted_edges())
    a = sorted(map(tuple, negative_sample(e).collect()))
    b = sorted(map(tuple, negative_sample(e).collect()))
    assert a == b and len(a) > 0


def test_empty_graph(spark):
    e = _edges_df(spark, []).filter(F.lit(False))
    assert negative_sample(e).count() == 0


def test_dense_index_is_partition_boundary_independent(spark):
    """The docstring claim: node is unique, so the two-phase global index
    equals the single-window index for ANY range-partition count."""
    from kie_invoice_minimal_spark.operators.graph_analytics import (
        _dense_node_index,
    )

    nodes = spark.createDataFrame(
        [(f"n{i:03d}",) for i in range(57)], "node string"
    )
    expect = {(f"n{i:03d}", i) for i in range(57)}
    for n_parts in (1, 7, 64):
        got = {
            (r.node, r.idx)
            for r in _dense_node_index(nodes, n_parts=n_parts).collect()
        }
        assert got == expect
