"""kg_neighbor_sample: deterministic GraphSAGE-style 2-hop fan-out
sampling (the GNN-training mini-batch feed).  Pins (a) the exact
md5-sample-order semantics against a pure-Python model, (b) per-seed
fan-out bounds on both the sampling and pass-through branches, (c)
hop-1/hop-2 salt decorrelation, (d) replay determinism, (e) the empty
graph."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from kie_invoice_minimal_spark.operators.graph_analytics import (
    NS_FAN1,
    NS_FAN2,
    neighbor_sample,
)

US = "\x1f"


def _mdhash(s: str) -> int:
    """The Python twin of text_analysis.mdhash_spark."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _sample_model(edges: list[tuple[str, str]], fan: int, salt: str) -> set:
    """Per-src top-``fan`` by (mdhash(salt, src, dst), dst) — the model
    both engines must match."""
    by_src: dict = {}
    for src, dst in edges:
        by_src.setdefault(src, []).append(
            (_mdhash(f"{salt}{US}{src}{US}{dst}"), dst)
        )
    out = set()
    for src, rows in by_src.items():
        for _, dst in sorted(rows)[:fan]:
            out.add((src, dst))
    return out


def _model(edges: list[tuple[str, str]], fan1: int, fan2: int) -> set:
    s1 = _sample_model(edges, fan1, "h1")
    s2 = _sample_model(edges, fan2, "h2")
    rows = {(u, 1, u, v) for u, v in s1}
    rows |= {(u, 2, v, w) for u, v in s1 for p, w in s2 if p == v}
    return rows


def _edges_df(spark, edges: list[tuple[str, str]]):
    # symmetric weighted edges, the comention_edges shape
    rows = [(s, d, 1) for s, d in edges]
    return spark.createDataFrame(rows, "src string, dst string, w long")


def _planted_edges() -> list[tuple[str, str]]:
    """hub has degree 10 (> both fans: sampling branch); spoke nodes have
    degree 1-3 (pass-through branch); a small clique supplies 2-hop
    paths that revisit their seed (the GraphSAGE keep-revisits rule)."""
    edges = []
    for j in range(10):
        edges += [("hub", f"n{j:02d}"), (f"n{j:02d}", "hub")]
    for a, b in [("n00", "n01"), ("n01", "n02"), ("n02", "n00")]:
        edges += [(a, b), (b, a)]
    return edges


def test_matches_python_model_and_fanout_bounds(spark):
    edges = _planted_edges()
    got = {
        (r.seed, r.hop, r.parent, r.node)
        for r in neighbor_sample(_edges_df(spark, edges)).collect()
    }
    assert got == _model(edges, NS_FAN1, NS_FAN2)

    deg = {}
    for s, _d in edges:
        deg[s] = deg.get(s, 0) + 1
    # hub exercises the SAMPLING branch, spokes the pass-through branch
    assert deg["hub"] > NS_FAN1 and deg["n05"] <= NS_FAN1
    h1 = {}
    for seed, hop, _p, _n in got:
        if hop == 1:
            h1[seed] = h1.get(seed, 0) + 1
    for seed, n in h1.items():
        assert n == min(deg[seed], NS_FAN1)
    # every hop-2 parent is one of its seed's hop-1 samples
    h1_pairs = {(s, n) for s, h, _p, n in got if h == 1}
    for seed, hop, parent, _node in got:
        if hop == 2:
            assert (seed, parent) in h1_pairs


def test_hop_salts_decorrelate(spark):
    edges = _planted_edges()
    s1 = _sample_model(edges, NS_FAN2, "h1")  # h1 order truncated to fan2
    s2 = _sample_model(edges, NS_FAN2, "h2")
    # with a shared salt these would be identical by construction; the
    # planted hub (10 neighbors, 2 sampled) must draw differently
    assert s1 != s2


def test_replay_is_byte_identical(spark):
    e = _edges_df(spark, _planted_edges())
    a = sorted(map(tuple, neighbor_sample(e).collect()))
    b = sorted(map(tuple, neighbor_sample(e).collect()))
    assert a == b and len(a) > 0


def test_empty_graph(spark):
    e = _edges_df(spark, []).filter(F.lit(False))
    assert neighbor_sample(e).count() == 0
