"""kg_random_walks: deterministic DeepWalk-style walk corpus.  Pins
(a) exact equality with a pure-Python model of the capped indexed
adjacency + keyed-hash transition, (b) walk-shape properties (every
(seed, walk) emits steps 0..L, consecutive nodes are true edges),
(c) the cap binding on a planted hub, (d) replay determinism, (e) the
empty graph, (f) truncation at a dead end on an asymmetric graph."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from kie_invoice_minimal_spark.operators.graph_analytics import (
    RW_CAP,
    RW_LEN,
    RW_WALKS,
    random_walks,
)

US = "\x1f"


def _mdhash(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _indexed_adj(edges: list[tuple[str, str, int]], cap: int) -> dict:
    by_src: dict = {}
    for s, d, w in edges:
        by_src.setdefault(s, []).append((-w, d))
    return {
        s: [d for _w, d in sorted(lst)[:cap]] for s, lst in by_src.items()
    }


def _model(
    edges: list[tuple[str, str, int]], walks: int, length: int, cap: int
) -> set:
    adj = _indexed_adj(edges, cap)
    out = set()
    for seed in adj:
        for w in range(walks):
            node = seed
            out.add((seed, w, 0, node))
            for t in range(1, length + 1):
                nbrs = adj.get(node)
                if not nbrs:
                    break  # dead end: the walk truncates
                node = nbrs[_mdhash(f"rw{US}{seed}{US}{w}{US}{t}") % len(nbrs)]
                out.add((seed, w, t, node))
    return out


def _edges_df(spark, edges: list[tuple[str, str, int]]):
    return spark.createDataFrame(edges, "src string, dst string, w long")


def _planted_edges() -> list[tuple[str, str, int]]:
    """A hub with degree above a tiny test cap plus a weighted cycle, all
    symmetric (every node has out-edges, so full-length walks)."""
    edges = []
    for j in range(8):
        edges += [("hub", f"n{j}", j + 1), (f"n{j}", "hub", j + 1)]
    cyc = ["n0", "n1", "n2", "n3"]
    for i, a in enumerate(cyc):
        b = cyc[(i + 1) % len(cyc)]
        edges += [(a, b, 10), (b, a, 10)]
    return edges


def test_matches_python_model_default_cap(spark):
    edges = _planted_edges()
    got = {
        (r.seed, r.walk, r.step, r.node)
        for r in random_walks(_edges_df(spark, edges)).collect()
    }
    assert got == _model(edges, RW_WALKS, RW_LEN, RW_CAP)
    # shape: every (seed, walk) emits exactly steps 0..RW_LEN (no dead
    # ends on a symmetric graph), and consecutive nodes are true edges
    eset = {(s, d) for s, d, _w in edges}
    byw: dict = {}
    for s, w, t, n in got:
        byw.setdefault((s, w), {})[t] = n
    assert len(byw) == len({s for s, _, _ in edges}) * RW_WALKS
    for (_s, _w), path in byw.items():
        assert sorted(path) == list(range(RW_LEN + 1))
        for t in range(1, RW_LEN + 1):
            assert (path[t - 1], path[t]) in eset


def test_cap_binds_on_the_hub(spark):
    """cap=4 < hub degree 8: walks from the hub may only visit its top-4
    neighbors by (w DESC, dst ASC) — the model and Spark agree."""
    edges = _planted_edges()
    got = {
        (r.seed, r.walk, r.step, r.node)
        for r in random_walks(_edges_df(spark, edges), cap=4).collect()
    }
    assert got == _model(edges, RW_WALKS, RW_LEN, 4)
    top4 = {d for _w, d in sorted((-w, d) for s, d, w in edges if s == "hub")[:4]}
    hub_next = {n for s, w, t, n in got if t >= 1 and (s, w, t - 1, "hub") in got}
    assert hub_next <= top4 and hub_next


def test_dead_end_truncates(spark):
    """Asymmetric graph: b has no out-edges, so walks stop at b."""
    edges = [("a", "b", 1)]
    got = {
        (r.seed, r.walk, r.step, r.node)
        for r in random_walks(_edges_df(spark, edges)).collect()
    }
    assert got == _model(edges, RW_WALKS, RW_LEN, RW_CAP)
    assert {(s, w, t, n) for s, w, t, n in got if t >= 1} == {
        ("a", w, 1, "b") for w in range(RW_WALKS)
    }


def test_replay_is_byte_identical(spark):
    e = _edges_df(spark, _planted_edges())
    a = sorted(map(tuple, random_walks(e).collect()))
    b = sorted(map(tuple, random_walks(e).collect()))
    assert a == b and len(a) > 0


def test_empty_graph(spark):
    e = _edges_df(spark, []).filter(F.lit(False))
    assert random_walks(e).count() == 0
