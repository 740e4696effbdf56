"""Property tests for the round-8 training-feed samplers: the DuckDB
twins of kg_neighbor_sample and kg_negative_sample must equal direct
pure-Python implementations of the documented draw semantics on
ARBITRARY co-mention inputs.  Runs in DuckDB — the Spark side is
hash-compared to the same SQL by the harness (and pinned to the same
Python model on planted graphs by test_r8_neighbor_sample /
test_r8_negative_sample), so equality transfers — the same strategy as
test_graph_fuzz_r5.py.

Fuzz conversations have ≤ 7 distinct surfaces, far under COMENTION_CAP,
so the edge model is the plain symmetric co-mention rule (the cap paths
have their own fuzz in test_graph_fuzz_r5 / test_r8_cap_routing)."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import duckdb
import pandas as pd
from hypothesis import given, settings, strategies as st

from kie_invoice_minimal_spark.operators.graph_analytics import (
    NEG_K,
    NEG_TRIALS,
    NS_FAN1,
    NS_FAN2,
    negative_sample_sql,
    neighbor_sample_sql,
)

US = "\x1f"

MENTION = st.tuples(
    st.integers(min_value=0, max_value=5),
    st.sampled_from(["a", "b", "c", "d", "e", "f", "g"]),
)


def _mdhash(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _comention_edges(pairs) -> set:
    """Symmetric (src, dst) pairs — the `e` CTE's edge rule (cap never
    binds at this fuzz scale)."""
    cs = {(f"c{c}", s) for c, s in pairs}
    return {
        (sa, sb)
        for ca, sa in cs
        for cb, sb in cs
        if ca == cb and sa != sb
    }


def _mentions_pdf(pairs):
    return pd.DataFrame(
        {
            "conv_id": [f"c{c}" for c, _s in pairs],
            "surface": [s for _c, s in pairs],
            "mention_type": ["BRAND"] * len(pairs),
        }
    )


def _run_sql(pairs, sql: str):
    con = duckdb.connect()
    con.register("fuzz_mentions_pdf", _mentions_pdf(pairs))
    return con.execute(sql).fetchall()


MENTIONS_SQL = "SELECT conv_id, surface, mention_type FROM fuzz_mentions_pdf"


def _sample_model(edges: set, fan: int, salt: str) -> set:
    by_src: dict = defaultdict(list)
    for src, dst in edges:
        by_src[src].append((_mdhash(f"{salt}{US}{src}{US}{dst}"), dst))
    return {
        (src, dst)
        for src, rows in by_src.items()
        for _, dst in sorted(rows)[:fan]
    }


@settings(max_examples=40, deadline=None)
@given(st.lists(MENTION, min_size=0, max_size=40))
def test_neighbor_sample_sql_equals_python_model(pairs):
    edges = _comention_edges(pairs)
    s1 = _sample_model(edges, NS_FAN1, "h1")
    s2 = _sample_model(edges, NS_FAN2, "h2")
    expect = {(u, 1, u, v) for u, v in s1}
    expect |= {(u, 2, v, w) for u, v in s1 for p, w in s2 if p == v}
    got = set(map(tuple, _run_sql(pairs, neighbor_sample_sql(MENTIONS_SQL))))
    assert got == expect


@settings(max_examples=40, deadline=None)
@given(st.lists(MENTION, min_size=0, max_size=40))
def test_negative_sample_sql_equals_python_model(pairs):
    edges = _comention_edges(pairs)
    nodes = sorted({s for s, _ in edges})
    expect = set()
    for s, d in edges:
        seen: dict = {}
        for t in range(NEG_TRIALS):
            neg = nodes[_mdhash(f"ng{US}{s}{US}{d}{US}{t}") % len(nodes)]
            if neg == s or (s, neg) in edges:
                continue
            if neg not in seen:
                seen[neg] = t
        kept = sorted((t, n) for n, t in seen.items())[:NEG_K]
        expect |= {(s, d, t, n) for t, n in kept}
    got = set(map(tuple, _run_sql(pairs, negative_sample_sql(MENTIONS_SQL))))
    assert got == expect


@settings(max_examples=40, deadline=None)
@given(st.lists(MENTION, min_size=0, max_size=40))
def test_random_walks_sql_equals_python_model(pairs):
    from kie_invoice_minimal_spark.operators.graph_analytics import (
        RW_LEN,
        RW_WALKS,
        random_walks_sql,
    )

    # weighted symmetric comention edges (the `e` CTE: w = conversations)
    cs = {(f"c{c}", s) for c, s in pairs}
    ew: dict = defaultdict(int)
    for ca, sa in cs:
        for cb, sb in cs:
            if ca == cb and sa != sb:
                ew[(sa, sb)] += 1
    adj: dict = defaultdict(list)
    for (s, d), w in ew.items():
        adj[s].append((-w, d))
    nbrs = {s: [d for _w, d in sorted(lst)] for s, lst in adj.items()}
    # fuzz degrees ≤ 6 ≪ RW_CAP, so the uncapped model is the capped one
    expect = set()
    for seed in nbrs:
        for w in range(RW_WALKS):
            node = seed
            expect.add((seed, w, 0, node))
            for t in range(1, RW_LEN + 1):
                lst = nbrs.get(node)
                if not lst:
                    break
                node = lst[_mdhash(f"rw{US}{seed}{US}{w}{US}{t}") % len(lst)]
                expect.add((seed, w, t, node))
    got = set(map(tuple, _run_sql(pairs, random_walks_sql(MENTIONS_SQL))))
    assert got == expect
