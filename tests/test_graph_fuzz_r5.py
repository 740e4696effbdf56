"""Property tests for the round-5 capped graph semantics: the DuckDB
twins of kg_khop_counts (top-cap adjacency, cap deliberately tiny here so
the cap BINDS) and kg_common_neighbors must equal direct pure-Python
implementations of the documented capped semantics on ARBITRARY
co-mention inputs.  Runs in DuckDB — the Spark side is hash-compared to
the same SQL by the harness, so equality transfers (same strategy as
test_pagerank_fuzz.py)."""

from __future__ import annotations

from collections import defaultdict

import duckdb
import pandas as pd
from hypothesis import given, settings, strategies as st

from kie_invoice_minimal_spark.operators.graph_analytics import (
    CN_Q,
    common_neighbors_sql,
    khop_sql,
)

CAP = 2  # tiny so random graphs exceed it and the capping path is exercised

MENTION = st.tuples(
    st.integers(min_value=0, max_value=5),
    st.sampled_from(["a", "b", "c", "d", "e", "f", "g"]),
)


def _comention_edges(pairs):
    """(src, dst) -> w, symmetric — the same normalized-group edge rule as
    graph_analytics.comention_edges / the SQL `e` CTE."""
    cs = {(f"c{c}", s) for c, s in pairs}
    edges = defaultdict(int)
    for ca, sa in cs:
        for cb, sb in cs:
            if ca == cb and sa != sb:
                edges[(sa, sb)] += 1
    return edges


def _full_adj(edges):
    adj = defaultdict(set)
    for (s, d) in edges:
        adj[s].add(d)
    return adj


def _capped_adj(edges, cap):
    lists = defaultdict(list)
    for (s, d), w in edges.items():
        lists[s].append((d, w))
    return {
        s: [d for d, _w in sorted(lst, key=lambda t: (-t[1], t[0]))[:cap]]
        for s, lst in lists.items()
    }


def _mentions_pdf(pairs):
    return pd.DataFrame(
        {
            "conv_id": [f"c{c}" for c, _s in pairs],
            "surface": [s for _c, s in pairs],
            "mention_type": ["BRAND"] * len(pairs),
        }
    )


def _run_sql(pairs, sql_fn):
    con = duckdb.connect()
    con.register("fuzz_mentions_pdf", _mentions_pdf(pairs))
    sql = sql_fn(
        "SELECT conv_id, surface, mention_type FROM fuzz_mentions_pdf", cap=CAP
    )
    return con.execute(sql).fetchall()


@settings(max_examples=40, deadline=None)
@given(st.lists(MENTION, min_size=0, max_size=40))
def test_khop_sql_equals_python_capped_model(pairs):
    edges = _comention_edges(pairs)
    full, capped = _full_adj(edges), _capped_adj(edges, CAP)
    expect = {}
    for u in full:
        two = set()
        for v in capped[u]:
            two |= set(capped.get(v, []))
        two -= full[u] | {u}
        expect[u] = (len(full[u]), len(two))
    got = {r[0]: (r[1], r[2]) for r in _run_sql(pairs, khop_sql)}
    assert got == expect


@settings(max_examples=40, deadline=None)
@given(st.lists(MENTION, min_size=0, max_size=40))
def test_common_neighbors_sql_equals_python_capped_model(pairs):
    edges = _comention_edges(pairs)
    full, capped = _full_adj(edges), _capped_adj(edges, CAP)
    co = defaultdict(int)
    for v, kept in capped.items():
        ks = sorted(kept)
        for i, a in enumerate(ks):
            for b in ks[i + 1 :]:
                co[(a, b)] += 1
    expect = {}
    for (a, b), c in co.items():
        if c >= 2:
            expect[(a, b)] = (
                c,
                c * CN_Q // (len(full[a]) + len(full[b]) - c),
            )
    got = {(r[0], r[1]): (r[2], r[3]) for r in _run_sql(pairs, common_neighbors_sql)}
    assert got == expect
