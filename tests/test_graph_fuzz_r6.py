"""Property tests for the round-6 per-conversation entity cap
(capped_conv_surfaces / the shared `_graph_cte` cs CTE): the DuckDB twin
of the capped edge generation must equal a direct pure-Python
implementation of the documented semantics — per conversation keep the
top-cap surfaces by (mention count DESC, surface ASC), then pair — on
ARBITRARY mention multisets, with the cap deliberately tiny so it BINDS.
Runs in DuckDB; the Spark side is hash-compared to the same SQL by the
harness, so equality transfers (same strategy as test_graph_fuzz_r5)."""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb
import pandas as pd
from hypothesis import given, settings, strategies as st

from kie_invoice_minimal_spark.operators.graph_analytics import _graph_cte

CONV_CAP = 2  # tiny so random conversations exceed it

MENTION = st.tuples(
    st.integers(min_value=0, max_value=3),
    st.sampled_from(["a", "b", "c", "d", "e", "f", "g"]),
)


def _python_capped_edges(pairs, cap):
    per_conv = defaultdict(Counter)
    for c, s in pairs:
        per_conv[f"c{c}"][s] += 1
    kept = {
        conv: [
            s
            for s, _n in sorted(cnt.items(), key=lambda t: (-t[1], t[0]))[:cap]
        ]
        for conv, cnt in per_conv.items()
    }
    edges = defaultdict(int)
    for surfaces in kept.values():
        for a in surfaces:
            for b in surfaces:
                if a != b:
                    edges[(a, b)] += 1
    return dict(edges)


def _mentions_pdf(pairs):
    return pd.DataFrame(
        {
            "conv_id": [f"c{c}" for c, _s in pairs],
            "surface": [s for _c, s in pairs],
            "mention_type": ["NAME"] * len(pairs),
        }
    )


@settings(max_examples=50, deadline=None)
@given(st.lists(MENTION, min_size=0, max_size=50))
def test_capped_edge_generation_sql_equals_python_model(pairs):
    con = duckdb.connect()
    con.register("fuzz_mentions_pdf", _mentions_pdf(pairs))
    cte = _graph_cte(
        "SELECT conv_id, surface, mention_type FROM fuzz_mentions_pdf",
        cap=CONV_CAP,
    )
    got = {
        (r[0], r[1]): r[2]
        for r in con.execute(f"WITH {cte} SELECT src, dst, w FROM e").fetchall()
    }
    assert got == _python_capped_edges(pairs, CONV_CAP)


def _python_kcore_rows(edges, k, peels):
    cur = set(edges)
    out = []
    for i in range(1, peels + 1):
        deg = Counter(a for a, _b in cur)
        keep = {n for n, d in deg.items() if d >= k}
        cur = {(a, b) for a, b in cur if a in keep and b in keep}
        out.append((i, len({a for a, _b in cur}), len(cur)))
    return out


@settings(max_examples=50, deadline=None)
@given(st.lists(MENTION, min_size=0, max_size=50))
def test_kcore_peel_sql_equals_python_model(pairs):
    """The unrolled MATERIALIZED-CTE peel must equal a direct pure-Python
    peel of the documented semantics on ARBITRARY co-mention graphs, with
    k tiny so peeling BINDS on random inputs (k=2 over a ≤7-surface pool
    produces full spectra: nothing peeled, partial, total collapse)."""
    from kie_invoice_minimal_spark.operators.graph_analytics import kcore_sql

    con = duckdb.connect()
    con.register("fuzz_mentions_pdf", _mentions_pdf(pairs))
    sql = kcore_sql(
        "SELECT conv_id, surface, mention_type FROM fuzz_mentions_pdf",
        k=2,
        peels=3,
    )
    got = sorted(tuple(r) for r in con.execute(sql).fetchall())
    edges = set(
        _python_capped_edges(pairs, 32)
    )  # cap 32 >> pool size: pairing, not capping, under test here
    assert got == _python_kcore_rows(edges, 2, 3)


@settings(max_examples=50, deadline=None)
@given(st.lists(MENTION, min_size=1, max_size=50))
def test_edge_lift_sql_equals_python_model(pairs):
    """Integer lift over arbitrary capped co-mention graphs: the DuckDB
    twin must equal (w · n_conv · 1e6) // (c_src · c_dst) computed
    directly from the pure-Python capped-edge model."""
    from kie_invoice_minimal_spark.operators.graph_analytics import (
        LIFT_Q,
        edge_lift_sql,
    )

    con = duckdb.connect()
    con.register("fuzz_mentions_pdf", _mentions_pdf(pairs))
    got = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.execute(
            edge_lift_sql(
                "SELECT conv_id, surface, mention_type FROM fuzz_mentions_pdf"
            )
        ).fetchall()
    }
    per_conv = defaultdict(Counter)
    for c, s in pairs:
        per_conv[f"c{c}"][s] += 1
    kept = {
        conv: [
            s
            for s, _n in sorted(cnt.items(), key=lambda t: (-t[1], t[0]))[:32]
        ]
        for conv, cnt in per_conv.items()
    }
    n_conv = len(kept)
    c_s = Counter()
    w = Counter()
    for surfaces in kept.values():
        for a in surfaces:
            c_s[a] += 1
            for b in surfaces:
                if a != b:
                    w[(a, b)] += 1
    expect = {
        (a, b): (cnt, (cnt * n_conv * LIFT_Q) // (c_s[a] * c_s[b]))
        for (a, b), cnt in w.items()
    }
    assert got == expect


@settings(max_examples=50, deadline=None)
@given(st.lists(MENTION, min_size=1, max_size=50))
def test_communities_sql_equals_python_model(pairs):
    """The full community oracle chain (capped edges → integer lift →
    prune at lift ≥ 1 → 2 unrolled LPA rounds) vs a direct pure-Python
    implementation on arbitrary mention multisets."""
    from kie_invoice_minimal_spark.operators.graph_analytics import (
        LIFT_Q,
        LPA_ITERS,
        LPA_PRUNE_PPM,
        communities_sql,
    )

    con = duckdb.connect()
    con.register("fuzz_mentions_pdf", _mentions_pdf(pairs))
    got = dict(
        con.execute(
            communities_sql(
                "SELECT conv_id, surface, mention_type FROM fuzz_mentions_pdf"
            )
        ).fetchall()
    )
    per_conv = defaultdict(Counter)
    for c, s in pairs:
        per_conv[f"c{c}"][s] += 1
    kept = {
        conv: [
            s
            for s, _n in sorted(cnt.items(), key=lambda t: (-t[1], t[0]))[:32]
        ]
        for conv, cnt in per_conv.items()
    }
    n_conv = len(kept)
    c_s = Counter()
    w = Counter()
    for surfaces in kept.values():
        for a in surfaces:
            c_s[a] += 1
            for b in surfaces:
                if a != b:
                    w[(a, b)] += 1
    adj = defaultdict(list)
    for (a, b), cnt in w.items():
        if (cnt * n_conv * LIFT_Q) // (c_s[a] * c_s[b]) >= LPA_PRUNE_PPM:
            adj[a].append((b, cnt))
    lbl = {n: n for n in adj}
    for _ in range(LPA_ITERS):
        new = {}
        for v, nbrs in adj.items():
            sc = defaultdict(int)
            for d, cnt in nbrs:
                sc[lbl[d]] += cnt
            mw = max(sc.values())
            new[v] = min(l for l, s in sc.items() if s == mw)
        lbl = new
    assert got == lbl


# --- round 7: conv-fanout histogram fuzz (bin-boundary pinning) ---------------------


@settings(max_examples=50, deadline=None)
@given(st.lists(MENTION, min_size=0, max_size=60))
def test_conv_fanout_sql_equals_python_model(pairs):
    """kg_conv_fanout's oracle vs a pure-Python recount on arbitrary
    mention multisets — specifically pins the log2-bin boundaries
    (d = 1, 2, 4, 8 land in buckets 0, 1, 2, 3 via length(bin(d))-1,
    where float log2 at exact powers of two is the classic cross-engine
    ulp hazard) and the over-cap counting with a deliberately tiny cap."""
    from kie_invoice_minimal_spark.operators.graph_analytics import (
        conv_fanout_sql,
    )

    pdf = _mentions_pdf(pairs)
    con = duckdb.connect()
    con.register("m_in", pdf)
    # shrink the cap inside the generated SQL so random data exceeds it
    sql = conv_fanout_sql("SELECT * FROM m_in").replace("> 32", "> 2")
    got = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(sql).fetchall()
    }
    per_conv = defaultdict(set)
    for c, s in pairs:
        per_conv[f"c{c}"].add(s)
    buckets = defaultdict(list)
    for v in per_conv.values():
        d = len(v)
        buckets[d.bit_length() - 1].append(d)
    want = {
        b: (
            len(ds),
            min(ds),
            max(ds),
            sum(1 for d in ds if d > 2),
        )
        for b, ds in buckets.items()
    }
    assert got == want
