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
