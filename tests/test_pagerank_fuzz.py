"""Property test: the unrolled-CTE integer PageRank must equal a direct
pure-Python implementation of the same exact-integer recurrence on
ARBITRARY co-mention inputs, not just the fixture.  Runs in DuckDB (the
Spark twin is hash-compared to the same SQL by the harness, so equality
transfers) against an independent dict-and-loop reference."""

from __future__ import annotations

from collections import defaultdict

import duckdb
import pandas as pd
from hypothesis import given, settings, strategies as st

from kie_invoice_minimal_spark.operators.graph_analytics import (
    PR_BASE,
    PR_DAMP_DEN,
    PR_DAMP_NUM,
    PR_ITERS,
    PR_SCALE,
    pagerank_sql,
)

MENTION = st.tuples(
    st.integers(min_value=0, max_value=5),  # conv id (few -> dense co-mention)
    st.sampled_from(["a", "b", "c", "d", "e", "f", "g"]),  # surface
)


def _python_pagerank(pairs):
    cs = {(f"c{c}", s) for c, s in pairs}
    edges = defaultdict(int)
    for conv_a, sa in cs:
        for conv_b, sb in cs:
            if conv_a == conv_b and sa != sb:
                edges[(sa, sb)] += 1
    wout = defaultdict(int)
    for (s, _d), w in edges.items():
        wout[s] += w
    nodes = sorted(wout)
    score = {n: PR_SCALE for n in nodes}
    for _ in range(PR_ITERS):
        insum = defaultdict(int)
        for (s, d), w in edges.items():
            insum[d] += (score[s] * w) // wout[s]
        score = {
            n: PR_BASE + (PR_DAMP_NUM * insum.get(n, 0)) // PR_DAMP_DEN
            for n in nodes
        }
    return score


@settings(max_examples=40, deadline=None)
@given(st.lists(MENTION, min_size=0, max_size=40))
def test_pagerank_sql_equals_python_reference(pairs):
    pdf = pd.DataFrame(
        {
            "conv_id": [f"c{c}" for c, _s in pairs],
            "surface": [s for _c, s in pairs],
            "mention_type": ["BRAND"] * len(pairs),
        }
    )
    con = duckdb.connect()
    con.register("fuzz_mentions_pdf", pdf)
    sql = pagerank_sql("SELECT conv_id, surface, mention_type FROM fuzz_mentions_pdf")
    got = {r[0]: r[1] for r in con.execute(sql).fetchall()}
    assert got == _python_pagerank(pairs)
