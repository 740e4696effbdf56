"""Property fuzz for mm_frame_minhash_pairs' DuckDB twin: the FULL
operator — framing, 60-bit fingerprints, MinHash permutations, band keys,
candidate generation AND exact-Jaccard verify — must equal a direct
pure-Python implementation of the documented semantics on ARBITRARY doc
sets.  Runs in DuckDB only (fast); the Spark side is hash-compared to the
same SQL by the harness, so equality transfers (the test_graph_fuzz_r5/r6
strategy).  Texts are concatenations of blocks drawn from a tiny pool so
frame overlap — and therefore banding collisions — actually occur."""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
from hypothesis import given, settings, strategies as st

from kie_invoice_minimal_spark.operators.dedup import (
    _MH_A,
    _MH_B,
    _MH_P,
    JACCARD_DEN,
    JACCARD_NUM,
    MINHASH_BANDS,
    MINHASH_K,
)
from kie_invoice_minimal_spark.operators.multimodal import (
    MM_FRAME_CHARS,
    MM_FRAME_MINHASH_SQL,
    MM_FRAME_SAMPLE_STEP,
)

# a pool of distinct MM_FRAME_CHARS-length blocks; docs are block
# concatenations (plus an optional ragged tail) so shared frames are common
_POOL = [
    (chr(ord("a") + i) * MM_FRAME_CHARS) for i in range(6)
] + [("xy" * (MM_FRAME_CHARS // 2))]

DOC = st.tuples(
    st.lists(st.integers(min_value=0, max_value=len(_POOL) - 1), max_size=6),
    st.integers(min_value=0, max_value=MM_FRAME_CHARS - 1),  # tail length
)


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _frames(text: str) -> set[int]:
    if not text:
        return set()
    out = set()
    for fi in range(0, (len(text) - 1) // MM_FRAME_CHARS + 1, MM_FRAME_SAMPLE_STEP):
        out.add(_md5_60(text[fi * MM_FRAME_CHARS : fi * MM_FRAME_CHARS + MM_FRAME_CHARS]))
    return out


def _python_pairs(texts: dict[int, str]) -> dict[tuple[int, int], tuple[int, int]]:
    fps = {d: _frames(t) for d, t in texts.items() if t}
    sigs = {}
    for d, f in fps.items():
        hb = [fp % _MH_P for fp in f]
        sigs[d] = [min((h * _MH_A[i] + _MH_B[i]) % _MH_P for h in hb) for i in range(MINHASH_K)]
    r = MINHASH_K // MINHASH_BANDS
    bkeys = {
        d: {
            (b, _md5_60(",".join(str(s[j]) for j in range(b * r, (b + 1) * r))))
            for b in range(MINHASH_BANDS)
        }
        for d, s in sigs.items()
    }
    out = {}
    ids = sorted(fps)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if not (bkeys[a] & bkeys[b]):
                continue
            inter = len(fps[a] & fps[b])
            union = len(fps[a] | fps[b])
            if inter * JACCARD_DEN >= union * JACCARD_NUM and inter > 0:
                out[(a, b)] = (inter, inter * 1_000_000 // union)
    return out


@settings(max_examples=40, deadline=None)
@given(st.lists(DOC, min_size=0, max_size=8))
def test_frame_minhash_sql_equals_python_model(docs):
    texts = {
        i: "".join(_POOL[j] for j in blocks) + _POOL[0][: tail]
        for i, (blocks, tail) in enumerate(docs)
    }
    pdf = pd.DataFrame(
        {"doc_id": list(texts.keys()), "text": list(texts.values())}
    ).astype({"doc_id": "int64", "text": "string"})
    con = duckdb.connect()
    con.register("documents", pdf)
    got = {
        (a, b): (n, j)
        for a, b, n, j in con.execute(MM_FRAME_MINHASH_SQL).fetchall()
    }
    assert got == _python_pairs(texts)
