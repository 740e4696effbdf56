"""Round-7 operators: near-dup frame detection (MinHash/LSH over frame
fingerprints — r6 verdict item 5) and its planted re-encode fixture."""

from __future__ import annotations

import duckdb
import pandas as pd

from pyspark.sql import functions as F

from kie_invoice_minimal_spark.operators.multimodal import (
    MM_FRAME_CHARS,
    MM_FRAME_MINHASH_SQL,
    MM_FRAME_SAMPLE_STEP,
    frame_minhash_pairs,
    mm_frame_minhash_pairs,
)

SF = "/root/testdata/sf0.01"


def _pseudo_text(seed: int, n_chars: int) -> str:
    """Deterministic APERIODIC text (md5 stream — a periodic arithmetic
    pattern collapses distinct frame slices into a handful of contents,
    which silently weakens the fixture)."""
    import hashlib

    chunks = []
    total = 0
    c = 0
    while total < n_chars:
        h = hashlib.md5(f"{seed}:{c}".encode()).hexdigest()
        chunks.append(h)
        total += len(h)
        c += 1
    return "".join(chunks)[:n_chars]


def test_frame_minhash_catches_planted_reencode(spark):
    """A re-encode (same content, one frame's bytes perturbed) must be
    caught by frame MinHash even though its exact payload hash differs —
    the near-dup case exact payload/frame dedup misses by design."""
    base = _pseudo_text(1, 4000)  # 100 frames, 50 sampled
    # perturb chars inside exactly one SAMPLED frame (offset 80..119)
    reenc = base[:85] + "XYZQW" + base[90:]
    other = _pseudo_text(2, 4000)  # unrelated
    docs = spark.createDataFrame(
        [(1, base), (2, reenc), (3, other)], "doc_id long, text string"
    )
    # exact payload dedup would miss: different content hashes
    assert base != reenc
    rows = {(r.doc_a, r.doc_b): r for r in frame_minhash_pairs(docs).collect()}
    assert (1, 2) in rows, rows
    r = rows[(1, 2)]
    # 49 of 50 sampled frames shared: J = 49/51
    assert r.n_common_frames == 49
    assert r.jaccard_ppm == 49 * 1_000_000 // 51
    # the unrelated doc is never paired
    assert not any(3 in k for k in rows)


def test_frame_minhash_identical_docs_jaccard_one(spark):
    docs = spark.createDataFrame(
        [(10, _pseudo_text(5, 2000)), (11, _pseudo_text(5, 2000))],
        "doc_id long, text string",
    )
    rows = frame_minhash_pairs(docs).collect()
    assert len(rows) == 1
    assert rows[0].doc_a == 10 and rows[0].doc_b == 11
    assert rows[0].jaccard_ppm == 1_000_000


def test_frame_minhash_empty_and_tiny_docs(spark):
    """Empty corpus and sub-frame docs must not error (empty frame sets
    simply produce no pairs)."""
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert frame_minhash_pairs(empty).count() == 0
    tiny = spark.createDataFrame(
        [(1, ""), (2, "short"), (3, "short")], "doc_id long, text string"
    )
    rows = frame_minhash_pairs(tiny).collect()
    # the two identical one-frame docs pair at J=1; the empty doc never does
    assert {(r.doc_a, r.doc_b) for r in rows} == {(2, 3)}


def test_frame_minhash_fixture_matches_oracle(spark):
    """Spark vs DuckDB twin at sf0.001 (the gate runs sf0.01; this pins
    the smaller SF so a dialect drift fails fast in unit tests)."""
    sf = "/root/testdata/sf0.001"
    got = sorted(tuple(r) for r in mm_frame_minhash_pairs(spark, sf).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    want = sorted(tuple(r) for r in con.execute(MM_FRAME_MINHASH_SQL).fetchall())
    assert got == want


def test_frame_minhash_verify_is_exact_jaccard(spark):
    """Every emitted pair's (n_common, jaccard_ppm) must equal a pure-
    Python frame-set computation — the verify stage is exact, only the
    CANDIDATE stage is approximate."""
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text"
    )
    texts = {r.doc_id: r.text for r in docs.collect()}

    import hashlib

    def fps(text: str) -> set[int]:
        out = set()
        if not text:
            return out
        for fi in range(
            0, (len(text) - 1) // MM_FRAME_CHARS + 1, MM_FRAME_SAMPLE_STEP
        ):
            sl = text[fi * MM_FRAME_CHARS : fi * MM_FRAME_CHARS + MM_FRAME_CHARS]
            out.add(int(hashlib.md5(sl.encode()).hexdigest()[:15], 16))
        return out

    for r in mm_frame_minhash_pairs(spark, sf).collect():
        a, b = fps(texts[r.doc_a]), fps(texts[r.doc_b])
        inter = len(a & b)
        union = len(a | b)
        assert r.n_common_frames == inter
        assert r.jaccard_ppm == inter * 1_000_000 // union
        assert 2 * inter >= union  # the threshold actually filtered
