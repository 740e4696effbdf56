"""Round-5 text additions: quantized tf-idf top terms and cross-document
chunk dedup — engine outputs vs independent pure-Python recomputes."""

from __future__ import annotations

from collections import Counter, defaultdict

from kie_invoice_minimal_spark.operators.text_analysis import (
    CHUNK_TOKENS,
    TFIDF_Q,
    TFIDF_TOP_K,
    ta_chunk_dedup,
    ta_tfidf_topk,
)

SF = "/root/testdata/sf0.001"


def _texts(spark):
    return {
        r.doc_id: r.text.lower().split(" ")
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }


def test_tfidf_topk_matches_python_reference(spark):
    docs = _texts(spark)
    n_docs = len(docs)
    df = Counter()
    for toks in docs.values():
        df.update(set(toks))
    expect = {}
    for doc_id, toks in docs.items():
        tf = Counter(toks)
        # r6 final quantization: tf·1e6 // df directly — n_docs cancels
        # algebraically, which is what makes the engine expression
        # int64-bounded without a 128-bit intermediate (see the
        # operator docstring's two-round fix history)
        scored = sorted(
            ((t * TFIDF_Q // df[term], term) for term, t in tf.items()),
            key=lambda x: (-x[0], x[1]),
        )[:TFIDF_TOP_K]
        for rank, (q, term) in enumerate(scored, 1):
            expect[(doc_id, rank)] = (term, q)
    got = {
        (r.doc_id, r.rank): (r.term, r.tfidf_q)
        for r in ta_tfidf_topk(spark, SF).collect()
    }
    assert got == expect
    assert len(got) == n_docs * TFIDF_TOP_K  # every doc has >= 3 terms here


def test_chunk_dedup_matches_python_reference(spark):
    docs = _texts(spark)
    chunks_of = {
        doc_id: [
            " ".join(toks[i * CHUNK_TOKENS : (i + 1) * CHUNK_TOKENS])
            for i in range(len(toks) // CHUNK_TOKENS)
        ]
        for doc_id, toks in docs.items()
    }
    owners = defaultdict(set)
    for doc_id, chunks in chunks_of.items():
        for c in chunks:
            owners[c].add(doc_id)
    expect = {}
    for doc_id, chunks in chunks_of.items():
        n = len(chunks)
        dup = sum(1 for c in chunks if len(owners[c]) > 1)
        expect[doc_id] = (n, dup, (dup * 1_000_000) // n if n else None)
    got = {
        r.doc_id: (r.n_chunks, r.n_dup_chunks, r.dup_frac_ppm)
        for r in ta_chunk_dedup(spark, SF).collect()
    }
    assert got == expect
    # non-vacuous: the fixture corpus genuinely shares some chunks
    assert any(v[1] > 0 for v in got.values())


def test_chunk_dedup_short_doc_null_fraction(spark, tmp_path):
    """A doc shorter than one chunk keeps its row with zero counts and a
    NULL fraction (no division-by-zero on either engine)."""
    import os

    spark.createDataFrame(
        [(1, "tiny doc", "en", "s", 8), (2, " ".join(["tok"] * 16), "en", "s", 60)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(os.path.join(str(tmp_path), "documents.parquet"))
    got = {
        r.doc_id: (r.n_chunks, r.n_dup_chunks, r.dup_frac_ppm)
        for r in ta_chunk_dedup(spark, str(tmp_path)).collect()
    }
    assert got[1] == (0, 0, None)
    assert got[2] == (2, 0, 0)  # two identical chunks in the SAME doc -> not cross-doc dups
