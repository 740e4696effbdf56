"""Round-4 additions: feature-hashed doc vectors, text->embedding topk,
exact-integer linear fit."""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from kie_invoice_minimal_spark.operators.relational_ext import stats_linear_fit
from kie_invoice_minimal_spark.operators.similarity import ss_topk_docs
from kie_invoice_minimal_spark.operators.text_analysis import (
    DV_DIM,
    ta_doc_vectors,
)

SF = "/root/testdata/sf0.001"


def _mdhash(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_doc_vectors_match_python_reference(spark):
    """The Spark vector equals a per-token Python recompute for every doc
    (dims, buckets, signs).  Since r5 the registry entry serializes the
    vector as the space-joined scalar ``v_str`` (the r4 array<bigint>
    output was the round's one driver-gate FAIL); this parses it back,
    pinning the serialization contract too."""
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    got = {
        r.doc_id: [int(x) for x in r.v_str.split(" ")]
        for r in ta_doc_vectors(spark, SF).collect()
    }
    assert set(got) == set(docs)
    for doc_id in list(docs)[:25]:
        v = [0] * DV_DIM
        for tok in docs[doc_id].lower().split(" "):
            h = _mdhash(tok)
            v[h % DV_DIM] += 1 if (h // DV_DIM) % 2 == 0 else -1
        assert got[doc_id] == v, doc_id
    assert all(len(v) == DV_DIM for v in got.values())


def test_topk_docs_matches_python_bruteforce(spark):
    """Engine top-k equals an independent Python recompute (vectors,
    rounded cosines, (cosine desc, id) tie-break) for every query."""
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    vecs = {}
    for doc_id, text in docs.items():
        v = [0] * DV_DIM
        for tok in text.lower().split(" "):
            h = _mdhash(tok)
            v[h % DV_DIM] += 1 if (h // DV_DIM) % 2 == 0 else -1
        if any(x != 0 for x in v):
            vecs[doc_id] = np.array(v, dtype=float)
    rows = ss_topk_docs(spark, SF).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    queries = [d for d in vecs if d % 100 == 0]
    assert set(by_q) == set(queries) and queries
    for q in queries:
        qv = vecs[q]
        scored = sorted(
            (
                (-round(float(qv @ v) / (np.linalg.norm(qv) * np.linalg.norm(v)), 6), n)
                for n, v in vecs.items()
                if n != q
            ),
        )[:10]
        expect = [(n, -c) for c, n in scored]
        got = [
            (r.neighbor_id, r.cosine)
            for r in sorted(by_q[q], key=lambda r: r.rank)
        ]
        assert got == expect, (q, got[:3], expect[:3])


def test_linear_fit_matches_numpy(spark):
    got = {r.event_type: (r.slope_per_sec, r.intercept, r.n) for r in stats_linear_fit(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "value",
    ).collect()
    by_t = {}
    for r in ev:
        if r.value is not None:
            by_t.setdefault(r.event_type, []).append((r.ts_us, r.value))
    assert set(got) == set(by_t)
    for et, pts in by_t.items():
        t0 = min(p[0] for p in pts)
        xs = np.array([(p[0] - t0) // 1_000_000 for p in pts], dtype=float)
        ys = np.array([p[1] for p in pts])
        slope, intercept = np.polyfit(xs, ys, 1)
        gs, gi, gn = got[et]
        assert gn == len(pts)
        # the engine quantizes y at 1e-6 and floors — tolerance covers it
        assert abs(gs - slope) <= max(1e-6, abs(slope) * 1e-3), (et, gs, slope)
        assert abs(gi - intercept) <= max(1e-3, abs(intercept) * 1e-3), (et, gi, intercept)


def test_ngram_lm_score_separates_fluent_from_gibberish(spark, tmp_path):
    """On a corpus of many repeated fluent sentences plus one doc of
    unique never-repeated tokens, the gibberish doc must carry a strictly
    higher surprisal than every fluent doc; short docs get NULL."""
    from kie_invoice_minimal_spark.operators.text_analysis import (
        ta_ngram_lm_score,
    )

    fluent = "the cat sat on the mat and the dog sat on the rug"
    rows = [(i, fluent, "en", "s", len(fluent)) for i in range(20)]
    rows.append((100, "zq xv jk wp mn bt lc dr fs gh", "en", "s", 29))
    rows.append((101, "solo", "en", "s", 4))  # < 2 tokens -> NULL score
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    out = os.path.join(str(tmp_path), "documents.parquet")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(out)
    got = {r.doc_id: (r.n_bigrams, r.surprise_q) for r in ta_ngram_lm_score(spark, str(tmp_path)).collect()}
    assert got[101] == (0, None)
    gib = got[100][1]
    for i in range(20):
        assert got[i][1] is not None and gib > got[i][1], (i, got[i], gib)
