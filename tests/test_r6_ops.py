"""Round-6 additions: binary-payload dedup, frame-hash dedup, degree
distribution — engine outputs vs independent pure-Python recomputes."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

from kie_invoice_minimal_spark.operators.multimodal import (
    MM_FRAME_CHARS,
    MM_FRAME_SAMPLE_STEP,
    mm_frame_hash_dedup,
    mm_payload_dedup,
)

SF = "/root/testdata/sf0.001"


def _mdhash(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _texts(spark):
    return {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }


def test_payload_dedup_matches_python_reference(spark):
    docs = _texts(spark)
    groups = defaultdict(list)
    for doc_id, text in docs.items():
        groups[_mdhash(text)].append(doc_id)
    expect = {
        fp: (
            min(ids),
            len(ids),
            len(docs[ids[0]].encode()),
            (len(ids) - 1) * len(docs[ids[0]].encode()),
        )
        for fp, ids in groups.items()
    }
    got = {
        r.payload_fp: (r.keep_doc_id, r.n_copies, r.payload_bytes, r.bytes_saved)
        for r in mm_payload_dedup(spark, SF).collect()
    }
    assert got == expect


def test_frame_hash_dedup_matches_python_reference(spark):
    docs = _texts(spark)
    frames_of = {}
    for doc_id, text in docs.items():
        idxs = range(0, (len(text) - 1) // MM_FRAME_CHARS + 1, MM_FRAME_SAMPLE_STEP)
        frames_of[doc_id] = [
            _mdhash(text[i * MM_FRAME_CHARS : (i + 1) * MM_FRAME_CHARS]) for i in idxs
        ]
    owners = defaultdict(set)
    for doc_id, fps in frames_of.items():
        for fp in fps:
            owners[fp].add(doc_id)
    expect = {}
    for doc_id, fps in frames_of.items():
        n = len(fps)
        dup = sum(1 for fp in fps if len(owners[fp]) > 1)
        expect[doc_id] = (n, dup, (dup * 1_000_000) // n if n else None)
    got = {
        r.doc_id: (r.n_frames_hashed, r.n_dup_frames, r.dup_frac_ppm)
        for r in mm_frame_hash_dedup(spark, SF).collect()
    }
    assert got == expect
    # the fixture must actually exercise multi-frame docs and real dups
    assert any(v[0] > 1 for v in got.values())
    assert any(v[1] > 0 for v in got.values())


def test_degree_distribution_matches_python_reference(spark):
    from kie_invoice_minimal_spark.operators.graph_analytics import (
        comention_edges,
        kg_degree_distribution,
    )
    from kie_invoice_minimal_spark.operators.mention_detect import (
        detect_mentions_arrow,
    )
    from kie_invoice_minimal_spark.sources.transcripts import (
        transcripts_from_documents,
    )

    m = detect_mentions_arrow(transcripts_from_documents(spark, SF))
    deg = Counter()
    for r in comention_edges(m).collect():
        deg[r.src] += 1
    buckets = defaultdict(list)
    for d in deg.values():
        buckets[d.bit_length() - 1].append(d)  # floor(log2(d))
    expect = {
        b: (len(ds), min(ds), max(ds), sum(ds)) for b, ds in buckets.items()
    }
    got = {
        r.bucket: (r.n_nodes, r.min_deg, r.max_deg, r.sum_deg)
        for r in kg_degree_distribution(spark, SF).collect()
    }
    assert got == expect and len(got) > 0


def test_triples_incremental_matches_python_reference(spark):
    """Novel-fact extraction: batch (md5-slot 0) triples minus triples
    whose (pred, obj) fact already exists in the rest of the corpus."""
    from kie_invoice_minimal_spark.operators.triples import (
        KG_INCR_MOD,
        KG_INCR_REM,
        kg_triples_incremental,
    )
    from kie_invoice_minimal_spark.plans.pipeline import extract_triples_df
    from kie_invoice_minimal_spark.sources.transcripts import (
        transcripts_from_documents,
    )

    trip = [
        (r.subj, r.pred, r.obj, r.conv_id)
        for r in extract_triples_df(
            transcripts_from_documents(spark, SF), engine="arrow"
        ).collect()
    ]
    def slot(conv_id: str) -> int:
        return _mdhash(conv_id) % KG_INCR_MOD

    corpus_facts = {
        (p, o) for (s, p, o, c) in trip if slot(c) != KG_INCR_REM
    }
    expect = sorted(
        (s, p, o, c)
        for (s, p, o, c) in trip
        if slot(c) == KG_INCR_REM and (p, o) not in corpus_facts
    )
    got = sorted(
        (r.subj, r.pred, r.obj, r.conv_id)
        for r in kg_triples_incremental(spark, SF).collect()
    )
    assert got == expect
    n_batch = sum(1 for (s, p, o, c) in trip if slot(c) == KG_INCR_REM)
    assert 0 < len(got) < n_batch  # suppression actually happens


def _capped_surfaces(spark, cap):
    """Pure-Python capped_conv_surfaces model over the sf0.001 mentions."""
    from kie_invoice_minimal_spark.operators.graph_analytics import PR_TYPES
    from kie_invoice_minimal_spark.operators.mention_detect import (
        detect_mentions_arrow,
    )
    from kie_invoice_minimal_spark.sources.transcripts import (
        transcripts_from_documents,
    )

    per_conv = defaultdict(Counter)
    for r in detect_mentions_arrow(
        transcripts_from_documents(spark, SF)
    ).collect():
        if r.mention_type in PR_TYPES:
            per_conv[r.conv_id][r.surface] += 1
    return {
        conv: [
            s
            for s, _n in sorted(cnt.items(), key=lambda t: (-t[1], t[0]))[:cap]
        ]
        for conv, cnt in per_conv.items()
    }


def test_edge_lift_matches_python_reference(spark):
    from kie_invoice_minimal_spark.operators.graph_analytics import (
        COMENTION_CAP,
        LIFT_Q,
        kg_edge_lift,
    )

    kept = _capped_surfaces(spark, COMENTION_CAP)
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
    got = {
        (r.src, r.dst): (r.w, r.lift_ppm)
        for r in kg_edge_lift(spark, SF).collect()
    }
    assert got == expect and len(got) > 0
    # lift must actually discriminate on the fixture (not all-equal)
    assert len({v[1] for v in got.values()}) > 1


def test_kcore_matches_python_reference_and_binds(spark):
    from kie_invoice_minimal_spark.operators.graph_analytics import (
        COMENTION_CAP,
        KCORE_K,
        KCORE_PEELS,
        kg_kcore,
    )

    kept = _capped_surfaces(spark, COMENTION_CAP)
    edges = set()
    for surfaces in kept.values():
        for a in surfaces:
            for b in surfaces:
                if a != b:
                    edges.add((a, b))
    expect = []
    cur = edges
    for i in range(1, KCORE_PEELS + 1):
        deg = Counter(a for a, _b in cur)
        keep = {n for n, d in deg.items() if d >= KCORE_K}
        cur = {(a, b) for a, b in cur if a in keep and b in keep}
        expect.append((i, len({a for a, _b in cur}), len(cur)))
    got = sorted(
        (r.peel, r.n_nodes, r.n_edges) for r in kg_kcore(spark, SF).collect()
    )
    assert got == expect
    # the peel must BIND on the fixture: every consecutive round shrinks
    # until empty, so the test exercises more than the nothing-to-peel path
    sizes = [n for _i, n, _e in got]
    assert sizes[0] < len({a for a, _b in edges})
    assert all(b < a for a, b in zip(sizes, sizes[1:]) if a > 0)


def test_communities_matches_python_reference_and_discriminates(spark):
    """Lift-pruned LPA vs a direct pure-Python implementation of the
    documented semantics; the result must form REAL structure (more than
    one community, fewer communities than nodes)."""
    from kie_invoice_minimal_spark.operators.graph_analytics import (
        COMENTION_CAP,
        LIFT_Q,
        LPA_ITERS,
        LPA_PRUNE_PPM,
        kg_communities,
    )

    kept = _capped_surfaces(spark, COMENTION_CAP)
    n_conv = len(kept)
    c_s = Counter()
    w = Counter()
    for surfaces in kept.values():
        for a in surfaces:
            c_s[a] += 1
            for b in surfaces:
                if a != b:
                    w[(a, b)] += 1
    pe = {
        (a, b): cnt
        for (a, b), cnt in w.items()
        if (cnt * n_conv * LIFT_Q) // (c_s[a] * c_s[b]) >= LPA_PRUNE_PPM
    }
    adj = defaultdict(list)
    for (a, b), cnt in pe.items():
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
    got = {
        r.surface: r.community for r in kg_communities(spark, SF).collect()
    }
    assert got == lbl
    n_comm = len(set(got.values()))
    assert 1 < n_comm < len(got)


def test_markov_transitions_matches_python_reference(spark):
    from kie_invoice_minimal_spark.operators.relational_ext import (
        ev_markov_transitions,
    )

    rows = sorted(
        (r.user_id, r.ts, r.event_id, r.event_type)
        for r in spark.read.parquet(f"{SF}/events.parquet").collect()
    )
    per_user = defaultdict(list)
    for uid, ts, eid, et in rows:
        per_user[uid].append(et)  # rows pre-sorted by (user, ts, event_id)
    n = Counter()
    for seq in per_user.values():
        for a, b in zip(seq, seq[1:]):
            n[(a, b)] += 1
    tot = Counter()
    for (a, _b), c in n.items():
        tot[a] += c
    expect = {
        (a, b): (c, (c * 1_000_000) // tot[a]) for (a, b), c in n.items()
    }
    got = {
        (r.from_type, r.to_type): (r.n, r.p_ppm)
        for r in ev_markov_transitions(spark, SF).collect()
    }
    assert got == expect and len(got) > 1
    # row-normalization sanity: each from-row's probabilities sum to ~1e6
    sums = defaultdict(int)
    for (a, _b), (_c, p) in got.items():
        sums[a] += p
    assert all(1_000_000 - 25 <= s <= 1_000_000 for s in sums.values())
