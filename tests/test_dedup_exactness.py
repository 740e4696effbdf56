"""Exactness guarantees of the dedup operators.

dd_ngram_jaccard claims GLOBAL exactness via prefix filtering (any pair with
J >= t shares a prefix element) — verify against a brute-force all-pairs
computation; dd_dup_clusters must partition exactly the docs of the verified
pairs with min-id labels."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from kie_invoice_minimal_spark.operators.dedup import (
    JACCARD_THS,
    _tok_shingles,
    dd_dup_clusters,
    dd_lsh_verified_dups,
    dd_ngram_jaccard,
)

SF = "/root/testdata/sf0.001"


def _shingle_sets(spark):
    d = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", _tok_shingles(F.col("text")).alias("sh"))
        .collect()
    )
    return {r.doc_id: frozenset(r.sh) for r in d}


def test_prefix_filter_is_exact(spark):
    """Operator output == brute-force all-pairs Jaccard at the threshold."""
    sets = _shingle_sets(spark)
    want = set()
    for a, b in itertools.combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        inter = len(sa & sb)
        if inter and inter / (len(sa) + len(sb) - inter) >= JACCARD_THS:
            want.add((a, b))
    got = {
        (r.doc_a, r.doc_b) for r in dd_ngram_jaccard(spark, SF).collect()
    }
    assert got == want
    assert want, "fixture must contain near-dup pairs for this test to bite"


def test_jaccard_values_match_bruteforce(spark):
    sets = _shingle_sets(spark)
    for r in dd_ngram_jaccard(spark, SF).collect():
        sa, sb = sets[r.doc_a], sets[r.doc_b]
        inter = len(sa & sb)
        exact = inter / (len(sa) + len(sb) - inter)
        assert abs(r.jaccard - exact) < 1e-6


def test_lsh_verified_subset_of_exact(spark):
    """The LSH cascade may miss signature-non-colliding pairs but must never
    invent one: its output is a subset of the exact operator's."""
    exact = {(r.doc_a, r.doc_b) for r in dd_ngram_jaccard(spark, SF).collect()}
    lsh = {(r.doc_a, r.doc_b) for r in dd_lsh_verified_dups(spark, SF).collect()}
    assert lsh <= exact


def test_dup_clusters_partition_pairs(spark):
    """Cluster labels are the min doc of each component and every paired doc
    is assigned; both endpoints of a pair land in the same cluster."""
    pairs = [(r.doc_a, r.doc_b) for r in dd_lsh_verified_dups(spark, SF).collect()]
    got = {r.doc_id: (r.cluster_id, r.is_keeper) for r in dd_dup_clusters(spark, SF).collect()}
    # union-find ground truth
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {}
    for n in parent:
        root = find(n)
        want[n] = root
    # normalize: cluster id should be the min member
    members: dict[int, list[int]] = {}
    for n, rt in want.items():
        members.setdefault(rt, []).append(n)
    want_min = {n: min(members[rt]) for n, rt in want.items()}
    assert {k: v[0] for k, v in got.items()} == want_min
    for doc, (cid, keep) in got.items():
        assert keep == (doc == cid)


def test_band_clusters_coarsen_verified_clusters(spark):
    """Bipartite band clustering is the recall stage: any LSH-verified dup
    pair shares a band, hence the same band cluster — band clusters must be
    a coarsening of the verified-pair clusters."""
    from kie_invoice_minimal_spark.operators.dedup import dd_band_clusters

    bc = {r.doc_id: r.cluster_id for r in dd_band_clusters(spark, SF).collect()}
    for r in dd_lsh_verified_dups(spark, SF).collect():
        assert bc[r.doc_a] == bc[r.doc_b], (r.doc_a, r.doc_b)


def test_contamination_matches_bruteforce(spark):
    """dd_contamination == brute-force containment over the benchmark split."""
    from kie_invoice_minimal_spark.operators.dedup import (
        BENCH_MOD,
        CONTAIN_DEN,
        CONTAIN_NUM,
        dd_contamination,
    )

    sets = _shingle_sets(spark)
    bench = {d: s for d, s in sets.items() if d % BENCH_MOD == 0}
    want = set()
    for d, s in sets.items():
        if d % BENCH_MOD == 0:
            continue
        for b, bs in bench.items():
            if len(s & bs) * CONTAIN_DEN >= len(s) * CONTAIN_NUM:
                want.add((d, b, len(s & bs)))
    got = {
        (r.doc_id, r.bench_doc_id, r.n_overlap)
        for r in dd_contamination(spark, "/root/testdata/sf0.001").collect()
    }
    assert got == want and len(got) > 0
