"""Similarity search over the ``embeddings`` table — brute-force cosine
top-k (the exactness baseline) and a random-hyperplane LSH-bucketed ANN
variant (the scale path).

Scale notes: brute-force is query-set x corpus — fine when the query set is
small and broadcast; the LSH variant buckets the corpus once (narrow map)
and only scans within buckets, turning top-k into an equi-join.  The
hyperplanes are deterministic ±1 literals generated in Python and embedded
in BOTH the Spark plan and the DuckDB twin, so signatures agree bit-for-bit.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.scan import spread_scan

TOP_K = 10
QUERY_MOD = 100  # vec_id % QUERY_MOD == 0 -> query vector
N_PLANES = 8
DIM = 64

# deterministic ±1 hyperplanes (seed 42), shared by both dialects as literals
_rng = np.random.RandomState(42)
HYPERPLANES: list[list[int]] = (
    (_rng.randint(0, 2, size=(N_PLANES, DIM)) * 2 - 1).tolist()
)


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread_scan: the hyperplane/cosine folds are interpreted per-element
    # work chained onto the scan; fan a one-task bench scan out to the
    # cores (no-op on real multi-split inputs — see sources/scan.py)
    path = f"{sf_dir}/embeddings.parquet"
    return spread_scan(
        spark.read.parquet(path).select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        ),
        path,
    )


def _cos(av, bv):
    dot = F.aggregate(F.zip_with(av, bv, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(av, F.lit(0.0), lambda s, x: s + x * x))
    nb = F.sqrt(F.aggregate(bv, F.lit(0.0), lambda s, x: s + x * x))
    return F.round(dot / (na * nb), 6)


def _norm(av):
    """Per-row vector norm — the EXACT same left-fold expression _cos
    inlines, split out so operators can compute it once per vector
    instead of once per pair (r9; values bit-identical by construction)."""
    return F.sqrt(F.aggregate(av, F.lit(0.0), lambda s, x: s + x * x))


def _cos_pre(av, bv, na, nb):
    """Cosine from precomputed norms: same dot fold, same rounding —
    only the norm recomputation per pair is gone."""
    dot = F.aggregate(F.zip_with(av, bv, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    return F.round(dot / (na * nb), 6)


def ss_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k neighbors for each query vector: broadcast the (small)
    query set against the corpus, rank with a per-query window.  Ordering is
    on the ROUNDED cosine + neighbor id so ranks are engine-independent."""
    e = _emb(spark, sf_dir).withColumn("nrm", _norm(F.col("v")))
    q = e.filter(F.pmod("vec_id", F.lit(QUERY_MOD)) == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    pairs = F.broadcast(q).join(e, F.col("vec_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        _cos_pre(
            F.col("qv"), F.col("v"), F.col("qnrm"), F.col("nrm")
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "cosine")
    )


def topk_sql(
    query_mod: int = QUERY_MOD, top_k: int = TOP_K, table: str = "embeddings"
) -> str:
    """DuckDB twin of ``ss_topk_bruteforce``, parameterized for the recall
    tests (exact ground truth on arbitrary registered corpora)."""
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM {table}
),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % {query_mod} = 0),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round(
           list_sum(list_transform(list_zip(q.qv, e.v), z -> z[1] * z[2]))
           / (sqrt(list_sum(list_transform(q.qv, x -> x * x)))
              * sqrt(list_sum(list_transform(e.v, x -> x * x)))), 6) AS cosine
  FROM q JOIN e ON e.vec_id != q.query_id
)
SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank, cosine FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {top_k}
"""


SS_TOPK_SQL = topk_sql()


def _bucket_expr_spark():
    terms = []
    for p, plane in enumerate(HYPERPLANES):
        coeffs = F.array(*[F.lit(float(c)) for c in plane])
        dot = F.aggregate(
            F.zip_with(F.col("v"), coeffs, lambda x, c: x * c),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        terms.append(F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    return total.cast("int")


def ss_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucket per vector (sign-bit signature)."""
    return _emb(spark, sf_dir).select(
        "vec_id", _bucket_expr_spark().alias("bucket")
    )


def _bucket_sql() -> str:
    bits = []
    for p, plane in enumerate(HYPERPLANES):
        lits = ", ".join(f"{float(c)}" for c in plane)
        bits.append(
            f"(CASE WHEN list_sum(list_transform(list_zip(v, [{lits}]),"
            f" z -> z[1] * z[2])) >= 0 THEN {1 << p} ELSE 0 END)"
        )
    return " + ".join(bits)


SS_LSH_BUCKETS_SQL = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
)
SELECT vec_id, CAST({_bucket_sql()} AS INTEGER) AS bucket FROM e
"""


def ss_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k: exact cosine restricted to same-bucket candidates —
    the scan is an equi-join on bucket instead of a full cross product.

    CONTRACT NOTE (measured round 3): this is the SINGLE-table formulation
    — 8 AND'd bits shatter the isotropic fixture into ~2-doc buckets, so
    its recall@10 vs bruteforce is 0.00 there (test-pinned as the
    motivating measurement).  It remains registered as the minimal
    bucketed-equi-join shape; real workloads should use
    ss_lsh_multitable_ann (OR-amplified, recall 0.52 isotropic / 1.00
    clustered) or ss_ivf_ann."""
    e = _emb(spark, sf_dir)
    withb = e.withColumn("bucket", _bucket_expr_spark()).withColumn(
        "nrm", _norm(F.col("v"))
    )
    q = withb.filter(F.pmod("vec_id", F.lit(QUERY_MOD)) == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
        "bucket",
    )
    cand = F.broadcast(q).join(
        withb, ["bucket"]
    ).filter(F.col("vec_id") != F.col("query_id"))
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        _cos_pre(
            F.col("qv"), F.col("v"), F.col("qnrm"), F.col("nrm")
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "cosine")
    )


N_CENTROIDS = 16
N_PROBE = 2


def ss_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: a training-free coarse quantizer, every vector
    assigned to its max-cosine cell, queries probe the N_PROBE nearest
    cells and run exact top-k inside them.  All joins are equi-joins on
    cell id; the full scan is replaced by ~N_PROBE/N_CENTROIDS of the
    corpus.

    Centroid choice (round 3): a DETERMINISTIC PSEUDO-RANDOM sample — the
    N_CENTROIDS vectors with the smallest md5(vec_id) — instead of the
    round-2 "first 16 vec_ids".  md5 ordering is uncorrelated with insert
    order / vec_id locality, so the sample is representative of the corpus
    distribution the way seeded reservoir sampling would be, while staying
    reproducible across engines (DuckDB twin orders by the same md5).  It
    is a global TakeOrdered(16) — no shuffle of the full table.

    Measured recall (tests/test_similarity_recall.py, vs bruteforce):
    - sf0.01 fixture, recall@10 at (16 cells, 2 probes) = 0.34, rising
      monotonically to 0.74 at 8 probes.  The fixture embeddings are
      ISOTROPIC random vectors, so no partition of the space can beat the
      scanned-fraction wall (~N_PROBE/N_CENTROIDS + the self-cell bonus);
      0.34 >> 2/16 = 0.125 shows the quantizer is doing its job, and the
      test pins >= 0.30 so sampler/probe regressions fail loudly.
    - clustered corpus (the workload IVF exists for): recall@10 = 1.00 at
      (8 cells, 2 probes) on a 4-cluster synthetic set — pinned >= 0.90.

    k-means refinement: MEASURED AND REJECTED (round 4, r3 verdict optional
    item 8).  One Lloyd iteration (exact fixed-point integer sums so both
    engines refine identically) was prototyped in the DuckDB twin and swept
    against the same bruteforce oracle: isotropic fixture recall was FLAT
    at (16,2) (0.34 -> 0.34), WORSE at (16,4) (0.56 -> 0.48), better only
    at (16,8) (0.74 -> 0.80); the clustered corpus was already at 1.00.
    On isotropic data Lloyd balances cell populations, which shrinks the
    self-cell bonus that drives mid-probe recall — so the refinement
    trades recall where it matters (low probe counts = the scan-reduction
    regime) for recall where it doesn't.  The md5 sample stays."""
    e = _emb(spark, sf_dir).withColumn("nrm", _norm(F.col("v")))
    cents = (
        e.orderBy(
            F.md5(F.col("vec_id").cast("string")).asc(), F.col("vec_id").asc()
        )
        .limit(N_CENTROIDS)
        .select(
            F.col("vec_id").alias("cid"),
            F.col("v").alias("cv"),
            F.col("nrm").alias("cnrm"),
        )
    )
    scored = e.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "v",
        "nrm",
        "cid",
        _cos_pre(F.col("v"), F.col("cv"), F.col("nrm"), F.col("cnrm")).alias(
            "csim"
        ),
    )
    wcell = Window.partitionBy("vec_id").orderBy(F.desc("csim"), F.asc("cid"))
    ranked = scored.withColumn("crank", F.row_number().over(wcell))
    assign = ranked.filter(F.col("crank") == 1).select("vec_id", "v", "nrm", "cid")
    probes = ranked.filter(
        (F.col("crank") <= N_PROBE) & (F.pmod("vec_id", F.lit(QUERY_MOD)) == 0)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
        "cid",
    )
    cand = probes.join(assign, "cid").filter(F.col("vec_id") != F.col("query_id"))
    out = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        _cos_pre(
            F.col("qv"), F.col("v"), F.col("qnrm"), F.col("nrm")
        ).alias("cosine"),
    ).distinct()
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        out.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "cosine")
    )


_COS_SQL = (
    "round(list_sum(list_transform(list_zip({a}, {b}), z -> z[1] * z[2]))"
    " / (sqrt(list_sum(list_transform({a}, x -> x * x)))"
    " * sqrt(list_sum(list_transform({b}, x -> x * x)))), 6)"
)

def ivf_ann_sql(
    n_centroids: int = N_CENTROIDS,
    n_probe: int = N_PROBE,
    query_mod: int = QUERY_MOD,
    top_k: int = TOP_K,
    table: str = "embeddings",
) -> str:
    """DuckDB twin of ``ss_ivf_ann``, parameterized so the recall tests can
    sweep (n_centroids, n_probe) on the fixture and on synthetic clustered
    corpora registered under a different view name."""
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM {table}
),
cents AS (
  SELECT vec_id AS cid, v AS cv FROM e
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {n_centroids}
),
scored AS (
  SELECT e.vec_id, e.v, c.cid,
         {_COS_SQL.format(a='e.v', b='c.cv')} AS csim
  FROM e CROSS JOIN cents c
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS crank
  FROM scored
),
assign AS (SELECT vec_id, v, cid FROM ranked WHERE crank = 1),
probes AS (
  SELECT vec_id AS query_id, v AS qv, cid FROM ranked
  WHERE crank <= {n_probe} AND vec_id % {query_mod} = 0
),
cand AS (
  SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id,
         {_COS_SQL.format(a='p.qv', b='a.v')} AS cosine
  FROM probes p JOIN assign a ON a.cid = p.cid AND a.vec_id != p.query_id
)
SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank, cosine FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rank
  FROM cand
) WHERE rank <= {top_k}
"""


SS_IVF_ANN_SQL = ivf_ann_sql()


SS_LSH_ANN_SQL = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
withb AS (SELECT vec_id, v, CAST({_bucket_sql()} AS INTEGER) AS bucket FROM e),
q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM withb
      WHERE vec_id % {QUERY_MOD} = 0),
scored AS (
  SELECT q.query_id, w.vec_id AS neighbor_id,
         round(
           list_sum(list_transform(list_zip(q.qv, w.v), z -> z[1] * z[2]))
           / (sqrt(list_sum(list_transform(q.qv, x -> x * x)))
              * sqrt(list_sum(list_transform(w.v, x -> x * x)))), 6) AS cosine
  FROM q JOIN withb w ON w.bucket = q.bucket AND w.vec_id != q.query_id
)
SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank, cosine FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
"""


# --- multi-table (OR-amplified) LSH ANN ---------------------------------------------

N_TABLES = 4
PLANES_PER_TABLE = 4
# independent ±1 hyperplanes for the multi-table variant (seed 43, distinct
# from the single-table HYPERPLANES so the two operators stay independent)
_rng_mt = np.random.RandomState(43)
MT_HYPERPLANES: list[list[int]] = (
    (_rng_mt.randint(0, 2, size=(N_TABLES * PLANES_PER_TABLE, DIM)) * 2 - 1).tolist()
)


def _mt_bucket_expr(t: int):
    terms = []
    for p in range(PLANES_PER_TABLE):
        plane = MT_HYPERPLANES[t * PLANES_PER_TABLE + p]
        coeffs = F.array(*[F.lit(float(c)) for c in plane])
        dot = F.aggregate(
            F.zip_with(F.col("v"), coeffs, lambda x, c: x * c),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        terms.append(F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    total = terms[0]
    for term in terms[1:]:
        total = total + term
    return total.cast("int")


def ss_lsh_multitable_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-amplified LSH ANN: N_TABLES independent PLANES_PER_TABLE-bit
    signature tables; candidates = union of same-bucket pairs across
    tables, then exact cosine top-k.

    WHY a second LSH operator: the single-table ss_lsh_ann AND-amplifies 8
    bits into ~2-doc buckets, and its measured recall@10 on the isotropic
    fixture is 0.00 (tests/test_similarity_recall.py) — the textbook
    single-table failure.  Four OR'd 4-bit tables scan ~24% of the corpus
    for recall 0.52 on the same isotropic data (the scanned-fraction wall,
    as with IVF; pinned >= 0.45), and 1.00 on a clustered corpus.
    Shape: explode into (table, bucket) → equi-join → DISTINCT pair dedup
    across tables → windowed top-k; no cross join anywhere."""
    e = _emb(spark, sf_dir).withColumn("nrm", _norm(F.col("v")))
    withb = e.select(
        "vec_id",
        "v",
        "nrm",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"), _mt_bucket_expr(t).alias("bkt")
                    )
                    for t in range(N_TABLES)
                ]
            )
        ).alias("tb"),
    ).select("vec_id", "v", "nrm", "tb.tbl", "tb.bkt")
    q = withb.filter(F.pmod("vec_id", F.lit(QUERY_MOD)) == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
        "tbl",
        "bkt",
    )
    cand = (
        q.join(withb, ["tbl", "bkt"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _cos_pre(
                F.col("qv"), F.col("v"), F.col("qnrm"), F.col("nrm")
            ).alias("cosine"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "cosine")
    )


def _mt_bucket_sql(t: int) -> str:
    bits = []
    for p in range(PLANES_PER_TABLE):
        plane = MT_HYPERPLANES[t * PLANES_PER_TABLE + p]
        lits = ", ".join(f"{float(c)}" for c in plane)
        bits.append(
            f"(CASE WHEN list_sum(list_transform(list_zip(v, [{lits}]),"
            f" z -> z[1] * z[2])) >= 0 THEN {1 << p} ELSE 0 END)"
        )
    return " + ".join(bits)


def lsh_mt_ann_sql(
    query_mod: int = QUERY_MOD, top_k: int = TOP_K, table: str = "embeddings"
) -> str:
    tb_structs = ", ".join(
        f"struct_pack(tbl := {t}, bkt := CAST({_mt_bucket_sql(t)} AS INTEGER))"
        for t in range(N_TABLES)
    )
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM {table}
),
withb AS (
  SELECT vec_id, v, tb.tbl AS tbl, tb.bkt AS bkt
  FROM (SELECT vec_id, v, unnest([{tb_structs}]) AS tb FROM e)
),
q AS (SELECT vec_id AS query_id, v AS qv, tbl, bkt FROM withb
      WHERE vec_id % {query_mod} = 0),
cand AS (
  SELECT DISTINCT q.query_id, w.vec_id AS neighbor_id,
         {_COS_SQL.format(a='q.qv', b='w.v')} AS cosine
  FROM q JOIN withb w ON w.tbl = q.tbl AND w.bkt = q.bkt
                     AND w.vec_id != q.query_id
)
SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank, cosine FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rank
  FROM cand
) WHERE rank <= {top_k}
"""


SS_LSH_MT_ANN_SQL = lsh_mt_ann_sql()


# --- top-k over DERIVED document vectors (text -> embedding -> similarity) ----------

DOC_QUERY_MOD = 100  # doc_id % 100 == 0 -> query document


def ss_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k over feature-hashed DOCUMENT vectors
    (text_analysis.doc_vectors) — the end-to-end text → embedding →
    similarity composition, with no external encoder: the 64-dim signed
    hashing-trick vectors are integers, so both engines derive
    byte-identical embeddings before the (rounded) cosine ranking.
    Same broadcast-query/window shape as ss_topk_bruteforce; zero-norm
    vectors (a degenerate all-cancelling token bag) are excluded on both
    sides before ranking."""
    from ..sources.scan import spread_scan
    from .text_analysis import doc_vectors

    d = spread_scan(
        spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text"),
        f"{sf_dir}/documents.parquet",
    )
    vecs = doc_vectors(d).select(
        "doc_id", F.col("v").cast("array<double>").alias("v")
    )
    norm2 = F.aggregate("v", F.lit(0.0), lambda s, x: s + x * x)
    # localCheckpoint (r9): the derived vector table feeds BOTH the
    # broadcast query side and the stream side — without the cut the full
    # explode→hash→groupBy derivation ran twice per invocation.  The
    # materialized table is O(docs × DV_DIM) — the same footprint this
    # exactness baseline's broadcast already implies (contract note in the
    # registry: not a scale path; the ANN entries are).  Norms are
    # computed once per row with the identical fold _cos inlined per pair.
    vecs = (
        vecs.filter(norm2 > 0)
        .withColumn("nrm", _norm(F.col("v")))
        .localCheckpoint()
    )
    q = vecs.filter(F.pmod("doc_id", F.lit(DOC_QUERY_MOD)) == 0).select(
        F.col("doc_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    pairs = F.broadcast(q).join(vecs, F.col("doc_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        F.col("doc_id").alias("neighbor_id"),
        _cos_pre(
            F.col("qv"), F.col("v"), F.col("qnrm"), F.col("nrm")
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "cosine")
    )


def topk_docs_sql() -> str:
    from .text_analysis import doc_vectors_sql

    return f"""
WITH dv AS ({doc_vectors_sql()}),
vecs AS (
  SELECT doc_id, list_transform(v, x -> CAST(x AS DOUBLE)) AS v FROM dv
  WHERE list_sum(list_transform(v, x -> CAST(x AS DOUBLE) * x)) > 0
),
q AS (SELECT doc_id AS query_id, v AS qv FROM vecs WHERE doc_id % {DOC_QUERY_MOD} = 0),
scored AS (
  SELECT q.query_id, w.doc_id AS neighbor_id,
         {_COS_SQL.format(a='q.qv', b='w.v')} AS cosine
  FROM q JOIN vecs w ON w.doc_id != q.query_id
)
SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank, cosine FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
"""
