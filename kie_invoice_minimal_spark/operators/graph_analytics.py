"""Graph analytics over the constructed KG — entity co-mention PageRank.

The reference scores nodes with a GCN forward pass per document graph
(``backend/kie/kie_utils.py`` model invocation); at corpus scale the
KG-side analog of "which node matters" is a global graph centrality over
the entity co-mention graph: nodes are NAME/BRAND surfaces, an edge joins
two surfaces co-mentioned in the same conversation (weight = number of
such conversations), and PageRank ranks entities by recursive importance.

Determinism / oracle parity: the classic float PageRank is
order-sensitive (doubles summed in different orders), so this is an
EXACT-INTEGER PageRank — scores live in units of 10^-12 (SCALE), every
per-edge contribution is truncating integer division
``(score * w) DIV wout``, the damping update is
``BASE + (85 * insum) DIV 100`` — all BIGINT, order-free, byte-identical
in DuckDB (whose twin unrolls the same fixed ITERS iterations as chained
CTEs).  Fixed iteration count (no float convergence test) keeps the two
engines in lockstep; 8 iterations contracts the residual by 0.85^8 ≈ 0.27
of the start gap — rank-stable on graphs whose diameter the iterations
cover.

Scale shape: the per-iteration work is one equi-join (scores × edges on
src) and one groupBy-sum on dst — both shuffle on node ids, and the sum
is map-side combined, so a celebrity entity with millions of in-edges
partial-aggregates before the exchange (no single-reducer hub funnel).
Each round ends in localCheckpoint() to truncate the iterative lineage
(same discipline as connected_components.py).  Overflow headroom: scores
sum to ≈ N·SCALE; with SCALE = 10^12 the BIGINT budget caps N·w at ~10^5
× the per-node average — at larger corpora drop SCALE (precision is
relative rank, not absolute mass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

PR_SCALE = 1_000_000_000_000  # 10^12: integer score units
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100
PR_BASE = (PR_DAMP_DEN - PR_DAMP_NUM) * PR_SCALE // PR_DAMP_DEN
PR_ITERS = 8
PR_TYPES = ("NAME", "BRAND")


def comention_edges(mentions: DataFrame) -> DataFrame:
    """(src, dst, w): surfaces co-mentioned in the same conversation; w =
    number of conversations.  Symmetric by construction (both directions
    emitted).  Edge generation is per-conversation pairing of DISTINCT
    surfaces — bounded by (entities per conversation)^2, not turns^2."""
    cs = (
        mentions.filter(F.col("mention_type").isin(*PR_TYPES))
        .select("conv_id", "surface")
        .distinct()
    )
    a, b = cs.alias("a"), cs.alias("b")
    return (
        a.join(b, "conv_id")
        .filter(F.col("a.surface") != F.col("b.surface"))
        .groupBy(
            F.col("a.surface").alias("src"), F.col("b.surface").alias("dst")
        )
        .agg(F.count("*").cast("long").alias("w"))
    )


def pagerank(edges: DataFrame, iters: int = PR_ITERS) -> DataFrame:
    """Exact-integer weighted PageRank over (src, dst, w) edges.  Returns
    (surface, pagerank_q, rank): pagerank_q in SCALE units, rank 1 = most
    central (ties broken by surface; the ranking window runs over the
    entity table, which is orders of magnitude smaller than the corpus)."""
    wout = edges.groupBy("src").agg(F.sum("w").cast("long").alias("wout"))
    nodes = wout.select(F.col("src").alias("node")).localCheckpoint()
    ew = edges.join(wout, "src").localCheckpoint()

    pr = nodes.withColumn("score", F.lit(PR_SCALE).cast("long"))
    for _ in range(iters):
        contrib = pr.join(ew, pr.node == ew.src).select(
            F.col("dst").alias("node"),
            F.expr("(score * w) DIV wout").alias("c"),
        )
        insum = contrib.groupBy("node").agg(F.sum("c").cast("long").alias("insum"))
        pr = (
            nodes.join(insum, "node", "left")
            .select(
                "node",
                F.expr(
                    f"CAST({PR_BASE} + ({PR_DAMP_NUM} * coalesce(insum, CAST(0 AS BIGINT)))"
                    f" DIV {PR_DAMP_DEN} AS BIGINT)"
                ).alias("score"),
            )
            .localCheckpoint()
        )
    w = Window.orderBy(F.desc("score"), F.asc("node"))
    return pr.select(
        F.col("node").alias("surface"),
        F.col("score").alias("pagerank_q"),
        F.row_number().over(w).cast("int").alias("rank"),
    )


def kg_entity_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the NAME/BRAND co-mention graph of the corpus."""
    from ..sources.transcripts import transcripts_from_documents
    from .mention_detect import detect_mentions_arrow

    m = detect_mentions_arrow(transcripts_from_documents(spark, sf_dir))
    return pagerank(comention_edges(m))


def pagerank_sql(mentions_sql: str, iters: int = PR_ITERS) -> str:
    """DuckDB twin: identical integer arithmetic, the fixed iterations
    unrolled as chained CTEs (pr0..prN) — no recursive CTE needed."""
    types = ", ".join(f"'{t}'" for t in PR_TYPES)
    itcte = []
    for i in range(1, iters + 1):
        itcte.append(f"""pr{i} AS (
  SELECT n.node,
         CAST({PR_BASE} + ({PR_DAMP_NUM} * COALESCE(s.insum, 0)) // {PR_DAMP_DEN}
              AS BIGINT) AS score
  FROM n LEFT JOIN (
    SELECT e.dst AS node, CAST(sum((p.score * e.w) // w2.wout) AS BIGINT) AS insum
    FROM pr{i - 1} p JOIN e ON e.src = p.node JOIN wout w2 ON w2.src = p.node
    GROUP BY e.dst
  ) s ON s.node = n.node
)""")
    chain = ",\n".join(itcte)
    return f"""
WITH m AS ({mentions_sql}),
cs AS (
  SELECT DISTINCT conv_id, surface FROM m WHERE mention_type IN ({types})
),
e AS (
  SELECT a.surface AS src, b.surface AS dst, CAST(count(*) AS BIGINT) AS w
  FROM cs a JOIN cs b ON a.conv_id = b.conv_id AND a.surface <> b.surface
  GROUP BY a.surface, b.surface
),
wout AS (SELECT src, CAST(sum(w) AS BIGINT) AS wout FROM e GROUP BY src),
n AS (SELECT src AS node FROM wout),
pr0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) AS score FROM n),
{chain}
SELECT node AS surface, score AS pagerank_q,
       CAST(row_number() OVER (ORDER BY score DESC, node) AS INTEGER) AS rank
FROM pr{iters}
"""
