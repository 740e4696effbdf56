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


# --- triangle counting (degree-ordered) ---------------------------------------------

def kg_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity triangle participation over the co-mention graph — the
    local clustering signal ("is this entity's neighborhood a clique or a
    star") that separates community members from pure hubs.

    Algorithm: the degree-ordered ("compact-forward") enumeration — orient
    every undirected edge from the (degree, node)-smaller endpoint to the
    larger, so each triangle is materialized exactly once as a wedge
    u->v, u->w (v<w in the order) closed by v->w.  The orientation bounds
    every node's out-degree by O(sqrt(edges)) regardless of in-degree, so
    a celebrity hub never enumerates its own quadratic wedge set — THE
    standard scale cure for distributed triangle counting.  Join keys are
    node ids; the wedge-closing join is an equi-join on the oriented pair.

    Output: (surface, n_triangles) for every node of the graph, zeros
    included."""
    from ..sources.transcripts import transcripts_from_documents
    from .mention_detect import detect_mentions_arrow

    m = detect_mentions_arrow(transcripts_from_documents(spark, sf_dir))
    # the edge table fans out into FIVE plan branches (und, deg x2, and the
    # three oriented copies) — without a lineage cut each branch re-runs the
    # scan + Arrow detector (measured: 133 exchanges / 56 arrow ops in the
    # uncut plan vs 12/1 cut); materialize it once, like pagerank() does
    e = comention_edges(m).localCheckpoint()  # symmetric
    und = e.filter(F.col("src") < F.col("dst")).select("src", "dst")
    deg = (
        e.groupBy(F.col("src").alias("node"))
        .agg(F.count("*").cast("long").alias("deg"))
    )
    # orient by (deg, node): lower -> higher
    d1 = deg.select(F.col("node").alias("src"), F.col("deg").alias("dsrc"))
    d2 = deg.select(F.col("node").alias("dst"), F.col("deg").alias("ddst"))
    lt = (F.col("dsrc") < F.col("ddst")) | (
        (F.col("dsrc") == F.col("ddst")) & (F.col("src") < F.col("dst"))
    )
    oriented = (
        und.join(d1, "src").join(d2, "dst")
        .select(
            F.when(lt, F.col("src")).otherwise(F.col("dst")).alias("a"),
            F.when(lt, F.col("dst")).otherwise(F.col("src")).alias("b"),
        )
        .localCheckpoint()  # consumed by three branches (o1, o2, closure)
    )
    # wedges pair out-neighbors in BOTH orders; the closing join against the
    # single-direction oriented edge set keeps exactly one per triangle
    # (filtering v < w by NAME here would be wrong — closure is oriented by
    # (deg, node) rank, which need not agree with name order)
    o1 = oriented.select(F.col("a").alias("u"), F.col("b").alias("v"))
    o2 = oriented.select(F.col("a").alias("u"), F.col("b").alias("w"))
    wedges = o1.join(o2, "u").filter(F.col("v") != F.col("w"))
    tri = wedges.join(
        oriented.select(F.col("a").alias("v"), F.col("b").alias("w")),
        ["v", "w"],
    )
    per_node = (
        tri.select(F.col("u").alias("node"))
        .union(tri.select(F.col("v").alias("node")))
        .union(tri.select(F.col("w").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )
    return (
        deg.select("node")
        .join(per_node, "node", "left")
        .select(
            F.col("node").alias("surface"),
            F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles"),
        )
    )


def triangle_sql(mentions_sql: str) -> str:
    """DuckDB twin — same degree-ordered enumeration."""
    types = ", ".join(f"'{t}'" for t in PR_TYPES)
    return f"""
WITH m AS ({mentions_sql}),
cs AS (
  SELECT DISTINCT conv_id, surface FROM m WHERE mention_type IN ({types})
),
e AS (
  SELECT a.surface AS src, b.surface AS dst
  FROM cs a JOIN cs b ON a.conv_id = b.conv_id AND a.surface <> b.surface
  GROUP BY a.surface, b.surface
),
deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src),
und AS (SELECT src, dst FROM e WHERE src < dst),
oriented AS (
  SELECT CASE WHEN (d1.deg, u.src) < (d2.deg, u.dst) THEN u.src ELSE u.dst END AS a,
         CASE WHEN (d1.deg, u.src) < (d2.deg, u.dst) THEN u.dst ELSE u.src END AS b
  FROM und u
  JOIN deg d1 ON d1.node = u.src
  JOIN deg d2 ON d2.node = u.dst
),
tri AS (
  SELECT o1.u, o1.v, o2.w
  FROM (SELECT a AS u, b AS v FROM oriented) o1
  JOIN (SELECT a AS u, b AS w FROM oriented) o2 ON o1.u = o2.u AND o1.v <> o2.w
  JOIN oriented o3 ON o3.a = o1.v AND o3.b = o2.w
),
per_node AS (
  SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM (
    SELECT u AS node FROM tri
    UNION ALL SELECT v FROM tri
    UNION ALL SELECT w FROM tri
  ) GROUP BY node
)
SELECT d.node AS surface, CAST(COALESCE(p.n_triangles, 0) AS BIGINT) AS n_triangles
FROM deg d LEFT JOIN per_node p USING (node)
"""


# --- k-hop neighborhood sizes -------------------------------------------------------

def kg_khop_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity 1-hop and exact 2-hop neighborhood sizes over the
    co-mention graph — the neighborhood-growth feature a graph-quality
    monitor tracks (a flat 2-hop curve means disconnected islands, an
    exploding one means hub contamination).

    n_1hop = degree; n_2hop = #nodes at EXACTLY distance 2 (reached via a
    neighbor, not a neighbor itself, not u).  The distance-2 set comes
    from one self-join of the edge list with a distinct + anti-join — all
    equi-joins on node ids.  At corpus scale the 2-hop expansion through
    a hub is the known cost center; the operator runs on the ENTITY graph
    (orders of magnitude smaller than the corpus), and production use
    caps intermediate degree the same way blocking.py caps block sizes.
    """
    from ..sources.transcripts import transcripts_from_documents
    from .mention_detect import detect_mentions_arrow

    m = detect_mentions_arrow(transcripts_from_documents(spark, sf_dir))
    e = comention_edges(m).select("src", "dst").localCheckpoint()
    deg = e.groupBy(F.col("src").alias("surface")).agg(
        F.count("*").cast("long").alias("n_1hop")
    )
    two = (
        e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .join(e.select(F.col("src").alias("v"), F.col("dst").alias("w")), "v")
        .filter(F.col("u") != F.col("w"))
        .select("u", "w")
        .distinct()
        .join(
            e.select(F.col("src").alias("u"), F.col("dst").alias("w")),
            ["u", "w"],
            "left_anti",
        )
        .groupBy(F.col("u").alias("surface"))
        .agg(F.count("*").cast("long").alias("n_2hop"))
    )
    return deg.join(two, "surface", "left").select(
        "surface",
        "n_1hop",
        F.coalesce("n_2hop", F.lit(0)).cast("long").alias("n_2hop"),
    )


def khop_sql(mentions_sql: str) -> str:
    types = ", ".join(f"'{t}'" for t in PR_TYPES)
    return f"""
WITH m AS ({mentions_sql}),
cs AS (
  SELECT DISTINCT conv_id, surface FROM m WHERE mention_type IN ({types})
),
e AS (
  SELECT a.surface AS src, b.surface AS dst
  FROM cs a JOIN cs b ON a.conv_id = b.conv_id AND a.surface <> b.surface
  GROUP BY a.surface, b.surface
),
deg AS (SELECT src AS surface, CAST(count(*) AS BIGINT) AS n_1hop FROM e GROUP BY src),
two AS (
  SELECT u, CAST(count(*) AS BIGINT) AS n_2hop FROM (
    SELECT DISTINCT e1.src AS u, e2.dst AS w
    FROM e e1 JOIN e e2 ON e1.dst = e2.src AND e1.src <> e2.dst
  ) p
  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.src = p.u AND e.dst = p.w)
  GROUP BY u
)
SELECT d.surface, d.n_1hop, CAST(COALESCE(t.n_2hop, 0) AS BIGINT) AS n_2hop
FROM deg d LEFT JOIN two t ON t.u = d.surface
"""


# --- canonical-entity PageRank (composition with the EL stage) ----------------------

def kg_canonical_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the CANONICALIZED co-mention graph: BRAND aliases are
    first merged by the entity-linking stage (blocking -> scorer -> CC),
    so an entity's centrality aggregates the evidence of all its surface
    variants — the composition the KG exists for (alias 'HABECO'/'Habeco'
    mass concentrates on one node instead of splitting).  Downstream of
    link_entities; the oracle twin uses the independent normalized-group
    formulation (functions/duckdb_oracle.canonical_mentions_sql)."""
    from ..plans.entity_linking import entity_resolved_mentions, link_entities
    from ..sources.transcripts import transcripts_from_documents
    from .mention_detect import detect_mentions_arrow

    m = detect_mentions_arrow(transcripts_from_documents(spark, sf_dir))
    emap = link_entities(m.filter(F.col("mention_type") == "BRAND"))
    resolved = entity_resolved_mentions(
        m, emap.select("surface", "canonical_surface")
    ).withColumn("surface", F.coalesce("canonical_surface", "surface"))
    return pagerank(comention_edges(resolved.drop("canonical_surface")))


# --- adjacency-list export (graph materialize, consumer-facing shape) ---------------

def kg_export_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacency-list export of the co-mention graph: one row per entity
    with its neighbors as a deterministic ' '-joined "dst:w" list (sorted
    by weight desc then name) — the compact consumer-facing shape a graph
    service or GNN sampler loads, vs. the edge-table shape analytics use.
    One groupBy on src; the in-group sort is array_sort of collected
    structs (bounded by the entity's degree), not a global sort.
    Reference analog: per-document grouped output shaping,
    kie_utils.py:314-340."""
    from ..sources.transcripts import transcripts_from_documents
    from .mention_detect import detect_mentions_arrow

    m = detect_mentions_arrow(transcripts_from_documents(spark, sf_dir))
    e = comention_edges(m)
    return (
        e.groupBy(F.col("src").alias("surface"))
        .agg(
            F.count("*").cast("long").alias("n_neighbors"),
            F.sum("w").cast("long").alias("total_w"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct((-F.col("w")).alias("nw"), "dst"))
                    ),
                    lambda s: F.concat_ws(":", s["dst"], (-s["nw"]).cast("string")),
                ),
                " ",
            ).alias("neighbors"),
        )
    )


def export_neighbors_sql(mentions_sql: str) -> str:
    types = ", ".join(f"'{t}'" for t in PR_TYPES)
    return f"""
WITH m AS ({mentions_sql}),
cs AS (
  SELECT DISTINCT conv_id, surface FROM m WHERE mention_type IN ({types})
),
e AS (
  SELECT a.surface AS src, b.surface AS dst, CAST(count(*) AS BIGINT) AS w
  FROM cs a JOIN cs b ON a.conv_id = b.conv_id AND a.surface <> b.surface
  GROUP BY a.surface, b.surface
)
SELECT src AS surface, CAST(count(*) AS BIGINT) AS n_neighbors,
       CAST(sum(w) AS BIGINT) AS total_w,
       string_agg(dst || ':' || CAST(w AS VARCHAR), ' ' ORDER BY -w, dst)
         AS neighbors
FROM e GROUP BY src
"""
