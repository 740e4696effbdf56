"""Named relational operators over the driver's TPC-H-ish tables —
SURVEY.md §2 rows re-expressed as pure DataFrame plans with DuckDB twins
(the ``queries()`` / ``oracle_sql()`` surface of ``__spark_entry__.py``).

Every function takes ``(spark, sf_dir)`` and returns a DataFrame whose
column names/aliases match its SQL twin exactly.  Floating aggregates are
rounded (ROUND_DP) identically on both sides so order-of-summation noise
can't flip the value hash.

Scale notes per operator are in each docstring; the common rules:
- global stats (min/max) are computed with a 1-row agg and broadcast-joined
  back (two-pass, map-side partials — never a window over the whole table);
- per-group stats use grouped agg + broadcast/shuffle join, not
  Window.partitionBy over skewed partitions when the group count is small;
- ordered concat uses sort_array(collect_list(struct)) — no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

ROUND_DP = 4


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- G5: ordered grouped concat (ref backend_utils.py:95-121) ---------------

def g5_ordered_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user, ' '-join event types in (ts, event_id) order.
    One shuffle (groupBy user_id); in-group order via array_sort, no window."""
    ev = _read(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                    lambda s: s["event_type"],
                ),
                " ",
            ).alias("event_seq"),
            F.count("*").cast("bigint").alias("n_events"),
        )
    )


G5_SQL = """
SELECT user_id,
       string_agg(event_type, ' ' ORDER BY ts, event_id) AS event_seq,
       count(*) AS n_events
FROM events GROUP BY user_id
"""


# --- E3: global min-max normalize (ref kie_utils.py:100-113) -----------------

def e3_minmax_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass: 1-row global agg broadcast back (the reference's
    agg-then-map normalization).  No window-over-all-rows (that would
    single-task the table)."""
    li = _read(spark, sf_dir, "lineitem")
    stats = li.agg(
        F.min("l_extendedprice").alias("mn"), F.max("l_extendedprice").alias("mx")
    )
    return (
        li.crossJoin(F.broadcast(stats))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(
                (F.col("l_extendedprice") - F.col("mn")) / (F.col("mx") - F.col("mn")),
                ROUND_DP,
            ).alias("price_norm"),
        )
    )


E3_SQL = f"""
SELECT l_orderkey, l_linenumber,
       round((l_extendedprice - mn) / (mx - mn), {ROUND_DP}) AS price_norm
FROM lineitem,
     (SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx FROM lineitem)
"""


# --- A5: per-group standardization (ref graph_norm.py:5-31) ------------------

def a5_group_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphNorm analog: standardize l_quantity within each l_returnflag.
    Grouped agg (3 groups) + broadcast join back — cheaper than a window
    shuffle partitioned by a 3-value key (which would be skew by design)."""
    li = _read(spark, sf_dir, "lineitem")
    stats = li.groupBy("l_returnflag").agg(
        F.avg("l_quantity").alias("mu"),
        F.stddev_samp("l_quantity").alias("sigma"),
    )
    return (
        li.join(F.broadcast(stats), "l_returnflag")
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            F.round((F.col("l_quantity") - F.col("mu")) / F.col("sigma"), ROUND_DP).alias(
                "qty_z"
            ),
        )
    )


A5_SQL = f"""
SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
       round((l.l_quantity - s.mu) / s.sigma, {ROUND_DP}) AS qty_z
FROM lineitem l
JOIN (SELECT l_returnflag, avg(l_quantity) AS mu, stddev_samp(l_quantity) AS sigma
      FROM lineitem GROUP BY l_returnflag) s
  ON l.l_returnflag = s.l_returnflag
"""


# --- A6: per-graph readout sum/max/mean (ref gated_gcn.py:443-450) -----------

def a6_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped pooled aggregates — map-side partials, one shuffle.

    Monetary sums aggregate as DECIMAL(18,2): exact and order-independent,
    so the value hash can't flip on summation order (doubles summed in
    different orders differ in the last ulp and round differently)."""
    o = _read(spark, sf_dir, "orders")
    sum_cents = F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
    # avg at 4dp via integer floor arithmetic — no round() on a double
    # quotient (HALF_UP-vs-binary rounding diverges on exact .5 boundaries).
    avg_e4 = F.floor(sum_cents * F.lit(100.0) / F.count("*"))
    return o.groupBy("o_custkey").agg(
        (sum_cents / 100.0).alias("sum_price"),
        F.max("o_totalprice").alias("max_price"),
        (avg_e4 / 10000.0).alias("avg_price"),
        F.count("*").cast("bigint").alias("n_orders"),
    )


A6_SQL = """
SELECT o_custkey,
       sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS sum_price,
       max(o_totalprice) AS max_price,
       floor(sum(CAST(round(o_totalprice * 100) AS BIGINT)) * 100.0 / count(*))
         / 10000.0 AS avg_price,
       count(*) AS n_orders
FROM orders GROUP BY o_custkey
"""


# --- O5: label distribution rollup (ref prepare_data.py:53-97) ---------------

def o5_label_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        F.round(F.avg("n_chars"), ROUND_DP).alias("avg_chars"),
    )


O5_SQL = f"""
SELECT lang, count(*) AS n_docs, count(DISTINCT source) AS n_sources,
       round(avg(n_chars), {ROUND_DP}) AS avg_chars
FROM documents GROUP BY lang
"""


# --- A8: softmax/argmax threshold classify (ref kie_utils.py:277-311) --------

def a8_threshold_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmax over the embedding vector; keep it only if argmax != class 0
    and max >= 0.5, else class 0 — the reference's postprocess_scores rule."""
    emb = _read(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.col("label").alias("gold"),
        F.when(
            (F.array_max("embedding") >= F.lit(0.5))
            & (F.array_position("embedding", F.array_max("embedding")) != F.lit(1)),
            F.array_position("embedding", F.array_max("embedding")) - 1,
        )
        .otherwise(F.lit(0))
        .cast("int")
        .alias("pred"),
        F.round(F.array_max("embedding").cast("double"), ROUND_DP).alias("conf"),
    )


A8_SQL = f"""
SELECT vec_id, label AS gold,
       CAST(CASE WHEN list_max(embedding) >= 0.5
                  AND list_position(embedding, list_max(embedding)) != 1
             THEN list_position(embedding, list_max(embedding)) - 1
             ELSE 0 END AS INTEGER) AS pred,
       round(CAST(list_max(embedding) AS DOUBLE), {ROUND_DP}) AS conf
FROM embeddings
"""


# --- O4: error-analysis join (ref evaluate.py:90-103) ------------------------

def o4_error_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mismatch rows between predictions (A8) and gold labels."""
    preds = a8_threshold_classify(spark, sf_dir)
    return preds.filter(F.col("pred") != F.col("gold")).select(
        "vec_id", "gold", "pred"
    )


O4_SQL = f"""
WITH preds AS ({A8_SQL.strip()})
SELECT vec_id, gold, pred FROM preds WHERE pred != gold
"""


# --- G3: nearest-neighbor top-1 join (ref contour_utils.py:61-101) -----------

def g3_nearest_neighbor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each 'click' event, the nearest 'purchase' by the same user in
    time: equi-join on user_id then row_number over |Δt| — the reference's
    argmin over the box-to-contour distance matrix as a min-join.
    Scale: the equi-join keys co-locate; per-user candidate sets are bounded."""
    ev = _read(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("purchase_ts")
    )
    j = clicks.join(buys, "user_id").withColumn(
        "dt_us",
        F.abs(
            F.unix_micros(F.col("click_ts").cast("timestamp"))
            - F.unix_micros(F.col("purchase_ts").cast("timestamp"))
        ).cast("bigint"),
    )
    w = Window.partitionBy("click_id").orderBy("dt_us", "purchase_id")
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "click_id", "purchase_id", "dt_us")
    )


G3_SQL = """
SELECT user_id, click_id, purchase_id, dt_us FROM (
  SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
         abs(epoch_us(c.ts) - epoch_us(p.ts)) AS dt_us,
         row_number() OVER (PARTITION BY c.event_id
                            ORDER BY abs(epoch_us(c.ts) - epoch_us(p.ts)), p.event_id) AS rn
  FROM events c JOIN events p ON c.user_id = p.user_id
  WHERE c.event_type = 'click' AND p.event_type = 'purchase'
) WHERE rn = 1
"""


# --- E2: band self-join / candidate generation (ref kie_utils.py:124-150) ----

def e2_band_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs of same-user events within a 1-hour band — the reference's
    |Δy| <= 3h edge pruning as a join predicate.  Equi-join on user_id
    carries the band as a post-join filter; at corpus scale the band is
    replaced by blocking keys (see operators/blocking.py)."""
    ev = _read(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    a = ev.alias("a")
    b = ev.alias("b")
    return (
        a.join(b, F.col("a.user_id") == F.col("b.user_id"))
        .filter(
            (F.col("a.event_id") < F.col("b.event_id"))
            & (F.abs(F.col("a.ts_us") - F.col("b.ts_us")) <= F.lit(3_600_000_000))
        )
        .select(
            F.col("a.user_id").alias("user_id"),
            F.col("a.event_id").alias("src_id"),
            F.col("b.event_id").alias("dst_id"),
            (F.col("b.ts_us") - F.col("a.ts_us")).cast("bigint").alias("delta_us"),
        )
    )


E2_SQL = """
SELECT a.user_id AS user_id, a.event_id AS src_id, b.event_id AS dst_id,
       epoch_us(b.ts) - epoch_us(a.ts) AS delta_us
FROM events a JOIN events b ON a.user_id = b.user_id
WHERE a.event_id < b.event_id
  AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 3600000000
"""


# --- G6: deterministic stratified split (ref prepare_data.py:100-151) --------

def g6_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """70/15/15 split, deterministic by key arithmetic (the reference seeds
    its shuffle; we hash-split so the assignment is stable and join-free)."""
    docs = _read(spark, sf_dir, "documents")
    split = (
        F.when(F.pmod(F.col("doc_id"), F.lit(20)) < 14, F.lit("train"))
        .when(F.pmod(F.col("doc_id"), F.lit(20)) < 17, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count("*").cast("bigint").alias("n"))
    )


G6_SQL = """
SELECT lang,
       CASE WHEN doc_id % 20 < 14 THEN 'train'
            WHEN doc_id % 20 < 17 THEN 'val'
            ELSE 'test' END AS split,
       count(*) AS n
FROM documents GROUP BY 1, 2
"""
