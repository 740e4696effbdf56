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
    time — the reference's argmin over the box-to-contour distance matrix.

    EXACT and linear via the as-of merge (round 1 joined clicks x purchases
    per user — quadratic within a hot user): union both streams, one
    per-user time-ordered window takes the last purchase at-or-before and
    the first purchase after each click, and the nearer of the two IS the
    global argmin (any other purchase is further in its direction).

    Tie-break parity with argmin-(dt, purchase_id): purchases sharing a
    (user, ts) are pre-collapsed to min purchase_id (equal dt => min id
    wins), and a prev/next dt tie picks the smaller id of the two.
    """
    ev = _read(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts_us",
        F.col("event_id").alias("click_id"),
        F.lit(None).cast("bigint").alias("purchase_id"),
        F.lit(1).alias("kind"),
    )
    buys = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts_us")
        .agg(F.min("event_id").alias("purchase_id"))
        .select(
            "user_id",
            "ts_us",
            F.lit(None).cast("bigint").alias("click_id"),
            "purchase_id",
            F.lit(0).alias("kind"),  # purchase sorts first at equal ts -> dt=0 lands in prev
        )
    )
    u = clicks.unionByName(buys)
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "kind")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "kind")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    cand = (
        u.withColumn("prev_pid", F.last("purchase_id", ignorenulls=True).over(w_prev))
        .withColumn(
            "prev_ts",
            F.last(
                F.when(F.col("purchase_id").isNotNull(), F.col("ts_us")),
                ignorenulls=True,
            ).over(w_prev),
        )
        .withColumn("next_pid", F.first("purchase_id", ignorenulls=True).over(w_next))
        .withColumn(
            "next_ts",
            F.first(
                F.when(F.col("purchase_id").isNotNull(), F.col("ts_us")),
                ignorenulls=True,
            ).over(w_next),
        )
        .filter(F.col("kind") == 1)
    )
    dt_prev = F.col("ts_us") - F.col("prev_ts")
    dt_next = F.col("next_ts") - F.col("ts_us")
    take_prev = F.col("prev_pid").isNotNull() & (
        F.col("next_pid").isNull()
        | (dt_prev < dt_next)
        | ((dt_prev == dt_next) & (F.col("prev_pid") <= F.col("next_pid")))
    )
    return cand.select(
        "user_id",
        "click_id",
        F.when(take_prev, F.col("prev_pid")).otherwise(F.col("next_pid")).alias("purchase_id"),
        F.when(take_prev, dt_prev).otherwise(dt_next).cast("bigint").alias("dt_us"),
    ).filter(F.col("purchase_id").isNotNull())


G3_SQL = """
WITH ev AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
),
clicks AS (
  SELECT user_id, ts_us, event_id AS click_id,
         CAST(NULL AS BIGINT) AS purchase_id, 1 AS kind
  FROM ev WHERE event_type = 'click'
),
buys AS (
  SELECT user_id, ts_us, CAST(NULL AS BIGINT) AS click_id,
         min(event_id) AS purchase_id, 0 AS kind
  FROM ev WHERE event_type = 'purchase' GROUP BY user_id, ts_us
),
u AS (SELECT * FROM clicks UNION ALL SELECT * FROM buys),
cand AS (
  SELECT *,
         last_value(purchase_id IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts_us, kind
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_pid,
         last_value(CASE WHEN purchase_id IS NOT NULL THEN ts_us END IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts_us, kind
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_ts,
         first_value(purchase_id IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts_us, kind
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_pid,
         first_value(CASE WHEN purchase_id IS NOT NULL THEN ts_us END IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts_us, kind
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_ts
  FROM u
)
SELECT user_id, click_id,
       CASE WHEN take_prev THEN prev_pid ELSE next_pid END AS purchase_id,
       CAST(CASE WHEN take_prev THEN ts_us - prev_ts ELSE next_ts - ts_us END AS BIGINT) AS dt_us
FROM (
  SELECT *,
         prev_pid IS NOT NULL AND (
           next_pid IS NULL
           OR (ts_us - prev_ts) < (next_ts - ts_us)
           OR ((ts_us - prev_ts) = (next_ts - ts_us) AND prev_pid <= next_pid)
         ) AS take_prev
  FROM cand WHERE kind = 1
)
WHERE (CASE WHEN take_prev THEN prev_pid ELSE next_pid END) IS NOT NULL
"""


# --- E2: band self-join / candidate generation (ref kie_utils.py:124-150) ----

E2_BAND_US = 3_600_000_000  # 1 hour, also the time-bucket width


def e2_band_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs of same-user events within a 1-hour band — the reference's
    |Δy| <= 3h edge pruning as a join predicate.

    Blocked on (user_id, time_bucket): each event lands in buckets
    {floor(t/B), floor(t/B)+1} with B = the band width, so any pair with
    |Δt| <= B shares a bucket (bucket indices differ by <= 1 — lossless),
    the join is a pure equi-join, and cross-bucket double-counts are
    deduped.  Round 1 joined on user_id alone and filtered — quadratic
    within a hot user; this is the same cure as interval_overlap_join."""
    ev = _read(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    B = F.lit(E2_BAND_US)
    bucketed = ev.select(
        "user_id",
        "event_id",
        "ts_us",
        F.explode(
            F.array(F.floor(F.col("ts_us") / B), F.floor(F.col("ts_us") / B) + 1)
        ).alias("bucket"),
    )
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.bucket") == F.col("b.bucket")),
        )
        .filter(
            (F.col("a.event_id") < F.col("b.event_id"))
            & (F.abs(F.col("a.ts_us") - F.col("b.ts_us")) <= F.lit(E2_BAND_US))
        )
        .select(
            F.col("a.user_id").alias("user_id"),
            F.col("a.event_id").alias("src_id"),
            F.col("b.event_id").alias("dst_id"),
            (F.col("b.ts_us") - F.col("a.ts_us")).cast("bigint").alias("delta_us"),
        )
        .distinct()
    )


E2_SQL = f"""
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
),
bucketed AS (
  SELECT user_id, event_id, ts_us,
         unnest([CAST(floor(ts_us / {E2_BAND_US}) AS BIGINT),
                 CAST(floor(ts_us / {E2_BAND_US}) AS BIGINT) + 1]) AS bucket
  FROM ev
)
SELECT DISTINCT a.user_id AS user_id, a.event_id AS src_id, b.event_id AS dst_id,
       b.ts_us - a.ts_us AS delta_us
FROM bucketed a JOIN bucketed b
  ON a.user_id = b.user_id AND a.bucket = b.bucket
WHERE a.event_id < b.event_id
  AND abs(a.ts_us - b.ts_us) <= {E2_BAND_US}
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
