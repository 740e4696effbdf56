"""As-of (most-recent-prior) join — the time-series operator a transcript /
event pipeline needs that Spark lacks natively (SURVEY.md §2.9 notes the
reference has no as-of joins; the band predicate in E2 is its only
range-like join).

Implementation is the scalable union+window formulation, not a per-key
loop: tag both streams, union the minimal columns, and for each right-side
row take the last left-side value seen in (ts, side) order within the key —
one shuffle on the key, one in-partition sort, no Python anywhere.

DuckDB twin: native ``ASOF JOIN``.  NB: as-of is only deterministic when
the left side has at most one row per (key, ts) — callers dedupe first
(both engines would otherwise pick arbitrary winners).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def asof_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    value_cols: list[str],
    right_id: str,
) -> DataFrame:
    """For every row of ``right`` (uniquely keyed by ``right_id``), attach
    ``value_cols`` of the most recent ``left`` row with left.ts <= right.ts
    within the same ``on`` key (null when no prior left row exists).

    Returns right_id, on, ts, and asof_<c> for each value column.
    """
    lt = left.select(
        F.col(on).alias("_k"),
        F.col(ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(dict(right.dtypes)[right_id]).alias("_rid"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    rt = right.select(
        F.col(on).alias("_k"),
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.col(right_id).alias("_rid"),
        *[
            F.lit(None).cast(dict(lt.dtypes)[f"_v_{c}"]).alias(f"_v_{c}")
            for c in value_cols
        ],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        lt.unionByName(rt)
        .select(
            "_k",
            "_ts",
            "_side",
            "_rid",
            *[
                F.last(f"_v_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
                for c in value_cols
            ],
        )
        .filter(F.col("_side") == 1)
        .select(
            F.col("_rid").alias(right_id),
            F.col("_k").alias(on),
            F.col("_ts").alias(ts),
            *[F.col(f"asof_{c}") for c in value_cols],
        )
    )


def asof_click_after_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each click, the value of the same user's most recent prior (or
    simultaneous) view — left side deduped to one row per (user, ts) so the
    match is deterministic in both engines."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    out = asof_backward(
        views, clicks, on="user_id", ts="ts", value_cols=["view_value"], right_id="event_id"
    )
    return out.select(
        "event_id",
        "user_id",
        F.round(F.coalesce("asof_view_value", F.lit(-1.0)), 6).alias("prior_view_value"),
    )


ASOF_SQL = """
WITH views AS (
  SELECT user_id, ts, max(value) AS view_value
  FROM events WHERE event_type = 'view' GROUP BY user_id, ts
),
clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
)
SELECT c.event_id, c.user_id,
       round(coalesce(v.view_value, -1.0), 6) AS prior_view_value
FROM clicks c
ASOF LEFT JOIN views v ON c.user_id = v.user_id AND c.ts >= v.ts
"""
