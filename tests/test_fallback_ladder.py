"""P4 threshold-fallback ladder invariants (ref inference_kie.py:114-135):
every user keeps exactly the rows of their strictest non-empty tier."""

from __future__ import annotations

from pyspark.sql import functions as F

from kie_invoice_minimal_spark.operators.relational_ext import (
    FALLBACK_THRESHOLDS,
    p4_threshold_fallback,
)

SF = "/root/testdata/sf0.01"


def test_single_tier_per_user(spark):
    out = p4_threshold_fallback(spark, SF)
    per_user = out.groupBy("user_id").agg(F.countDistinct("tier").alias("nt"))
    assert per_user.filter(F.col("nt") != 1).count() == 0


def test_tier_is_strictest_nonempty(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "user_id", F.round(F.col("value") / 600.0, 6).alias("score")
    )
    out = p4_threshold_fallback(spark, SF)
    chosen = {r.user_id: r.tier for r in out.select("user_id", "tier").distinct().collect()}
    # recompute the ladder driver-side on the small fixture
    rows = ev.collect()
    best: dict[int, int] = {}
    for r in rows:
        for i, t in enumerate(FALLBACK_THRESHOLDS):
            if r.score >= t:
                best[r.user_id] = min(best.get(r.user_id, 99), i)
                break
    assert chosen == best


def test_rows_match_threshold(spark):
    out = p4_threshold_fallback(spark, SF)
    bad = out.filter(
        ~(
            (F.col("tier") == 0) & (F.col("score") >= FALLBACK_THRESHOLDS[0])
            | (F.col("tier") == 1)
            & (F.col("score") >= FALLBACK_THRESHOLDS[1])
            & (F.col("score") < FALLBACK_THRESHOLDS[0])
            | (F.col("tier") == 2)
            & (F.col("score") >= FALLBACK_THRESHOLDS[2])
            & (F.col("score") < FALLBACK_THRESHOLDS[1])
            | (F.col("tier") == 3)
            & (F.col("score") >= FALLBACK_THRESHOLDS[3])
            & (F.col("score") < FALLBACK_THRESHOLDS[2])
        )
    )
    assert bad.count() == 0
