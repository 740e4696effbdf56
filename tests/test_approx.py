"""Approximate sketches are bounded against exact values (r3 verdict item
2: approx_stats moved from engine-private HLL/t-digest to deterministic
KMV/bottom-k order statistics so the driver hash gate applies; accuracy —
which the parity gate cannot see — is pinned here instead)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kie_invoice_minimal_spark.operators.relational_ext import (
    KMV_K,
    approx_stats,
)

SF = "/root/testdata/sf0.01"
SF_SMALL = "/root/testdata/sf0.001"


def test_kmv_users_within_bounds(spark):
    """KMV with k=64 has rel σ ≈ 1/√(k−2) ≈ 12.7%; measured 4.0% at sf0.01
    (150 distinct per group).  Bound at 30% (> 2σ headroom)."""
    got = {r.event_type: r.approx_users for r in approx_stats(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet")
    exact = {
        r.event_type: r.u
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("u")).collect()
    }
    assert got and set(got) == set(exact)
    for et, au in got.items():
        eu = exact[et]
        assert abs(au - eu) <= 0.30 * eu, (et, au, eu)


def test_kmv_takes_estimator_branch_at_sf001(spark):
    """sf0.01 groups hold 150 > k distinct users, so the estimator branch
    (not the exact-count fallback) must be what the bound above verified —
    otherwise the sketch test is vacuous."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    min_u = (
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("u"))
        .agg(F.min("u"))
        .collect()[0][0]
    )
    assert min_u > KMV_K


def test_kmv_exact_branch_small_groups(spark):
    """Groups with < k distinct hashes return the EXACT distinct count
    (sf0.001 has 15 users per group)."""
    got = {r.event_type: r.approx_users for r in approx_stats(spark, SF_SMALL).collect()}
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    exact = {
        r.event_type: r.u
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("u")).collect()
    }
    for et, au in got.items():
        assert au == exact[et], (et, au, exact[et])


def test_sampled_median_rank_bound(spark):
    """The bottom-k (k=256) sampled median must land within exact ranks
    [0.35, 0.65] of each group's value distribution (sample-median rank
    σ ≈ 0.5/√k ≈ 3.1%; measured max deviation 4.9% at sf0.01)."""
    got = {r.event_type: r.approx_p50 for r in approx_stats(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet")
    for et, ap in got.items():
        frac = (
            ev.filter(F.col("event_type") == et)
            .agg(F.avg(F.when(F.col("value") <= ap, 1.0).otherwise(0.0)))
            .collect()[0][0]
        )
        assert 0.35 <= frac <= 0.65, (et, ap, frac)
