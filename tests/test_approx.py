"""Approximate sketches are bounded against exact values."""

from __future__ import annotations

from pyspark.sql import functions as F

from kie_invoice_minimal_spark.operators.relational_ext import approx_stats

SF = "/root/testdata/sf0.01"


def test_approx_within_bounds(spark):
    got = {r.event_type: (r.approx_users, r.approx_p50) for r in approx_stats(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet")
    exact = {
        r.event_type: (r.u, r.p50)
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("u"),
            F.expr("percentile(value, 0.5)").alias("p50"),
        )
        .collect()
    }
    for et, (au, ap50) in got.items():
        eu, ep50 = exact[et]
        assert abs(au - eu) <= max(3, 0.1 * eu), (et, au, eu)  # HLL ~2% rsd
        spread = abs(ep50) + 1
        assert abs(ap50 - ep50) <= 0.25 * spread, (et, ap50, ep50)
