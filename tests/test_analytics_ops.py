"""Semantic tests for grouping_sets_doc_stats, w_range_frame and
ta_curate_corpus — the parity gate proves Spark==DuckDB but not that the
shared semantics are RIGHT; these pin them independently."""

from __future__ import annotations

from pyspark.sql import functions as F

from kie_invoice_minimal_spark.operators.relational_ext import (
    grouping_sets_doc_stats,
    w_range_frame,
)
from kie_invoice_minimal_spark.operators.text_analysis import ta_curate_corpus

SF = "/root/testdata/sf0.01"


def test_grouping_sets_composition(spark):
    """The three grouping sets equal the three standalone groupBys, and
    there is NO grand-total row (the asymmetry vs CUBE)."""
    d = spark.read.parquet(f"{SF}/documents.parquet")
    out = grouping_sets_doc_stats(spark, SF).collect()
    by_lang = {r.lang: (r.n, r.c) for r in d.groupBy("lang").agg(
        F.count("*").alias("n"), F.sum("n_chars").alias("c")).collect()}
    by_source = {r.source: (r.n, r.c) for r in d.groupBy("source").agg(
        F.count("*").alias("n"), F.sum("n_chars").alias("c")).collect()}
    by_both = {(r.lang, r.source): (r.n, r.c) for r in d.groupBy("lang", "source").agg(
        F.count("*").alias("n"), F.sum("n_chars").alias("c")).collect()}
    got_lang = {r.lang: (r.n_docs, r.total_chars) for r in out if r.source == "<all>" and r.lang != "<all>"}
    got_source = {r.source: (r.n_docs, r.total_chars) for r in out if r.lang == "<all>" and r.source != "<all>"}
    got_both = {(r.lang, r.source): (r.n_docs, r.total_chars) for r in out
                if r.lang != "<all>" and r.source != "<all>"}
    assert got_lang == by_lang and got_source == by_source and got_both == by_both
    assert not any(r.lang == "<all>" and r.source == "<all>" for r in out)


def test_range_frame_matches_bruteforce(spark):
    """Rolling 30-minute sums equal a driver-side recomputation on a
    per-user sample."""
    out = {(r.user_id, r.event_id): r.roll_cents_30m for r in w_range_frame(spark, SF).collect()}
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select(
            "user_id",
            "event_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .filter(F.col("user_id") < 10)
        .collect()
    )
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    horizon = 30 * 60 * 1_000_000
    for u, rows in by_user.items():
        for r in rows:
            want = sum(x.cents for x in rows if r.ts_us - horizon <= x.ts_us <= r.ts_us)
            assert out[(u, r.event_id)] == want, (u, r.event_id)


def test_curate_corpus_composes_standalone_operators(spark):
    """Curation output == intersection of the standalone operators' criteria
    (dedup keeper AND quality >= 2 AND lang != und) — guards against the
    composed pass drifting from the operators it claims to compose."""
    from kie_invoice_minimal_spark.operators.dedup import dd_exact
    from kie_invoice_minimal_spark.operators.text_analysis import (
        ta_lang_id,
        ta_quality_score,
    )

    keepers = {r.keep_doc_id for r in dd_exact(spark, SF).collect()}
    quality = {r.doc_id for r in ta_quality_score(spark, SF).collect() if r.quality_score >= 2}
    lang = {r.doc_id for r in ta_lang_id(spark, SF).collect() if r.lang_pred != "und"}
    want = keepers & quality & lang
    got = {r.doc_id for r in ta_curate_corpus(spark, SF).collect()}
    assert got == want and len(got) > 0


def test_windowed_anomaly_matches_python_reference(spark):
    """Hourly counts + exact-integer z^2 vs a direct Python recompute
    (population variance, floor division, |z|>=2 flag)."""
    from collections import Counter, defaultdict

    from kie_invoice_minimal_spark.operators.relational_ext import (
        EV_HOUR_US,
        EV_Z2_THS_PPM,
        ev_windowed_anomaly,
    )

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet").select("event_type", "ts").collect()
    cnt = Counter(
        (r.event_type, int(r.ts.timestamp() * 1_000_000) // EV_HOUR_US * EV_HOUR_US)
        for r in ev
    )
    by_type = defaultdict(list)
    for (et, h), x in cnt.items():
        by_type[et].append(x)
    expect = {}
    for (et, h), x in cnt.items():
        xs = by_type[et]
        n, s, ss = len(xs), sum(xs), sum(v * v for v in xs)
        den = n * ss - s * s
        if den == 0:
            expect[(et, h)] = (x, None, None)
        else:
            z2 = ((x * n - s) ** 2 * 1_000_000) // den
            expect[(et, h)] = (x, z2, 1 if z2 >= EV_Z2_THS_PPM else 0)
    got = {
        (r.event_type, r.hour_us): (r.n_events, r.z2_ppm, r.is_anomaly)
        for r in ev_windowed_anomaly(spark, sf).collect()
    }
    assert got == expect
    assert any(v[2] == 1 for v in got.values())  # non-vacuous flags
    assert any(v[2] == 0 for v in got.values())
