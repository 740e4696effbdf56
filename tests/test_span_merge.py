"""Multi-token span merging (reference create_merge_cells analog,
backend_utils.py:95-121): adjacent same-type token mentions become one span
in all three implementations, and the merged span is a literal substring of
the turn text."""

from __future__ import annotations

from pyspark.sql import functions as F

from kie_invoice_minimal_spark.operators.mention_detect import (
    detect_mentions_arrow,
    merge_adjacent_mentions,
)
from kie_invoice_minimal_spark.oracle import detect_mentions, merge_mentions
from kie_invoice_minimal_spark.sources.transcripts import synth_transcripts

N_TURNS = 500


def test_multi_token_spans_exist(spark):
    t = synth_transcripts(spark, N_TURNS)
    merged = merge_adjacent_mentions(detect_mentions_arrow(t))
    n_multi = merged.filter(F.col("n_tokens") >= 2).count()
    assert n_multi > 0  # the synthesis plants two-token brands


def test_merge_matches_python_oracle(spark):
    t = synth_transcripts(spark, N_TURNS)
    got = {
        (r.conv_id, r.turn_idx, r.pos, r.span_start, r.span_end, r.surface, r.mention_type)
        for r in merge_adjacent_mentions(detect_mentions_arrow(t)).collect()
    }
    turns = [(r.conv_id, r.turn_idx, r.text) for r in t.collect()]
    flat = [m for c, i, txt in turns for m in detect_mentions(c, i, txt)]
    want = {
        (m.conv_id, m.turn_idx, m.pos, m.span_start, m.span_end, m.surface, m.mention_type)
        for m in merge_mentions(flat)
    }
    assert got == want


def test_merged_span_substring_invariant(spark):
    """substring(text, span_start, span_end) == surface also for merged
    multi-token spans (single-space tokenization guarantees it)."""
    t = synth_transcripts(spark, N_TURNS)
    merged = merge_adjacent_mentions(detect_mentions_arrow(t))
    joined = merged.join(t.select("conv_id", "turn_idx", "text"), ["conv_id", "turn_idx"])
    bad = joined.filter(
        F.expr("substring(text, span_start + 1, span_end - span_start)")
        != F.col("surface")
    )
    assert bad.count() == 0


def test_merge_preserves_triples(spark):
    """The flagship obj is a pos-ordered ' '-join, so merging must not change
    triples: materializing from merged mentions == from token mentions."""
    from kie_invoice_minimal_spark.operators.triples import materialize_triples

    t = synth_transcripts(spark, N_TURNS)
    m = detect_mentions_arrow(t)
    a = sorted(map(tuple, materialize_triples(m).collect()))
    b = sorted(map(tuple, materialize_triples(merge_adjacent_mentions(m)).collect()))
    assert a == b


def test_rescan_equals_member_join_surfaces(spark):
    """The merged-crop re-OCR analog (rescan_merged_surfaces,
    backend_utils.py:110-113) and the member string_agg path must agree
    under single-space tokenization — the two ways of reading a merged
    span are the same text."""
    from kie_invoice_minimal_spark.operators.mention_detect import (
        rescan_merged_surfaces,
    )

    t = synth_transcripts(spark, N_TURNS)
    merged = merge_adjacent_mentions(detect_mentions_arrow(t))
    key = ["conv_id", "turn_idx", "pos", "span_start", "span_end", "surface",
           "mention_type", "n_tokens"]
    joined = {tuple(r) for r in merged.select(*key).collect()}
    rescanned = {tuple(r) for r in rescan_merged_surfaces(merged, t).select(*key).collect()}
    assert joined == rescanned
