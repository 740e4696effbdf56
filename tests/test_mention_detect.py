"""Detector equivalence: arrow UDF == native JVM == pure-Python oracle."""

from __future__ import annotations

from kie_invoice_minimal_spark.operators.mention_detect import (
    detect_mentions_arrow,
    detect_mentions_native,
)
from kie_invoice_minimal_spark.operators.turn_order import reassembled_turns
from kie_invoice_minimal_spark.oracle import detect_mentions
from kie_invoice_minimal_spark.sources.transcripts import synth_transcripts


def _rows(df):
    return sorted(
        (r.conv_id, r.turn_idx, r.pos, r.span_start, r.span_end, r.surface, r.mention_type)
        for r in df.collect()
    )


def test_arrow_equals_native_equals_oracle(spark):
    t = synth_transcripts(spark, 300)
    arrow = _rows(detect_mentions_arrow(t))
    native = _rows(detect_mentions_native(t))
    assert arrow == native
    oracle = sorted(
        (m.conv_id, m.turn_idx, m.pos, m.span_start, m.span_end, m.surface, m.mention_type)
        for r in t.collect()
        for m in detect_mentions(r.conv_id, r.turn_idx, r.text)
    )
    assert arrow == oracle
    assert len(arrow) > 0


def test_rule_cases(spark):
    """Targeted rule semantics, incl. negative cases."""
    rows = [
        # bare date with no preceding label token -> no mention
        ("c1", 0, "ngay 12/2024 khong nhan"),
        # date right after NSX: -> MFG; after HSD -> EXP
        ("c1", 1, "NSX: 1/2023 HSD 2/12/2025"),
        # weight standalone; weight label; case-insensitivity of triggers
        ("c1", 2, "nang 500g kl: 2kg WEIGHT: 1.5l"),
        # gazetteers are case-sensitive
        ("c1", 3, "VinaMilk vinamilk VINAMILK vinamilkX Sữa-Tươi sữa-tươi"),
        # empty-ish
        ("c1", 4, ""),
    ]
    t = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    got = {
        (r.turn_idx, r.surface, r.mention_type)
        for r in detect_mentions_arrow(t).collect()
    }
    assert (0, "12/2024", "OTHER") not in got
    assert not any(r for r in got if r[0] == 0)
    assert (1, "NSX:", "MFG_LABEL") in got
    assert (1, "1/2023", "MFG") in got
    assert (1, "HSD", "EXP_LABEL") in got
    assert (1, "2/12/2025", "EXP") in got
    assert (2, "500g", "WEIGHT") in got
    assert (2, "kl:", "WEIGHT_LABEL") in got
    assert (2, "2kg", "WEIGHT") in got
    assert (2, "WEIGHT:", "WEIGHT_LABEL") in got
    assert (2, "1.5l", "WEIGHT") in got
    assert (3, "VinaMilk", "BRAND") in got
    assert (3, "vinamilk", "BRAND") in got  # planted alias variant
    assert (3, "VINAMILK", "BRAND") in got
    assert not any(s == "vinamilkX" for (_, s, _) in got)
    assert (3, "Sữa-Tươi", "NAME") in got
    assert not any(s == "sữa-tươi" for (_, s, _) in got)
    # native agrees on the tricky cases too
    native = {
        (r.turn_idx, r.surface, r.mention_type)
        for r in __import__(
            "kie_invoice_minimal_spark.operators.mention_detect",
            fromlist=["detect_mentions_native"],
        ).detect_mentions_native(t).collect()
    }
    assert native == got


def test_span_invariant(spark):
    """Per-turn text equality: every surface == substring of its turn text."""
    t = synth_transcripts(spark, 500)
    m = detect_mentions_arrow(t)
    chk = reassembled_turns(m, t)
    bad = chk.filter(~chk.span_ok).count()
    assert bad == 0
    assert chk.count() > 0


def test_null_text_handling(spark):
    """Null/empty text yields no mentions (and never the literal 'None')."""
    t = spark.createDataFrame(
        [("c1", 0, None), ("c1", 1, ""), ("c1", 2, "NSX: 1/2023")],
        "conv_id string, turn_idx int, text string",
    )
    a = sorted(map(tuple, detect_mentions_arrow(t).collect()))
    n = sorted(map(tuple, detect_mentions_native(t).collect()))
    assert a == n
    assert all(r[1] == 2 for r in a)  # only the real turn produced mentions
    assert len(a) == 2
