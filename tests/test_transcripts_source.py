"""Transcript synthesis: Spark derivation == DuckDB derivation, row for row."""

from __future__ import annotations

import duckdb

from kie_invoice_minimal_spark.sources.transcripts import (
    duckdb_transcripts_sql,
    synth_transcripts,
    transcripts_from_documents,
)

SF_DIR = "/root/testdata/sf0.001"


def test_spark_duckdb_derivation_parity(spark):
    got = sorted(
        (r.conv_id, r.turn_idx, r.role, r.text, r.tool, r.ts.isoformat())
        for r in transcripts_from_documents(spark, SF_DIR).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = sorted(
        (r[0], r[1], r[2], r[3], r[4], r[5].isoformat())
        for r in con.execute(duckdb_transcripts_sql()).fetchall()
    )
    assert got == want
    assert len(got) == 500


def test_synth_matches_doc_derivation(spark):
    """synth_transcripts(range) and doc-derived transcripts agree where keys
    overlap (doc_id is the key)."""
    a = {
        (r.conv_id, r.turn_idx): r.text
        for r in synth_transcripts(spark, 500).collect()
    }
    b = {
        (r.conv_id, r.turn_idx): r.text
        for r in transcripts_from_documents(spark, SF_DIR).collect()
    }
    assert a == b


def test_schema_and_keys(spark):
    df = synth_transcripts(spark, 200)
    assert [f.name for f in df.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
    ]
    rows = df.collect()
    keys = {(r.conv_id, r.turn_idx) for r in rows}
    assert len(keys) == len(rows)  # (conv_id, turn_idx) unique
    # ts monotone within conversation
    by_conv: dict[str, list] = {}
    for r in rows:
        by_conv.setdefault(r.conv_id, []).append((r.turn_idx, r.ts))
    for turns in by_conv.values():
        turns.sort()
        ts = [t[1] for t in turns]
        assert ts == sorted(ts)
