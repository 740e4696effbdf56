"""Degenerate-input behavior of the round-2 operators: empty mention sets,
no duplicate pairs, single-row groups — they must return empty/identity
results, not throw."""

from __future__ import annotations

from pyspark.sql import functions as F

from kie_invoice_minimal_spark.operators.connected_components import (
    connected_components,
)
from kie_invoice_minimal_spark.operators.mention_detect import (
    MENTION_SCHEMA_DDL,
    merge_adjacent_mentions,
)


def test_merge_empty_mentions(spark):
    empty = spark.createDataFrame([], MENTION_SCHEMA_DDL)
    out = merge_adjacent_mentions(empty)
    assert out.count() == 0
    assert "n_tokens" in out.columns


def test_merge_single_mention_is_identity(spark):
    one = spark.createDataFrame(
        [("c1", 0, 2, 10, 14, "Vina", "BRAND")], MENTION_SCHEMA_DDL
    )
    rows = merge_adjacent_mentions(one).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.surface, r.span_start, r.span_end, r.n_tokens) == ("Vina", 10, 14, 1)


def test_merge_nonadjacent_same_type_not_merged(spark):
    two = spark.createDataFrame(
        [
            ("c1", 0, 2, 10, 14, "Vina", "BRAND"),
            ("c1", 0, 5, 30, 35, "Masan", "BRAND"),
        ],
        MENTION_SCHEMA_DDL,
    )
    rows = merge_adjacent_mentions(two).collect()
    assert len(rows) == 2 and all(r.n_tokens == 1 for r in rows)


def test_cc_empty_edges(spark):
    empty = spark.createDataFrame([], "u bigint, v bigint")
    assert connected_components(empty).count() == 0


def test_merge_different_types_adjacent_not_merged(spark):
    two = spark.createDataFrame(
        [
            ("c1", 0, 2, 10, 14, "Vina", "BRAND"),
            ("c1", 0, 3, 15, 20, "Milky", "NAME"),
        ],
        MENTION_SCHEMA_DDL,
    )
    rows = merge_adjacent_mentions(two).collect()
    assert len(rows) == 2 and all(r.n_tokens == 1 for r in rows)
