"""Triple emission & materialization — SURVEY.md §2.8 (O1/O2).

The reference's ``postprocess_write_info`` (``backend/kie/kie_utils.py:314-340``)
builds, per document and per non-OTHER label, the ' '-join of all member
texts in index order.  Here that is one grouped aggregation with a
deterministic in-group sort, emitting the ``triples`` table
``(subj, pred, obj, conv_id)``; the writer partitions by
``(pred, subj_bucket)`` with an explicit salt column for hot subjects
(north rule: skew handled explicitly, not left to AQE alone).

Scale notes: groupBy(conv_id, mention_type) shuffles once on a high-
cardinality composite key — no skew (conversations are bounded).  Skew
appears at WRITE time (hot predicate partitions, hot subjects); the salt
splits a hot subject's rows across SALT_BUCKETS files within its
partition so no single task owns a mega-partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.rules import OTHER

SUBJ_BUCKETS = 64
SALT_BUCKETS = 8


def materialize_triples(mentions: DataFrame, subj_col: str = "conv_id") -> DataFrame:
    """(subj, pred, obj, conv_id): obj = surfaces ' '-joined in stable
    (turn_idx, pos) order.  One shuffle (the groupBy); the sort is the
    array_sort of collected structs, not a global sort."""
    return (
        mentions.filter(F.col("mention_type") != OTHER)
        # shuffle only what the aggregation needs — span offsets stay behind
        .select(subj_col, "mention_type", "turn_idx", "pos", "surface")
        .groupBy(F.col(subj_col).alias("subj"), F.col("mention_type").alias("pred"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("turn_idx", "pos", "surface"))
                    ),
                    lambda m: m["surface"],
                ),
                " ",
            ).alias("obj"),
            F.first(subj_col).alias("conv_id"),
        )
        .select("subj", "pred", "obj", "conv_id")
    )


def with_partition_keys(triples: DataFrame) -> DataFrame:
    """Add the physical layout columns: subj_bucket = hash(subj) % K and a
    deterministic salt spreading hot subjects (hash of the full row — stable,
    no rand())."""
    return triples.withColumn(
        "subj_bucket", F.pmod(F.xxhash64("subj"), F.lit(SUBJ_BUCKETS)).cast("int")
    ).withColumn(
        "salt",
        F.pmod(F.xxhash64("subj", "pred", "obj"), F.lit(SALT_BUCKETS)).cast("int"),
    )


def write_triples(triples: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Materialize partitioned by (pred, subj_bucket); repartition by
    (pred, subj_bucket, salt) first so a hot subject's rows land on
    SALT_BUCKETS tasks instead of one."""
    (
        with_partition_keys(triples)
        .repartition("pred", "subj_bucket", "salt")
        .drop("salt")
        .write.mode(mode)
        .partitionBy("pred", "subj_bucket")
        .parquet(path)
    )
