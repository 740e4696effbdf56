"""Turn-order reconstruction & ordered merge — SURVEY.md §2.5 (G1–G5).

The reference reconstructs reading order geometrically (contour sort +
within-line x-sort + ordered text join, ``backend/contour_utils.py:5-101``,
``backend_utils.py:95-121``).  For transcripts the canonical order is
``(turn_idx, ts)`` within a conversation; every ordered operation here is a
window or a sort_array over collected structs — never a driver-side sort.

Scale notes: all operators partition by ``conv_id``; after one exchange on
conv_id every per-conversation step is shuffle-free.  Conversations are
bounded (thousands of turns at most), so collect_list per conv is safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ordered_turns(transcripts: DataFrame) -> DataFrame:
    """Stable per-conversation ordering: row_number over (turn_idx, ts).

    Analog of the reference's line ordering (`contour_utils.py:53-57` sort
    by leftmost y; `backend_utils.py:89-99` within-line x sort).
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx", "ts")
    return transcripts.withColumn("turn_rank", F.row_number().over(w))


def merge_conversation_text(transcripts: DataFrame) -> DataFrame:
    """Per conversation, ' '-join all turn texts in stable order.

    The turn-level analog of ``create_merge_cells`` (`backend_utils.py:95-121`:
    sort members by mean-x, join texts with ' ').  sort_array over structs
    gives deterministic order without a window shuffle on top of the groupBy.
    """
    return (
        transcripts.groupBy("conv_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("turn_idx", "ts", "text"))
            ).alias("_turns")
        )
        .select(
            "conv_id",
            F.array_join(F.transform("_turns", lambda t: t["text"]), " ").alias(
                "conv_text"
            ),
            F.size("_turns").alias("n_turns"),
        )
    )


def reassembled_turns(mentions: DataFrame, transcripts: DataFrame) -> DataFrame:
    """Join mentions back to their turns and check the per-turn text
    invariant: every surface equals substring(text, span_start, len).

    Analog of the reference's box-count assert (`backend_utils.py:171`) and
    its O(n^2) re-alignment scan (`backend_utils.py:175-187`) replaced by an
    equi-join on the carried key — SURVEY.md G4.
    Returns rows with a boolean ``span_ok``.
    """
    t = transcripts.select("conv_id", "turn_idx", "text")
    return (
        mentions.join(t, ["conv_id", "turn_idx"], "left")
        .withColumn(
            "span_ok",
            F.expr("substring(text, span_start + 1, span_end - span_start)")
            == F.col("surface"),
        )
    )
