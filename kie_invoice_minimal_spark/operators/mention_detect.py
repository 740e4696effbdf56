"""Batched mention detection + span typing — SURVEY.md §2.3/§2.4 (D1–D7, R1–R4).

The reference detects boxes with a batched CNN (``text_detector.py:77-132``),
reads them with batched seq2seq OCR (``backend_utils.py:190-211``, batch flag
``configs.py:61``), and remaps labels with keyword rules
(``train_kie.py:73-95``).  Here the "detector + recognizer + labeler" is one
vectorized pass over turn text: tokenize, compute char spans, classify each
token with the deterministic rule set in :mod:`..functions.rules`.

Two interchangeable implementations, tested for equality:

- :func:`detect_mentions_arrow` — ``mapInPandas``: whole-Arrow-batch numpy/
  pandas ops, zero per-row Python (the north rule's required surface; this is
  what the flagship pipeline uses).  The model-scoring analog slot: any
  learned detector (a real NER model) would drop into this same UDF body.
- :func:`detect_mentions_native` — pure JVM column expressions
  (posexplode + higher-order functions), whole-stage-codegen friendly; the
  fastest path when the rule set is expressible in SQL.

Both output the ``mentions`` table (FIXTURES.md §2):
  conv_id, turn_idx, pos, span_start, span_end, surface, mention_type
with OTHER tokens dropped (reference skips class OTHER at emission,
``kie_utils.py:314-340``).

Scale notes: both are narrow maps — no shuffle; output size ~= planted
mention density * corpus size.  Arrow batch size bounds UDF memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import rules

MENTION_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("pos", T.IntegerType()),
        T.StructField("span_start", T.IntegerType()),
        T.StructField("span_end", T.IntegerType()),
        T.StructField("surface", T.StringType()),
        T.StructField("mention_type", T.StringType()),
    ]
)

MENTION_SCHEMA_DDL = (
    "conv_id string, turn_idx int, pos int, span_start int, span_end int, "
    "surface string, mention_type string"
)


_MFG_L = pa.array(rules.MFG_LABEL_TOKENS)
_EXP_L = pa.array(rules.EXP_LABEL_TOKENS)
_WT_L = pa.array(rules.WEIGHT_LABEL_TOKENS)
_BRANDS = pa.array(sorted(rules.BRAND_GAZETTEER))
_NAMES = pa.array(sorted(rules.NAME_GAZETTEER))
# RE2 patterns (pyarrow match_substring_regex); identical text to the
# Python/SQL forms in rules.py
_DATE_PAT = rules.DATE_RE_SQL
_WEIGHT_PAT = rules.WEIGHT_RE_SQL


def _classify_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized rule classifier over one Arrow batch of turns.

    Tokenization, lowering, set membership and regex all run in pyarrow
    compute kernels (C++); the segment arithmetic for positions/spans is
    numpy.  No Python loop over rows or tokens.
    """
    if df.empty:
        return pd.DataFrame(
            {f.name: pd.Series(dtype="object") for f in MENTION_SCHEMA.fields}
        )
    # null text = no content (never the string 'None')
    texts = pa.array(df["text"].fillna("").astype(str), type=pa.string())
    sp = pc.split_pattern(texts, " ")
    flat = pc.list_flatten(sp)
    counts = pc.list_value_length(sp).to_numpy().astype(np.int64)

    n = int(counts.sum())
    starts = np.concatenate(([0], np.cumsum(counts[:-1]))).astype(np.int64)
    pos = np.arange(n, dtype=np.int64) - np.repeat(starts, counts)

    # char spans: within-turn cumsum of (len+1) = global cumsum - segment base
    tok_len = pc.utf8_length(flat).to_numpy().astype(np.int64)
    L = tok_len + 1
    c = np.cumsum(L)
    base = np.repeat(c[starts] - L[starts], counts)
    span_start = c - base - L

    low = pc.utf8_lower(flat)
    is_mfg_l = pc.is_in(low, value_set=_MFG_L).to_numpy(zero_copy_only=False)
    is_exp_l = pc.is_in(low, value_set=_EXP_L).to_numpy(zero_copy_only=False)
    is_wt_l = pc.is_in(low, value_set=_WT_L).to_numpy(zero_copy_only=False)
    is_date = pc.match_substring_regex(flat, _DATE_PAT).to_numpy(zero_copy_only=False)
    is_weight = pc.match_substring_regex(low, _WEIGHT_PAT).to_numpy(zero_copy_only=False)
    is_brand = pc.is_in(flat, value_set=_BRANDS).to_numpy(zero_copy_only=False)
    is_name = pc.is_in(flat, value_set=_NAMES).to_numpy(zero_copy_only=False)

    # previous token's label-membership, shifted within each turn
    prev_mfg = np.concatenate(([False], is_mfg_l[:-1])) & (pos > 0)
    prev_exp = np.concatenate(([False], is_exp_l[:-1])) & (pos > 0)

    label = np.select(
        [
            is_mfg_l,
            is_exp_l,
            is_wt_l,
            is_date & prev_mfg,
            is_date & prev_exp,
            is_date,  # unanchored date -> OTHER
            is_weight,
            is_brand,
            is_name,
        ],
        [
            "MFG_LABEL",
            "EXP_LABEL",
            "WEIGHT_LABEL",
            "MFG",
            "EXP",
            rules.OTHER,
            "WEIGHT",
            "BRAND",
            "NAME",
        ],
        default=rules.OTHER,
    )
    keep = label != rules.OTHER
    surface = flat.to_numpy(zero_copy_only=False)
    return pd.DataFrame(
        {
            "conv_id": np.repeat(df["conv_id"].to_numpy(), counts)[keep],
            "turn_idx": np.repeat(
                df["turn_idx"].to_numpy().astype(np.int32), counts
            )[keep],
            "pos": pos[keep].astype(np.int32),
            "span_start": span_start[keep].astype(np.int32),
            "span_end": (span_start + tok_len)[keep].astype(np.int32),
            "surface": surface[keep],
            "mention_type": label[keep],
        }
    )


def detect_mentions_arrow(transcripts: DataFrame) -> DataFrame:
    """Mention detection as a ``mapInPandas`` over Arrow batches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _classify_batch(pdf)

    return transcripts.select("conv_id", "turn_idx", "text").mapInPandas(
        run, schema=MENTION_SCHEMA_DDL
    )


def detect_mentions_native(
    transcripts: DataFrame, carry: tuple[str, ...] = ()
) -> DataFrame:
    """Same semantics in pure JVM column expressions (no Python at all).

    posexplode(split(text)) gives (pos, token); the previous token comes
    from array indexing (no window/shuffle); char offsets via an
    O(tokens) aggregate accumulator per turn.  ``carry`` names extra input
    columns passed through unchanged (e.g. ``ts`` for streaming watermarks —
    keeping them in-plan avoids a stream-stream self-join).
    """
    mfg_l = ",".join(f"'{t}'" for t in rules.MFG_LABEL_TOKENS)
    exp_l = ",".join(f"'{t}'" for t in rules.EXP_LABEL_TOKENS)
    wt_l = ",".join(f"'{t}'" for t in rules.WEIGHT_LABEL_TOKENS)
    brands = ",".join(f"'{t}'" for t in sorted(rules.BRAND_GAZETTEER))
    names = ",".join(f"'{t}'" for t in sorted(rules.NAME_GAZETTEER))

    carry_cols = list(carry)
    toks = transcripts.select(
        "conv_id",
        "turn_idx",
        *carry_cols,
        F.split(F.coalesce(F.col("text"), F.lit("")), " ").alias("toks"),
    ).select(
        "conv_id",
        "turn_idx",
        *carry_cols,
        # running char offsets: starts[i] = i + sum(len(toks[j]) for j<i)
        F.expr(
            """
            aggregate(
              toks,
              struct(cast(0 as int) as off, cast(array() as array<int>) as starts),
              (acc, x) -> struct(
                acc.off + length(x) + 1,
                array_append(acc.starts, acc.off)),
              acc -> acc.starts
            )
            """
        ).alias("starts"),
        "toks",
    ).select(
        "conv_id",
        "turn_idx",
        *carry_cols,
        F.posexplode(
            F.expr("zip_with(toks, starts, (t, s) -> struct(t as tok, s as start))")
        ).alias("pos", "z"),
        F.col("toks"),
    ).select(
        "conv_id",
        "turn_idx",
        *carry_cols,
        F.col("pos").cast("int").alias("pos"),
        F.col("z.start").alias("span_start"),
        (F.col("z.start") + F.length("z.tok")).cast("int").alias("span_end"),
        F.col("z.tok").alias("surface"),
        F.expr("if(pos > 0, lower(element_at(toks, pos)), '')").alias("prev_low"),
    )

    classified = toks.withColumn(
        "mention_type",
        F.expr(
            f"""
            CASE
              WHEN lower(surface) IN ({mfg_l}) THEN 'MFG_LABEL'
              WHEN lower(surface) IN ({exp_l}) THEN 'EXP_LABEL'
              WHEN lower(surface) IN ({wt_l}) THEN 'WEIGHT_LABEL'
              WHEN surface RLIKE '{rules.DATE_RE_SQL}' THEN
                CASE WHEN prev_low IN ({mfg_l}) THEN 'MFG'
                     WHEN prev_low IN ({exp_l}) THEN 'EXP'
                     ELSE 'OTHER' END
              WHEN lower(surface) RLIKE '{rules.WEIGHT_RE_SQL}' THEN 'WEIGHT'
              WHEN surface IN ({brands}) THEN 'BRAND'
              WHEN surface IN ({names}) THEN 'NAME'
              ELSE 'OTHER'
            END
            """
        ),
    )
    return classified.filter(F.col("mention_type") != rules.OTHER).select(
        "conv_id",
        "turn_idx",
        *carry_cols,
        "pos",
        F.col("span_start").cast("int").alias("span_start"),
        "span_end",
        "surface",
        "mention_type",
    )


def with_mention_id(mentions: DataFrame) -> DataFrame:
    """Stable 64-bit mention id from the natural key (JVM xxhash64) —
    the analog of the reference's box index, made global and join-stable
    (fixes the O(n^2) re-alignment of ``backend_utils.py:175-187``)."""
    return mentions.withColumn(
        "mention_id", F.xxhash64("conv_id", "turn_idx", "pos")
    )


def merge_adjacent_mentions(mentions: DataFrame) -> DataFrame:
    """Merge runs of ADJACENT same-type token mentions within a turn into one
    multi-token span — the reference's multi-box span merge
    (``backend/backend_utils.py:95-121`` ``create_merge_cells``: boxes on one
    line whose gaps are below a threshold become one cell), restated for
    pre-tokenized text where "adjacent" means consecutive token positions.

    Gaps-and-islands: island = pos - row_number() over (conv, turn, type
    ordered by pos) is constant exactly on consecutive-pos runs; one groupBy
    per island emits the merged span.  Merged surface = ' '-join in pos
    order, span = [min(span_start), max(span_end)) — single-space
    tokenization guarantees substring(text, span) == surface (tested).

    Scale: the window and groupBy both key on (conv_id, turn_idx, ...) — the
    same clustering the bucketed transcripts scan already provides, so on a
    bucket(conv_id) table this whole operator is exchange-free.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id", "turn_idx", "mention_type").orderBy("pos")
    isl = mentions.withColumn("island", F.col("pos") - F.row_number().over(w))
    return (
        isl.groupBy("conv_id", "turn_idx", "mention_type", "island")
        .agg(
            F.min("pos").cast("int").alias("pos"),
            F.min("span_start").cast("int").alias("span_start"),
            F.max("span_end").cast("int").alias("span_end"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "surface"))),
                    lambda m: m["surface"],
                ),
                " ",
            ).alias("surface"),
            F.count("*").cast("int").alias("n_tokens"),
        )
        .select(
            "conv_id",
            "turn_idx",
            "pos",
            "span_start",
            "span_end",
            "surface",
            "mention_type",
            "n_tokens",
        )
    )


def rescan_merged_surfaces(merged: DataFrame, transcripts: DataFrame) -> DataFrame:
    """RE-READ each merged span from the source turn text — the reference's
    merged-crop re-OCR (``backend/backend_utils.py:110-113``: after
    ``create_merge_cells`` the merged crop goes back through the recognizer,
    rather than concatenating the member-box texts).  Here "re-OCR" is
    re-extraction: surface = substring(text, span_start+1, span_end -
    span_start), taken from the turn text itself, so any divergence between
    the merged bounds and the member-join surface surfaces as a difference
    instead of being papered over (tests pin the two paths equal under
    single-space tokenization).

    Scale: the join keys on (conv_id, turn_idx) — the clustering the
    bucketed transcripts table already provides, so on a bucket(conv_id)
    table this is a zero-exchange co-located join; span extraction is pure
    column algebra."""
    t = transcripts.select("conv_id", "turn_idx", "text")
    return (
        merged.drop("surface")
        .join(t, ["conv_id", "turn_idx"])
        .select(
            "conv_id",
            "turn_idx",
            "pos",
            "span_start",
            "span_end",
            F.expr(
                "substring(text, span_start + 1, span_end - span_start)"
            ).alias("surface"),
            "mention_type",
            "n_tokens",
        )
    )
