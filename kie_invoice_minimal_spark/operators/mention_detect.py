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


def _classify_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized rule classifier over one Arrow batch of turns.

    Everything below is numpy/pandas column ops — no Python loop over rows.
    """
    if df.empty:
        return pd.DataFrame(
            {f.name: pd.Series(dtype="object") for f in MENTION_SCHEMA.fields}
        )
    toks = df["text"].str.split(" ")
    counts = toks.str.len().to_numpy(dtype=np.int64)
    ex = pd.DataFrame(
        {
            "conv_id": np.repeat(df["conv_id"].to_numpy(), counts),
            "turn_idx": np.repeat(df["turn_idx"].to_numpy(), counts),
            "surface": toks.explode().fillna("").to_numpy(),
        }
    )
    # segment arithmetic instead of groupby: per-turn offsets from the
    # global cumsum and each segment's start
    n = len(ex)
    starts = np.concatenate(([0], np.cumsum(counts[:-1]))).astype(np.int64)
    pos = np.arange(n, dtype=np.int64) - np.repeat(starts, counts)
    ex["pos"] = pos

    # char spans: within-group cumsum of (len+1), vectorized via global
    # cumsum minus each group's base
    tok_len = ex["surface"].str.len().to_numpy(dtype=np.int64)
    L = tok_len + 1
    c = np.cumsum(L)
    base = np.repeat(c[starts] - L[starts], counts)
    span_start = c - base - L
    ex["span_start"] = span_start
    ex["span_end"] = span_start + tok_len

    low = ex["surface"].str.lower()
    prev_low = low.shift(1)
    prev_low = prev_low.where(pos > 0, "")

    is_mfg_l = low.isin(rules.MFG_LABEL_TOKENS)
    is_exp_l = low.isin(rules.EXP_LABEL_TOKENS)
    is_wt_l = low.isin(rules.WEIGHT_LABEL_TOKENS)
    is_date = ex["surface"].str.match(rules.DATE_RE, na=False)
    is_weight = low.str.match(rules.WEIGHT_RE, na=False)
    prev_mfg = prev_low.isin(rules.MFG_LABEL_TOKENS)
    prev_exp = prev_low.isin(rules.EXP_LABEL_TOKENS)
    is_brand = ex["surface"].isin(rules.BRAND_GAZETTEER)
    is_name = ex["surface"].isin(rules.NAME_GAZETTEER)

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
    ex["mention_type"] = label
    out = ex[ex["mention_type"] != rules.OTHER]
    return pd.DataFrame(
        {
            "conv_id": out["conv_id"].astype(str),
            "turn_idx": out["turn_idx"].astype("int32"),
            "pos": out["pos"].astype("int32"),
            "span_start": out["span_start"].astype("int32"),
            "span_end": out["span_end"].astype("int32"),
            "surface": out["surface"].astype(str),
            "mention_type": out["mention_type"].astype(str),
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
        F.split("text", " ").alias("toks"),
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
