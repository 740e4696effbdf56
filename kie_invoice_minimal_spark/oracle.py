"""Single-process reference-semantics extractor — the golden oracle.

The analog of the reference's batch CLI entry point
(``scripts/inference_kie.py:process_image`` -> ``postprocess_write_info``,
``backend/kie/kie_utils.py:314-340``): one plain-Python function from a
conversation's turns to its ``(subj, pred, obj)`` triples, with no Spark.
The distributed pipeline's P/R >= 0.95 parity gate (BASELINE.md) compares
against this module's output.

Deliberately naive and eager — clarity over speed; it is the spec.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass

from .functions.rules import EMITTED_LABELS, OTHER, classify_token


@dataclass(frozen=True)
class Mention:
    conv_id: str
    turn_idx: int
    pos: int  # token position within the turn (0-based)
    span_start: int  # char offset into the turn text
    span_end: int  # exclusive
    surface: str
    mention_type: str


def detect_mentions(conv_id: str, turn_idx: int, text: str) -> list[Mention]:
    """Tokenize one turn on single spaces and classify every token.

    Mirrors the reference's detect->recognize->label chain collapsed onto
    pre-tokenized text: each token is the analog of one CRAFT-detected,
    VietOCR-read box (``text_detector.py:153-190`` + ``backend_utils.py:190-211``),
    classified by the deterministic rule set (``train_kie.py:73-95``).
    """
    mentions: list[Mention] = []
    tokens = text.split(" ")
    prev: str | None = None
    offset = 0
    for pos, tok in enumerate(tokens):
        label = classify_token(tok, prev) if tok else OTHER
        if label != OTHER:
            mentions.append(
                Mention(conv_id, turn_idx, pos, offset, offset + len(tok), tok, label)
            )
        offset += len(tok) + 1
        prev = tok
    return mentions


def extract_triples(turns: list[tuple[str, int, str]]) -> list[tuple[str, str, str, str]]:
    """Golden triples for a corpus of ``(conv_id, turn_idx, text)`` turns.

    Returns rows ``(subj, pred, obj, conv_id)`` where subj is the
    conversation entity (the document analog), one row per non-OTHER label
    present, obj = surfaces joined with ' ' in (turn_idx, pos) order —
    the reference's postprocess_write_info (``kie_utils.py:314-340``) with
    its index-order join, OTHER never emitted.
    """
    by_conv: dict[str, list[Mention]] = defaultdict(list)
    for conv_id, turn_idx, text in turns:
        by_conv[conv_id].extend(detect_mentions(conv_id, turn_idx, text))

    triples: list[tuple[str, str, str, str]] = []
    for conv_id in sorted(by_conv):
        ms = sorted(by_conv[conv_id], key=lambda m: (m.turn_idx, m.pos))
        for label in EMITTED_LABELS:
            surfaces = [m.surface for m in ms if m.mention_type == label]
            if surfaces:
                triples.append((conv_id, label, " ".join(surfaces), conv_id))
    return triples


def precision_recall(
    got: set[tuple[str, str, str]], golden: set[tuple[str, str, str]]
) -> tuple[float, float]:
    """Exact-row P/R, mirroring scripts/evaluate.py:119-131's per-class
    report collapsed to micro P/R over (subj, pred, obj) rows."""
    if not got or not golden:
        return (0.0, 0.0)
    inter = len(got & golden)
    return inter / len(got), inter / len(golden)


def merge_mentions(mentions: list[Mention]) -> list[Mention]:
    """Merge runs of adjacent same-type mentions within a turn — the
    pure-Python spec of ``operators.mention_detect.merge_adjacent_mentions``
    (reference ``backend_utils.py:95-121`` create_merge_cells).  Surfaces
    join with ' '; the merged span covers [first.span_start, last.span_end).
    """
    by_key: dict[tuple[str, int, str], list[Mention]] = defaultdict(list)
    for m in mentions:
        by_key[(m.conv_id, m.turn_idx, m.mention_type)].append(m)
    out: list[Mention] = []
    for (conv_id, turn_idx, mtype), ms in by_key.items():
        ms.sort(key=lambda m: m.pos)
        run: list[Mention] = []
        for m in ms + [None]:  # sentinel flushes the last run
            if run and (m is None or m.pos != run[-1].pos + 1):
                out.append(
                    Mention(
                        conv_id,
                        turn_idx,
                        run[0].pos,
                        run[0].span_start,
                        run[-1].span_end,
                        " ".join(r.surface for r in run),
                        mtype,
                    )
                )
                run = []
            if m is not None:
                run.append(m)
    return out
