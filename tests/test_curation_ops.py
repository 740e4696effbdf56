"""Semantic invariants for the round-3 curation operators (repetition
filter, span redaction, sequence packing, mixture weights).  Run in DuckDB
against the shared SQL twins — the harness hash-compares the Spark plans to
these same strings, so properties proven here transfer to the Spark side.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from kie_invoice_minimal_spark.functions import rules
from kie_invoice_minimal_spark.operators.text_analysis import (
    PACK_SEQ_LEN,
    TA_MIXTURE_SQL,
    TA_PACK_SQL,
    TA_REPETITION_SQL,
    ta_redact_sql,
)

SF_DIR = "/root/testdata/sf0.01"


def _con():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    return con


def test_repetition_flags_planted_repetitive_doc():
    """A degenerate 'spam spam spam' doc must flag; a all-distinct doc must
    not — and the fractions are exactly the hand-computable values."""
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["spam spam spam spam spam spam", "a b c d e f g h i j"],
            "lang": ["en", "en"],
            "source": ["s", "s"],
            "n_chars": [29, 19],
        }
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    rows = {r[0]: r for r in con.execute(TA_REPETITION_SQL).fetchall()}
    spam = rows[0]
    # 6 tokens, 1 distinct -> dup 5/6; top 6/6; 5 bigrams all equal -> dup 4/5
    assert spam[1] == 6 and round(spam[2], 6) == round(1 - 1 / 6, 6)
    assert spam[3] == 1.0 and round(spam[4], 6) == round(1 - 1 / 5, 6)
    assert spam[5] is True
    clean = rows[1]
    assert clean[2] == 0.0 and clean[4] == 0.0 and clean[5] is False


def test_repetition_fractions_bounded_on_fixture():
    con = _con()
    bad = con.execute(
        f"""SELECT count(*) FROM ({TA_REPETITION_SQL})
            WHERE dup_token_frac NOT BETWEEN 0 AND 1
               OR top_token_frac NOT BETWEEN 0 AND 1
               OR dup_2gram_frac NOT BETWEEN 0 AND 1"""
    ).fetchone()[0]
    assert bad == 0
    flagged = con.execute(
        f"SELECT count(*) FROM ({TA_REPETITION_SQL}) WHERE is_repetitive"
    ).fetchone()[0]
    # thresholds sit at discriminating quantiles: some but not all flag
    assert 0 < flagged < 500, flagged


def test_pack_two_level_prefix_sum_equals_naive_global_cumsum():
    """The distributed prefix sum (bucketed windows) must equal the naive
    single global window — same tape, same cuts."""
    con = _con()
    naive = f"""
WITH d AS (SELECT doc_id, CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens
           FROM documents),
tape AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
  FROM d)
SELECT doc_id, n_tokens,
       CAST(floor(start_tok / {PACK_SEQ_LEN}) AS BIGINT) AS seq_id,
       CAST(start_tok % {PACK_SEQ_LEN} AS BIGINT) AS offset_in_seq
FROM tape
"""
    a = sorted(map(tuple, con.execute(TA_PACK_SQL).fetchall()))
    b = sorted(map(tuple, con.execute(naive).fetchall()))
    assert a == b


def test_pack_offsets_and_seq_monotonicity():
    con = _con()
    rows = con.execute(
        f"SELECT doc_id, n_tokens, seq_id, offset_in_seq FROM ({TA_PACK_SQL}) ORDER BY doc_id"
    ).fetchall()
    assert all(0 <= r[3] < PACK_SEQ_LEN for r in rows)
    seqs = [r[2] for r in rows]
    assert seqs == sorted(seqs)  # tape order == doc_id order
    total = sum(r[1] for r in rows)
    assert rows[-1][2] == (total - rows[-1][1]) // PACK_SEQ_LEN


def test_redaction_is_complete_and_token_preserving():
    """No date/weight token survives redaction, token count is unchanged,
    and the counters equal the number of rewritten tokens."""
    con = _con()
    sql = ta_redact_sql()
    bad = con.execute(
        f"""SELECT count(*) FROM ({sql})
            WHERE len(list_filter(string_split(redacted_text, ' '),
                  tok -> regexp_matches(tok, '{rules.DATE_RE_SQL}')
                         OR regexp_matches(lower(tok), '{rules.WEIGHT_RE_SQL}'))) > 0"""
    ).fetchone()[0]
    assert bad == 0
    mism = con.execute(
        f"""SELECT count(*) FROM ({sql})
            WHERE len(list_filter(string_split(redacted_text, ' '),
                        tok -> tok IN ('[DATE]', '[NUM]')))
                  != n_dates + n_nums"""
    ).fetchone()[0]
    assert mism == 0
    some = con.execute(
        f"SELECT sum(n_dates), sum(n_nums) FROM ({sql})"
    ).fetchone()
    assert some[0] > 0 and some[1] > 0  # the corpus plants both


def test_mixture_weights_sum_to_one_and_cover_corpus():
    con = _con()
    tot_w, tot_docs = con.execute(
        f"SELECT sum(weight), sum(n_docs) FROM ({TA_MIXTURE_SQL})"
    ).fetchone()
    assert abs(tot_w - 1.0) < 1e-3  # per-group 6dp rounding only
    assert tot_docs == 500


from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5000),  # sparse, gappy doc_ids
            st.integers(min_value=1, max_value=400),  # token counts
        ),
        min_size=0,
        max_size=60,
        unique_by=lambda t: t[0],
    )
)
def test_pack_two_level_equals_naive_on_arbitrary_ids(rows):
    """The bucketed prefix sum must equal the naive global cumsum for ANY
    doc_id distribution — gaps, empty buckets, a single doc, nothing."""
    pdf = pd.DataFrame(
        {
            "doc_id": pd.array([r[0] for r in rows], dtype="int64"),
            "text": pd.array([" ".join(["w"] * r[1]) for r in rows], dtype="string"),
            "lang": pd.array(["en"] * len(rows), dtype="string"),
            "source": pd.array(["s"] * len(rows), dtype="string"),
            "n_chars": pd.array([0] * len(rows), dtype="int64"),
        }
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    naive = f"""
WITH d AS (SELECT doc_id, CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens
           FROM documents),
tape AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
  FROM d)
SELECT doc_id, n_tokens,
       CAST(floor(start_tok / {PACK_SEQ_LEN}) AS BIGINT) AS seq_id,
       CAST(start_tok % {PACK_SEQ_LEN} AS BIGINT) AS offset_in_seq
FROM tape
"""
    a = sorted(map(tuple, con.execute(TA_PACK_SQL).fetchall()))
    b = sorted(map(tuple, con.execute(naive).fetchall()))
    assert a == b


def test_mixture_sample_gate_and_min_domain():
    """Every kept doc passes its domain's hash gate, and the smallest
    domain (rate 1e6) keeps every one of its docs."""
    from kie_invoice_minimal_spark.operators.text_analysis import (
        SAMPLE_PPM,
        TA_MIXTURE_SAMPLE_SQL,
    )

    con = _con()
    bad = con.execute(
        f"""SELECT count(*) FROM ({TA_MIXTURE_SAMPLE_SQL})
            WHERE CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                       AS BIGINT) % {SAMPLE_PPM} >= rate_ppm"""
    ).fetchone()[0]
    assert bad == 0
    # the min-token domain has rate exactly SAMPLE_PPM -> all docs kept
    full = con.execute(
        f"""
WITH g AS (SELECT lang, source, sum(len(string_split(text,' '))) AS t
           FROM documents GROUP BY lang, source),
m AS (SELECT lang, source FROM g WHERE t = (SELECT min(t) FROM g) LIMIT 1)
SELECT (SELECT count(*) FROM documents d JOIN m USING (lang, source)),
       (SELECT count(*) FROM ({TA_MIXTURE_SAMPLE_SQL}) s JOIN m USING (lang, source))
"""
    ).fetchone()
    assert full[0] == full[1] and full[0] > 0
    kept = con.execute(
        f"SELECT count(*) FROM ({TA_MIXTURE_SAMPLE_SQL})"
    ).fetchone()[0]
    assert 0 < kept < 500  # balanced sampling thins the big domains


def test_curate_v2_is_the_intersection():
    """v2 == curate ∩ non-repetitive ∩ sampled, strictly thinner than any
    single stage and non-empty on the fixture."""
    from kie_invoice_minimal_spark.operators.text_analysis import (
        TA_CURATE_SQL,
        TA_CURATE_V2_SQL,
        TA_MIXTURE_SAMPLE_SQL,
    )

    con = _con()
    v2 = {r[0] for r in con.execute(TA_CURATE_V2_SQL).fetchall()}
    cur = {r[0] for r in con.execute(TA_CURATE_SQL).fetchall()}
    samp = {r[0] for r in con.execute(TA_MIXTURE_SAMPLE_SQL).fetchall()}
    rep = {
        r[0]
        for r in con.execute(
            f"SELECT doc_id FROM ({TA_REPETITION_SQL}) WHERE NOT is_repetitive"
        ).fetchall()
    }
    assert v2 == cur & samp & rep
    assert 0 < len(v2) < len(cur)
