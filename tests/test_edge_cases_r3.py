"""Round-3 edge regressions.

ta_fingerprint crashed on 1-2-token documents: Spark's sequence(1, 0)
generates a DESCENDING [1, 0] (unlike DuckDB's empty range(1, 1)) and
slice(toks, 0, 3) throws on start=0; separately, DuckDB's
array_to_string([]) is NULL (not ''), so the twin emitted a NULL
fingerprint where Spark hashes ''.  Both dialects now emit the
empty-shingle-set fingerprint for short docs — pinned here.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd

from kie_invoice_minimal_spark.operators.text_analysis import (
    TA_FINGERPRINT_SQL,
    ta_fingerprint,
)


def test_fingerprint_short_docs_match_twin(spark, tmp_path):
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["one", "two words", "a b c", ""],
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": [3, 9, 5, 0],
        }
    )
    out = os.path.join(str(tmp_path), "documents.parquet")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(out)
    got = {
        r.doc_id: (r.text_fp, r.shingle_fp)
        for r in ta_fingerprint(spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{out}/*.parquet'")
    want = {r[0]: (r[1], r[2]) for r in con.execute(TA_FINGERPRINT_SQL).fetchall()}
    assert got == want
    # 0-, 1- and 2-token docs share the empty shingle set -> same shingle_fp
    assert got[0][1] == got[1][1] == got[3][1]
    assert got[2][1] != got[0][1]  # a real 3-gram differs from empty


def test_new_curation_ops_on_empty_documents(spark, tmp_path):
    """Empty corpus in -> empty (not crashed) out, for every round-3
    curation operator — the repo's standard degenerate-input probe."""
    from kie_invoice_minimal_spark.operators.text_analysis import (
        ta_mixture_sample,
        ta_mixture_weights,
        ta_pack_sequences,
        ta_repetition_filter,
    )

    out = os.path.join(str(tmp_path), "documents.parquet")
    spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(out)
    for fn in (
        ta_repetition_filter,
        ta_pack_sequences,
        ta_mixture_weights,
        ta_mixture_sample,
    ):
        assert fn(spark, str(tmp_path)).count() == 0, fn.__name__
