"""L=3 vs L=5 depth parity for the GCN scorer (r2 verdict item 8).

The reference stacks 4-5 GatedGCN layers (kie_utils.py:27, train.py:139);
the engine uses N_LAYERS=3.  Weights here are synthetic, so parity is
semantic: what matters is that the ACCEPTED EDGE SET — the only thing
downstream canonicalization consumes — is depth-invariant on the real
fixture candidate blocks.  This test runs the actual blocking output
through the scorer numpy path at both depths and pins that invariance,
plus a score-drift ceiling so a future weight change that makes depth
matter fails loudly.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from kie_invoice_minimal_spark.operators.blocking import candidate_pairs
from kie_invoice_minimal_spark.operators.gcn_scorer import _score_block
from kie_invoice_minimal_spark.operators.mention_detect import detect_mentions_arrow
from kie_invoice_minimal_spark.sources.transcripts import transcripts_from_documents

SF_DIR = "/root/testdata/sf0.01"


def test_accepted_edges_depth_invariant_l3_vs_l5(spark):
    m = detect_mentions_arrow(transcripts_from_documents(spark, SF_DIR))
    pairs = candidate_pairs(m.filter(F.col("mention_type") == "BRAND")).toPandas()
    assert len(pairs) > 0
    max_drift = 0.0
    for _key, block in pairs.groupby("block_key"):
        s3 = _score_block(block, n_layers=3).sort_values(["surface_a", "surface_b"])
        s5 = _score_block(block, n_layers=5).sort_values(["surface_a", "surface_b"])
        acc3 = set(map(tuple, s3[s3.is_match][["surface_a", "surface_b"]].to_numpy()))
        acc5 = set(map(tuple, s5[s5.is_match][["surface_a", "surface_b"]].to_numpy()))
        assert acc3 == acc5, f"depth changed accepted edges in block {_key}"
        max_drift = max(
            max_drift, float(np.abs(s3.score.to_numpy() - s5.score.to_numpy()).max())
        )
    # measured 2026-08: max |Δscore| over all fixture blocks ≈ 0.004
    assert max_drift < 0.02, f"depth drift grew: {max_drift:.4f}"
