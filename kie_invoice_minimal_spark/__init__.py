"""kie_invoice_minimal_spark — a PySpark-native knowledge-graph construction engine.

A brand-new engine with the computational capabilities of the reference
``htrnguyen/KIE_invoice_minimal`` (an invoice key-information-extraction
pipeline: text detection -> OCR -> line merging -> spatial graph -> GatedGCN
node classification -> (document, label, text) triples), re-expressed as
idiomatic distributed Spark dataflow over multi-turn conversation transcripts
``(conv_id, turn_idx, role, text, tool, ts)``:

- turn-order reconstruction with window functions            (ref: backend_utils.py:95-121)
- batched mention detection + span typing in Arrow UDFs      (ref: text_detector.py:77-132, backend_utils.py:190-211)
- MinHash / token-ngram blocking for entity-link candidates  (ref: kie_utils.py:124-150 band pruning)
- GCN-style neighborhood scorer per Arrow batch              (ref: models/kie/gated_gcn.py:70-84)
- canonicalization via iterative connected components        (ref: craft_utils.py:77-79 lifted to corpus scale)
- (subj, pred, obj) triples partitioned by predicate and
  subject-hash with explicit skew salting                    (ref: kie_utils.py:314-340)

No code is ported from the reference; it defines WHAT is computed, this
package defines HOW on Spark.
"""

__version__ = "0.1.0"
