"""Physical-plan guards: the Spark-first claims, asserted mechanically.

- No row-at-a-time Python (BatchEvalPython) anywhere in any registered
  query's plan — the north rule's "no per-row Python".
- The flagship native extraction keeps its single-exchange shape.
- Scans prune columns: the mention path never reads the documents table's
  text-unrelated payload columns.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_no_row_at_a_time_python_anywhere(spark):
    """Two registry-wide invariants, checked in one pass over every
    registered query's plan/schema:

    - no BatchEvalPython (the north rule's "no per-row Python");
    - no ArrayType/MapType/StructType OUTPUT column — the driver's pandas
      canonicalizer factorizes every column and dies on complex cells
      (``unhashable type: 'list'``), which made r4's ta_doc_vectors the
      round's one driver-gate FAIL; serialize vectors/lists as
      deterministic strings (kg_export_neighbors.neighbors,
      ta_doc_vectors.v_str) or long-format rows instead."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    for name, fn in entrymod.queries().items():
        df = fn(spark, SF)
        plan = _plan(df)
        assert "BatchEvalPython" not in plan, f"{name} fell off the Arrow path"
        complex_cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        assert not complex_cols, (
            f"{name} returns non-scalar columns {complex_cols} — "
            "driver-uncertifiable (see r4 ta_doc_vectors)"
        )


def test_flagship_native_single_exchange(spark):
    """The flagship keeps exactly ONE data shuffle (the triple groupBy).
    A keyless RoundRobinPartitioning exchange is additionally allowed:
    that is sources/scan.spread_scan's adaptive scan fan-out, which only
    exists when the input file is too small for the scan to parallelize
    itself (r9) — on a real multi-split corpus it is absent, so the
    single-hash-exchange scale claim is unchanged."""
    plan = _plan(entrymod.queries()["kg_triples_native"](spark, SF))
    n_ex = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    n_spread = 1 if re.search(r"roundrobinpartitioning", plan, re.I) else 0
    assert n_ex - n_spread == 1, (
        f"flagship should have exactly one data shuffle (+ optional "
        f"adaptive spread), saw {n_ex} exchanges ({n_spread} round-robin)"
    )


def test_mention_scan_prunes_columns(spark):
    """The transcripts derivation needs only doc_id from documents —
    ReadSchema must not include text/lang/source payload columns."""
    plan = _plan(entrymod.queries()["kg_mentions"](spark, SF))
    m = re.search(r"ReadSchema: (struct<[^\n]*)", plan)
    assert m, plan
    schema = m.group(1)
    assert "doc_id" in schema
    for col in ("lang", "source", "n_chars"):
        assert col not in schema, f"unpruned column {col} in {schema}"


def test_a2a3_joins_on_user_and_bucket(spark):
    """The r3 de-quadratic rewrite must survive in the PHYSICAL plan: the
    self-join's equi-keys are (user_id, bucket), not user_id alone (which
    materializes O(n_u^2) pairs per hot user before the band filter)."""
    plan = _plan(entrymod.queries()["a2a3_message_pass"](spark, SF))
    m = re.search(r"Left keys \[\d+\]: \[([^\]]*)\]", plan)
    assert m, f"no equi-join keys found:\n{plan}"
    left_keys = m.group(1)
    assert "user_id" in left_keys and "bucket" in left_keys, left_keys


def test_contamination_has_no_forced_broadcast(spark):
    """dd_contamination must not pin a broadcast hint on the benchmark side
    (input-proportional on this fixture) — AQE decides from actual sizes.
    The pre-AQE physical plan therefore shows a shuffle join, not a
    planner-forced BroadcastHashJoin."""
    df = entrymod.queries()["dd_contamination"](spark, SF)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in optimized and "BROADCAST" not in optimized, (
        optimized[:500]
    )


def test_pagerank_has_no_single_partition_window(spark):
    """r5 verdict item 4: the final PageRank ranking must be the two-phase
    distributed rank — NO empty-partition window (whose WindowExec drags
    the whole entity table through one task) anywhere in the plan.  An
    empty partition spec prints as windowspecdefinition(<sort col> ASC/
    DESC ..., frame) — the first argument already carries a sort
    direction; a partitioned window leads with bare partition columns."""
    for name in (
        "kg_entity_pagerank",
        "kg_canonical_pagerank",
        # r6 graph additions: all their windows (the capped-surface top-N)
        # must stay conversation-partitioned
        "kg_degree_distribution",
        "kg_edge_lift",
        "kg_kcore",
        "kg_communities",
    ):
        plan = _plan(entrymod.queries()[name](spark, SF))
        hit = re.search(r"windowspecdefinition\([^,()]+ (?:ASC|DESC)", plan)
        assert not hit, f"{name} has a global-sort window: {hit.group(0)}"


def test_pack_heavy_window_is_bucket_partitioned(spark):
    """ta_pack_sequences' corpus-wide cumsum must stay a bucketed window —
    a bare Window.orderBy(doc_id) would drag the whole table through ONE
    task.  The per-doc window must carry a bkt partition spec; only the
    tiny per-bucket-aggregate window may be global."""
    plan = _plan(entrymod.queries()["ta_pack_sequences"](spark, SF))
    assert re.search(
        r"windowspecdefinition\(bkt#\d+L, doc_id#\d+L ASC", plan
    ), "per-doc cumsum lost its bucket partitioning:\n" + plan
