#!/usr/bin/env python
"""Benchmark runner — prints ONE JSON line for the driver.

Times every ``__spark_entry__.queries()`` entry at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]``, plus the
flagship KG pipeline over a synthesized transcripts table sized to the SF
(the documents table stays small across SFs, so the pipeline is benched on
synth turns: sf0.1 -> 600k turns).  Results are materialized to the noop
sink so we measure engine work, not driver collect.

Output: {"metric": "...", "value": total_sec, "unit": "sec",
         "queries": {name: sec, ...}, "sf": ..., "turns_per_sec": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from kie_invoice_minimal_spark.plans.pipeline import extract_triples_df  # noqa: E402
from kie_invoice_minimal_spark.session import get_spark  # noqa: E402
from kie_invoice_minimal_spark.sources.transcripts import synth_transcripts  # noqa: E402

SF_TURNS = {"0.001": 6_000, "0.01": 60_000, "0.1": 600_000}
BENCH_REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))


def _sf_of(sf_dir: str) -> str:
    base = os.path.basename(sf_dir.rstrip("/"))
    return base[2:] if base.startswith("sf") else base


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_of(sf_dir)
    n_turns = SF_TURNS.get(sf, 60_000)

    spark = get_spark(
        app_name="kie-kg-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 32),
    )
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    # Flagship: synth transcripts -> triples (arrow + native engines).
    # Warmup (codegen + python workers) then min-of-2 steady-state timing.
    transcripts = synth_transcripts(spark, n_turns).persist()
    n_actual = transcripts.count()  # materialize input outside the timing
    for eng in ("arrow", "native"):  # warm BOTH engines (workers + codegen)
        _materialize(extract_triples_df(synth_transcripts(spark, 20_000), engine=eng))
    for eng in ("arrow", "native"):
        walls = []
        for _ in range(BENCH_REPEATS):
            t0 = time.time()
            _materialize(extract_triples_df(transcripts, engine=eng))
            walls.append(time.time() - t0)
        timings[f"kg_pipeline_{eng}"] = round(min(walls), 3)
    turns_per_sec = round(n_actual / timings["kg_pipeline_arrow"], 1)
    transcripts.unpersist()

    # Operator library at sf_dir — min-of-k per query with k RECORDED in
    # the output (r4 verdict item 6: the +7.1% round-over-round "regression"
    # was a slow-window artifact of single-draw timings on a host with ±15%
    # drift; min-of-k measures the plan, not the neighbor's noise).  Each
    # repeat builds a FRESH DataFrame via fn(), so repeats get new shuffle
    # IDs and cannot reuse the previous repeat's map-stage shuffle files
    # (the r4 methodology correction applies to same-DataFrame repeats).
    for name, fn in entrymod.queries().items():
        walls = []
        for _ in range(BENCH_REPEATS):
            t0 = time.time()
            _materialize(fn(spark, sf_dir))
            walls.append(time.time() - t0)
        timings[name] = round(min(walls), 3)

    total = round(sum(timings.values()), 3)
    # Full per-query timings go to a sidecar file: the full per-query JSON
    # line outgrew the driver's tail capture in r02 ("parsed": null), so
    # stdout's LAST line is a compact summary the driver can always parse,
    # pointing at the sidecar for the full breakdown.
    sidecar = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_QUERIES.json")
    full = {
        "metric": "kg_pipeline_and_operator_suite_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_turns": n_actual,
        "turns_per_sec": turns_per_sec,
        "repeats": BENCH_REPEATS,  # per-query timings are min-of-k, k here
    }
    with open(sidecar, "w") as f:
        json.dump(full, f, indent=1)
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:5])
    print(
        json.dumps(
            {
                "metric": "kg_pipeline_and_operator_suite_runtime",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "n_turns": n_actual,
                "turns_per_sec": turns_per_sec,
                "queries": {
                    "kg_pipeline_arrow": timings["kg_pipeline_arrow"],
                    "kg_pipeline_native": timings["kg_pipeline_native"],
                    **slowest,
                },
                "n_queries": len(timings),
                "repeats": BENCH_REPEATS,
                "queries_file": "BENCH_QUERIES.json",
            }
        )
    )


if __name__ == "__main__":
    main()
