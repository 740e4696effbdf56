#!/usr/bin/env python
"""Physical-plan audit: print .explain('formatted') for the headline plans
and flag anti-patterns (missing pushdown, full-width scans, unexpected
exchanges, row-at-a-time Python).

Usage: python scripts/explain_audit.py [query_name ...]   (default: headline set)
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from kie_invoice_minimal_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
HEADLINE = [
    "kg_triples_native",
    "e3_minmax_normalize",
    "a5_group_standardize",
    "g3_nearest_neighbor",
    "e2_band_self_join",
    "dd_minhash_lsh_pairs",
    "ss_lsh_ann",
]


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit(name: str, plan: str) -> list[str]:
    flags = []
    n_exchange = len(re.findall(r"\bExchange\b", plan))
    n_arrow = len(re.findall(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", plan))
    if "BatchEvalPython" in plan:
        flags.append("ROW-AT-A-TIME PYTHON UDF (BatchEvalPython) — forbidden")
    if re.search(r"ReadSchema: struct<.{400,}", plan):
        flags.append("very wide scan — check column pruning")
    flags.append(f"exchanges={n_exchange} arrow_python_ops={n_arrow}")
    return flags


def table_row(name: str, plan: str) -> str:
    # count DETAIL-section nodes only ("(4) Exchange") — each physical node
    # appears twice in .explain('formatted') (tree + details), and the
    # PLANS.md convention is one count per node
    n_exchange = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    n_arrow = len(
        re.findall(
            r"^\(\d+\) (?:ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas)",
            plan,
            re.M,
        )
    )
    batch = "YES" if "BatchEvalPython" in plan else "no"
    pushed = "yes" if re.search(r"PushedFilters: \[[^\]]*(Is|Equal|Greater|Less|String)", plan) else "-"
    return f"| {name} | {n_exchange} | {n_arrow} | {batch} | {pushed} |"


def main() -> None:
    args = sys.argv[1:]
    spark = get_spark(app_name="explain-audit", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    if args and args[0] == "--table":
        # regenerate the PLANS.md table body over EVERY registered query
        print("| query | exchanges | arrow python ops | BatchEvalPython | non-trivial PushedFilters |")
        print("|---|---|---|---|---|")
        for name, fn in qs.items():
            print(table_row(name, plan_of(fn(spark, SF_DIR))), flush=True)
        return
    names = args or HEADLINE
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = plan_of(df)
        print(f"\n{'=' * 70}\n## {name}")
        for fl in audit(name, plan):
            print(f"  [{fl}]")
        print(plan)


if __name__ == "__main__":
    main()
