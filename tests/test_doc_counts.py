"""Docs must not drift from the registry (r2 verdict item 6: BASELINE.md
said 70/70 after ta_vocab_topk made it 71).  Counts in README/BASELINE and
the PLANS.md table row count are checked against len(queries())."""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402


def _read(name: str) -> str:
    with open(os.path.join(REPO, name)) as f:
        return f.read()


def test_baseline_md_count_matches_registry():
    n = len(entrymod.queries())
    assert f"{n}/{n} queries OK" in _read("BASELINE.md")


def test_readme_count_matches_registry():
    n = len(entrymod.queries())
    assert f"{n} `queries()` entries" in _read("README.md")


def test_plans_table_covers_every_registered_query():
    names = set(entrymod.queries())
    rows = {
        m.group(1)
        for m in re.finditer(r"^\| (\w+) \| \d+ \|", _read("PLANS.md"), re.M)
    }
    missing = names - rows
    assert not missing, f"PLANS.md table missing: {sorted(missing)}"


def test_oracle_registry_is_consistent():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    # every oracle refers to a registered query; only approx_stats may omit
    assert set(os_) <= set(qs)
    assert set(qs) - set(os_) == {"approx_stats"}
