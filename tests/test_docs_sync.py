"""Docs must not drift from the registry: every query name appears in
QUERIES.md (auto-generated) and COVERAGE.md (hand-maintained map), and the
stated counts match reality.
"""

from __future__ import annotations

import os
import re

from agol_pandas_spark.workload import load_all

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REGISTRY = load_all()


def test_queries_md_lists_every_query():
    text = open(os.path.join(ROOT, "QUERIES.md")).read()
    missing = [n for n in REGISTRY if f"`{n}`" not in text]
    assert not missing, f"run tools/gen_query_index.py; missing: {missing}"


def test_coverage_md_lists_every_query():
    text = open(os.path.join(ROOT, "COVERAGE.md")).read()
    missing = [n for n in REGISTRY if f"`{n}`" not in text]
    assert not missing, f"COVERAGE.md missing queries: {missing}"


def test_coverage_md_counts_match():
    text = open(os.path.join(ROOT, "COVERAGE.md")).read()
    m = re.search(r"Registry count: (\d+) queries, (\d+) with full value-hash", text)
    assert m, "COVERAGE.md lost its registry-count line"
    n_oracle = sum(1 for q in REGISTRY.values() if q.oracle)
    assert (int(m.group(1)), int(m.group(2))) == (len(REGISTRY), n_oracle), (
        f"COVERAGE.md says {m.groups()}, registry has "
        f"({len(REGISTRY)}, {n_oracle})"
    )
