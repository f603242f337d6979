"""Registry ↔ sweep-artifact sync gate (VERDICT r5 item 3).

Round 5 shipped full-registry sweep artifacts that were stale by two
queries — green everywhere, but the artifact no longer described the
registry it claimed to. This gate makes that staleness impossible: the
NEWEST ``CORRECTNESS_local_r*.json`` (and its ``_sf01`` sibling, when
present for the same round) must carry exactly the registry's key set.
Regenerate with ``python tools/local_correctness.py <round>`` after any
registry change.
"""

from __future__ import annotations

import glob
import json
import os
import re

from agol_pandas_spark.workload import load_all

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_round() -> int:
    rounds = [
        int(m.group(1))
        for f in glob.glob(os.path.join(ROOT, "CORRECTNESS_local_r*.json"))
        if (m := re.search(r"CORRECTNESS_local_r(\d+)(?:_sf01)?\.json$", f))
    ]
    assert rounds, "no CORRECTNESS_local_r*.json artifact found"
    return max(rounds)


def _check(path: str) -> None:
    artifact = set(json.load(open(path)))
    registry = set(load_all())
    missing = sorted(registry - artifact)
    extra = sorted(artifact - registry)
    assert not missing and not extra, (
        f"{os.path.basename(path)} out of sync with the registry — "
        f"rerun tools/local_correctness.py; missing from artifact: "
        f"{missing}; no longer registered: {extra}"
    )


def test_latest_sweep_artifact_matches_registry():
    rnd = _latest_round()
    _check(os.path.join(ROOT, f"CORRECTNESS_local_r{rnd:02d}.json"))


def test_latest_sf01_sweep_artifact_matches_registry_when_present():
    rnd = _latest_round()
    p = os.path.join(ROOT, f"CORRECTNESS_local_r{rnd:02d}_sf01.json")
    if not os.path.exists(p):
        # an sf0.1 sweep is optional per round; the sf0.01 gate above is
        # the hard one
        return
    _check(p)
