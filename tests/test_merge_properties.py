"""Property-based merge-mode tests: for random source/target tables and
every mode, the engine's distributed merge must equal a trivial
pandas-dict reference implementation of the reference's server semantics
(src/agol_pandas.py:388-413 — by-key match, by-name column alignment).
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from agol_pandas_spark.operators.merge import merge

KEYS = st.integers(min_value=0, max_value=9)
VALS = st.integers(min_value=-100, max_value=100)


def rows_strategy(unique_keys: bool):
    pair = st.tuples(KEYS, VALS)
    if unique_keys:
        return st.lists(pair, min_size=0, max_size=8, unique_by=lambda t: t[0])
    return st.lists(pair, min_size=0, max_size=8)


def reference_merge(tgt: list, src: list, mode: str) -> list:
    """Driver-side oracle: dict-by-key semantics of the AGOL server merge."""
    if mode == "append":
        return tgt + src
    if mode == "overwrite":
        return src
    d = {k: v for k, v in tgt}
    if mode == "upsert":
        d.update(dict(src))
    elif mode == "update":
        d.update({k: v for k, v in src if k in d})
    elif mode == "insert":
        for k, v in src:
            d.setdefault(k, v)
    return sorted(d.items())


@given(
    tgt=rows_strategy(unique_keys=True),
    src=rows_strategy(unique_keys=True),
    mode=st.sampled_from(["append", "overwrite", "upsert", "update", "insert"]),
)
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_merge_modes_match_reference_semantics(spark, tgt, src, mode):
    if not src:
        return  # engine raises EmptyInputError by design; covered elsewhere
    schema = "k long, v long"
    tdf = spark.createDataFrame(pd.DataFrame(tgt, columns=["k", "v"]), schema) \
        if tgt else spark.createDataFrame([], schema)
    sdf = spark.createDataFrame(pd.DataFrame(src, columns=["k", "v"]), schema)
    got = merge(tdf, sdf, key="k", mode=mode)
    got_rows = sorted((r.k, r.v) for r in got.collect())
    want = sorted(reference_merge(tgt, src, mode))
    assert got_rows == want, f"mode={mode}"
