"""Property-based merge-mode tests: for random source/target tables and
every mode, the engine's distributed merge must equal a trivial
pandas-dict reference implementation of the reference's server semantics
(src/agol_pandas.py:388-413 — by-key match, by-name column alignment).
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from agol_pandas_spark.operators.merge import merge

# Randomized property sweeps: slow tier (deterministic unit tests in
# test_merge.py / test_pruned_merge.py pin the same operators).
pytestmark = pytest.mark.slow

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


# -- as-of join vs pandas merge_asof (the reference implementation) ----------

ASOF_KEYS = st.integers(min_value=0, max_value=3)
ASOF_TS = st.integers(min_value=0, max_value=30)


@given(
    left=st.lists(st.tuples(ASOF_KEYS, ASOF_TS), min_size=1, max_size=10),
    right=st.lists(
        st.tuples(ASOF_KEYS, ASOF_TS), min_size=1, max_size=10,
        unique_by=lambda t: t,  # unique (key, ts): merge_asof tie rule differs
    ),
    direction=st.sampled_from(["backward", "forward", "nearest"]),
    tolerance=st.sampled_from([None, 3]),
)
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_join_matches_pandas_merge_asof(spark, left, right, direction, tolerance):
    from agol_pandas_spark.operators.joins import asof_join

    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k long, ts long, lid long"
    )
    rdf = spark.createDataFrame(
        [(k, t, float(100 * k + t)) for k, t in right], "k long, ts long, px double"
    )
    got = asof_join(
        ldf, rdf, on=["k"], left_ts="ts", right_ts="ts", right_cols=["px"],
        direction=direction,
        tolerance_seconds=float(tolerance) if tolerance is not None else None,
    )
    got_map = {r.lid: r.px for r in got.collect()}

    lpd = pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], columns=["k", "ts", "lid"]
    ).sort_values("ts", kind="stable")
    rpd = pd.DataFrame(
        [(k, t, float(100 * k + t)) for k, t in right], columns=["k", "ts", "px"]
    ).sort_values("ts", kind="stable")
    want_pd = pd.merge_asof(
        lpd, rpd, on="ts", by="k", direction=direction, tolerance=tolerance
    )
    want = {
        int(r.lid): (None if pd.isna(r.px) else float(r.px))
        for r in want_pd.itertuples()
    }
    assert got_map == want, f"direction={direction} tolerance={tolerance}"


# -- connected components vs union-find (pure-Python reference) --------------


def _union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    return {n: find(n) for n in parent}


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ).filter(lambda t: t[0] != t[1]),
        min_size=1,
        max_size=15,
    )
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_connected_components_match_union_find(spark, edges):
    from agol_pandas_spark.operators.dedup import connected_components

    edf = spark.createDataFrame(edges, "a long, b long")
    got = {r.node: r.component for r in connected_components(edf, "a", "b").collect()}
    want = _union_find_components(edges)
    # union-find roots aren't guaranteed minimal with path compression;
    # normalize both sides to min-node-per-component
    def normalize(m):
        groups = {}
        for node, root in m.items():
            groups.setdefault(root, set()).add(node)
        out = {}
        for members in groups.values():
            lo = min(members)
            for n in members:
                out[n] = lo
        return out

    assert normalize(got) == normalize(want)


# -- exact chunking vs direct slicing ----------------------------------------


@given(
    vals=st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=40),
    chunk_size=st.integers(min_value=1, max_value=7),
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_with_chunk_id_matches_slicing(spark, vals, chunk_size):
    from agol_pandas_spark.operators.chunking import with_chunk_id

    df = spark.createDataFrame([(v, i) for i, v in enumerate(vals)], "v long, uid long")
    out = with_chunk_id(df, chunk_size=chunk_size, keys=("v", "uid"))
    got = {r.uid: r.chunk_id for r in out.collect()}
    ordered = sorted(range(len(vals)), key=lambda i: (vals[i], i))
    want = {uid: pos // chunk_size for pos, uid in enumerate(ordered)}
    assert got == want


# ---- prefix-filtered Jaccard join: engine result == brute force, for ----
# ---- random corpora (the prefix-filter lemma exercised adversarially) ----

WORDS = ["aa", "bb", "cc", "dd", "ee", "ff"]  # tiny vocab forces overlaps
DOC = st.lists(st.sampled_from(WORDS), min_size=0, max_size=10).map(" ".join)


@given(texts=st.lists(DOC, min_size=1, max_size=6))
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_jaccard_prefix_join_equals_bruteforce(spark, texts):
    from agol_pandas_spark.operators.dedup import jaccard_prefix_pairs

    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def shingles(text):
        t = [w for w in text.split() if w]
        return {" ".join(t[i:i + 3]) for i in range(len(t) - 2)}

    want = {}
    for i, (ia, ta) in enumerate(docs):
        for ib, tb in docs[i + 1:]:
            A, B = shingles(ta), shingles(tb)
            inter = len(A & B)
            if inter and 2 * inter >= len(A | B):
                want[(ia, ib)] = inter
    got = {
        (r.id_a, r.id_b): r.n_inter
        for r in jaccard_prefix_pairs(df, "doc_id", "text").collect()
    }
    assert got == want


# ---- CDC apply-changes: random logs vs a dict reference ----

OPS = st.sampled_from(["U", "D", "I"])
CHG = st.tuples(KEYS, OPS, st.integers(min_value=0, max_value=5), VALS)


@given(
    tgt=rows_strategy(unique_keys=True),
    chg=st.lists(CHG, min_size=0, max_size=10),
)
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_apply_changes_equals_dict_reference(spark, tgt, chg):
    from agol_pandas_spark.operators.merge import apply_changes
    from agol_pandas_spark.errors import EmptyInputError

    tgt_df = spark.createDataFrame(tgt, "k long, v long") if tgt else \
        spark.createDataFrame([], "k long, v long")
    chg_df = spark.createDataFrame(chg, "k long, op string, seq long, v long") \
        if chg else spark.createDataFrame([], "k long, op string, seq long, v long")

    # reference: per key, winner = max seq; ties -> min (op, v) — the
    # operator's default remaining-columns-ascending tie-break
    winners = {}
    for k, op, seq, v in chg:
        cur = winners.get(k)
        cand = (seq, op, v)
        if cur is None or cand[0] > cur[0] or (
            cand[0] == cur[0] and (cand[1], cand[2]) < (cur[1], cur[2])
        ):
            winners[k] = cand
    expected = {k: v for k, v in tgt}
    for k, (seq, op, v) in winners.items():
        if op == "D":
            expected.pop(k, None)
        else:
            expected[k] = v

    got = {
        r.k: r.v
        for r in apply_changes(tgt_df, chg_df, key="k", seq_col="seq")
        .select("k", "v")
        .collect()
    }
    assert got == expected


# -- pruned copy-on-write merge ≡ full merge (random layouts and deltas) -----

PRUNE_KEYS = st.integers(min_value=0, max_value=99)


@given(
    tgt=st.lists(
        st.tuples(PRUNE_KEYS, VALS), min_size=1, max_size=30,
        unique_by=lambda t: t[0],
    ),
    src=st.lists(
        st.tuples(PRUNE_KEYS, VALS), min_size=1, max_size=10,
        unique_by=lambda t: t[0],
    ),
    mode=st.sampled_from(["upsert", "update", "insert", "delete"]),
    n_files=st.sampled_from([1, 3, 5]),
    range_layout=st.booleans(),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_pruned_merge_equals_full_merge(
    spark, tmp_path_factory, tgt, src, mode, n_files, range_layout
):
    """For ANY layout (range-clustered or hash-scattered), file count,
    key overlap, and keyed mode, the pruned copy-on-write path must be
    row-identical to the full join-rewrite merge — pruning is an
    IO optimization, never a semantics change."""
    from agol_pandas_spark.catalog import Catalog
    from agol_pandas_spark.operators.merge import merge_pruned

    root = tmp_path_factory.mktemp("prune_fuzz")
    cat = Catalog(spark, str(root))
    schema = "k long, v long"
    tdf = spark.createDataFrame(pd.DataFrame(tgt, columns=["k", "v"]), schema)
    layout = (
        tdf.repartitionByRange(n_files, "k").sortWithinPartitions("k")
        if range_layout
        else tdf.repartition(n_files)
    )
    cat.write(layout, "t", mode="error")
    sdf = spark.createDataFrame(pd.DataFrame(src, columns=["k", "v"]), schema)
    expected = sorted(
        map(tuple, merge(cat.table("t"), sdf, mode, "k").collect())
    )
    stats = merge_pruned(cat, sdf, "t", mode, "k")
    assert stats["pruned"] is True
    got = sorted(map(tuple, cat.table("t").collect()))
    assert got == expected, f"mode={mode} files={n_files} range={range_layout}"


@given(
    member=st.lists(st.integers(0, 10_000), min_size=1, max_size=60,
                    unique=True),
    probes=st.lists(st.integers(0, 10_000), min_size=1, max_size=120,
                    unique=True),
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bloom_reduce_never_drops_a_member(spark, member, probes):
    """Property: bloom_reduce keeps EVERY probe whose key is in the
    member set (no false negatives) — the invariant the exact join after
    the reduction relies on for correctness."""
    from agol_pandas_spark.operators.sketches import (
        bloom_as_map,
        bloom_build,
        bloom_reduce,
    )

    keys = spark.createDataFrame(
        pd.DataFrame({"k": [str(m) for m in member]}), "k string"
    )
    fact = spark.createDataFrame(
        pd.DataFrame({"fid": probes, "k": [str(p) for p in probes]}),
        "fid long, k string",
    )
    kept = {
        r.fid
        for r in bloom_reduce(fact, bloom_as_map(bloom_build(keys, "k")), "k")
        .collect()
    }
    assert set(member) & set(probes) <= kept


@given(
    vals=st.lists(
        st.one_of(st.none(), st.integers(-1000, 1000)),
        min_size=1,
        max_size=40,
    ),
    cut=st.integers(-500, 500),
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_check_constraints_count_matches_python_semantics(spark, vals, cut):
    """Property: enforce_checks' violation count equals the Python
    recompute under SQL CHECK semantics (NULL passes, only FALSE
    violates)."""
    from agol_pandas_spark.errors import ConstraintViolationError
    from agol_pandas_spark.operators.constraints import enforce_checks

    df = spark.createDataFrame(
        pd.DataFrame({"v": pd.array(vals, dtype="Int64")}), "v long"
    )
    expected = sum(1 for v in vals if v is not None and not (v >= cut))
    if expected == 0:
        assert enforce_checks(df, {"r": f"v >= {cut}"}) is df
    else:
        with pytest.raises(ConstraintViolationError) as ei:
            enforce_checks(df, {"r": f"v >= {cut}"})
        assert ei.value.counts == {"r": expected}
