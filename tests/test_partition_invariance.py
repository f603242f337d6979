"""Partition-count invariance: the engine's determinism contract says the
answer must not depend on physical parallelism (scaled-int aggregation,
deterministic tie-breaks). Re-run representative queries under a very
different shuffle-partition count and require byte-identical rowsets —
this is the local stand-in for "same answer on a 1000-executor cluster".
"""

from __future__ import annotations

import pytest

from agol_pandas_spark.workload import load_all

REGISTRY = load_all()

# one query per risk family: float agg, window tie-break, LSH self-join,
# iterative fixpoint, as-of ordering
QUERIES = [
    "pricing_summary",
    "window_topk_orders_per_segment",
    "dedup_minhash_lsh_pairs",
    "dedup_connected_components",
    "join_asof_click_purchase",
    # rows-only (approximate/iterative) entries: no oracle checks values,
    # so partition-invariance is their only determinism guarantee — the
    # driver's cross-run comparisons depend on it
    "agg_approx_distinct_parts",
    "agg_hll_sketch_union",
    "sim_ivf_topk_ann",
    "sim_kmeans_ivf_cells",
    # round-4 training-pipeline ops: per-row map stages must be trivially
    # invariant; semantic prune's cell equi-join + greedy drop must not
    # depend on which partition a pair lands in
    "text_gopher_rules_filter",
    "text_chunk_token_windows",
    "dedup_semantic_prune",
    # this session's additions: prefix-filter candidate join (frequency
    # order must not depend on layout), winnowing window-min, CDC
    # last-writer-wins, equi-depth global rank buckets
    "dedup_jaccard_prefix_pairs",
    "dedup_winnow_shared_pairs",
    "merge_apply_cdc_log",
    "stats_equidepth_histogram",
    # drift family: cumulative-window numerators and the wedge self-join
    # must not depend on physical layout
    "stats_ks_drift",
    "stats_chi2_priority_drift",
    "text_drift_token_tv",
    "graph_common_neighbor_jaccard",
    "join_interval_overlap_windows",
    # sweep-line: prefix sums over tied boundary rows — the peer-order
    # argument (equal deltas among peers) must make the OUTPUT invariant
    "events_peak_concurrency",
]


def _rowset(df):
    cols = sorted(df.columns)
    return sorted(tuple(repr(r[c]) for c in cols) for r in df.collect())


@pytest.mark.slow
@pytest.mark.parametrize("name", QUERIES)
def test_result_invariant_to_shuffle_partitions(spark, sf_dir, name):
    fn = REGISTRY[name].fn
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        low = _rowset(fn(spark, sf_dir))
        spark.conf.set("spark.sql.shuffle.partitions", "64")
        high = _rowset(fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert low == high, f"{name} changed results with partition count"


def test_join_strategy_invariance(spark, sf_dir):
    """flagship joins broadcast locally (dims under the threshold) but
    become sort-merge at cluster scale — results must be identical, and
    the plan must actually flip so we know both paths are exercised."""
    from agol_pandas_spark.plans.explain import formatted_plan

    fn = REGISTRY["flagship_region_revenue"].fn
    orig = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        bcast = _rowset(fn(spark, sf_dir))
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = fn(spark, sf_dir)
        assert "SortMergeJoin" in formatted_plan(df)
        smj = _rowset(df)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", orig)
    assert bcast == smj
