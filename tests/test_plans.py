"""Physical-plan regression tests: the 100 TB posture depends on pushdown,
pruning, broadcast choices, and top-k pushdown actually landing in the
executed plan — assert on plan text so a refactor can't silently regress
them (results would still be correct, just catastrophically slower at
scale).
"""

from __future__ import annotations

import pytest

from agol_pandas_spark.plans.explain import (
    formatted_plan,
    pushed_filters,
    read_schema_columns,
    uses_broadcast_join,
)
from agol_pandas_spark.workload import load_all

REGISTRY = load_all()


@pytest.fixture(scope="module")
def q(spark, sf_dir):
    def build(name):
        return REGISTRY[name].fn(spark, sf_dir)

    return build


def test_flagship_pushdown_pruning_broadcast(q):
    df = q("flagship_region_revenue")
    # shipdate predicate must reach the parquet scan
    assert any("l_shipdate" in f for f in pushed_filters(df))
    # lineitem scan must read only the 4 needed of 11 columns
    li = next(s for s in read_schema_columns(df) if "l_orderkey" in s)
    assert set(li) == {"l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"}
    # every dim joins as broadcast — no shuffle joins in the star chain
    # (formatted plans print each node twice: tree + details section)
    plan = formatted_plan(df)
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan


def test_topk_uses_take_ordered(q):
    assert "TakeOrderedAndProject" in formatted_plan(q("top_revenue_orders"))


def test_brute_force_topk_shape(q):
    plan = formatted_plan(q("sim_brute_force_topk"))
    # probe side broadcast (tiny), corpus never shuffled before scoring
    assert "BroadcastNestedLoopJoin" in plan
    # per-partition top-k pushed below the shuffle (rank <= k group limit)
    assert "WindowGroupLimit" in plan


def test_filter_project_pushdown_query(q):
    df = q("filter_project_pushdown")
    assert pushed_filters(df), "no filters reached the scan"
    for cols in read_schema_columns(df):
        assert len(cols) <= 6, f"scan reads too many columns: {cols}"


def test_merge_upsert_no_cartesian(q):
    plan = formatted_plan(q("merge_upsert"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_band_join_broadcasts(q):
    # non-equi band join must broadcast the band table, not shuffle the fact
    plan = formatted_plan(q("join_range_price_bands"))
    assert "BroadcastNestedLoopJoin" in plan


def test_asof_single_shuffle(q):
    # union+window as-of: exactly one exchange on the key (plus AQE reads);
    # a join-based rewrite would add a second shuffle or an explosion
    plan = formatted_plan(q("join_asof_click_purchase"))
    n_exchanges = plan.count("+- Exchange") + plan.count(":- Exchange")
    assert n_exchanges <= 1, f"as-of join shuffles {n_exchanges}x"


def test_minhash_signatures_no_shuffle(q):
    # signature computation is a pure map stage — any exchange means a
    # regression in the barrier/window structure
    plan = formatted_plan(q("dedup_minhash_signatures"))
    assert "Exchange" not in plan


def test_broadcast_helper(q):
    assert uses_broadcast_join(q("flagship_region_revenue"))


def test_partitioned_scan_prunes(q):
    plan = formatted_plan(q("source_partitioned_pruning"))
    assert "PartitionFilters" in plan and "event_type" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]


def test_dynamic_partition_pruning(q):
    plan = formatted_plan(q("source_dynamic_partition_pruning"))
    assert "dynamicpruning" in plan.lower(), "no DPP subquery in the fact scan"


def test_chunk_lineage_has_no_global_window(q):
    """Round 1 numbered rows through a single-partition Window.orderBy —
    a one-task funnel at scale. The rewrite must keep Window out of the
    plan entirely (range shuffle + Arrow per-partition numbering)."""
    plan = formatted_plan(q("merge_chunk_lineage"))
    assert "Window" not in plan


def test_contamination_benchmark_side_broadcasts(q):
    """The eval-set side is tiny by construction — the shingle-hash join
    must broadcast it, never shuffle the corpus side."""
    plan = formatted_plan(q("text_benchmark_contamination"))
    assert "BroadcastHashJoin" in plan


def test_geo_topk_uses_take_ordered(q):
    assert "TakeOrderedAndProject" in formatted_plan(q("geo_nearest_to_origin"))


def test_bucketed_join_eliminates_input_shuffles(q):
    """bucketBy(8, key) + sortBy on both sides: the sort-merge join must
    consume buckets directly — at most one Exchange in the whole plan
    (the final groupBy), none feeding the join."""
    import re

    plan = formatted_plan(q("source_bucketed_colocated_join"))
    assert "SortMergeJoin" in plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 1


def test_quantize_int8_is_pure_map(q):
    """int8 quantization is a per-row transform — any Exchange in its plan
    means someone added an accidental shuffle to a map-only operator."""
    plan = formatted_plan(q("sim_quantize_int8"))
    assert "Exchange" not in plan


def test_pii_redaction_is_pure_map(q):
    plan = formatted_plan(q("text_pii_redaction"))
    assert "Exchange" not in plan


def test_line_dedup_has_no_global_window(q):
    """Line dedup's survivor window partitions by line hash (parallel);
    a Window with an empty partition spec would funnel the corpus through
    one task."""
    plan = formatted_plan(q("dedup_line_level"))
    assert "Window" in plan  # the hash-partitioned survivor row_number
    # single-partition global sorts appear as 'Sort [...], true, 0' after
    # an Exchange SinglePartition — none allowed
    assert "SinglePartition" not in plan


def test_funnel_pushes_stage_filters(q):
    """Each funnel stage filters event_type at the parquet scan — three
    slim scans beat one wide scan + three in-memory filters at 100 TB."""
    df = q("events_funnel_stages")
    assert any("event_type" in f for f in pushed_filters(df))


def test_token_sharding_has_no_global_window(q):
    """The running total must come from the two-phase partial-sum path,
    not a global Window.orderBy cumsum."""
    plan = formatted_plan(q("text_pack_token_shards"))
    assert "SinglePartition" not in plan


def test_grid_distance_join_is_equi_join(q):
    """The spatial join must run as a hash equi-join on grid cells — a
    CartesianProduct or BroadcastNestedLoopJoin means the grid blocking
    key was lost and the plan degraded to the quadratic join the oracle
    brute-forces."""
    plan = formatted_plan(q("geo_grid_distance_join"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_geo_knn_is_equi_join_with_group_limit(q):
    """The spatial kNN join rides the same grid blocking (equi-join on
    cells, never all-pairs) and its per-probe top-3 window must pre-prune
    below the shuffle (WindowGroupLimit)."""
    plan = formatted_plan(q("geo_knn_within_radius"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "WindowGroupLimit" in plan


def test_asof_nearest_single_shuffle(q):
    """Nearest as-of runs both directional scans over ONE key shuffle:
    exactly one Exchange in the plan (the union's key partitioning) and
    two Window operators over it — a second Exchange means the forward
    pass stopped reusing the backward pass's partitioning."""
    import re

    plan = formatted_plan(q("join_asof_nearest_purchase"))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 2


def test_ivf_int8_rerank_no_cartesian(q):
    """The IVF-composed int8 rerank exists precisely to REPLACE the flat
    SQ8 coarse scan's |corpus|×|Q| cross join with a cell EQUI-join
    (VERDICT r5 item 5): no CartesianProduct anywhere, the coarse stage
    a BroadcastHashJoin on cell, and the only nested-loop the tiny
    query×pivots multi-probe scoring (|Q|·nprobe rows of model state —
    the same shape the ivfpq pin tolerates)."""
    import re

    plan = formatted_plan(q("sim_ivf_int8_rerank_topk"))
    assert "CartesianProduct" not in plan
    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)) <= 1
    assert re.search(
        r"\(\d+\) BroadcastHashJoin\nLeft keys \[1\]: \[cell#", plan
    ), "coarse stage lost its cell equi-join"


def test_pq_adc_scan_has_no_sort_merge_join(q):
    """ADC scoring must stay broadcast-only up to the top-k window: a
    SortMergeJoin on the corpus side means the LUT/codebook stopped
    broadcasting and the scan-side shuffle returned."""
    plan = formatted_plan(q("sim_pq_adc_topk"))
    assert "SortMergeJoin" not in plan
    assert "BroadcastExchange" in plan
    assert "WindowGroupLimit" in plan  # top-k pushed below the full sort


def test_ivfpq_probe_is_equi_join_on_cell(q):
    """The IVF-PQ probe joins on the cell key — a nested-loop or
    cartesian plan means cell restriction was lost and every query scans
    the whole coded corpus."""
    plan = formatted_plan(q("sim_ivfpq_topk"))
    assert "CartesianProduct" not in plan


def test_int8_rerank_stays_broadcast(q):
    """Both stages of the int8-rerank ANN must avoid corpus shuffles: the
    coarse scan is a broadcast nested-loop of (tiny) quantized queries ×
    corpus, and the re-rank fetch joins the corpus against a BROADCAST
    candidate list — a SortMergeJoin means the |Q|·C candidate set (or
    the query side) started shuffling the corpus."""
    plan = formatted_plan(q("sim_int8_rerank_topk"))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan
    assert "WindowGroupLimit" in plan  # both top-k windows pre-prune


def test_lsh_index_probe_prunes_corpus_text(q, spark, sf_dir, tmp_path):
    """The index probe must hash only BATCH text: exactly one scan reads
    a ``text`` column (the batch); the corpus contributes only its
    persisted id+signature+band index table. (Built from the operators
    directly: the registered query localCheckpoints, which hides the
    plan.)"""
    from pyspark.sql import functions as F

    from agol_pandas_spark.catalog import Catalog
    from agol_pandas_spark.operators.dedup import probe_lsh_index, write_lsh_index

    docs = Catalog(spark, sf_dir).table("documents")
    cat = Catalog(spark, str(tmp_path / "idx"))
    write_lsh_index(cat, "lsh", docs.filter(F.col("source") != "src0"), "doc_id", "text")
    probe = probe_lsh_index(cat, "lsh", docs.filter(F.col("source") == "src0"), "doc_id", "text")
    text_scans = [s for s in read_schema_columns(probe) if "text" in s]
    assert len(text_scans) == 1, text_scans


def test_chunker_and_gopher_are_pure_map_stages(q):
    """Chunking and the rule filter are single map stages over the
    documents scan — any Exchange means a per-row operator regressed
    into a shuffle (at 100 TB that's the whole job cost)."""
    for name in ("text_chunk_token_windows", "text_gopher_rules_filter"):
        plan = formatted_plan(q(name))
        assert "Exchange" not in plan, name


def test_semantic_prune_joins_on_cell_only(q):
    """SemDeDup candidates come from a cell equi-join — a nested-loop or
    cartesian plan means the cell restriction was lost and every vector
    compares against the whole corpus."""
    plan = formatted_plan(q("dedup_semantic_prune"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_winnow_fingerprints_no_shuffle(q):
    # winnowing selection is per-document array math — a pure map stage;
    # any Exchange means the window-min fell back to a per-doc shuffle
    plan = formatted_plan(q("dedup_winnow_fingerprints"))
    assert "Exchange" not in plan


def test_key_skew_uses_take_ordered(q):
    # top-10 heavy hitters must be TakeOrderedAndProject over the key agg,
    # never a global sort or a window over all keys
    plan = formatted_plan(q("stats_key_skew"))
    assert "TakeOrderedAndProject" in plan


def test_mad_outliers_single_corpus_scan(q):
    # the value histogram feeds four branches through a persisted cache —
    # every downstream reference must read the cache (InMemoryTableScan),
    # so lineitem materializes once; scan reads only the two needed columns
    plan = formatted_plan(q("stats_mad_outliers"))
    assert "InMemoryTableScan" in plan
    cols = read_schema_columns(q("stats_mad_outliers"))
    assert all(set(c) <= {"l_returnflag", "l_extendedprice"} for c in cols)


def test_bm25_topk_take_ordered(q):
    plan = formatted_plan(q("text_bm25_topk"))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_survivorship_and_cdc_no_cartesian(q):
    for name in ("pipeline_dedup_survivorship", "merge_apply_cdc_log",
                 "join_scd2_point_in_time"):
        plan = formatted_plan(q(name))
        assert "CartesianProduct" not in plan, name


def test_label_centroids_partial_aggregation(q):
    # the groupBy must partial-aggregate map-side: the shuffle carries
    # (label, dim) partial sums, not the exploded corpus
    plan = formatted_plan(q("sim_label_centroids"))
    assert plan.count("HashAggregate") >= 4  # partial + final, tree+details


def test_ks_drift_pushdown_and_single_pass(q):
    """r11: the KS argmax is one more window over the SAME group
    partition the cumulative ECDF windows use — the histogram pipeline
    runs ONCE (the old shape broadcast-joined a per-group max back onto
    the diffs, duplicating the whole subtree: 3 scans)."""
    df = q("stats_ks_drift")
    plan = formatted_plan(df)
    # the year predicate reaches the parquet scan
    assert any("l_shipdate" in f for f in pushed_filters(df))
    # lineitem scan reads only the 3 needed of 11 columns
    li = next(s for s in read_schema_columns(df) if "l_extendedprice" in s)
    assert set(li) == {"l_discount", "l_extendedprice", "l_shipdate"}
    # single linear pass: one scan, no join of any kind
    assert len(read_schema_columns(df)) == 1
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


def test_common_neighbor_jaccard_no_cartesian(q):
    # wedge join and both degree joins are equi-joins — all-pairs would
    # show up as a cartesian/nested-loop product
    plan = formatted_plan(q("graph_common_neighbor_jaccard"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interval_overlap_join_is_equi_join(q):
    # the whole point of grid binning: the non-equi overlap must execute
    # as a hash equi-join on (key, cell), never a nested-loop product
    plan = formatted_plan(q("join_interval_overlap_windows"))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan)


def test_aqe_splits_skewed_join_partition(spark):
    """The session's AQE skew-join claim, executed: a planted heavy key
    (95% of the left side) under a forced sort-merge join must come out
    the other side as SortMergeJoin(skew=true) with a skewed
    AQEShuffleRead — the runtime mitigation the salted-join operator
    exists to complement. Asserted on the FINAL adaptive plan (the
    pre-execution plan never shows skew handling)."""
    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")

        left = spark.range(0, 2_000_000).select(
            F.when(F.col("id") < 1_900_000, F.lit(7)).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("payload_"), F.col("id")).alias("payload"),
        )
        right = spark.range(0, 5_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        j = left.join(right, "k")
        assert j.rdd.count() == 1_900_000  # heavy key matches k=7 only
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan
        assert "skewed" in plan  # AQEShuffleRead ... skewed
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_runtime_bloom_filter_prunes_probe_side(spark, sf_dir):
    """Runtime Bloom-filter join injection, executed: with a selective
    filter on the build side of a non-broadcast join, the optimizer must
    plant a bloom-filter subquery (might_contain) on the probe-side scan
    so most of the big side is discarded before the shuffle — the
    row-level complement to dynamic partition pruning at 100 TB."""
    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_totalprice") > 350000
        )
        j = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
            "l_orderkey", "l_extendedprice", "o_totalprice"
        )
        assert j.rdd.count() > 0
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)


# --- registry-wide single-partition-window ban (VERDICT r4 item 3) -----

# Global (unpartitioned) Windows funnel every row through one task — the
# canonical 100 TB stall. Every rank/ntile/row_number over an unbounded
# input now routes through operators/ranks.py (range-partitioned global
# positions). The ONLY global windows allowed are over inputs bounded by
# construction, each justified here:
GLOBAL_WINDOW_BOUNDED_OK = {
    # lag() over ONE ROW PER CALENDAR WEEK — input is bounded by the
    # date span (dozens of rows at any corpus size), produced by a
    # map-side-combined weekly aggregation.
    "date_week_over_week_growth",
    # row_number() over the top-10 rows AFTER TakeOrderedAndProject —
    # input is literally capped at 10 rows by the limit below it.
    "stats_key_skew",
}


def _global_windows(df):
    found = []

    def walk(node):
        if (
            node.getClass().getSimpleName() == "Window"
            and node.partitionSpec().isEmpty()
        ):
            found.append(node)
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().optimizedPlan())
    return found


@pytest.mark.slow
def test_no_unbounded_global_windows_in_registry(spark, sf_dir):
    """Build every registered query and reject any optimized plan with an
    unpartitioned Window outside the bounded whitelist above."""
    offenders = {}
    for name, query in sorted(REGISTRY.items()):
        if name in GLOBAL_WINDOW_BOUNDED_OK:
            continue
        df = query.fn(spark, sf_dir)
        wins = _global_windows(df)
        if wins:
            offenders[name] = len(wins)
    assert not offenders, (
        "unpartitioned Window over unbounded input (route through "
        f"operators/ranks.add_global_ranks): {offenders}"
    )


def test_whitelisted_global_windows_still_exist(spark, sf_dir):
    """If a whitelisted query stops using a global window, the whitelist
    entry is stale — fail so it gets pruned."""
    for name in sorted(GLOBAL_WINDOW_BOUNDED_OK):
        df = REGISTRY[name].fn(spark, sf_dir)
        assert _global_windows(df), f"{name} no longer has a global window"


def test_nondeterministic_kernels_evaluate_once(q):
    """Pin the §4.4 anti-duplication invariant (VERDICT r11 item 9): the
    expensive Arrow kernels are marked nondeterministic ONLY so Catalyst
    cannot clone them below inferred filters — each must appear exactly
    once in its consumer's physical plan. A Spark upgrade that changes
    the optimizer could silently reintroduce the double-eval (two
    ArrowEvalPython nodes scoring the whole corpus) or a refactor could
    drop the marking; either shows up here as a count change."""
    import re

    def nodes(plan, node_name):
        return len(re.findall(rf"\(\d+\) {node_name}\b", plan))

    # sim_ivfpq_topk: corpus assign+encode kernel once (named), and
    # exactly 3 ArrowEvalPython nodes total (corpus kernel, probe
    # multi-probe kernel, per-query LUT kernel)
    plan = formatted_plan(q("sim_ivfpq_topk"))
    assert plan.count("_cell_and_codes(") == 1, plan.count("_cell_and_codes(")
    assert nodes(plan, "ArrowEvalPython") == 3
    # gopher gate kernel: one ArrowEvalPython over the documents scan
    plan = formatted_plan(q("text_gopher_rules_filter"))
    assert nodes(plan, "ArrowEvalPython") == 1
    # fused gate+chunk+hash kernel: one MapInArrow, no ArrowEvalPython
    plan = formatted_plan(q("pipeline_chunk_dedup_stats"))
    assert nodes(plan, "MapInArrow") == 1
    assert nodes(plan, "ArrowEvalPython") == 0
    # simhash signature kernel: a pure map — one ArrowEvalPython
    plan = formatted_plan(q("dedup_simhash_band_pairs"))
    assert nodes(plan, "ArrowEvalPython") == 1


def test_q19_disjunctive_pushdown(q):
    """Q19's OR-of-ANDs must split per side and reach both scans: the
    quantity disjunction pushes to lineitem, the brand/size disjunction
    to part — losing either reads the full table at 100 TB."""
    fs = pushed_filters(q("filter_q19_disjunctive_revenue"))
    text = " ".join(fs)
    assert "l_quantity" in text and "Or(" in text
    assert "p_brand" in text and "p_size" in text


def test_q10_topk_and_broadcast_dims(q):
    plan = formatted_plan(q("top_q10_returned_customers"))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_q07_star_no_cartesian(q):
    plan = formatted_plan(q("join_q07_nation_volume"))
    assert plan.count("BroadcastHashJoin") >= 6  # tree + details, >=3 dims
    assert "CartesianProduct" not in plan


def test_ivfpq_index_probe_reads_no_corpus_vectors(q, spark, sf_dir, tmp_path):
    """The persisted-index probe must score from CODES alone: the scan of
    the encoded index table reads exactly (vec_id, cell, codes) — an
    'embedding' column there means the probe regressed into re-reading
    corpus vectors (the build-once/probe-many contract, VERDICT r6
    item 2). Query routing stays an equi-join on cell."""
    from pyspark.sql import functions as F

    from agol_pandas_spark.catalog import Catalog
    from agol_pandas_spark.operators.similarity import (
        pq_codebook_from_seeds,
        probe_ivfpq_index,
        write_ivfpq_index,
    )

    emb = Catalog(spark, sf_dir).table("embeddings")
    pivots = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("pivot_id"), "embedding"
    )
    cat = Catalog(spark, str(tmp_path / "vidx"))
    write_ivfpq_index(cat, "idx", emb, pivots,
                      pq_codebook_from_seeds(emb, "vec_id"),
                      corpus_id="vec_id", pivot_id="pivot_id")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    probe = probe_ivfpq_index(cat, "idx", queries, query_id="query_id")
    scans = read_schema_columns(probe)
    coded_scans = [s for s in scans if "codes" in s]
    assert coded_scans, scans
    for s in coded_scans:
        assert set(s) == {"vec_id", "cell", "codes"}, s
    plan = formatted_plan(probe)
    assert "CartesianProduct" not in plan


def test_budgeted_hard_negatives_score_codes_not_vectors(
    q, spark, sf_dir, tmp_path
):
    """The budgeted hard-negative path (VERDICT r9 item 6) must generate
    candidates from the persisted index's CODES with the other-label
    filter on the coded scan: the scan of the encoded table reads
    exactly (vec_id, cell, codes, label) — an 'embedding' column there
    means candidate generation regressed into vector math; corpus
    vectors may appear only in the pool-pruned exact rerank."""
    from pyspark.sql import functions as F

    from agol_pandas_spark.catalog import Catalog
    from agol_pandas_spark.operators.similarity import (
        hard_negative_topk_indexed,
        pq_codebook_from_seeds,
        write_ivfpq_index,
    )

    emb = Catalog(spark, sf_dir).table("embeddings")
    pivots = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("pivot_id"), "embedding"
    )
    cat = Catalog(spark, str(tmp_path / "hnidx"))
    write_ivfpq_index(
        cat, "idx", emb, pivots, pq_codebook_from_seeds(emb, "vec_id"),
        corpus_id="vec_id", pivot_id="pivot_id", payload_cols=("label",),
    )
    probes = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "label", "embedding"
    )
    out = hard_negative_topk_indexed(
        cat, "idx", probes, query_id="query_id", rerank_with=emb
    )
    scans = read_schema_columns(out)
    coded_scans = [s for s in scans if "codes" in s]
    assert coded_scans, scans
    for s in coded_scans:
        assert set(s) == {"vec_id", "cell", "codes", "label"}, s
    plan = formatted_plan(out)
    assert "CartesianProduct" not in plan


def test_esri_feature_serialization_is_map_only(q, spark, sf_dir):
    # the feature-build stage (SpatialFrame.to_esri_features) must be a
    # pure projection — zero exchanges; serializing a 100 TB corpus to
    # features costs no data movement
    from agol_pandas_spark.operators.spatial import SpatialFrame
    from agol_pandas_spark.workload.geo_queries import _customer_points

    feats = SpatialFrame.from_xy(_customer_points(spark, sf_dir)).to_esri_features()
    fplan = formatted_plan(feats)
    assert "Exchange" not in fplan
    assert "structstojson" in fplan.lower()  # the serializer is real
    # and the registry roundtrip must parse REAL strings: without its
    # checkpoint barrier Catalyst's OptimizeJsonExprs elides the
    # from_json(to_json(x)) pair, making the roundtrip vacuous — prove
    # the elision so the barrier's reason stays pinned
    from pyspark.sql import functions as F

    parsed = feats.select(
        F.from_json(
            "feature_json",
            "attributes struct<c_custkey: bigint, c_mktsegment: string>, "
            "geometry struct<x: double, y: double, "
            "spatialReference: struct<wkid: int>>",
        ).alias("f")
    )
    assert "jsontostructs" not in formatted_plan(parsed).lower()  # elided
    # the registry query keeps its agg shuffle only
    plan = formatted_plan(q("geo_esri_features_roundtrip"))
    assert plan.count("Exchange") <= 2  # tree + details of the one agg exchange
    assert "CartesianProduct" not in plan


def test_table_changes_single_join_single_generate(spark, tmp_path, sf_dir):
    """The CDF plan pin (VERDICT r7 "what's wrong" item 1): the registry
    query localCheckpoints its result because its fixture catalog is a
    deleted tmpdir, collapsing the documented plan to Scan ExistingRDD.
    This pin builds ``Catalog.table_changes`` over a PERSISTED catalog
    and proves the engine path itself: two snapshot scans feed exactly
    ONE null-safe full-outer key join and ONE Generate (the change-array
    explode) — no per-change-type re-scan, no cartesian. At 100 TB the
    feed costs one key shuffle of the (pruned) snapshots, period."""
    from pyspark.sql import functions as F

    from agol_pandas_spark.catalog import Catalog

    base = (
        Catalog(spark, sf_dir)
        .table("orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    k = F.col("o_orderkey")
    cat = Catalog(spark, str(tmp_path / "cdfcat"))
    cat.write(base.where(k % 5 != 4), "t")
    cat.write(base.where(k % 5 != 0), "t", mode="overwrite", keep_versions=1)
    ch = cat.table_changes("t", from_version=1, key="o_orderkey")
    plan = formatted_plan(ch)
    # exactly one join, and it is the full-outer key join (tree section;
    # formatted plans print each node again in the details section)
    assert plan.count("SortMergeJoin FullOuter") + plan.count(
        "ShuffledHashJoin FullOuter"
    ) >= 1
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert bad not in plan
    tree = plan.split("\n\n")[0]
    assert sum(tree.count(j) for j in ("Join", "join")) == 1, tree
    assert tree.count("Generate") == 1, tree
    assert tree.count("Scan parquet") == 2, tree
    # both snapshot scans read ONLY the table's columns (no extra pass)
    for cols in read_schema_columns(ch):
        assert set(cols) == {"o_orderkey", "o_orderstatus", "o_totalprice"}
