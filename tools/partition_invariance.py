"""Artifact-level partition invariance for the r4 driver-red queries.

VERDICT r4 item 5: run each of the 11 formerly-red queries (plus the two
r5 harness probes) under local[32] AND ``spark.sql.shuffle.partitions``
∈ {1, 7, 200}, and assert the driver's canonical value hash is identical
across all three configurations — partition-count invariance at the
artifact level, complementing tests/test_partition_invariance.py's
per-operator checks. The distributed rank rewrites (operators/ranks.py)
make several of these queries sensitive-by-construction to range
boundaries, so this is the direct falsifier for any offset bug.

Usage: ``python tools/partition_invariance.py``. Prints one line per
query with PASS/FAIL; exits nonzero on any FAIL. The result is recorded
in COVERAGE.md (round-5 section).
"""

from __future__ import annotations

import hashlib
import os
import sys

QUERIES = [
    "window_max_drawdown_daily",
    "sample_ab_srm_check",
    "text_code_prose_gate",
    "stats_dunn_posthoc_pairs",
    "stats_kruskal_wallis_h",
    "stats_friedman_blocked_ranks",
    "stats_runs_test_randomness",
    "udf_ewma_integer_recurrence",
    "join_attribution_linear_touch",
    "stats_fano_burstiness",
    "window_running_distinct_users",
    "stats_seasonal_additive_decompose",
    "sim_centroid_shift_drift",
    "stats_lincoln_petersen_estimate",
    "feature_linear_scoring_ppm",
    "feature_loo_target_encoding",
    "graph_degree_assortativity",
    "join_allen_interval_relations",
    "privacy_l_diversity_gate",
    "sketch_heavy_hitters_mg",
    "stats_hellinger_drift",
    "stats_levene_brown_forsythe",
    "stats_skewness_kurtosis_grouped",
    "stats_wilson_interval",
    "agg_decimal128_exact_sum",
    "agg_exact_percentiles",
    "agg_probe_hugeint_bare",
    "agg_probe_hugeint_cast",
    "agg_weighted_median_price",
    "agg_winsorized_revenue",
    "audit_rule_violations",
    "clean_impute_group_mean",
    "date_business_day_latency",
    "date_week_over_week_growth",
    "dedup_cross_source_matrix",
    "events_peak_concurrency",
    "events_rfm_segments",
    # r5 additions with their own partition-sensitive machinery
    "merge_zorder_optimize",
    "mm_shard_by_bytes",
    "sample_weighted_bottomk",
    # r5 distributed-rank rewrites outside the r4 red set
    "window_rank_dense_rank",
    "window_ntile_price_quartiles",
    "window_percent_rank_cume_dist",
    "stats_equidepth_histogram",
    "text_token_rank_quality",
    "sample_systematic_every_nth",
    "geo_zorder_chunk_locality",
    # r6 additions: pruned copy-on-write merge (file-count-sensitive by
    # construction), nearest as-of (dual-window choice), IVF-int8 rerank
    # (cell equi-join + two windows), real-BMP decode (mapInPandas)
    "merge_pruned_upsert",
    "join_asof_nearest_purchase",
    "sim_ivf_int8_rerank_topk",
    "mm_decode_real_bmp",
    # r6 late additions: skipping-index scan (file-layout sensitive),
    # streaming pruned CDC (single-drain deterministic)
    "source_skipping_index_scan",
    "stream_pruned_cdc_upsert",
    # r6 geo/text additions
    "geo_knn_within_radius",
    "geo_point_in_concave_polygon",
    "text_url_canonical_dedup",
    # r6 session-2 additions: partition-sensitive by construction —
    # skyline's local-frontier stage, the rank-riding normalizations,
    # the gaps-and-islands span merge, BPE's 1-row best-pair broadcast,
    # the mtime-ordered streaming drain
    "stats_skyline_suppliers",
    "stats_quantile_normalize",
    "stats_gini_concentration",
    "stats_cusum_changepoint",
    "text_substring_dup_spans",
    "text_bpe_pair_merge",
    "feature_target_encoding",
    "sim_matryoshka_rerank_topk",
    "source_csv_malformed_quarantine",
    "stream_watermark_late_routing",
    "merge_surrogate_keys",
    "pipeline_feature_matrix",
    # r7 additions: declared-key upsert (merge through the metadata
    # sidecar), persisted IVF-PQ probe (cell equi-join over stored
    # codes), connector limit (page-partition planning must not change
    # the first-N slice), capped simhash banding machinery
    "meta_declared_key_upsert",
    "sim_ivfpq_index_probe",
    "source_paged_limit_count",
    # r8 additions: CDF tail (spool file layout and micro-batch split
    # must not change the maintained summary), auth'd paged read (token
    # deaths interleave differently per partitioning)
    "stream_cdf_tail_summary",
    "source_paged_token_refresh",
    # r9 additions: the composed paged-CDC → pruned-merge → CDF-tail →
    # IVM pipeline (page windows, dirty-file sets, spool batching, and
    # delta application all shift with partitioning; the dashboard must
    # not), and the schema-evolved aligned diff (shared-projection
    # comparison across differently-partitioned snapshots)
    "pipeline_paged_cdc_ivm",
    "meta_table_changes_aligned",
    # r10 additions: both join-view IVM maintainers (touched-key
    # anti-joins, semi-joined fact slices, and CDF feeds all shift with
    # partitioning; the maintained view must not), the budgeted
    # hard-negative path (cell routing + ADC pool + exact rerank), and
    # the server-side statistics pushdown (grouped response vs Spark
    # fallback must agree under any layout)
    "pipeline_join_view_ivm",
    "pipeline_join_view_bilateral_ivm",
    "sim_hard_negative_budgeted",
    "source_paged_stats_pushdown",
    "pipeline_join_view_tailed",
    "stats_auc_mann_whitney",
    "text_substring_dup_removal",
    "join_bloom_semi_reduction",
    "mining_association_rules",
    "profile_functional_deps",
    "link_fellegi_sunter_weights",
    "stats_welch_t2_one_vs_rest",
    "stats_poisson_bootstrap_ci",
    "merge_incremental_join_view",
    "subquery_q21_waiting_suppliers",
    "merge_write_audit_publish",
    "join_q07_nation_volume",
    "filter_q19_disjunctive_revenue",
    "top_q10_returned_customers",
    "sim_hard_negative_mining",
    "stats_spearman_rank_corr",
    "graph_kcore_boilerplate",
    "subquery_q20_excess_share_suppliers",
    "join_q02_min_unit_price_supplier",
    "graph_resource_allocation_links",
    "privacy_t_closeness_audit",
    "feature_hashing_trick_vectorize",
    "stats_kendall_tau_b",
    "text_inverted_index_search",
    "sim_mmr_diversified_topk",
    "graph_hits_hubs_authorities",
    "link_entity_resolution_clusters",
    "sample_temperature_domain_mix",
    "text_bpe_learned_merges",
    "window_capped_session_stats",
    "sim_hybrid_rrf_fusion",
    "merge_selective_compaction",
    "pipeline_lsh_index_append",
    "merge_rendezvous_rebalance",
    "window_funnel_regex_match",
    "text_kneser_ney_bigram_ppm",
    "stats_mann_kendall_seasonal",
    "merge_tag_pinned_snapshot",
    "stats_isotonic_calibration",
    "stats_cramers_v_association",
    "stats_cohens_kappa_ppm",
    "sample_neyman_allocation",
    "stats_theil_sen_slope",
    "join_null_safe_region_match",
    # r7 session-2 additions: distributed wire writes — batch
    # composition changes with input partitioning, so upsert
    # convergence and geometry roundtrip must not depend on it
    "sink_paged_applyedits_upsert",
    "geo_wire_layer_envelope",
    # snapshot-diff CDF: full-outer key join + explode over two
    # materialized table versions; the IVM query stacks a second
    # full-outer merge on top
    "meta_table_changes_cdf",
    "pipeline_cdf_summary_maintenance",
]

PARTITIONS = (1, 7, 200)


def canonical_hash(rows, cols) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if v is None:
            return "<NULL>"
        if isinstance(v, float):
            return repr(v)
        return str(v)

    canon = sorted(tuple(cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for row in canon:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF01_DIR", "/root/testdata/sf0.01")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("partition-invariance")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry

    queries = entry.queries()
    failures = 0
    for name in QUERIES:
        hashes = {}
        for p in PARTITIONS:
            spark.conf.set("spark.sql.shuffle.partitions", str(p))
            from agol_pandas_spark.session import release_session_blocks

            release_session_blocks(spark)
            df = queries[name](spark, sf_dir)
            hashes[p] = canonical_hash(df.collect(), df.columns)
        ok = len(set(hashes.values())) == 1
        failures += not ok
        print(("PASS" if ok else "FAIL"), name, "" if ok else hashes, flush=True)
    spark.stop()
    print(f"{len(QUERIES) - failures}/{len(QUERIES)} partition-invariant")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
