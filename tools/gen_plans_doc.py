"""Regenerate PLANS.md: formatted physical plans of representative queries
with the scale-relevant properties called out. Run:
``python tools/gen_plans_doc.py`` (uses sf0.1).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agol_pandas_spark.plans.explain import formatted_plan  # noqa: E402
from agol_pandas_spark.session import get_spark  # noqa: E402
from agol_pandas_spark.workload import load_all  # noqa: E402

NOTES = {
    "flagship_region_revenue": (
        "Star-schema join chain: the l_shipdate predicate is pushed into the "
        "parquet scan (PushedFilters), the scan reads 4 of 11 lineitem columns "
        "(ReadSchema), and every dimension joins as BroadcastHashJoin — zero "
        "shuffle joins before the final aggregation exchange."
    ),
    "sim_brute_force_topk": (
        "The probe set broadcasts (BroadcastNestedLoopJoin BuildLeft); the "
        "corpus is scanned once. WindowGroupLimit pushes the per-query top-k "
        "below the shuffle, so only k candidates per partition move."
    ),
    "dedup_minhash_lsh_pairs": (
        "Signatures come from an InMemoryTableScan (persisted — the LSH "
        "self-join reads them twice without re-hashing the corpus); the only "
        "corpus-sized shuffle carries (band_key, signature) rows, never text."
    ),
    "source_dynamic_partition_pruning": (
        "The fact scan carries a dynamicpruning subquery on event_type: "
        "partitions are pruned at runtime to the event types surviving the "
        "dim-side filter."
    ),
    "sim_pq_adc_topk": (
        "PQ ADC scan: the codebook and the per-query flattened LUT both "
        "broadcast; corpus vectors are scored from their 4-int codes by M "
        "array lookups inside codegen — zero SortMergeJoin, and "
        "WindowGroupLimit pushes the per-query top-k below the final window "
        "sort. The only corpus shuffles carry (id, m, d2, code) integers "
        "during encoding."
    ),
    "sim_ivfpq_topk": (
        "Full IVF-PQ: query probe cells join the coded corpus on the cell "
        "key (hash equi-join, no cartesian), so each query touches "
        "nprobe/cells of the corpus — and only its (id, cell, codes) "
        "columns, never raw vectors."
    ),
    "stats_ks_drift": (
        "Drift gate: the l_shipdate range filter reaches the parquet scan "
        "(PushedFilters) and only 3 of 11 columns are read; the cumulative "
        "windows run over the distinct-value histogram (first groupBy "
        "collapses the corpus), and the 11-row per-group max joins back as "
        "a BroadcastHashJoin to locate the argmax."
    ),
    "join_interval_overlap_windows": (
        "Grid-binned interval overlap: both sides explode into grid cells "
        "(Generate) and meet in a hash EQUI-join on (user_id, cell) — no "
        "BroadcastNestedLoopJoin / cartesian anywhere despite the non-equi "
        "overlap semantics; the emit-once predicate runs as a post-join "
        "codegen filter."
    ),
    "graph_common_neighbor_jaccard": (
        "Wedge self-join on the shared neighbor: the SimHash pair graph "
        "collapses to an edge list first, candidates form per shared "
        "neighbor (equi-join), and degree joins attach exact denominators "
        "— never an all-pairs product."
    ),
    "sim_ivf_int8_rerank_topk": (
        "IVF-SQ8+refine (r6): the int8 coarse scan meets the broadcast "
        "query-cell table in a BroadcastHashJoin ON THE CELL KEY — the "
        "flat SQ8 variant's corpus-wide cross join is gone; the only "
        "nested-loop is the |Q|×nprobe query-pivot scoring (model "
        "state). WindowGroupLimit pre-prunes both top-k windows."
    ),
    "join_asof_nearest_purchase": (
        "Nearest as-of (r6): both directional scans ride ONE Exchange on "
        "the join key — the backward cumulative max and forward "
        "cumulative min appear as two Window operators over the same "
        "partitioning (the second re-sorts within partitions, no second "
        "shuffle), and the |Δt| choice is a codegen projection."
    ),
    "text_substring_dup_spans": (
        "ExactSubstr census (r6): the tokenize→shingle→md5 map feeds one "
        "InMemoryTableScan read twice (dup-hash count, join-back) while "
        "the per-doc census base is a separate pure-map scan — the only "
        "corpus-scale shuffle is the gram-hash aggregation with map-side "
        "partial combine, and the span merge windows are partitioned BY "
        "DOCUMENT."
    ),
    "stats_skyline_suppliers": (
        "Distributed skyline (r6): the per-partition numpy frontier "
        "(ArrowEvalPython over mapInPandas) reduces the input before any "
        "join; the dominance check is a BroadcastNestedLoopJoin "
        "LeftAnti over the persisted CANDIDATE set only — the aggregated "
        "input never sees a cross join."
    ),
    "meta_table_changes_cdf": (
        "Snapshot-diff change feed: ONE null-safe full-outer key join of "
        "the two snapshots (a single exchange pair) and a per-row "
        "change-array Generate — no per-change-type re-scan of the join. "
        "Plan built over a PERSISTED catalog (the registry fixture "
        "checkpoints over a deleted tmpdir, which would collapse this to "
        "Scan ExistingRDD); pinned by tests/test_plans.py::"
        "test_table_changes_single_join_single_generate. At 100 TB the "
        "manifest shared-file pruning (not visible in the plan; it "
        "shrinks the scan's file list before planning) makes both scans "
        "proportional to the rewritten file set."
    ),
    "text_bpe_pair_merge": (
        "BPE iteration (r6): the word histogram is the only corpus-scale "
        "shuffle (partial_count before the exchange); pair counting, the "
        "1-row best-pair sort-limit, and the merge replace all run on "
        "the vocabulary — the best pair re-enters as a 1-row "
        "BroadcastNestedLoopJoin, which is model state, not data."
    ),
}


def _cdf_over_persisted_catalog(spark, sf: str):
    """meta_table_changes_cdf's exact fixture over a catalog that is NOT
    deleted before explain, so the documented plan shows the engine's
    real change-feed path (one full-outer join + one Generate) instead
    of the registry variant's checkpoint-collapsed Scan ExistingRDD."""
    import tempfile

    from pyspark.sql import functions as F

    from agol_pandas_spark.catalog import Catalog

    base = Catalog(spark, sf).table("orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    k = F.col("o_orderkey")
    v1 = base.where(k % 5 != 4).withColumn(
        "o_totalprice",
        F.when(k % 7 == 0, F.lit(0.0)).otherwise(F.col("o_totalprice")),
    )
    v2 = base.where(k % 5 != 0)
    root = tempfile.mkdtemp(prefix="plans_cdf_")
    _TEMP_DIRS.append(root)  # removed by main() after the plan is printed
    cat = Catalog(spark, root)
    cat.write(v1, "orders_cdf")
    cat.write(v2, "orders_cdf", mode="overwrite", keep_versions=1)
    return cat.table_changes("orders_cdf", from_version=1, key="o_orderkey")


# fixture dirs the builders stage; cleaned by main() after writing the doc
_TEMP_DIRS: list[str] = []

# plan built from an override instead of the registry fn (fixture-lifetime
# reasons documented on each builder)
BUILDERS = {
    "meta_table_changes_cdf": _cdf_over_persisted_catalog,
}


def tree_only(plan: str) -> str:
    """Keep the tree section, drop the per-node details."""
    lines = []
    for line in plan.splitlines():
        if re.match(r"^\(\d+\) ", line.strip()):
            break
        lines.append(line.rstrip())
    return "\n".join(lines).strip()


def main() -> None:
    spark = get_spark(app_name="plans-doc")
    reg = load_all()
    sf = "/root/testdata/sf0.1"
    out = [
        "# PLANS — physical plans of representative queries "
        "(auto-generated by tools/gen_plans_doc.py, sf0.1)",
        "",
        "These are the plans `tests/test_plans.py` pins. Node details are",
        "elided; ids vary run to run.",
    ]
    for name, note in NOTES.items():
        build = BUILDERS.get(name) or (lambda s, d, _n=name: reg[_n].fn(s, d))
        plan = tree_only(formatted_plan(build(spark, sf)))
        out += ["", f"## {name}", "", note, "", "```", plan, "```"]
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"
    )
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    import shutil

    for d in _TEMP_DIRS:
        shutil.rmtree(d, ignore_errors=True)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
