"""Guardrails for the driver correctness harness's fetch boundary.

Round-4 root cause (see workload/probe_queries.py): DuckDB widens
``SUM(<integer>)`` to HUGEINT and clients coerce HUGEINT (and sometimes
DECIMAL) to float64 on the Arrow/pandas fetch paths, so an oracle whose
RESULT schema contains those types hash-diverges from Spark's exact ints
under such a harness even when every value is equal. The registry-wide
invariant enforced here: no oracle may emit a HUGEINT/UHUGEINT/DECIMAL
result column (pin with ``CAST(... AS BIGINT)``, or ship >63-bit values
as VARCHAR the way ``agg_decimal128_exact_sum`` does).

These tests run DESCRIBE only — no Spark session, no query execution —
so the whole registry checks in seconds.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# r5 sentinel retired r6 (VERDICT r5 item 1): theory confirmed by
# CORRECTNESS_r05.json, so the bare probe's oracle is now cast like
# every other — nothing is exempt from the invariant anymore.
ALLOWED_SUSPECT: set[str] = set()

BANNED = ("HUGEINT", "UHUGEINT")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def test_no_hugeint_or_decimal_oracle_outputs(con):
    oracles = entry.oracle_sql()
    offenders: dict[str, list[str]] = {}
    for name, sql in sorted(oracles.items()):
        if name in ALLOWED_SUSPECT:
            continue
        types = con.execute("DESCRIBE " + sql).fetchall()
        bad = [
            c
            for c, t, *_ in types
            if t in BANNED or t.startswith("DECIMAL")
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracle result columns with harness-fragile DuckDB types "
        f"(pin with CAST ... AS BIGINT): {offenders}"
    )


def test_probe_sentinel_retired_to_bigint(con):
    """r6: the confirmed sentinel's oracle is cast to BIGINT so the
    driver artifact reads fully green (VERDICT r5 item 1)."""
    sql = entry.oracle_sql()["agg_probe_hugeint_bare"]
    types = {c: t for c, t, *_ in con.execute("DESCRIBE " + sql).fetchall()}
    assert types["s"] == "BIGINT"


def test_driver_window_contains_all_r4_reds_and_probes():
    """The driver checks the first 50 sorted names. The 11 r4-red rows
    must stay inside that window (VERDICT r4: 'do NOT rename or remove
    any red query') together with both probes, so CORRECTNESS_r05.json
    adjudicates the fix and the diagnosis in one artifact."""
    names = sorted(entry.queries())
    window = set(names[:50])
    reds = {
        "agg_decimal128_exact_sum",
        "agg_exact_percentiles",
        "agg_weighted_median_price",
        "agg_winsorized_revenue",
        "audit_rule_violations",
        "clean_impute_group_mean",
        "date_business_day_latency",
        "date_week_over_week_growth",
        "dedup_cross_source_matrix",
        "events_peak_concurrency",
        "events_rfm_segments",
    }
    probes = {"agg_probe_hugeint_bare", "agg_probe_hugeint_cast"}
    missing = (reds | probes) - window
    assert not missing, f"fell out of the driver's 50-name window: {missing}"
