"""Emit a driver-schema correctness artifact for EVERY registered query.

The driver's per-round CORRECTNESS file caps at the first 50 query names
alphabetically; this tool runs the identical Spark-vs-DuckDB comparison
for the full registry at sf0.01 and writes ``CORRECTNESS_local_r{N}.json``
in the driver's exact row schema, so driver rows and local rows diff
mechanically (VERDICT r3, "Next round" item 6).

Comparison per query (mirrors the driver): run the Spark builder from
``__spark_entry__.queries()`` under a VANILLA session (no engine configs —
the engine must self-configure through ``Catalog``), run the
``oracle_sql()`` string in DuckDB over the same parquet tables, then
compare row count, sorted column-name schema, and an order-insensitive
value hash (columns sorted by name, floats via ``repr``, NULL sentinel).
Queries without an oracle record the driver's weaker rows-only row.

Usage: ``python tools/local_correctness.py [round_number]``
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


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


def _release_blocks(spark) -> None:
    """Per-query block hygiene (see session.release_session_blocks)."""
    from agol_pandas_spark.session import release_session_blocks

    release_session_blocks(spark)


def main() -> None:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF01_DIR", "/root/testdata/sf0.01")

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("local-correctness")
        .config("spark.ui.enabled", "false")
        # the sweep runs the FULL registry in one session; without a
        # per-query block release the accumulated localCheckpoint blocks
        # (iterative graph ops, staged-index queries) plus persisted rank
        # intermediates overflow the default 1g heap around query ~100
        # (observed: OOM at graph_resource_allocation_links, cascading
        # ConnectionRefused for the rest of the alphabet). Headroom AND
        # hygiene below; the driver's own 50-query window never hits this.
        .config("spark.driver.memory", "6g")
        .getOrCreate()
    )
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry

    queries, oracles = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    out: dict[str, dict] = {}
    for name in sorted(queries):
        rec = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            sdf = queries[name](spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
            rec["spark_rows"] = len(srows)
            if name in oracles:
                ores = con.execute(oracles[name])
                ocols = [d[0] for d in ores.description]
                orows = ores.fetchall()
                rec["oracle_rows"] = len(orows)
                rec["rows_match"] = len(srows) == len(orows)
                rec["schema_match"] = sorted(scols) == sorted(ocols)
                rec["hash_match"] = canonical_hash(srows, scols) == canonical_hash(
                    orows, ocols
                )
            else:
                # driver's weaker rows-only check for non-SQL-expressible ops
                rec["rows_match"] = rec["spark_rows"] >= 0
        except Exception as exc:  # noqa: BLE001 - artifact records the failure
            rec["err"] = f"{type(exc).__name__}: {exc}"[:500]
        out[name] = rec
        _release_blocks(spark)

    suffix = os.environ.get("SPARK_GRAFT_ARTIFACT_SUFFIX", "")
    path = f"CORRECTNESS_local_r{rnd:02d}{suffix}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    bad = [
        k
        for k, v in out.items()
        if v["err"] or v["rows_match"] is False
        or v["schema_match"] is False
        or v["hash_match"] is False
    ]
    print(f"{path}: {len(out)} queries, {len(bad)} failing: {bad}")


if __name__ == "__main__":
    main()
