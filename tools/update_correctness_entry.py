"""Incrementally refresh named entries in the local correctness artifacts.

Runs the SAME Spark-vs-DuckDB comparison as ``local_correctness.py`` for
just the queries named on the command line and merges the rows into
``CORRECTNESS_local_r{N}.json`` (sf0.01) and
``CORRECTNESS_local_r{N}_sf01.json`` (sf0.1) — so the registry↔artifact
sync gate stays green per commit while new queries land. The full-sweep
tool still regenerates everything at round close; this exists to keep
the between-sweeps window honest, not to replace the sweep.

Usage: ``python tools/update_correctness_entry.py <round> name [name...]``
"""

from __future__ import annotations

import json
import os
import sys

from local_correctness import TABLES, canonical_hash


def run_one(spark, con, queries, oracles, name, sf_dir):
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
            rec["rows_match"] = rec["spark_rows"] >= 0
    except Exception as exc:  # noqa: BLE001 - artifact records the failure
        rec["err"] = f"{type(exc).__name__}: {exc}"[:500]
    return rec


def main() -> None:
    rnd = int(sys.argv[1])
    names = sys.argv[2:]
    if not names:
        raise SystemExit("usage: update_correctness_entry.py <round> name [name...]")

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("local-correctness-incr")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry

    queries, oracles = entry.queries(), entry.oracle_sql()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    targets = [
        (os.path.join(root, f"CORRECTNESS_local_r{rnd:02d}.json"),
         "/root/testdata/sf0.01"),
        (os.path.join(root, f"CORRECTNESS_local_r{rnd:02d}_sf01.json"),
         "/root/testdata/sf0.1"),
    ]
    for path, sf_dir in targets:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        out = json.load(open(path)) if os.path.exists(path) else {}
        for name in names:
            out[name] = run_one(spark, con, queries, oracles, name, sf_dir)
            spark.catalog.clearCache()
        out = dict(sorted(out.items()))
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
        bad = [n for n in names if out[n]["err"] or out[n]["hash_match"] is False]
        print(f"{path}: updated {names}, failing: {bad}")


if __name__ == "__main__":
    main()
