"""Targeted oracle check: run the driver's Spark-vs-DuckDB comparison
for a NAMED SUBSET of registry queries (same methodology as
``local_correctness.py``) so an optimization's blast radius can be
verified in minutes instead of re-sweeping all 352 queries.

Usage: ``python tools/check_queries.py q1 q2 ...`` (optionally
``SPARK_GRAFT_SF01_DIR`` to point at a different SF).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# Python workers must import agol_pandas_spark (Arrow kernels are
# module-level functions, pickled by reference): run with the repo root
# on PYTHONPATH so executor-side imports resolve regardless of cwd.
os.environ["PYTHONPATH"] = (
    _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
)

from local_correctness import TABLES, canonical_hash, _release_blocks


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: python tools/check_queries.py <query> [<query> ...]")
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF01_DIR", "/root/testdata/sf0.01")

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check-queries")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "6g")
        .getOrCreate()
    )
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import __spark_entry__ as entry

    queries, oracles = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    bad = []
    for name in names:
        if name not in queries:
            print(f"{name}: NOT REGISTERED")
            bad.append(name)
            continue
        try:
            sdf = queries[name](spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
            if name in oracles:
                ores = con.execute(oracles[name])
                ocols = [d[0] for d in ores.description]
                orows = ores.fetchall()
                ok = (
                    len(srows) == len(orows)
                    and sorted(scols) == sorted(ocols)
                    and canonical_hash(srows, scols)
                    == canonical_hash(orows, ocols)
                )
                print(
                    f"{name}: {'OK' if ok else 'MISMATCH'} "
                    f"(spark={len(srows)} oracle={len(orows)})"
                )
                if not ok:
                    bad.append(name)
            else:
                print(f"{name}: rows-only ({len(srows)} rows)")
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {type(exc).__name__}: {exc}"[:300])
            bad.append(name)
        _release_blocks(spark)

    print(f"checked {len(names)}, failing {len(bad)}: {bad}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
