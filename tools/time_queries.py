"""Time a NAMED SUBSET of registry queries with bench.py's exact
methodology (warm-up run, then min-of-N noop-sink timed runs with the
cache cleared before each) so an optimization's before/after numbers can
be taken in seconds instead of re-running the whole 25-query bench.

Usage::

    python tools/time_queries.py [-n RUNS] q1 q2 ...

Env: ``SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1),
``SPARK_GRAFT_CPUS`` (master core count, same as bench.py).
Prints one JSON line per query plus a composite line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agol_pandas_spark.session import get_spark, release_session_blocks  # noqa: E402
from agol_pandas_spark.workload import load_all  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    if args and args[0] == "-n":
        runs = int(args[1])
        args = args[2:]
    if not args:
        print("usage: python tools/time_queries.py [-n RUNS] <query> ...")
        sys.exit(2)
    registry = load_all()
    unknown = [n for n in args if n not in registry]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="time-queries")

    def materialize(df):
        df.write.format("noop").mode("overwrite").save()

    # warm the JVM + file listings once (bench.py does the same)
    materialize(registry[args[0]].fn(spark, sf_dir))
    release_session_blocks(spark)

    timings: dict[str, float] = {}
    for name in args:
        spark.sparkContext.setJobDescription(f"warm {name}")
        materialize(registry[name].fn(spark, sf_dir))  # warm run
        best = float("inf")
        for i in range(runs):
            release_session_blocks(spark)
            spark.sparkContext.setJobDescription(f"timed {name} #{i}")
            t0 = time.perf_counter()
            materialize(registry[name].fn(spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
        release_session_blocks(spark)
        print(json.dumps({"query": name, "min_sec": timings[name], "runs": runs}))

    print(json.dumps({"total_min_sec": round(sum(timings.values()), 4), "queries": timings}))


if __name__ == "__main__":
    main()
