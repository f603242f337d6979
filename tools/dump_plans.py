"""Dump ``explain("formatted")`` for registry queries to ``plans/r12/``.

Usage::

    python tools/dump_plans.py before [name ...]
    python tools/dump_plans.py after  [name ...]

With no names, dumps every headline query. The files are the
optimization round's evidence trail: ``plans/r12/<query>_<tag>.txt``.
Building a query's DataFrame may execute its preparatory actions (index
builds, merges) exactly as the bench does; the captured plan is the plan
of the returned (timed) DataFrame.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agol_pandas_spark.plans.explain import formatted_plan  # noqa: E402
from agol_pandas_spark.session import get_spark, release_session_blocks  # noqa: E402
from agol_pandas_spark.workload import load_all  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    registry = load_all()
    names = sys.argv[2:] or sorted(n for n, q in registry.items() if q.headline)
    unknown = [n for n in names if n not in registry]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("AGOL_PLANS_ROUND", "r12"))
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="dump-plans")
    for name in names:
        df = registry[name].fn(spark, sf_dir)
        plan = formatted_plan(df)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
        release_session_blocks(spark)


if __name__ == "__main__":
    main()
