#!/usr/bin/env python3
"""Capture .explain("formatted") for declared queries into plans/<tag>/.
Usage: python scripts/capture_plans.py <tag> [query ...]
Writes plans/<tag>/<query>_<suffix>.txt (suffix from $PLAN_SUFFIX, default
'before')."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    suffix = os.environ.get("PLAN_SUFFIX", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))

    from wikibrain_spark.session import get_spark

    spark = get_spark("wikibrain-plans", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as em

    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    qs = em.queries()
    if not names:
        names = list(qs)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR capturing plan: {e}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print("captured", name, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
