"""Dump ``explain("formatted")`` for bench queries to plans/<tag>/<q>_<suffix>.txt.

Usage:  python tools/capture_plans.py <suffix> [query ...]

With no query list, captures every BENCH_QUERIES entry. Plans are the
optimizer's initial physical plans (AdaptiveSparkPlan isFinalPlan=false)
— the artifact the optimization round's claims are checked against.
"""
from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    import bench as benchmod
    import __spark_entry__ as E
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.session import (
        get_spark,
    )

    names = sys.argv[2:] or benchmod.BENCH_QUERIES
    spark = get_spark("capture-plans")
    qs = E.queries()
    outdir = os.path.join(
        REPO, "plans", os.environ.get("SPARK_GRAFT_PLAN_DIR", "r14")
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR {type(exc).__name__}: {exc}"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(name, "ok" if not plan.startswith("ERROR") else plan[:120])
    spark.stop()


if __name__ == "__main__":
    main()
