"""Time a subset of bench queries with the bench's own methodology
(warm run, then min-of-3 count()), in BENCH_QUERIES order so shared
pins are built by the same first toucher as in the real bench.

Usage: python tools/time_subset.py q1 q2 ...   (env SPARK_GRAFT_SF_DIR)
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import bench as benchmod
    import __spark_entry__ as E
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.session import (
        get_spark,
    )

    wanted = set(sys.argv[1:])
    names = [n for n in benchmod.BENCH_QUERIES if n in wanted]
    missing = wanted - set(names)
    if missing:
        print(f"not in BENCH_QUERIES: {sorted(missing)}", file=sys.stderr)
    spark = get_spark("time-subset")
    qs = E.queries()
    timings: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"warm:{name}")
        fn(spark, SF_DIR).count()
        best = float("inf")
        for i in range(3):
            spark.sparkContext.setJobDescription(f"timed:{name}:{i}")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            best = min(best, time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        timings[name] = round(best, 3)
        print(f"{name}: {timings[name]}s", file=sys.stderr)
    print(json.dumps({"sf_dir": SF_DIR, "queries": timings,
                      "total": round(sum(timings.values()), 3)}))


if __name__ == "__main__":
    main()
