"""Interactive probe harness for the optimization rounds.

Run inside tmux:  python -i tools/probe.py

Provides:
  spark           — live session (bench config)
  Q               — the queries() registry
  t(name, n=3)    — warm + min-of-n wall time for a bench query (count())
  tn(name, n=3)   — same but timed through the noop sink (guide §1.4)
  ex(name)        — print explain("formatted")
  jobs(name)      — run once and report how many Spark jobs it scheduled
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

import __spark_entry__ as E  # noqa: E402
from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.session import (  # noqa: E402
    get_spark,
)

spark = get_spark("probe")
Q = E.queries()


def _df(name):
    return Q[name](spark, SF_DIR)


def t(name, n=3):
    spark.sparkContext.setJobDescription(f"warm:{name}")
    _df(name).count()
    best = float("inf")
    for i in range(n):
        spark.sparkContext.setJobDescription(f"timed:{name}:{i}")
        t0 = time.perf_counter()
        _df(name).count()
        best = min(best, time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    print(f"{name}: {best:.3f}s (min of {n}, count)")
    return best


def tn(name, n=3):
    _noop(_df(name))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        _noop(_df(name))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best:.3f}s (min of {n}, noop)")
    return best


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def ex(name):
    df = _df(name)
    print(
        df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    )


def jobs(name):
    st = spark.sparkContext.statusTracker()
    before = st.getJobIdsForGroup(None) or []
    _df(name).count()
    after = st.getJobIdsForGroup(None) or []
    n = len(set(after) - set(before))
    print(f"{name}: {n} jobs")
    return n


print(f"probe ready: sf_dir={SF_DIR}")
