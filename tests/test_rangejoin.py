"""Bounded range join (operators/rangejoin.py): exact window semantics
(inclusive bounds, bucket-boundary crossings, no duplicate pairs) and
the equi-join plan shape — never a nested-loop."""

from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.rangejoin import (
    bounded_range_join,
)
from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.plans.audit import (
    physical_plan,
)


def _mk(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def test_range_join_window_semantics(spark):
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    t = lambda s: base + timedelta(seconds=s)
    errors = _mk(
        spark,
        [(100, 1, t(300)), (101, 1, t(1000)), (102, 2, t(300))],
        ["eid", "user_id", "ts"],
    )
    clicks = _mk(
        spark,
        [
            (7, 1, t(0)),     # exactly lower bound of eid 100 (300-300)
            (8, 1, t(299)),   # inside eid 100's window
            (9, 1, t(300)),   # exactly at eid 100 (upper bound 0)
            (10, 1, t(301)),  # after → no match
            (11, 1, t(699)),  # 301 s before eid 101 → outside
            (12, 1, t(701)),  # inside eid 101's window, crosses bucket edge
            (13, 3, t(300)),  # other user → never matches
        ],
        ["cid", "user_id", "ts"],
    )
    got = sorted(
        (r["eid"], r["cid"])
        for r in bounded_range_join(
            errors, clicks, ["user_id"], "ts", "ts", -300.0, 0.0
        ).collect()
    )
    assert got == [(100, 7), (100, 8), (100, 9), (101, 12)]


def test_range_join_no_duplicate_pairs_across_buckets(spark):
    """A left window spanning two buckets must not double-match a right
    row; dense same-key data across many buckets stays exact."""
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    t = lambda s: base + timedelta(seconds=s)
    left = _mk(spark, [(i, 1, t(i * 7)) for i in range(50)], ["lid", "user_id", "ts"])
    right = _mk(spark, [(i, 1, t(i * 5)) for i in range(70)], ["rid", "user_id", "ts"])
    out = bounded_range_join(left, right, ["user_id"], "ts", "ts", -13.0, 0.0)
    rows = [(r["lid"], r["rid"]) for r in out.collect()]
    assert len(rows) == len(set(rows))  # no duplicates
    # brute-force truth
    want = sorted(
        (li, ri)
        for li in range(50)
        for ri in range(70)
        if -13 <= ri * 5 - li * 7 <= 0
    )
    assert sorted(rows) == want


def test_range_join_plan_is_equi_join(spark):
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    t = lambda s: base + timedelta(seconds=s)
    left = _mk(spark, [(1, 1, t(10))], ["lid", "user_id", "ts"])
    right = _mk(spark, [(2, 1, t(5))], ["cid", "user_id", "ts"])
    plan = physical_plan(
        bounded_range_join(left, right, ["user_id"], "ts", "ts", -300.0, 0.0)
    )
    assert "NestedLoop" not in plan  # the bucketization earns an equi-join
    assert "Join" in plan
