"""As-of join semantics (operators/asof.py): inclusive vs strict ties,
deterministic tie-break among equal-ts right rows, left-outer nulls, and
the single-shuffle no-join plan shape."""

from datetime import datetime

from pyspark.sql import functions as F

from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.asof import (
    asof_join,
)
from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.plans.audit import (
    exchange_count,
    physical_plan,
)


def _t(s):
    return datetime(2024, 1, 1, 0, 0, s)


def _sides(spark):
    left = spark.createDataFrame(
        [
            (100, 1, _t(10)),  # after r-rows at 5 and 10 → tie at 10
            (101, 1, _t(4)),   # before any right row → null
            (102, 2, _t(30)),  # only key-2 row at 20 matches
            (103, 3, _t(30)),  # key 3 has no right rows at all → null
        ],
        ["lid", "k", "ts"],
    )
    right = spark.createDataFrame(
        [
            (7, 1, _t(5), 1.0),
            (8, 1, _t(10), 2.0),   # equal-ts: inclusive matches, strict not
            (9, 1, _t(10), 3.0),   # same key+ts as rid 8 → tie_break: 9 wins
            (10, 2, _t(20), 4.0),
            (11, 2, _t(40), 5.0),  # after the key-2 left row → invisible
        ],
        ["rid", "k", "ts", "v"],
    )
    return left, right


def test_asof_inclusive_strict_and_tiebreak(spark):
    left, right = _sides(spark)
    got = {
        r["lid"]: (r["asof_rid"], r["asof_v"])
        for r in asof_join(
            left, right, ["k"], "ts", "ts", ["rid", "v"], tie_break="rid"
        ).collect()
    }
    assert got == {
        100: (9, 3.0),   # equal ts included; rid 9 beats 8 on tie_break
        101: (None, None),
        102: (10, 4.0),
        103: (None, None),
    }

    strict = {
        r["lid"]: r["asof_rid"]
        for r in asof_join(
            left, right, ["k"], "ts", "ts", ["rid"],
            tie_break="rid", strict=True,
        ).collect()
    }
    assert strict[100] == 7  # equal-ts rows excluded → falls back to t=5


def test_asof_plan_one_shuffle_no_join(spark):
    left, right = _sides(spark)
    out = asof_join(left, right, ["k"], "ts", "ts", ["v"], tie_break="rid")
    plan = physical_plan(out)
    assert "Join" not in plan  # union+window, never an inequality join
    assert exchange_count(out) == 1  # one shuffle, on the key


def test_asof_matches_duckdb_window_twin(spark):
    """The registered query's operator form vs the oracle's window SQL on
    a seeded corpus with equal-ts collisions (driver also runs this at
    sf0.01 via the parity gate; this is the fast in-suite pin)."""
    import duckdb

    left, right = _sides(spark)
    got = sorted(
        (r["lid"], r["asof_rid"])
        for r in asof_join(
            left, right, ["k"], "ts", "ts", ["rid"], tie_break="rid"
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE l(lid BIGINT, k BIGINT, ts TIMESTAMP);"
        "CREATE TABLE r(rid BIGINT, k BIGINT, ts TIMESTAMP, v DOUBLE)"
    )
    con.executemany("INSERT INTO l VALUES (?,?,?)", [tuple(x) for x in left.collect()])
    con.executemany("INSERT INTO r VALUES (?,?,?,?)", [tuple(x) for x in right.collect()])
    want = sorted(
        (int(a), None if b is None else int(b))
        for a, b in con.execute("""
            WITH tagged AS (
              SELECT k, ts AS ats, 1 AS is_l, CAST(NULL AS BIGINT) AS tb,
                     lid, CAST(NULL AS BIGINT) AS c_rid FROM l
              UNION ALL
              SELECT k, ts, 0, rid, NULL, rid FROM r
            ),
            filled AS (
              SELECT lid, is_l,
                     last_value(c_rid IGNORE NULLS) OVER w AS m
              FROM tagged
              WINDOW w AS (PARTITION BY k
                           ORDER BY ats ASC, is_l ASC, tb ASC NULLS FIRST
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            )
            SELECT lid, m FROM filled WHERE is_l = 1
        """).fetchall()
    )
    assert got == want


def test_asof_matches_bruteforce_random(spark):
    """Seeded random corpus with heavy ts collisions vs the O(n*m)
    definition: latest right row per key with ts <= left ts, greatest
    rid among equal-ts ties."""
    import random
    from datetime import datetime, timedelta

    rng = random.Random(13)
    base = datetime(2024, 1, 1)
    t = lambda s: base + timedelta(seconds=s)
    lrows = [
        (i, rng.randint(1, 5), t(rng.randint(0, 40))) for i in range(120)
    ]
    rrows = [
        (i, rng.randint(1, 5), t(rng.randint(0, 40)), float(i))
        for i in range(150)
    ]
    left = spark.createDataFrame(lrows, ["lid", "k", "ts"])
    right = spark.createDataFrame(rrows, ["rid", "k", "ts", "v"])

    got = {
        r["lid"]: r["asof_rid"]
        for r in asof_join(
            left, right, ["k"], "ts", "ts", ["rid"], tie_break="rid"
        ).collect()
    }
    for lid, k, ts in lrows:
        cands = [(rts, rid) for rid, rk, rts, _ in rrows if rk == k and rts <= ts]
        want = max(cands)[1] if cands else None
        assert got[lid] == want, (lid, k, ts)
