"""Salted two-phase distinct count: equivalence with the direct form on
skewed data, and the salt actually spreads the hot key."""

from __future__ import annotations

from pyspark.sql import functions as F

from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.skew import (
    _salt,
    salted_distinct_count,
)


def test_matches_direct_distinct_count_on_skewed_data(spark):
    # hot key: 1000 values (with duplicates); cold keys: a few each
    rows = [("hot", f"v{i % 700}") for i in range(1000)]
    rows += [("cold1", "a"), ("cold1", "a"), ("cold1", "b"), ("cold2", "z")]
    df = spark.createDataFrame(rows, ["k", "v"])
    got = {r.k: r.n_distinct for r in salted_distinct_count(df, "k", "v").collect()}
    want = {
        r.k: r.d
        for r in df.groupBy("k").agg(F.countDistinct("v").alias("d")).collect()
    }
    assert got == want == {"hot": 700, "cold1": 2, "cold2": 1}


def test_salt_spreads_hot_key(spark):
    df = spark.createDataFrame([("hot", f"v{i}") for i in range(500)], ["k", "v"])
    buckets = (
        df.select(_salt(F.col("v"), 16).alias("s"))
        .groupBy("s")
        .count()
        .collect()
    )
    assert len(buckets) == 16, "500 distinct values must hit all 16 salt buckets"
    assert max(r["count"] for r in buckets) < 100, "no bucket should hog the key"


def test_salted_join_equals_plain_join(spark):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.skew import (
        salted_join,
    )

    # heavy skew: 90% of big rows hit key 1
    big = spark.createDataFrame(
        [(1 if i % 10 else i % 5, float(i)) for i in range(500)],
        "k long, v double",
    )
    small = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(5)], "sk long, name string"
    )
    got = sorted(
        (r.k, r.v, r.name)
        for r in salted_join(big, small, "k", "sk", buckets=4).collect()
    )
    want = sorted(
        (r.k, r.v, r.name)
        for r in big.join(small, big["k"] == small["sk"]).collect()
    )
    assert got == want and len(got) > 0


def test_salted_join_key_includes_salt(spark):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.skew import (
        salted_join,
    )

    big = spark.createDataFrame([(1, 1.0)], "k long, v double")
    small = spark.createDataFrame([(1, "x")], "sk long, name string")
    j = salted_join(big, small, "k", "sk", buckets=4)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan  # the physical join key carries the salt
