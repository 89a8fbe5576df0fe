"""Hash sampling/splits: determinism, partition-invariance, no overlap."""

from __future__ import annotations

from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators import (
    sampling as SA,
)


def test_sample_deterministic_and_partition_invariant(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    s1 = {r.doc_id for r in SA.hash_sample(df, "doc_id", 0.3).collect()}
    s2 = {r.doc_id for r in SA.hash_sample(df.repartition(7), "doc_id", 0.3).collect()}
    assert s1 == s2, "membership must not depend on partitioning"
    assert 0.25 < len(s1) / 2000 < 0.35


def test_split_covers_all_rows_without_overlap(spark):
    df = spark.range(0, 3000).withColumnRenamed("id", "doc_id")
    split = SA.hash_split(df, "doc_id", train=0.8, dev=0.1)
    counts = {r.split: r.n for r in split.groupBy("split").count().withColumnRenamed("count", "n").collect()}
    assert sum(counts.values()) == 3000
    assert 0.75 < counts["train"] / 3000 < 0.85
    assert 0.05 < counts["dev"] / 3000 < 0.15
    # splits are a partition: each key appears exactly once with one label
    assert split.select("doc_id").distinct().count() == 3000


def test_split_stable_under_superset(spark):
    """Adding rows must not move existing keys between splits (the
    leakage property rand() lacks)."""
    small = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    s_small = {r.doc_id: r.split for r in SA.hash_split(small, "doc_id").collect()}
    s_big = {r.doc_id: r.split for r in SA.hash_split(big, "doc_id").collect()}
    assert all(s_big[k] == v for k, v in s_small.items())


def test_stratified_topn_balances_and_is_stable(spark):
    from pyspark.sql import functions as F

    rows = [(i, i % 3) for i in range(300)] + [(1000 + i, 99) for i in range(5)]
    df = spark.createDataFrame(rows, ["k", "g"])
    out = SA.stratified_topn(df, "k", "g", 10)
    counts = {r.g: r.n for r in out.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {0: 10, 1: 10, 2: 10, 99: 5}  # min(n, |stratum|)

    # growing OTHER strata must not change a stratum's selection
    bigger = spark.createDataFrame(rows + [(2000 + i, 0) for i in range(50)], ["k", "g"])
    sel_small = {r.k for r in SA.stratified_topn(df, "k", "g", 10).filter("g = 1").collect()}
    sel_big = {r.k for r in SA.stratified_topn(bigger, "k", "g", 10).filter("g = 1").collect()}
    assert sel_small == sel_big


def test_weighted_sample_pps_and_deterministic(spark):
    """Sequential-Poisson sample: heavy rows dominate, zero/negative
    weights are excluded, membership is partition-invariant, and the
    priority expression is a pure function of (key, weight)."""
    from pyspark.sql import functions as F

    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        # rows 0-99 carry 1000x the weight of rows 100-999
        F.when(F.col("id") < 100, F.lit(100000)).otherwise(F.lit(100)).alias("w"),
    )
    top = SA.weighted_sample(df, "doc_id", "w", 50).collect()
    picked = {r.doc_id for r in top}
    heavy = sum(1 for d in picked if d < 100)
    # with a 1000:1 weight ratio the 100 heavy rows should own nearly
    # the whole top-50 (each heavy row's priority is ~1000x smaller)
    assert heavy >= 40, f"PPS should favor heavy rows, got {heavy}/50"

    again = {r.doc_id for r in SA.weighted_sample(df.repartition(7), "doc_id", "w", 50).collect()}
    assert picked == again, "membership must not depend on partitioning"

    with_zero = df.withColumn(
        "w", F.when(F.col("doc_id") % 2 == 0, F.lit(0)).otherwise(F.col("w"))
    )
    z = SA.weighted_sample(with_zero, "doc_id", "w", 100).collect()
    assert all(r.doc_id % 2 == 1 for r in z), "zero-weight rows must be excluded"
