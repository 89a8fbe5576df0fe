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
