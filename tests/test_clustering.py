"""Deterministic k-means (operators/clustering.py): the Spark plan must
match a direct pure-Python evaluation of the declared semantics (seeded
by smallest ids, rounded d2/means, cluster-asc tie break), and the
labels must be usable as an IVF codebook."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators import (
    clustering,
)
from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.sources import (
    tables,
)

SF = "/root/testdata/sf0.001"


def _python_kmeans(vectors: dict[int, list[float]], k: int, iters: int):
    ids = sorted(vectors)
    cents = {c: list(vectors[i]) for c, i in enumerate(ids[:k])}

    def d2(v, c):
        return round(
            sum(x * x for x in v)
            + sum(x * x for x in c)
            - 2 * sum(a * b for a, b in zip(v, c)),
            6,
        )

    def assign(cents):
        return {
            i: min(cents, key=lambda c: (d2(v, cents[c]), c))
            for i, v in vectors.items()
        }

    for _ in range(iters - 1):
        a = assign(cents)
        for c in cents:
            members = [vectors[i] for i, ci in a.items() if ci == c]
            if members:
                dim = len(members[0])
                cents[c] = [
                    round(sum(m[j] for m in members) / len(members), 6)
                    for j in range(dim)
                ]
    return assign(cents)


@pytest.fixture(scope="module")
def emb(spark):
    return tables.load_table(spark, SF, "embeddings")


def test_kmeans_matches_python_reference(spark, emb):
    sample = emb.filter(F.col("vec_id") < 40)
    vectors = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in sample.collect()
    }
    got = {
        r["vec_id"]: r["cluster"]
        for r in clustering.kmeans_assign(sample, k=4, iters=2).collect()
    }
    want = _python_kmeans(vectors, k=4, iters=2)
    assert got == want
    assert set(got.values()) <= set(range(4))


def test_kmeans_labels_feed_ivf(spark, emb):
    """The fitted labels slot into ann_ivf as the label column — the
    train/search composition the IVF docstring promises."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators import (
        similarity as SIM,
    )

    labeled = (
        emb.drop("label")
        .join(clustering.kmeans_assign(emb, k=4, iters=2), "vec_id")
        .withColumnRenamed("cluster", "label")
    )
    res = SIM.ann_ivf(labeled, [0, 1], k=5).collect()
    assert res
    labels = {
        r["vec_id"]: r["label"]
        for r in labeled.select("vec_id", "label").collect()
    }
    assert all(labels[r["neighbor_id"]] == r["probe_label"] for r in res)
