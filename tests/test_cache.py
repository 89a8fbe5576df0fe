"""Result-cache (O10) contract: key shapes, TTL expiry, nx semantics,
empty-result guard — mirroring the reference's Redis usage."""

from __future__ import annotations

import hashlib

from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.graph.model import (
    truncate,
)
from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.cache import (
    ResultCache,
    pymk_cache_key,
    search_cache_key,
)


def test_key_shapes():
    k = search_cache_key("furniture trading", "edy", 10)
    md5 = hashlib.md5(b"q=furniture trading&u=edy").hexdigest()
    assert k == f"es:query_id:{md5}:limit:10"
    assert pymk_cache_key("Sungmin Kim") == pymk_cache_key("sungmin kim")


def test_ttl_and_nx(spark):
    now = [0.0]
    cache = ResultCache(ttl_s=600, clock=lambda: now[0])
    calls = []

    def compute():
        calls.append(1)
        return spark.createDataFrame([(1, "a")], ["id", "v"])

    key = pymk_cache_key("edy")
    r1 = cache.get_or_compute(key, compute)
    r2 = cache.get_or_compute(key, compute)
    assert r1 == r2 and len(calls) == 1 and cache.hits == 1

    now[0] = 601.0  # TTL expired → recompute
    cache.get_or_compute(key, compute)
    assert len(calls) == 2

    # nx: existing key is not overwritten
    assert not cache.set_nx(key, r1)


def test_empty_results_never_cached(spark):
    cache = ResultCache()
    empty = spark.createDataFrame([], "id long")
    key = search_cache_key("no hits", None, 10)
    cache.get_or_compute(key, lambda: empty)
    assert cache.get(key) is None  # miss again — empties aren't cached


def test_truncate_preserves_schema(spark):
    df = spark.createDataFrame([(1, 2, 1.0)], ["src", "dst", "weight"])
    t = truncate(df)
    assert t.count() == 0
    assert t.schema == df.schema
