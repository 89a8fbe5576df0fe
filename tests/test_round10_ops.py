"""Round-10 operators: learned quality-classifier gate and semantic
dedup — brute-force references plus composition contracts.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.functions import (
    text as T,
)


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _ref_margins(texts: dict[int, str], n_buckets: int = 256):
    feats: dict[tuple[int, int], int] = {}
    for i, t in texts.items():
        for tok in re.split("[^a-z0-9]+", t.lower()):
            if not tok:
                continue
            h = _md5_long(tok)
            sign = ((h >> 8) & 1) * 2 - 1
            k = (i, h % n_buckets)
            feats[k] = feats.get(k, 0) + sign
    margins: dict[int, int] = {}
    for (i, b), wt in feats.items():
        w = _md5_long(str(b)) % (2 * T.QUALITY_CLF_SCALE + 1) - T.QUALITY_CLF_SCALE
        margins[i] = margins.get(i, 0) + w * wt
    return margins


def test_quality_classifier_margin_matches_reference(spark):
    texts = {
        1: "the cat sat on the mat",
        2: "qualitatively distinct content here",
        3: "",
        4: "the the the the",
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["margin"]
        for r in T.quality_classifier_margin(docs).collect()
    }
    assert got == _ref_margins(texts)  # doc 3 has no tokens -> no row


def test_quality_classifier_weights_constant_and_bounded(spark):
    w = {r["bucket"]: r["w"] for r in T.quality_classifier_weights(spark).collect()}
    assert set(w) == set(range(256))
    assert all(-T.QUALITY_CLF_SCALE <= v <= T.QUALITY_CLF_SCALE for v in w.values())
    # deterministic: second build identical
    w2 = {r["bucket"]: r["w"] for r in T.quality_classifier_weights(spark).collect()}
    assert w == w2


def test_curate_classifier_gate_composes(spark):
    """The classifier gate is one more independent predicate: gated
    output ⊆ ungated output, and equals the ungated output intersected
    with the margin-passing ids."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
        pinned as PIN,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.curation import (
        classifier_margins,
        curate,
    )

    docs = spark.createDataFrame(
        [
            (i, f"the quick brown fox {i} jumps over the lazy dog " * 3, "web")
            for i in range(1, 30)
        ],
        "doc_id long, text string, source string",
    )
    base = {r["doc_id"]: r["split"] for r in curate(docs, min_quality=0.0).collect()}
    gated = {
        r["doc_id"]: r["split"]
        for r in curate(docs, min_quality=0.0, classifier_min_margin=0).collect()
    }
    passing = {
        r["doc_id"]
        for r in classifier_margins(docs).filter(F.col("margin") >= 0).collect()
    }
    assert set(gated) == set(base) & passing
    # split labels unchanged by the extra predicate (hash of doc_id only)
    assert all(base[i] == s for i, s in gated.items())
    PIN.release_all()
