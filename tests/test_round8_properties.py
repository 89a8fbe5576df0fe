"""Property tests for the round-8 operators: randomized corpora checked
against brute-force Python references (the BPE greedy-merge fold and
exact-substring span extraction have enough edge geometry — overlapping
runs, spans at document edges, ties — that fixed fixtures undercover).

hypothesis generates corpora; settings keep Spark round-trips bounded.
"""

from __future__ import annotations

import collections
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.functions import (
    text as T,
)
from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators import (
    dedup as D,
)

# words over a tiny alphabet so pair collisions / overlap runs are common
_word = st.text(alphabet="ab", min_size=1, max_size=6)
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=6)


def _ref_bpe(texts, k):
    freq = collections.Counter()
    for t in texts:
        for w in [x for x in re.split("[^a-z0-9]+", t.lower()) if x]:
            freq[w] += 1
    words = {w: list(w) for w in freq}
    out = []
    for step in range(1, k + 1):
        cnt = collections.Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                cnt[(a, b)] += freq[w]
        if not cnt:
            break
        (x, y), c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((step, x, y, x + y, c))
        for w, syms in words.items():
            ns = []
            for e in syms:
                if ns and ns[-1] == x and e == y:
                    ns[-1] = x + y
                else:
                    ns.append(e)
            words[w] = ns
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_corpus, k=st.integers(min_value=1, max_value=4))
def test_bpe_train_matches_reference_on_random_corpora(spark, texts, k):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
        pinned as PIN,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [tuple(r) for r in T.bpe_train(docs, k).orderBy("step").collect()]
    assert got == _ref_bpe(texts, k)
    PIN.release_all()  # per-example corpora must not accumulate pins


def _ref_spans(texts, L):
    """Brute force: every L-window occurring >= 2 times corpus-wide,
    merged per doc into maximal spans (1-based)."""
    count = collections.Counter()
    for t in texts:
        for p in range(len(t) - L + 1):
            count[t[p : p + L]] += 1
    out = {}
    for i, t in enumerate(texts):
        pos = [
            p + 1
            for p in range(len(t) - L + 1)
            if count[t[p : p + L]] >= 2
        ]
        spans = []
        for p in pos:
            if spans and p <= spans[-1][1] + 1:
                spans[-1] = (spans[-1][0], p + L - 1)
            else:
                spans.append((p, p + L - 1))
        if spans:
            out[i] = spans
    return out


# documents over a 2-char alphabet, long enough for 4-char windows
_span_doc = st.text(alphabet="xy", min_size=0, max_size=20)
_span_corpus = st.lists(_span_doc, min_size=1, max_size=5)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_span_corpus)
def test_duplicated_spans_matches_brute_force(spark, texts):
    L = 4
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {}
    for r in D.duplicated_spans(docs, L).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"])
        )
    got = {k: sorted(v) for k, v in got.items()}
    assert got == _ref_spans(texts, L)


def test_pretoken_whitespace_class_cross_engine(spark):
    """r8 ADVICE: Java's ``\\s`` includes vertical tab (\\x0B), RE2's
    does not, so the old ``\\s``-based pretokenizer and whitespace
    split diverged on corpora containing \\x0B ("\\x0B.\\x0B" → 3
    pretokens in Spark, 1 in DuckDB). Both regexes now use an explicit
    character class; this probe pins Spark == DuckDB on exactly the
    texts that used to diverge."""
    import duckdb

    cases = ["\x0B.\x0B", "a\tb\x0Bc", " \x0B ", "a.b,c!", "x \x0B y"]
    docs = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(cases)],
        "doc_id string, text string",
    )
    got = {
        r["doc_id"]: (r["n_ws_tokens"], r["n_bpe_pretokens"])
        for r in T.token_counts(docs).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(cases):
        ws, bpe = con.execute(
            "SELECT len(list_filter(regexp_split_to_array(?,"
            " '[ \\t\\n\\f\\r\\x0B]+'), x -> x <> '')),"
            " len(regexp_extract_all(lower(?), ?))",
            [t, t, T.BPE_PRETOKEN_RE],
        ).fetchone()
        assert got[str(i)] == (ws, bpe), (t, got[str(i)], (ws, bpe))
