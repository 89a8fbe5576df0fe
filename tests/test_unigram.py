"""Unigram-LM tokenizer (functions/text.py unigram_*) vs a brute-force
Python hard-EM reference: the Viterbi tie geometry (equal-score paths
over repeated characters, pieces pruned mid-EM, character floor-
smoothing) needs randomized corpora, and the cross-engine determinism
claim (bit-identical IEEE products, lexicographic tie-break) is exactly
what the reference re-implements in plain Python floats.
"""

from __future__ import annotations

import collections
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.functions import (
    text as T,
)


def _ref_viterbi(w: str, pmap: dict[str, float], max_len: int):
    """best[j] = (score, pieces): IEEE left-to-right product, ties to
    the lexicographically smaller pieces list — the engines' recurrence
    in plain Python doubles."""
    best: list[tuple[float, list[str]]] = [(1.0, [])]
    for j in range(1, len(w) + 1):
        cur: tuple[float, list[str]] = (0.0, [])
        for width in range(1, max_len + 1):
            i = j - width
            if i < 0:
                continue
            piece = w[i:j]
            p = pmap.get(piece, 0.0)
            if p <= 0.0:
                continue
            s = best[i][0] * p
            ps = best[i][1] + [piece]
            if s > cur[0] or (s == cur[0] and ps < cur[1]):
                cur = (s, ps)
        best.append(cur)
    return best[len(w)]


def _ref_unigram(texts, rounds=3, max_len=4, seed_cap=48):
    """Brute-force hard-EM: seed = top substrings ∪ chars; per round
    Viterbi usage counts, char floor at 1, prune zeros."""
    words = collections.Counter()
    for t in texts:
        for w in re.split("[^a-z0-9]+", t.lower()):
            if w:
                words[w] += 1
    cand = collections.Counter()
    for w, f in words.items():
        for i in range(len(w)):
            for width in range(1, max_len + 1):
                if i + width <= len(w):
                    cand[w[i : i + width]] += f
    top = sorted(cand.items(), key=lambda kv: (-kv[1], kv[0]))[:seed_cap]
    vocab = dict(top)
    for p, c in cand.items():
        if len(p) == 1:
            vocab[p] = c
    for _ in range(rounds):
        total = float(sum(vocab.values()))
        pmap = {p: c / total for p, c in vocab.items()}
        usage = collections.Counter()
        for w, f in words.items():
            for piece in _ref_viterbi(w, pmap, max_len)[1]:
                usage[piece] += f
        nxt = {}
        for p in vocab:
            c = usage.get(p, 0)
            if len(p) == 1:
                c = max(c, 1)
            if c > 0:
                nxt[p] = c
        vocab = nxt
    return vocab, words, pmap


def _mkdocs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


# tiny alphabet so piece collisions / equal-score tie paths are common
_word = st.text(alphabet="ab", min_size=1, max_size=8)
_doc = st.lists(_word, min_size=0, max_size=10).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=6)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_corpus, rounds=st.integers(min_value=1, max_value=3))
def test_unigram_vocab_matches_reference_on_random_corpora(
    spark, texts, rounds
):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
        pinned as PIN,
    )

    docs = _mkdocs(spark, texts)
    got = {
        r["piece"]: r["cnt"] for r in T.unigram_vocab(docs, rounds).collect()
    }
    want, _, _ = _ref_unigram(texts, rounds)
    assert got == want
    PIN.release_all()


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_corpus)
def test_unigram_encode_matches_reference(spark, texts):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
        pinned as PIN,
    )

    docs = _mkdocs(spark, texts)
    got = {
        r["doc_id"]: r["n_pieces"]
        for r in T.unigram_tokens_per_doc(docs).collect()
    }
    vocab, _, _ = _ref_unigram(texts)
    total = float(sum(vocab.values()))
    pmap = {p: c / total for p, c in vocab.items()}
    want = {}
    for i, t in enumerate(texts):
        toks = [w for w in re.split("[^a-z0-9]+", t.lower()) if w]
        if not toks:
            continue  # no tokens -> no encode row (inner join)
        want[i] = sum(
            len(_ref_viterbi(w, pmap, T.UNIGRAM_MAX_PIECE_LEN)[1])
            for w in toks
        )
    assert got == want
    PIN.release_all()


def test_unigram_fixed_corpus(spark):
    """Pinned example: whole frequent words win over characters, chars
    floor at 1, encode counts are the Viterbi piece counts."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
        pinned as PIN,
    )

    texts = ["abab aab b the cat", "the the cat abab", "b aab the"]
    docs = _mkdocs(spark, texts)
    vocab = {r["piece"]: r["cnt"] for r in T.unigram_vocab(docs).collect()}
    assert vocab["the"] == 4 and vocab["abab"] == 2 and vocab["cat"] == 2
    # every surviving char is floor-smoothed or genuinely used
    assert all(c >= 1 for c in vocab.values())
    enc = {
        r["doc_id"]: r["n_pieces"]
        for r in T.unigram_tokens_per_doc(docs).collect()
    }
    assert enc == {0: 5, 1: 4, 2: 3}
    PIN.release_all()


def test_unigram_single_char_and_unseen_are_covered(spark):
    """Character floor-smoothing keeps the alphabet segmentable even
    when EM never uses a char piece on its own."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
        pinned as PIN,
    )

    docs = _mkdocs(spark, ["zzzz zzzz zzzz"])
    vocab = {r["piece"]: r["cnt"] for r in T.unigram_vocab(docs).collect()}
    assert vocab.get("z") == 1  # floor-smoothed, never Viterbi-chosen
    assert "zzzz" in vocab
    enc = T.unigram_tokens_per_doc(docs).collect()
    assert enc[0]["n_pieces"] == 3
    PIN.release_all()


def test_unigram_degenerate_inputs(spark):
    """Empty corpus and token-free documents yield empty relations
    (no crash in the seed aggregate, the vmap fold, or the encode
    join)."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
        pinned as PIN,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert T.unigram_vocab(empty).count() == 0
    assert T.unigram_tokens_per_doc(empty).count() == 0
    punct = spark.createDataFrame([(1, "!!! ... ???")], "doc_id long, text string")
    assert T.unigram_vocab(punct).count() == 0
    assert T.unigram_tokens_per_doc(punct).count() == 0
    assert T.quality_classifier_margin(empty).count() == 0
    PIN.release_all()


def _ref_heldout_encode(train_texts, new_texts, rounds=3, max_len=4):
    """Reference inference: fit on train, Viterbi-encode new text with
    the UNK fold (single-char fallback at 0.5/total)."""
    vocab, _, _ = _ref_unigram(train_texts, rounds, max_len)
    if not vocab:  # empty model -> no encode rows (engine + oracle agree)
        return {}
    total = float(sum(vocab.values()))
    pmap = {p: c / total for p, c in vocab.items()}
    unk = 0.5 / total

    def vit(w):
        best = [(1.0, [])]
        for j in range(1, len(w) + 1):
            cur = (0.0, [])
            for width in range(1, max_len + 1):
                i = j - width
                if i < 0:
                    continue
                piece = w[i:j]
                p = pmap.get(piece, unk if width == 1 else 0.0)
                if p <= 0.0:
                    continue
                s = best[i][0] * p
                ps = best[i][1] + [piece]
                if s > cur[0] or (s == cur[0] and ps < cur[1]):
                    cur = (s, ps)
            best.append(cur)
        return best[len(w)][1]

    out = {}
    for i, t in enumerate(new_texts):
        toks = [w for w in re.split("[^a-z0-9]+", t.lower()) if w]
        if toks:
            out[i] = sum(len(vit(w)) for w in toks)
    return out


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(train=_corpus, new=_corpus)
def test_unigram_heldout_encode_matches_reference(spark, train, new):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
        pinned as PIN,
    )

    tdf = _mkdocs(spark, train)
    ndf = _mkdocs(spark, new)
    got = {
        r["doc_id"]: r["n_pieces"]
        for r in T.unigram_encode_tokens_per_doc(tdf, ndf).collect()
    }
    assert got == _ref_heldout_encode(train, new)
    PIN.release_all()


def test_unigram_heldout_unseen_chars_use_unk(spark):
    """Characters training never saw segment as single UNK pieces but
    never displace real pieces on covered text."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
        pinned as PIN,
    )

    train = _mkdocs(spark, ["the cat sat on the mat"] * 2)
    new = _mkdocs(spark, ["zz7q the cat"])
    got = T.unigram_encode_tokens_per_doc(train, new).collect()
    # 'zz7q' -> 4 UNK chars; 'the' and 'cat' are whole learned pieces
    assert got[0]["n_pieces"] == 6
    PIN.release_all()
