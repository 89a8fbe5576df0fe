"""Round-8 operators: exact-substring dedup (Lee et al. 2022 style,
operators/dedup.py duplicated_spans / substring_dup_stats)."""

from pyspark.sql import functions as F

from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators import (
    dedup as D,
)


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _spans(spark, rows, min_len):
    out = D.duplicated_spans(_corpus(spark, rows), min_len=min_len)
    return sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
        for r in out.collect()
    )


def test_shared_sentence_detected_in_both_docs(spark):
    shared = "the quick brown fox jumps over the lazy dog"  # 43 chars
    rows = [
        (1, "AAAA " + shared + " BBBB"),
        (2, "CCCCCC " + shared + " DD"),
        (3, "totally unrelated content here with no duplication at all x"),
    ]
    got = _spans(spark, rows, min_len=20)
    # the duplicated region includes the shared FLANKING spaces —
    # " <shared> " (45 chars): doc 1 at 5..49, doc 2 at 7..51; doc 3
    # contributes nothing
    assert got == [(1, 5, 49, 45), (2, 7, 51, 45)]


def test_overlapping_windows_merge_to_one_maximal_span(spark):
    # one long shared block must come back as ONE span, not one row
    # per duplicated window position
    block = "x" * 10 + "shared block of text repeated verbatim" + "y" * 10
    rows = [(1, "p" * 7 + block), (2, block + "q" * 9)]
    got = _spans(spark, rows, min_len=10)
    assert [g[0] for g in got] == [1, 2]
    assert got[0][1:] == (8, 7 + len(block), len(block))
    assert got[1][1:] == (1, len(block), len(block))


def test_within_doc_repeat_counts_as_duplication(spark):
    chunk = "abcdefghijklmnopqrst"  # 20 chars, repeated inside ONE doc
    rows = [(1, chunk + "-----" + chunk)]
    got = _spans(spark, rows, min_len=20)
    assert got == [(1, 1, 20, 20), (1, 26, 45, 20)]


def test_docs_shorter_than_window_emit_nothing(spark):
    rows = [(1, "short"), (2, "short"), (3, "")]
    assert _spans(spark, rows, min_len=30) == []


def test_disjoint_spans_stay_separate(spark):
    a = "first duplicated sentence block!"  # 32
    b = "second duplicated sentence block"  # 32
    # gaps must not self-repeat: a run like "-"*50 contains its own
    # 30-char window 21 times, is itself duplicated, and (correctly)
    # bridges the two spans — use distinct non-repetitive filler
    # (and must share no prefix/suffix with each other, else the
    # shared flanking chars correctly extend the a/b spans)
    gap1 = "1st middle filler, unique text, zero repeats, yes"
    gap2 = "2nd divider text that differs from one entirely!?"
    rows = [(1, a + gap1 + b), (2, a + gap2 + b)]
    got = _spans(spark, rows, min_len=30)
    assert [g[0] for g in got] == [1, 1, 2, 2]
    assert all(g[3] == 32 for g in got)


def test_unicode_positions_are_character_based(spark):
    shared = "ünïcødé-sävvy düplicate blöck"  # 29 chars
    rows = [(1, "aa" + shared), (2, shared + "zz")]
    got = _spans(spark, rows, min_len=29)
    assert got == [(1, 3, 31, 29), (2, 1, 29, 29)]


def test_substring_dup_stats_covers_all_docs(spark):
    shared = "the quick brown fox jumps over the lazy dog"
    rows = [
        (1, "AAAA " + shared),
        (2, shared + " BBBB"),
        (3, "unique text with no duplicated windows whatsoever okay"),
    ]
    out = {
        r["doc_id"]: (r["n_spans"], r["dup_chars"], r["dup_frac"])
        for r in D.substring_dup_stats(
            _corpus(spark, rows), min_len=20
        ).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1] == (1, 43, round(43 / len(rows[0][1]), 6))
    assert out[2] == (1, 43, round(43 / len(rows[1][1]), 6))
    assert out[3] == (0, 0, 0.0)


def test_spans_partition_invariant(spark):
    docs = (
        _corpus(
            spark,
            [
                (i, ("common boilerplate header attached here " * 2) + f"tail{i}")
                for i in range(40)
            ],
        )
    )
    one = sorted(
        map(tuple, D.duplicated_spans(docs.coalesce(1), 30).collect())
    )
    many = sorted(
        map(tuple, D.duplicated_spans(docs.repartition(13), 30).collect())
    )
    assert one == many and one


# ---------------------------------------------------------------- BPE


def _ref_bpe(texts, k):
    """Pure-Python Sennrich-style reference (same frozen analyzer)."""
    import collections
    import re

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


def _bpe(spark, texts, k):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.functions.text import (
        bpe_train,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return [tuple(r) for r in bpe_train(df, k).orderBy("step").collect()]


def test_bpe_greedy_overlap_is_leftmost_nonoverlapping(spark):
    # 'aaaa' merging (a,a): greedy left scan gives (aa)(aa), so round 2
    # sees pair (aa,aa) — NOT (a,aa) or (aa,a)
    texts = ["aaaa aaaa aaaa"]
    got = _bpe(spark, texts, 2)
    assert got == _ref_bpe(texts, 2)
    assert got[0][1:4] == ("a", "a", "aa")
    assert got[1][1:4] == ("aa", "aa", "aaaa")


def test_bpe_merged_symbol_chains_across_rounds(spark):
    # classic: (e,r) then (er,t) — a merge output participating as the
    # LEFT side of a later pair
    texts = ["water water water alert alert overt"] * 3
    got = _bpe(spark, texts, 4)
    assert got == _ref_bpe(texts, 4)


def test_bpe_tie_break_is_lexicographic(spark):
    # two pairs with identical counts: (b,c) and (x,y) both appear
    # exactly 5 times; (b,c) must win round 1
    texts = ["bc " * 5 + "xy " * 5]
    got = _bpe(spark, texts, 1)
    assert got == _ref_bpe(texts, 1)
    assert got[0][1:3] == ("b", "c")


def test_bpe_converges_and_stops_early(spark):
    # single repeated 2-char word: round 1 merges it fully; round 2 has
    # no pairs left — the loop must stop, returning 1 row not 8
    texts = ["ab ab ab"]
    got = _bpe(spark, texts, 8)
    assert got == [(1, "a", "b", "ab", 3)]


def test_bpe_weighted_by_word_frequency(spark):
    # 'zz' appears in ONE doc 10 times, 'qr' in 5 docs once each:
    # pair (z,z) count 10 beats (q,r) count 5
    texts = ["zz " * 10] + ["qr"] * 5
    got = _bpe(spark, texts, 1)
    assert got == _ref_bpe(texts, 1)
    assert got[0][1:3] == ("z", "z") and got[0][4] == 10


def test_bpe_matches_reference_on_sf0001_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    texts = [r.text for r in docs.select("text").collect()]
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.functions.text import (
        bpe_train,
    )

    got = [tuple(r) for r in bpe_train(docs, 8).orderBy("step").collect()]
    assert got == _ref_bpe(texts, 8)


# ------------------------------------------------------------- DSIR


def test_dsir_target_docs_score_higher_on_average(spark):
    """Sanity on the selection direction: documents FROM the target
    subset must average a higher log-ratio than the rest (the target
    LM, trained on them, assigns their features more mass)."""
    from pyspark.sql import functions as F

    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.functions.text import (
        dsir_weights,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    w = dsir_weights(docs, F.col("lang") == "en")
    j = w.join(docs.select("doc_id", "lang"), "doc_id")
    means = {
        r["t"]: r["m"]
        for r in j.groupBy((F.col("lang") == "en").alias("t"))
        .agg(F.avg("logratio").alias("m"))
        .collect()
    }
    assert means[True] > means[False], means


def test_dsir_weights_sum_structure(spark):
    """Every doc with tokens gets exactly one row; n_tokens matches the
    analyzer's count."""
    from pyspark.sql import functions as F

    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.functions.text import (
        dsir_weights,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.search.index import (
        tokenize,
    )

    docs = spark.createDataFrame(
        [(1, "aa bb aa", "en"), (2, "cc", "de"), (3, "", "en")],
        "doc_id long, text string, lang string",
    )
    w = dsir_weights(docs, F.col("lang") == "en").orderBy("doc_id")
    rows = w.collect()
    assert [(r["doc_id"], r["n_tokens"]) for r in rows] == [(1, 3), (2, 1)]


def test_strip_duplicated_spans_matches_hand_computation(spark):
    """Cleaned text = original minus the maximal spans; docs without
    duplication pass through verbatim."""
    import hashlib

    shared = "the quick brown fox jumps over the lazy dog"
    rows = [
        (1, "AAAA " + shared + " BBBB"),
        (2, "CCCCCC " + shared + " DD"),
        (3, "unique text here with no duplication at all xxxx yyyy"),
    ]
    docs = _corpus(spark, rows)
    sp = {
        r["doc_id"]: (r["span_start"], r["span_end"])
        for r in D.duplicated_spans(docs, 20).collect()
    }
    got = {
        r["doc_id"]: (r["n_removed"], r["clean_fp"])
        for r in D.strip_duplicated_spans(docs, 20).collect()
    }
    for i, t in rows:
        if i in sp:
            s, e = sp[i]
            clean = t[: s - 1] + t[e:]
            exp = (e - s + 1, hashlib.md5(clean.encode()).hexdigest())
        else:
            exp = (0, hashlib.md5(t.encode()).hexdigest())
        assert got[i] == exp, (i, got[i], exp)


def test_strip_handles_span_at_document_edges(spark):
    """Spans touching position 1 or the document end leave empty gap
    pieces, not errors; a fully-duplicated doc cleans to ''."""
    import hashlib

    t = "exactly the same text in both documents here!"
    docs = _corpus(spark, [(1, t), (2, t)])
    got = {
        r["doc_id"]: (r["n_removed"], r["clean_fp"])
        for r in D.strip_duplicated_spans(docs, 20).collect()
    }
    empty_fp = hashlib.md5(b"").hexdigest()
    assert got[1] == (len(t), empty_fp) and got[2] == (len(t), empty_fp)


def test_decontaminated_train_drops_exactly_leaking_docs(spark):
    """A train doc sharing an 8-token shingle with a test doc drops;
    disjoint train docs and short (unshingleable) ones survive."""
    from pyspark.sql import functions as F

    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.contamination import (
        decontaminated_train,
    )

    leak = "one two three four five six seven eight"
    rows = [
        (1, leak + " extra words in the train copy", "train"),
        (2, "completely different training content with many words here", "train"),
        (3, "tiny", "train"),  # < 8 tokens: cannot leak
        (4, "prefix words then " + leak, "test"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, split string")
    kept = {r["doc_id"] for r in decontaminated_train(docs).collect()}
    assert kept == {2, 3}
