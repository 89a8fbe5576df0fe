"""Text-analysis operators over the ``documents`` table (north-star
training-data pipeline surface, BASELINE.json): language-ID heuristic,
quality scoring, token counting, document fingerprinting.

All built-in-function columns (JVM-side); each has a DuckDB oracle twin in
oracles.py. The analyzer is the engine-wide frozen tokenizer
(search.index.tokenize).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..search.index import tokenize

# Stopword profiles for the n-gram/stopword language heuristic. The corpus
# language tags in testdata are synthetic; the heuristic's *semantics*
# (argmax profile overlap with deterministic tie order) are what's tested.
LANG_PROFILES: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "en": ["the", "a", "of", "and", "is", "not"],
    "es": ["el", "la", "de", "y", "es", "no"],
    "fr": ["le", "la", "de", "et", "est", "pas"],
    "zh": ["de", "le", "shi", "bu", "wo", "ni"],
}
STOPWORDS_EN = LANG_PROFILES["en"]


def _profile_score(tokens: Column, words: list[str]) -> Column:
    """Number of tokens (with multiplicity) belonging to the profile."""
    wl = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda x: F.array_contains(wl, x)))


def language_pred(text_col: Column) -> Column:
    """``predicted_lang`` as a single Column expression — argmax profile
    score, ties broken by language code ascending, all-zero → 'und'.
    Exposed so single-scan composers (operators/curation.py) can evaluate
    the gate inline on the corpus scan instead of via a semi-join; the
    expression tree is the one ``language_id``'s staged selects collapse
    to under Catalyst's projection collapsing, so both forms are
    plan-identical per row."""
    toks = tokenize(text_col)
    scores = {
        lang: _profile_score(toks, words)
        for lang, words in sorted(LANG_PROFILES.items())
    }
    best = F.greatest(*scores.values())
    pred = F.when(best == F.lit(0), F.lit("und"))
    for lang in sorted(scores):  # first (asc) language hitting the max wins
        pred = pred.when(scores[lang] == best, F.lit(lang))
    return pred


def language_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Predicted language = argmax profile score; ties broken by language
    code ascending; all-zero → 'und'. Returns (id_col, predicted_lang)."""
    return df.select(
        F.col(id_col), language_pred(F.col(text_col)).alias("predicted_lang")
    )


def _quality_cols(text_col: Column) -> dict[str, Column]:
    """The quality-feature expressions, shared by ``quality_scores`` and
    the inline gate ``quality_score_col`` so the formula cannot drift."""
    toks = tokenize(text_col)
    nt = F.size(toks).cast("long")
    token_chars = F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x))
    n_stop = _profile_score(toks, STOPWORDS_EN)
    avg_len = F.when(nt > 0, token_chars / nt).otherwise(F.lit(0.0))
    stop_ratio = F.when(nt > 0, n_stop / nt).otherwise(F.lit(0.0))
    # Composite: in-range token count, reasonable word length, some stopwords.
    score = (
        F.when((nt >= 10) & (nt <= 1000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when((avg_len >= 3) & (avg_len <= 10), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(stop_ratio > 0, F.lit(0.3)).otherwise(F.lit(0.0))
    )
    return {
        "n_chars": F.length(text_col).cast("long"),
        "n_tokens": nt,
        "avg_token_len": F.round(avg_len, 6),
        "stopword_ratio": F.round(stop_ratio, 6),
        "quality_score": F.round(score, 6),
    }


def quality_score_col(text_col: Column) -> Column:
    """The 6dp-rounded composite quality score as a Column — the inline
    form of the ``quality_scores`` gate for single-scan composition."""
    return _quality_cols(text_col)["quality_score"]


def quality_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Heuristic quality features + composite score. Returns
    (id, n_tokens, n_chars, avg_token_len, stopword_ratio, quality_score);
    ratios rounded to 6dp (double), deterministic across engines."""
    cols = _quality_cols(F.col(text_col))
    return df.select(
        F.col(id_col),
        *[cols[name].alias(name) for name in (
            "n_chars", "n_tokens", "avg_token_len", "stopword_ratio",
            "quality_score",
        )],
    )


#: GPT-2-style BPE PRE-tokenizer pattern, lookahead-free so it runs
#: identically under Java regex (Spark) and RE2 (DuckDB — no lookahead
#: support): optional leading space + letter run / digit run / other-
#: symbol run, else a whitespace run. Applied to LOWERED text; both
#: engines' alternation is leftmost-first, so match counts agree.
#: Whitespace is an EXPLICIT character class, not ``\s`` (r8 ADVICE:
#: Java's ``\s`` includes vertical tab \x0B, RE2's does not, so
#: "\x0B.\x0B" matched 3 pretokens in Spark but 1 in DuckDB); both
#: engines interpret ``\x0B`` identically, verified by the
#: cross-engine probe in tests/test_round8_properties.py.
BPE_PRETOKEN_RE = r" ?[a-z]+| ?[0-9]+| ?[^ \t\n\f\r\x0Ba-z0-9]+|[ \t\n\f\r\x0B]+"


def token_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Token accounting: whitespace-split count, analyzer token count,
    distinct analyzer tokens, and the GPT-2-style BPE pre-tokenizer
    match count (the unit a subword tokenizer's budget is quoted in —
    whitespace counts UNDER-estimate it on punctuation-heavy text).
    Returns (id, n_ws_tokens, n_tokens, n_distinct, n_bpe_pretokens)."""
    # explicit whitespace class, same \x0B rationale as BPE_PRETOKEN_RE
    ws = F.filter(
        F.split(F.col(text_col), r"[ \t\n\f\r\x0B]+"), lambda x: x != ""
    )
    toks = tokenize(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.size(ws).cast("long").alias("n_ws_tokens"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.regexp_count(F.lower(F.col(text_col)), F.lit(BPE_PRETOKEN_RE))
        .cast("long")
        .alias("n_bpe_pretokens"),
    )


def fingerprint(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Normalized bag-of-words fingerprint: md5 of the space-joined sorted
    distinct token set — content-defined identity generalizing the
    reference's content_id (upsert_bizcard_to_es.py:73-75, O21).
    Returns (id, fingerprint)."""
    toks = tokenize(F.col(text_col))
    fp = F.md5(
        F.concat_ws(" ", F.array_sort(F.array_distinct(toks))).cast("binary")
    )
    return df.select(F.col(id_col), fp.alias("fingerprint"))


def document_frequency_topk(
    df: DataFrame, k: int = 50, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus vocabulary head: the k terms with the highest document
    frequency. Returns (token, df) — the stats table a tokenizer-training
    or stopword-mining pass starts from (and the same tok→df relation the
    search index's term dictionary pins per corpus, search/index.py).

    Ties are declared: df desc, token asc.

    Scale: explode(distinct tokens per doc) → groupBy(token) count is one
    shuffle with map-side partial aggregation (hot tokens like 'the'
    partial-combine in every task before the exchange), and the final
    orderBy+limit is TakeOrderedAndProject — per-partition top-k heaps, a
    k-row driver result, no global sort.
    """
    toks = F.explode(F.array_distinct(tokenize(F.col(text_col)))).alias("token")
    return (
        df.select(F.col(id_col), toks)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.col("df").desc(), F.col("token").asc())
        .limit(k)
    )


def unigram_logprob_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Unigram language-model fluency score per document: the mean log
    probability of the document's tokens under the corpus's own unigram
    distribution — the classic cheap LM-quality gate (low scores = rare-
    token gibberish; public practice in the CCNet/Gopher-style cleaning
    stacks, there with an external LM; here self-scored, so the operator
    is closed over its input).

    Returns (id, n_tokens, unigram_logprob): score = avg(ln(tf/T)), NULL
    for documents with zero analyzer tokens, rounded to 6dp (absorbs
    summation-order and libm ulp divergence vs the oracle).

    Scale: two shuffles — global term frequencies (map-side combined; the
    vocabulary relation is one row per distinct token, so the scoring
    join has fan-out 1 per token occurrence regardless of how hot 'the'
    is), then the per-document average. The tf relation is NOT force-
    broadcast: a 100 TB corpus's vocabulary (URLs, typos, code) can be
    tens of GB; AQE broadcasts it when it is actually small.
    """
    toks = df.select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("token")
    )
    tf = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = toks.agg(F.count(F.lit(1)).alias("t"))
    scored = (
        toks.join(tf, "token")
        .crossJoin(total)  # 1-row combine, same device as graph_counts
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(F.log(F.col("cnt") / F.col("t"))), 6).alias(
                "unigram_logprob"
            ),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            "unigram_logprob",
        )
    )


#: Ceiling on Catalyst's size estimate for a relation we broadcast-HINT
#: (tfidf's vocabulary dim). Far under Spark's 8 GB broadcast hard limit
#: and the driver heap; the estimate errs large (see
#: plans.audit.estimated_size_bytes), so real vocabularies near this
#: size fall back to a shuffle join that AQE can still convert.
BROADCAST_DIM_CAP_BYTES = 64 << 20


def tfidf_top_terms(
    df: DataFrame, k: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document keyword extraction: the k terms with the highest
    TF-IDF in each document — the classic relevance weighting (Sparck
    Jones, public) and the per-doc dual of ``document_frequency_topk``'s
    corpus-level head. Returns (doc_id, token, tfidf).

    tfidf = tf * ln(N / df) with raw counts: N is the corpus row count
    (empty docs count — they dilute nothing but keep N stable), df the
    number of documents containing the term. Ranking is on the 6dp-ROUNDED
    score then token asc, so both engines order on identical quantities
    (ln differs across libm implementations at ulp level).

    Scale: tf is one (doc, token) shuffle with map-side combine; df
    derives from tf by a token-keyed re-aggregation (no second corpus
    scan — tf's shuffle exchange is REUSED for both consumers) and
    joins back as a BROADCAST: document frequency is a vocabulary-sized
    relation (Heaps' law, the bpe_tokens_per_doc precedent), and
    shuffling the full tf relation by token just to pair it with that
    dim tripled the query's sf1 time (r8: 4.9 s → 1.4 s). The hint is
    GATED on Catalyst's size estimate (r8 ADVICE: a broadcast hint is
    honored regardless of actual size, so hinting an ungated
    vocabulary OOMs the driver on a corpus whose term dictionary
    outgrows the broadcast limit): past ``BROADCAST_DIM_CAP_BYTES``
    the join becomes a plain token-keyed equi-join — AQE still
    converts it to broadcast at runtime if the BUILT relation turns
    out small, and splits residual token skew if it does not. The
    estimate errs large (it propagates the exploded corpus size), so
    the fallback engages well before the hint could hurt.
    N enters as a broadcast 1-row relation; the per-doc top-k window
    partitions by doc_id — no global sort, no driver loop.
    """
    from ..plans.audit import estimated_size_bytes

    tf = (
        df.select(F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("dfr"))
    if estimated_size_bytes(dfreq) <= BROADCAST_DIM_CAP_BYTES:
        dfreq = F.broadcast(dfreq)
    n = df.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .select(
            F.col(id_col),
            "token",
            F.round(
                F.col("tf") * F.log(F.col("n").cast("double") / F.col("dfr")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def chunk_documents(
    df: DataFrame,
    width: int = 50,
    stride: int = 40,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into overlapping token-window chunks — the
    standard training/RAG preprocessing step (``width`` tokens per
    chunk, new chunk every ``stride``; width > stride ⟹ overlap keeps
    boundary context). Returns (doc_id, chunk_idx, n_chunk_tokens,
    chunk_text); token-free docs yield no chunks (declared).

    All JVM-side array ops — tokenize once, generate chunk starts with
    ``sequence`` (no UDF, no driver loop), ``posexplode`` for the chunk
    index, ``slice`` for the window. One narrow explode whose fan-out is
    ceil(n/stride) per doc: output size is (width/stride)× the corpus —
    the planned, bounded expansion every chunking pipeline pays. No
    shuffle at all: chunking is embarrassingly parallel per document.
    """
    toks = tokenize(F.col(text_col))
    n = F.size(toks)
    starts = F.sequence(
        F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride)
    )
    base = df.select(
        F.col(id_col), toks.alias("_toks"), n.alias("_n"), starts.alias("_st")
    ).filter(F.col("_n") > 0)
    pos = F.posexplode(F.col("_st"))
    return base.select(
        id_col, "_toks", pos.alias("chunk_idx", "_start")
    ).select(
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size(F.slice("_toks", F.col("_start") + 1, width))
        .cast("long")
        .alias("n_chunk_tokens"),
        F.array_join(
            F.slice("_toks", F.col("_start") + 1, width), " "
        ).alias("chunk_text"),
    )


def collocations_topk(
    df: DataFrame,
    vocab_k: int = 50,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k token collocations by document-level PMI over the
    vocabulary head — the corpus-statistics pass behind phrase mining
    and tokenizer-merge candidates. PMI(x,y) = ln(N·c_xy / (c_x·c_y))
    on document-presence counts.

    The UNBOUNDED version of this is quadratic per document (every
    distinct-token pair); the declared boundary is the same device as
    the n-gram DF cap: pairs are drawn only from the top-``vocab_k``
    vocabulary (ties df desc, token asc — document_frequency_topk), so
    the per-doc self-join fan-out is ≤ vocab_k and the pair space is
    vocab_k²/2 regardless of corpus size. The vocab and its df counts
    ride a broadcast (vocab_k rows); the only big shuffles are the
    distinct doc-token projection and the pair count, both map-side
    combined. Ranking on the 6dp-rounded PMI then (x, y) —
    deterministic, TakeOrderedAndProject.
    """
    vocab = document_frequency_topk(df, vocab_k, id_col, text_col)
    dt = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokenize(F.col(text_col)))).alias("token"),
    )
    dv = dt.join(F.broadcast(vocab.select("token")), "token")
    a = dv.select(F.col(id_col), F.col("token").alias("x"))
    b = dv.select(F.col(id_col), F.col("token").alias("y"))
    pairs = (
        a.join(b, id_col)
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("c_xy"))
    )
    n = df.agg(F.count(F.lit(1)).alias("n"))
    vx = vocab.select(F.col("token").alias("x"), F.col("df").alias("dfx"))
    vy = vocab.select(F.col("token").alias("y"), F.col("df").alias("dfy"))
    return (
        pairs.join(F.broadcast(vx), "x")
        .join(F.broadcast(vy), "y")
        .crossJoin(F.broadcast(n))
        .select(
            "x",
            "y",
            "c_xy",
            F.round(
                F.log(
                    F.col("n").cast("double")
                    * F.col("c_xy")
                    / (F.col("dfx") * F.col("dfy"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), F.col("x").asc(), F.col("y").asc())
        .limit(k)
    )


#: Declared repetition gates (Gopher-style, Rae et al. 2021 table A1
#: uses 0.18 for the top-2-gram fraction; the duplicate-3-gram gate is
#: this engine's declared analog of the duplicate-n-gram family).
TOP_BIGRAM_MAX_FRAC = 0.18
DUP_TRIGRAM_MAX_FRAC = 0.30


def repetition_metrics(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition quality metrics per document — the
    n-gram repetition family of the public pretraining-curation rules
    (Rae et al. 2021 §A1.1): templated/boilerplate text shows a fat
    most-common-2-gram and a high duplicate-3-gram mass.

    Returns (doc_id, n_tokens, top_bigram_frac, dup_trigram_frac,
    repetitive):
    - ``top_bigram_frac`` — tokens covered by occurrences of the single
      most frequent bigram: 2·max_count / n_tokens (6dp; NULL when
      n_tokens < 2);
    - ``dup_trigram_frac`` — fraction of trigram occurrences beyond
      their first: (n_tri − n_distinct_tri) / n_tri (6dp; NULL when
      n_tokens < 3);
    - ``repetitive`` — either fraction over its declared gate (NULL
      metrics gate nothing).

    Scale: ZERO shuffles — every metric is a per-row expression. The
    most-frequent-bigram count is the longest run of equal adjacent
    elements in the SORTED bigram array (an O(n log n) ``array_sort`` +
    an O(n) left fold), and duplicate-trigram mass is
    ``size − size(array_distinct)``; all whole-stage-codegen. The first
    version of this operator shuffled (doc, width, gram) rows — ~2
    string rows per token corpus-wide — and benched 12 s at sf0.1; the
    row-local form is the plan a 100 TB corpus needs (document-sized
    work, embarrassingly parallel, nothing keyed on gram strings).
    """

    def grams(t, width: int):
        return F.when(
            F.size(t) >= width,
            F.transform(
                F.slice(t, 1, F.size(t) - (width - 1)),
                lambda x, i: F.concat_ws(
                    " ",
                    x,
                    *[F.element_at(t, i + j + 1) for j in range(1, width)],
                ),
            ),
        )

    def max_run(sorted_arr):
        """Longest run of equal adjacent elements in a sorted array —
        i.e. the count of the most frequent element."""
        acc0 = F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        )
        step = lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(
                    F.lit(1).cast("long")
                ),
            ).alias("best"),
        )
        return F.aggregate(sorted_arr, acc0, step, lambda acc: acc["best"])

    t = tokenize(F.col(text_col))
    base = df.select(
        F.col(id_col),
        F.size(t).cast("long").alias("n_tokens"),
        grams(t, 2).alias("bi"),
        grams(t, 3).alias("tri"),
    )
    top_frac = F.round(
        F.lit(2.0) * max_run(F.array_sort(F.col("bi"))) / F.col("n_tokens"),
        6,
    )
    n_tri = F.size("tri").cast("long")
    dup_frac = F.round(
        (n_tri - F.size(F.array_distinct(F.col("tri"))))
        / n_tri.cast("double"),
        6,
    )
    return base.select(
        id_col,
        "n_tokens",
        top_frac.alias("top_bigram_frac"),
        dup_frac.alias("dup_trigram_frac"),
        (
            F.coalesce(top_frac > TOP_BIGRAM_MAX_FRAC, F.lit(False))
            | F.coalesce(dup_frac > DUP_TRIGRAM_MAX_FRAC, F.lit(False))
        ).alias("repetitive"),
    )


def lm_buckets(
    df: DataFrame, k: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """CCNet-style LM-quality tiling (Wenzek et al. 2020): rank the
    corpus by unigram-LM fluency and cut it into ``k`` NTILE buckets —
    bucket 1 = most fluent head, bucket k = gibberish tail (CCNet keeps
    head/middle and drops tail).

    Returns (doc_id, unigram_logprob, bucket). Deterministic order:
    (logprob desc, doc_id asc) with NULL (zero-token) docs coalesced to
    -1e18 so they sink to the tail identically in both engines (Spark
    and DuckDB disagree on default NULL placement under DESC).

    Scale: the rank comes from operators/ranking.py's two-phase
    range-partitioned row_number — no global-order window, no
    single-partition exchange; the NTILE is closed-form arithmetic on
    (rank, count).
    """
    from ..operators.ranking import global_row_number, ntile_from_rank

    scored = unigram_logprob_scores(df, id_col, text_col).select(
        id_col,
        "unigram_logprob",
        F.coalesce(F.col("unigram_logprob"), F.lit(-1e18)).alias("__lm_key"),
    )
    ranked = global_row_number(
        scored, [F.col("__lm_key").desc(), F.col(id_col).asc()]
    )
    total = ranked.agg(F.count(F.lit(1)).alias("n_rows"))
    return (
        ranked.crossJoin(F.broadcast(total))
        .select(
            id_col,
            "unigram_logprob",
            ntile_from_rank(F.col("rn"), F.col("n_rows"), k).alias("bucket"),
        )
    )


def token_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Shannon entropy of each document's token distribution — the
    information-density quality gate (low entropy = templated /
    repetitive text; the distributional complement of
    ``repetition_metrics``' positional n-gram view).

    H = ln(n) − Σ c·ln(c) / n over per-token counts c — the algebraic
    form that needs only ONE per-doc aggregate (Σ c·ln c and n ride the
    same groupBy), instead of a counts-then-rejoin two-pass to form
    c/n. Returns (id, n_tokens, n_distinct, entropy); zero-token docs
    keep a row with NULL entropy, single-token docs score exactly 0.
    6dp round absorbs summation-order/libm ulps (the unigram-logprob
    convention).

    Scale: one (doc, token) shuffle with map-side combine, one per-doc
    aggregate — both keyed, nothing corpus-global."""
    tf = (
        df.select(
            F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("token")
        )
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    scored = tf.groupBy(id_col).agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.round(
            F.log(F.sum("c").cast("double"))
            - F.sum(F.col("c") * F.log(F.col("c"))) / F.sum("c"),
            6,
        ).alias("entropy"),
    )
    return (
        df.select(F.col(id_col))
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            F.coalesce(F.col("n_distinct"), F.lit(0)).alias("n_distinct"),
            "entropy",
        )
    )


def bpe_merge_candidates(
    df: DataFrame, k: int = 20, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One BPE training iteration's candidate list: the k most frequent
    ADJACENT token pairs corpus-wide (Sennrich et al. 2016 — the merge
    rule each iteration greedily picks is exactly this argmax). The
    adjacency-count complement of ``collocations_topk``'s doc-presence
    PMI and ``repetition_metrics``' per-doc view. Returns (x, y, cnt),
    ties by (x, y) ascending.

    Scale: one corpus scan building the bigram array JVM-side, one
    explode + (x, y)-keyed count with map-side combine (hot pairs like
    'of the' partial-aggregate in every task), TakeOrderedAndProject
    for the k-row result — no global sort."""
    t = tokenize(F.col(text_col))
    pairs = df.select(
        F.explode(
            F.when(
                F.size(t) >= 2,
                F.transform(
                    F.slice(t, 1, F.size(t) - 1),
                    lambda x, i: F.struct(
                        x.alias("x"),
                        F.element_at(t, i + 2).alias("y"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<x:string,y:string>>"))
        ).alias("p")
    )
    return (
        pairs.groupBy(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("x").asc(), F.col("y").asc())
        .limit(k)
    )


def bpe_train(
    df: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """FULL iterative BPE training (Sennrich et al. 2016), k merge
    rounds — the tokenizer-training primitive ``bpe_merge_candidates``
    is one step of. Word-level pre-tokenization (the frozen analyzer),
    then the classic loop: count adjacent symbol pairs weighted by word
    frequency, merge the argmax pair greedily left-to-right inside
    every word, repeat. Returns the learned merge table
    (step, x, y, merged, cnt) with cnt = the pair's corpus count AT the
    step it was chosen (ties by (x, y) ascending — a total order, so
    training is deterministic across engines and partitionings).

    Spark shape — the distributed-BPE decomposition every public
    implementation at corpus scale uses: the CORPUS-sized work is one
    word-frequency aggregate (massive reduction: 100 TB of text becomes
    a vocabulary-sized (word, freq, syms) table); each merge round then
    runs on that vocabulary table — one pair-count aggregate
    (map-side-combined) + a 1-row driver sync for the argmax + one
    JVM ``aggregate`` fold per word applying the merge. The per-round
    driver traffic is ONE row; state between rounds is localCheckpointed
    so lineage stays O(1) in k (the house iterative discipline).

    The in-word merge is a left fold: append each symbol, except when
    the accumulator's last symbol is x and the incoming is y — then
    replace the last with the merged symbol. Because ``merged`` is
    strictly longer than ``x``, a just-merged symbol can never equal x,
    so the fold IS the greedy leftmost non-overlapping pass ('a a a'
    with (a,a) → ('aa','a'), never ('a','aa') or ('aa','aa'))."""
    _words, mdf = _bpe_fit_pinned(df, k, text_col)
    return mdf


def _bpe_fit_pinned(
    df: DataFrame, k: int, text_col: str
) -> tuple[DataFrame, DataFrame]:
    """(words, merges) as a PINNED index keyed per (corpus, k) — the
    tokenizer serving model: training (the k sequential rounds) is the
    index build, every downstream query (merge table, subword counts,
    corpus encode) is a lookup against the fitted vocabulary. The pin
    records the words relation's backing tracked checkpoint
    (pinned._CKPT_BACKED), so either release hook frees both and the
    bench's cold pass re-pays training."""
    from ..pinned import pinned

    def build() -> tuple[DataFrame, DataFrame]:
        merges, words, _ids, spark = _bpe_fit(df, k, text_col)
        mdf = spark.createDataFrame(
            merges, "step int, x string, y string, merged string, cnt long"
        )
        return (words, mdf)

    return pinned(("bpe_fit", df.semanticHash(), k, text_col), build)


def _bpe_merge_fold(x: str, y: str, merged: str):
    """The greedy leftmost non-overlapping in-word merge as a left-fold
    lambda (see ``bpe_train``'s proof: ``merged`` is strictly longer
    than ``x``, so a just-merged symbol can never equal ``x`` and the
    fold IS the single greedy pass). Shared by training (which applies
    the round's argmax pair) and inference (which replays the fitted
    merge table over unseen words)."""
    xl, yl, ml = F.lit(x), F.lit(y), F.lit(merged)

    def fold(acc, e):
        return F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == xl) & (e == yl),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(ml)),
        ).otherwise(F.concat(acc, F.array(e)))

    return fold


def _char_syms(word_col):
    """word → array of its single characters (the BPE base alphabet)."""
    return F.transform(
        F.sequence(F.lit(1), F.length(word_col)),
        lambda i: word_col.substr(i, F.lit(1)),
    )


def bpe_apply_merges(
    words: DataFrame, merges: list[tuple[str, str, str]], syms_col: str = "syms"
) -> DataFrame:
    """Apply a FITTED merge table to a word relation: each merge
    (x, y, merged), in step order, replayed as one greedy leftmost
    fold over ``syms_col``. Applying the merges in training order to a
    word's raw characters reproduces the training segmentation exactly
    (each training round applies its argmax pair once, greedily —
    the identical pass this replays), and extends it to UNSEEN words —
    the standard BPE inference contract (Sennrich et al. 2016 §3).
    Property-tested against ``bpe_tokens_per_doc`` on the training
    corpus and against a brute-force reference on held-out text.

    Scale: pure column expressions over a vocabulary-sized relation —
    k chained projections that Catalyst collapses into one; no
    shuffle, no driver data beyond the ≤k-row merge table itself."""
    for x, y, merged in merges:
        words = words.withColumn(
            syms_col,
            F.aggregate(
                syms_col,
                F.array().cast("array<string>"),
                _bpe_merge_fold(x, y, merged),
            ),
        )
    return words


def fitted_bpe_merges(
    train_df: DataFrame, k: int = 8, text_col: str = "text"
) -> list[tuple[str, str, str]]:
    """The fitted merge table of ``bpe_train(train_df, k)`` as a
    driver-side list [(x, y, merged)…] in step order — a ≤k-row
    collect against the pinned tokenizer index (train once, encode
    many; the ≤k rows are the entire driver traffic, the same bound as
    training's 1-row-per-round argmax sync)."""
    _words, mdf = _bpe_fit_pinned(train_df, k, text_col)
    return [
        (r["x"], r["y"], r["merged"]) for r in mdf.orderBy("step").collect()
    ]


def bpe_encode_tokens_per_doc(
    train_df: DataFrame,
    new_df: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """INFERENCE half of BPE (the gap named in the r8 verdict):
    encode UNSEEN text with the merge table fitted on ``train_df`` —
    (id_col, n_subwords) per held-out document. Unlike
    ``bpe_tokens_per_doc`` (which reads segment lengths off the
    training vocabulary and therefore only covers words seen in
    training), this segments every held-out word by replaying the
    fitted merges over its raw characters, so out-of-vocabulary words
    are covered — what applying a frozen tokenizer to a new micro-batch
    actually requires.

    Scale: the held-out corpus reduces to its DISTINCT-word relation
    (map-side combined, vocabulary-sized by Heaps' law); the k merge
    folds are collapsed column expressions over that relation; the
    word → segment-count dim then joins back against the exploded
    held-out scan — broadcast under the same size gate as tfidf's
    vocabulary dim, shuffle-join fallback that AQE can still convert.
    The corpus is scanned once; nothing quadratic, nothing collected
    but the ≤k merge rows."""
    from ..plans.audit import estimated_size_bytes

    merges = fitted_bpe_merges(train_df, k, text_col)
    vocab = (
        new_df.select(F.explode(tokenize(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("_f"))
        .select("word", _char_syms(F.col("word")).alias("syms"))
    )
    seg_len = bpe_apply_merges(vocab, merges).select(
        "word", F.size("syms").cast("long").alias("n")
    )
    if estimated_size_bytes(seg_len) <= BROADCAST_DIM_CAP_BYTES:
        seg_len = F.broadcast(seg_len)
    return (
        new_df.select(
            F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("word")
        )
        .join(seg_len, "word")
        .groupBy(id_col)
        .agg(F.sum("n").cast("long").alias("n_subwords"))
    )


def _bpe_fit(df: DataFrame, k: int, text_col: str):
    """Shared BPE training loop. Returns (merges, words, ids, spark):
    the merge list, the final (word, freq, syms) vocabulary relation
    AFTER the k-th merge (checkpointed — caller frees ``ids`` when the
    relation is consumed), and the session."""
    from .. import checkpoints as CKPT

    spark = df.sparkSession
    words = (
        df.select(F.explode(tokenize(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .select("word", "freq", _char_syms(F.col("word")).alias("syms"))
    )
    words, ids = CKPT.checkpoint(words)
    merges: list[tuple[int, str, str, str, int]] = []
    for step_no in range(1, k + 1):
        pairs = words.select(
            "freq",
            F.explode(
                F.when(
                    F.size("syms") >= 2,
                    F.transform(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1),
                        lambda s, i: F.struct(
                            s.alias("x"),
                            F.element_at(F.col("syms"), i + 2).alias("y"),
                        ),
                    ),
                ).otherwise(
                    F.array().cast("array<struct<x:string,y:string>>")
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
            .agg(F.sum("freq").cast("long").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("x").asc(), F.col("y").asc())
            .limit(1)
            .collect()
        )
        if not top:  # every word fully merged — vocabulary converged
            break
        x, y, cnt = top[0]["x"], top[0]["y"], int(top[0]["cnt"])
        merged = x + y
        merges.append((step_no, x, y, merged, cnt))
        nxt = words.select(
            "word",
            "freq",
            F.aggregate(
                "syms", F.array().cast("array<string>"),
                _bpe_merge_fold(x, y, merged),
            ).alias("syms"),
        )
        words, new_ids = CKPT.checkpoint(nxt)
        CKPT.free(spark, ids, blocking=False)
        ids = new_ids
    return merges, words, ids, spark


def bpe_subword_counts(
    df: DataFrame,
    k: int = 8,
    top: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """ENCODE side of BPE: train k merges (``bpe_train``), segment
    every vocabulary word with them, and return the ``top`` most
    frequent subwords corpus-wide — (subword, cnt), ties by subword
    ascending. The distribution a tokenizer designer reads to judge a
    merge budget (how much of the corpus the learned units cover).

    Scale: the clincher for the word-table decomposition — encoding
    needs NO second corpus pass at all. The vocabulary relation already
    carries each word's corpus frequency, so subword counts are one
    explode + sum(freq) over the vocabulary-sized table; 100 TB of
    text never gets re-read or re-joined. The fitted vocabulary is a
    pinned index (train once, serve many)."""
    words, _mdf = _bpe_fit_pinned(df, k, text_col)
    return (
        words.select(F.explode("syms").alias("subword"), "freq")
        .groupBy("subword")
        .agg(F.sum("freq").cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("subword").asc())
        .limit(top)
    )


def bpe_tokens_per_doc(
    df: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-side BPE encode: subword count per document after k
    learned merges — (id_col, n_subwords). The number a token-budget
    planner (sequence packing, context-length stats) actually needs,
    and the canonical encode JOIN shape: the corpus explodes to words
    and equi-joins the vocabulary's word → segment-count mapping.

    Scale: the vocabulary relation is ≪ corpus (Heaps' law), so the
    join is a BROADCAST against the exploded corpus scan — no shuffle
    of the 100 TB side; the per-doc sum then shuffles once on doc id
    with map-side combine. The hint is gated on Catalyst's size
    estimate like tfidf's vocabulary dim (r8 ADVICE — an ungated hint
    is honored regardless of size); past the cap the equi-join falls
    back to shuffle and AQE still converts it when the built relation
    is small. The fitted vocabulary is a pinned index (train once,
    encode many)."""
    from ..plans.audit import estimated_size_bytes

    words, _mdf = _bpe_fit_pinned(df, k, text_col)
    seg_len = words.select("word", F.size("syms").cast("long").alias("n"))
    if estimated_size_bytes(seg_len) <= BROADCAST_DIM_CAP_BYTES:
        seg_len = F.broadcast(seg_len)
    return (
        df.select(
            F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("word")
        )
        .join(seg_len, "word")
        .groupBy(id_col)
        .agg(F.sum("n").cast("long").alias("n_subwords"))
    )


def dsir_weights(
    df: DataFrame,
    target_pred,
    n_buckets: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document
    by how much more likely its hashed-unigram features are under a
    TARGET distribution (the docs matching ``target_pred``, e.g. a
    high-quality reference subset) than under the raw corpus —
    logratio(doc) = Σ_b c_b(doc)·(ln p_target(b) − ln p_raw(b)), with
    add-one smoothing over the ``n_buckets`` hashed vocabulary. A
    sampler then resamples the corpus ∝ exp(logratio); the returned
    relation (id_col, n_tokens, logratio) is exactly its input.

    Uses the engine's md5-prefix hash (operators/dedup.md5_long) so the
    bucket assignment — like every hash here — replays bit-for-bit in
    the oracle. Per-doc log-ratio sums are rounded at 6dp (the
    docs_lm_buckets precedent for cross-engine ln).

    Scale: two vocabulary-free aggregates build the 2×n_buckets model
    (map-side combined; n_buckets is a constant), broadcast back into
    one (doc, bucket)-keyed join — the corpus is scanned once for
    features and once for scoring, nothing grows with corpus size
    except those scans."""
    from ..operators.dedup import md5_long

    tok = df.select(
        F.col(id_col),
        target_pred.alias("is_target"),
        F.explode(tokenize(F.col(text_col))).alias("token"),
    ).select(
        id_col,
        "is_target",
        (md5_long(F.col("token"), 15) % n_buckets).cast("long").alias("b"),
    )
    # ONE corpus explode feeds everything: per-doc feature counts first
    # (is_target is constant per doc, so keying on it costs nothing),
    # then the 2×n_buckets model derives from per_doc. The features
    # relation is PINNED — it is exactly the hashed-features table a
    # DSIR pipeline materializes (corpus-scan-reduced: ≤ n_buckets rows
    # per doc), and without it the model branch, totals branch, and
    # scoring probe each re-ran the corpus explode (column pruning
    # makes the subtrees non-identical, so ReuseExchange never fires).
    from ..pinned import pinned

    (per_doc,) = pinned(
        (
            "dsir_features",
            df.semanticHash(),
            str(target_pred),
            n_buckets,
            id_col,
            text_col,
        ),
        lambda: (
            tok.groupBy(F.col(id_col), "is_target", "b").agg(
                F.count(F.lit(1)).cast("long").alias("c")
            ),
        ),
    )
    model = per_doc.groupBy("b").agg(
        F.sum("c").cast("long").alias("c_raw"),
        F.sum(F.when(F.col("is_target"), F.col("c")).otherwise(F.lit(0)))
        .cast("long")
        .alias("c_tgt"),
    )
    totals = model.agg(
        F.sum("c_raw").cast("double").alias("tot_raw"),
        F.sum("c_tgt").cast("double").alias("tot_tgt"),
    )
    lr = model.crossJoin(F.broadcast(totals)).select(
        "b",
        (
            F.log((F.col("c_tgt") + 1) / (F.col("tot_tgt") + F.lit(n_buckets)))
            - F.log((F.col("c_raw") + 1) / (F.col("tot_raw") + F.lit(n_buckets)))
        ).alias("lr"),
    )
    return (
        per_doc.join(F.broadcast(lr), "b")
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.round(F.sum(F.col("c") * F.col("lr")), 6).alias("logratio"),
        )
    )


def hashed_features(
    df: DataFrame,
    n_buckets: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Feature hashing (the hashing trick, Weinberger et al. 2009):
    token → bucket = h mod n, sign = ±1 from the next hash bit, signed
    counts summed per (doc, bucket) — the fixed-width sparse features a
    distributed linear model trains on, with NO vocabulary table to
    build, broadcast, or keep consistent (the trick's entire point at
    100 TB).

    Emitted in EXPLODED form (doc_id, bucket, weight) — the sparse
    relation a trainer's aggregations consume directly; also array-free
    on purpose, so the cross-engine value comparison is exact-integer.
    Rows whose signs cancel to 0 are kept (deterministic relation).

    Scale: one scan, one (doc, bucket)-keyed map-side-combined sum;
    state per group is one long."""
    from ..operators.dedup import md5_long

    tok = df.select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("token")
    )
    h = md5_long(F.col("token"), 15)
    sign = (F.shiftright(h, 8).bitwiseAND(F.lit(1)) * 2 - 1).cast("long")
    return (
        tok.select(
            id_col,
            (h % n_buckets).cast("long").alias("bucket"),
            sign.alias("s"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.sum("s").cast("long").alias("weight"))
    )


# ---------------------------------------------------------------------------
# Unigram-LM tokenizer (SentencePiece-style; Kudo 2018, "Subword
# Regularization"). The canonical tokenizer family beside BPE: pieces
# carry probabilities, words segment by VITERBI (max-probability path),
# and training is EM — E-step: hard counts of piece uses over each
# word's Viterbi segmentation; M-step: renormalize counts into
# probabilities, dropping pieces no segmentation uses (the pruning
# step), with single characters floor-smoothed at count 1 so the model
# always covers the alphabet (SentencePiece's character-coverage
# guarantee).
#
# Cross-engine determinism WITHOUT rounding declarations: every piece
# probability is one IEEE division cnt/total of exact integers, every
# path score is a left-to-right IEEE product of those — both engines
# compute bit-identical doubles. Viterbi ties break on the
# lexicographically smallest pieces array; two candidates at the same
# position always cover the same characters, so neither array is a
# proper prefix of the other and the comparison is extension-monotone —
# the DP fixpoint is unique no matter the relaxation order.

#: Longest candidate piece (SentencePiece's max_sentencepiece_length
#: analogue). The Viterbi DP examines exactly this many predecessors
#: per position, so the fold is O(len * UNIGRAM_MAX_PIECE_LEN).
UNIGRAM_MAX_PIECE_LEN = 4
#: Seed-vocabulary cap: the top-V substrings by corpus count (ties by
#: piece ascending) — plus ALL single characters — form round-0's
#: candidate set; EM only ever shrinks it.
UNIGRAM_SEED_VOCAB = 48
UNIGRAM_EM_ROUNDS = 3


def _unigram_word_table(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) — the one corpus-sized pass (same massive reduction
    as ``_bpe_fit``: 100 TB of text becomes a Heaps-law-sized table);
    every EM round below touches only this relation."""
    return (
        df.select(F.explode(tokenize(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


def _unigram_seed(words: DataFrame, max_len: int, seed_cap: int) -> DataFrame:
    """Round-0 candidate vocabulary: every substring of length
    1..max_len of every word, cnt = Σ freq·occurrences; top-``seed_cap``
    by (cnt desc, piece asc) ∪ all single characters. One explode +
    piece-keyed map-side-combined sum over the vocabulary-sized word
    table — the corpus itself is never rescanned."""
    occ = (
        words.select(
            "word",
            "freq",
            F.explode(F.sequence(F.lit(0), F.length("word") - 1)).alias("i"),
        )
        .select(
            "word",
            "freq",
            "i",
            F.explode(F.sequence(F.lit(1), F.lit(max_len))).alias("w"),
        )
        .filter(F.col("i") + F.col("w") <= F.length("word"))
        .select(
            "freq",
            F.col("word").substr(F.col("i") + 1, F.col("w")).alias("piece"),
        )
    )
    cand = occ.groupBy("piece").agg(F.sum("freq").cast("long").alias("cnt"))
    top = cand.orderBy(F.col("cnt").desc(), F.col("piece").asc()).limit(seed_cap)
    chars = cand.filter(F.length("piece") == 1)
    return (
        top.unionByName(chars).groupBy("piece").agg(F.max("cnt").alias("cnt"))
    )


def _unigram_vmap(vocab: DataFrame) -> DataFrame:
    """1-row (vmap) relation: piece → p = cnt/total as an in-plan map —
    the model the DP folds against. The map is vocabulary-sized (≤ seed
    cap + alphabet), so shipping it is a 1-row broadcast fold (house
    crossJoin pattern), never a per-word shuffle."""
    tot = vocab.agg(F.sum("cnt").cast("double").alias("_total"))
    return (
        vocab.crossJoin(F.broadcast(tot))
        # GROUP on the total (the oracle's GROUP BY t.total): an EMPTY
        # vocabulary yields an EMPTY model relation — no model, no
        # encode rows — instead of a global agg's one all-NULL row.
        .groupBy("_total")
        .agg(
            F.map_from_entries(
                F.collect_list(
                    F.struct(
                        F.col("piece"),
                        (F.col("cnt").cast("double") / F.col("_total")).alias(
                            "p"
                        ),
                    )
                )
            ).alias("vmap")
        )
        .select(
            "vmap",
            # UNK probability for inference over unseen characters: HALF
            # the smallest possible real-piece probability (cnt ≥ 1 ⇒
            # p ≥ 1/total), so an UNK char candidate is strictly
            # dominated whenever the real char is in vocabulary — the
            # declared SentencePiece-UNK analogue, one exact IEEE
            # division.
            (F.lit(0.5) / F.col("_total")).alias("unk_p"),
        )
    )


def _unigram_pick(a: Column, b: Column) -> Column:
    """max under the DP total order: higher score, then lexicographically
    smaller pieces array (see the section comment's uniqueness proof)."""
    return F.when(
        (b["s"] > a["s"]) | ((b["s"] == a["s"]) & (b["ps"] < a["ps"])), b
    ).otherwise(a)


def _unigram_final(
    word: Column, vmap: Column, max_len: int, unk: Column | None = None
) -> Column:
    """The word's final Viterbi entry struct(s, ps): a left fold over
    positions 1..len — accumulator = the DP table so far (array of
    best-entry structs, index = position + 1), each step picking the
    best of the ≤max_len in-vocabulary predecessors. Pure column
    expressions (whole-stage codegen); the oracle twin folds the
    IDENTICAL recurrence with DuckDB list_reduce.

    ``unk`` (inference only): out-of-vocabulary CHARACTERS fall back to
    a single-char piece at this probability instead of killing the
    path — strictly dominated by any in-vocabulary char (see
    ``_unigram_vmap``), so it changes nothing on covered text and makes
    unseen text totally segmentable (the SentencePiece UNK contract)."""
    sent = F.struct(
        F.lit(0.0).alias("s"), F.array().cast("array<string>").alias("ps")
    )

    def cand(acc: Column, w: int) -> Column:
        j = F.size(acc)  # the position this step fills
        piece = word.substr(j - w + 1, F.lit(w))
        prev = F.element_at(acc, j - w + 1)
        fallback = unk if (w == 1 and unk is not None) else F.lit(0.0)
        p = F.coalesce(F.element_at(vmap, piece), fallback)
        return F.when(
            (j >= w) & (p > 0.0),
            F.struct(
                (prev["s"] * p).alias("s"),
                F.concat(prev["ps"], F.array(piece)).alias("ps"),
            ),
        ).otherwise(sent)

    def step(acc: Column, _x: Column) -> Column:
        best = cand(acc, 1)
        for w in range(2, max_len + 1):
            best = _unigram_pick(best, cand(acc, w))
        return F.concat(acc, F.array(best))

    init = F.array(
        F.struct(
            F.lit(1.0).alias("s"), F.array().cast("array<string>").alias("ps")
        )
    )
    dp = F.aggregate(F.sequence(F.lit(1), F.length(word)), init, step)
    return F.element_at(dp, F.length(word) + 1)


def _unigram_fit(
    df: DataFrame, rounds: int, max_len: int, seed_cap: int, text_col: str
) -> DataFrame:
    """EM training loop; returns the fitted (piece, cnt) vocabulary.
    Per round: one 1-row vmap fold, one Viterbi pass over the WORD
    table (not the corpus), one piece-keyed usage sum, one vocab-sized
    left join — zero driver-side data traffic (BPE's per-round argmax
    sync is already 1 row; here it is none). Round state is
    localCheckpointed so lineage stays O(1) in rounds."""
    from .. import checkpoints as CKPT

    spark = df.sparkSession
    words, wids = CKPT.checkpoint(_unigram_word_table(df, text_col))
    vocab, ids = CKPT.checkpoint(_unigram_seed(words, max_len, seed_cap))
    for _ in range(rounds):
        vm = _unigram_vmap(vocab)
        fin = words.crossJoin(F.broadcast(vm)).select(
            "freq",
            _unigram_final(F.col("word"), F.col("vmap"), max_len).alias("fin"),
        )
        usage = (
            fin.select(F.explode(F.col("fin.ps")).alias("piece"), "freq")
            .groupBy("piece")
            .agg(F.sum("freq").cast("long").alias("used"))
        )
        nxt = (
            vocab.join(usage, "piece", "left")
            .select(
                "piece",
                F.when(
                    F.length("piece") == 1,
                    F.greatest(F.coalesce(F.col("used"), F.lit(0)), F.lit(1)),
                )
                .otherwise(F.coalesce(F.col("used"), F.lit(0)))
                .cast("long")
                .alias("cnt"),
            )
            .filter(F.col("cnt") > 0)
        )
        vocab, new_ids = CKPT.checkpoint(nxt)
        CKPT.free(spark, ids, blocking=False)
        ids = new_ids
    CKPT.free(spark, wids, blocking=False)
    return vocab


def _unigram_fit_pinned(
    df: DataFrame,
    rounds: int = UNIGRAM_EM_ROUNDS,
    max_len: int = UNIGRAM_MAX_PIECE_LEN,
    seed_cap: int = UNIGRAM_SEED_VOCAB,
    text_col: str = "text",
) -> DataFrame:
    """Fitted vocabulary as a PINNED index keyed per (corpus, params) —
    the same train-once-serve-many contract as ``_bpe_fit_pinned``; the
    final round's checkpoint backing rides the pin lifecycle."""
    from ..pinned import pinned

    (vocab,) = pinned(
        ("unigram_fit", df.semanticHash(), rounds, max_len, seed_cap, text_col),
        lambda: (_unigram_fit(df, rounds, max_len, seed_cap, text_col),),
    )
    return vocab


def unigram_vocab(
    df: DataFrame,
    rounds: int = UNIGRAM_EM_ROUNDS,
    text_col: str = "text",
) -> DataFrame:
    """The fitted unigram-LM vocabulary — (piece, cnt), cnt = the
    E-step's freq-weighted Viterbi use count after the final round
    (exact integers; probabilities are cnt/total). Ordered
    (cnt desc, piece asc). The artifact a SentencePiece .model file
    carries, as a relation."""
    return _unigram_fit_pinned(df, rounds, text_col=text_col).orderBy(
        F.col("cnt").desc(), F.col("piece").asc()
    )


def unigram_tokens_per_doc(
    df: DataFrame,
    rounds: int = UNIGRAM_EM_ROUNDS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus encode under the fitted unigram LM: (id, n_pieces) =
    per-document Viterbi piece count — the token-budget number, same
    join shape as ``bpe_tokens_per_doc``: the per-WORD piece count is
    computed once on the vocabulary-sized word table, then broadcast
    (size-gated) into the exploded corpus scan; the 100 TB side never
    shuffles."""
    from ..pinned import pinned
    from ..plans.audit import estimated_size_bytes

    def _seg_build() -> tuple[DataFrame]:
        vocab = _unigram_fit_pinned(df, rounds, text_col=text_col)
        vm = _unigram_vmap(vocab)
        return (
            _unigram_word_table(df, text_col)
            .crossJoin(F.broadcast(vm))
            .select(
                "word",
                F.size(
                    _unigram_final(
                        F.col("word"), F.col("vmap"), UNIGRAM_MAX_PIECE_LEN
                    )["ps"]
                )
                .cast("long")
                .alias("n"),
            ),
        )

    # The word → piece-count dim is itself a serving index (one Viterbi
    # pass over the vocabulary-sized word table) — pinned beside the
    # fitted model so repeated encodes join a cached dim instead of
    # re-folding the DP per call.
    (seg_len,) = pinned(
        ("unigram_seg", df.semanticHash(), int(rounds), text_col), _seg_build
    )
    if estimated_size_bytes(seg_len) <= BROADCAST_DIM_CAP_BYTES:
        seg_len = F.broadcast(seg_len)
    return (
        df.select(
            F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("word")
        )
        .join(seg_len, "word")
        .groupBy(id_col)
        .agg(F.sum("n").cast("long").alias("n_pieces"))
    )


#: Integer weight range of the stand-in classifier model: weights live
#: in [-QUALITY_CLF_SCALE, +QUALITY_CLF_SCALE] and margins are exact
#: BIGINT sums (the logistic is monotone in the margin, so a
#: threshold-on-margin gate is the threshold-on-probability gate).
QUALITY_CLF_SCALE = 1000


def quality_classifier_weights(spark, n_buckets: int = 256) -> DataFrame:
    """The linear quality model as a CONSTANT relation (bucket, w) —
    the artifact a trained fastText-style classifier (Joulin et al.
    2016; the GPT-3/CCNet curation gate) exports. Weights here are a
    DECLARED deterministic stand-in (md5 of the bucket id, folded into
    [-scale, scale]); swapping in genuinely trained weights is a data
    change, not a code change. |relation| = n_buckets — always
    broadcastable."""
    from ..operators.dedup import md5_long

    b = spark.range(n_buckets).select(F.col("id").cast("long").alias("bucket"))
    h = md5_long(F.col("bucket").cast("string"), 15)
    return b.select(
        "bucket",
        (h % (2 * QUALITY_CLF_SCALE + 1) - QUALITY_CLF_SCALE)
        .cast("long")
        .alias("w"),
    )


def quality_classifier_margin(
    df: DataFrame,
    n_buckets: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Learned-quality-classifier application — the standard model-based
    curation gate beside the heuristic ``quality_scores``: margin(doc) =
    Σ_b w(b) · hashed_feature(doc, b), an EXACT integer (so the
    cross-engine check is float-free); keep iff margin ≥ threshold is
    the logistic-probability gate by monotonicity. Returns
    (id, margin).

    Scale: ``hashed_features`` is one scan + one (doc, bucket) sum with
    NO vocabulary table (the hashing trick's point at 100 TB); the
    model join is a broadcast of an n_buckets-row constant relation;
    the margin is one more doc-keyed map-side-combined sum."""
    w = F.broadcast(quality_classifier_weights(df.sparkSession, n_buckets))
    return (
        hashed_features(df, n_buckets, id_col, text_col)
        .join(w, "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("w") * F.col("weight")).cast("long").alias("margin"))
    )


def unigram_encode_tokens_per_doc(
    train_df: DataFrame,
    new_df: DataFrame,
    rounds: int = UNIGRAM_EM_ROUNDS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """INFERENCE half of the unigram-LM tokenizer (the symmetric twin of
    ``bpe_encode_tokens_per_doc``): encode UNSEEN text under the model
    fitted on ``train_df`` — (id, n_pieces) per held-out document.
    Out-of-vocabulary characters segment as single-char UNK pieces at
    the declared sub-minimal probability (``_unigram_vmap``), so every
    held-out word — including ones with characters training never saw —
    gets a total, deterministic segmentation.

    Scale: the held-out corpus reduces to its distinct-word relation
    (Heaps-sublinear), one Viterbi fold per word against the broadcast
    1-row model, then the size-gated broadcast join back into the
    exploded held-out scan — the corpus side never shuffles."""
    from ..pinned import pinned
    from ..plans.audit import estimated_size_bytes

    def _seg_build() -> tuple[DataFrame]:
        vocab = _unigram_fit_pinned(train_df, rounds, text_col=text_col)
        vm = _unigram_vmap(vocab)
        words = (
            new_df.select(F.explode(tokenize(F.col(text_col))).alias("word"))
            .distinct()
        )
        return (
            words.crossJoin(F.broadcast(vm)).select(
                "word",
                F.size(
                    _unigram_final(
                        F.col("word"),
                        F.col("vmap"),
                        UNIGRAM_MAX_PIECE_LEN,
                        unk=F.col("unk_p"),
                    )["ps"]
                )
                .cast("long")
                .alias("n"),
            ),
        )

    (seg_len,) = pinned(
        (
            "unigram_seg_heldout",
            train_df.semanticHash(),
            new_df.semanticHash(),
            int(rounds),
            text_col,
        ),
        _seg_build,
    )
    if estimated_size_bytes(seg_len) <= BROADCAST_DIM_CAP_BYTES:
        seg_len = F.broadcast(seg_len)
    return (
        new_df.select(
            F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("word")
        )
        .join(seg_len, "word")
        .groupBy(id_col)
        .agg(F.sum("n").cast("long").alias("n_pieces"))
    )


#: Jelinek-Mercer interpolation weight of the bigram term; the unigram
#: complement is computed once as ``1.0 - LAM`` in Python and the SAME
#: double is embedded in the oracle via repr() — ``1 - 0.8`` is NOT the
#: double ``0.2``, so deriving the complement independently in SQL
#: would diverge by 1 ulp before the declared 6dp rounding.
BIGRAM_LAM = 0.8


def bigram_logprob_scores(
    df: DataFrame,
    lam: float = BIGRAM_LAM,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Bigram language-model fluency score per document — the
    context-aware sibling of ``unigram_logprob_scores`` and the shape
    of the CCNet perplexity gate (Wenzek et al. 2020, there with an
    external KenLM; here self-scored so the operator is closed over its
    input): score = avg over the doc's adjacent token pairs of
    ln(λ·c₂(x,y)/c₁(x) + (1−λ)·c₁(y)/T) — Jelinek-Mercer interpolated,
    so unseen-bigram mass is covered by the unigram term. Returns
    (id, n_bigrams, bigram_logprob); docs with <2 tokens score NULL,
    rounded to 6dp (absorbs summation-order and libm ulp divergence,
    the unigram gate's declared edge).

    Scale: three shuffles — corpus bigram counts and unigram counts
    (both map-side combined), then the per-doc average; the count
    relations join the occurrence stream with fan-out exactly 1 per
    occurrence and are NOT force-broadcast (a web corpus's bigram
    vocabulary is huge; AQE converts when genuinely small)."""
    toks = df.select(F.col(id_col), tokenize(F.col(text_col)).alias("_toks"))
    t = F.col("_toks")
    pairs = toks.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.size(t) >= 2,
                F.transform(
                    F.slice(t, 1, F.size(t) - 1),
                    lambda x, i: F.struct(
                        x.alias("x"), F.element_at(t, i + 2).alias("y")
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<x:string,y:string>>"))
        ).alias("p"),
    ).select(id_col, F.col("p.x").alias("x"), F.col("p.y").alias("y"))
    c2 = pairs.groupBy("x", "y").agg(F.count(F.lit(1)).alias("cnt2"))
    uni = toks.select(F.explode(t).alias("w"))
    c1 = uni.groupBy("w").agg(F.count(F.lit(1)).alias("cnt1"))
    total = uni.agg(F.count(F.lit(1)).alias("t_all"))
    lp = F.log(
        F.lit(float(lam)) * (F.col("cnt2") / F.col("cx"))
        + F.lit(1.0 - float(lam)) * (F.col("cy") / F.col("t_all"))
    )
    scored = (
        pairs.join(c2, ["x", "y"])
        .join(c1.select(F.col("w").alias("x"), F.col("cnt1").alias("cx")), "x")
        .join(c1.select(F.col("w").alias("y"), F.col("cnt1").alias("cy")), "y")
        .crossJoin(total)  # 1-row combine, same device as the unigram gate
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(F.avg(lp), 6).alias("bigram_logprob"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias(
                "n_bigrams"
            ),
            "bigram_logprob",
        )
    )


#: Absolute-discount constant for the trigram gate (Kneser-Ney's fixed
#: discount, the standard 0.75); embedded as the SAME double literal in
#: the oracle (repr), the BIGRAM_LAM convention.
TRIGRAM_D = 0.75


def trigram_logprob_scores(
    df: DataFrame,
    d: float = TRIGRAM_D,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Interpolated trigram language-model fluency score — one step up
    the CCNet ladder from ``bigram_logprob_scores`` toward the KenLM
    5-gram Kneser-Ney gate (Wenzek et al. 2020), with DECLARED
    simplifications: absolute discounting with a fixed D=0.75 at the
    trigram and bigram levels (KN's discount without its
    continuation-count base), MLE unigrams, self-scored corpus. Per
    trigram position (x, y, z):

        P_uni(z)     = c1(z) / T
        P_bi(z|y)    = max(c2(y,z) − D, 0)/c1(y) + (D·N1+(y·)/c1(y))·P_uni(z)
        P_tri(z|x,y) = max(c3(x,y,z) − D, 0)/c2(x,y)
                       + (D·N1+(x,y,·)/c2(x,y))·P_bi(z|y)

    where N1+(h·) is the distinct-follower count of history h — the
    discount mass each level redistributes to the level below. Scoring
    its own corpus, every observed trigram has c3 ≥ 1 and every context
    c2 ≥ 1, so probabilities are always positive and finite; the
    interpolation is still semantically load-bearing (rare trigrams
    lean on their bigram, rare bigrams on the unigram). Returns
    (id, n_trigrams, trigram_logprob = avg ln P_tri, 6dp); docs with
    < 3 tokens score NULL.

    Scale: all model relations are VOCABULARY-sized (trigram, bigram,
    unigram count tables + two distinct-follower aggregates, each
    map-side combined), and the scoring pass joins the occurrence
    stream with fan-out exactly 1 per join — the bigram gate's shape
    with three more dimension joins; nothing is force-broadcast (web
    trigram vocab is huge; AQE converts genuinely small sides)."""
    dd = float(d)
    toks = df.select(F.col(id_col), tokenize(F.col(text_col)).alias("_toks"))
    t = F.col("_toks")
    triples = toks.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.size(t) >= 3,
                F.transform(
                    F.slice(t, 1, F.size(t) - 2),
                    lambda x, i: F.struct(
                        x.alias("x"),
                        F.element_at(t, i + 2).alias("y"),
                        F.element_at(t, i + 3).alias("z"),
                    ),
                ),
            ).otherwise(
                F.array().cast("array<struct<x:string,y:string,z:string>>")
            )
        ).alias("q"),
    ).select(
        id_col, F.col("q.x").alias("x"), F.col("q.y").alias("y"),
        F.col("q.z").alias("z"),
    )
    pairs = toks.select(
        F.explode(
            F.when(
                F.size(t) >= 2,
                F.transform(
                    F.slice(t, 1, F.size(t) - 1),
                    lambda x, i: F.struct(
                        x.alias("x"), F.element_at(t, i + 2).alias("y")
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<x:string,y:string>>"))
        ).alias("p")
    ).select(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
    c3 = triples.groupBy("x", "y", "z").agg(F.count(F.lit(1)).alias("cnt3"))
    c2 = pairs.groupBy("x", "y").agg(F.count(F.lit(1)).alias("cnt2"))
    f3 = c3.groupBy("x", "y").agg(F.count(F.lit(1)).alias("n1p3"))
    f2 = c2.groupBy("x").agg(F.count(F.lit(1)).alias("n1p2"))
    uni = toks.select(F.explode(t).alias("w"))
    c1 = uni.groupBy("w").agg(F.count(F.lit(1)).alias("cnt1"))
    total = uni.agg(F.count(F.lit(1)).alias("t_all"))

    D = F.lit(dd)
    p_uni = F.col("cz") / F.col("t_all")
    p_bi = (
        F.greatest(F.col("cnt2yz") - D, F.lit(0.0)) / F.col("cy")
        + ((D * F.col("n1p2")) / F.col("cy")) * p_uni
    )
    p_tri = (
        F.greatest(F.col("cnt3") - D, F.lit(0.0)) / F.col("cnt2xy")
        + ((D * F.col("n1p3")) / F.col("cnt2xy")) * p_bi
    )
    scored = (
        triples.join(c3, ["x", "y", "z"])
        .join(
            c2.select(
                F.col("x").alias("x"), F.col("y").alias("y"),
                F.col("cnt2").alias("cnt2xy"),
            ),
            ["x", "y"],
        )
        .join(f3, ["x", "y"])
        .join(
            c2.select(
                F.col("x").alias("y"), F.col("y").alias("z"),
                F.col("cnt2").alias("cnt2yz"),
            ),
            ["y", "z"],
        )
        .join(f2.select(F.col("x").alias("y"), "n1p2"), "y")
        .join(c1.select(F.col("w").alias("y"), F.col("cnt1").alias("cy")), "y")
        .join(c1.select(F.col("w").alias("z"), F.col("cnt1").alias("cz")), "z")
        .crossJoin(total)  # 1-row combine, the unigram/bigram gate device
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_trigrams"),
            F.round(F.avg(F.log(p_tri)), 6).alias("trigram_logprob"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_trigrams"), F.lit(0)).cast("long").alias(
                "n_trigrams"
            ),
            "trigram_logprob",
        )
    )


#: Sliding-window (RAG) chunk width / overlap in tokens. Distinct names
#: from chunk_documents' width/stride pair — r11's re-land of this
#: operator accidentally REDEFINED chunk_documents in this module and
#: silently broke docs_chunks' oracle (reverted, VERDICT r11 task 1);
#: the collision-regression test imports both symbols.
SLIDING_CHUNK_TOKENS = 64
SLIDING_CHUNK_OVERLAP = 16


def sliding_chunks(
    df: DataFrame,
    chunk_tokens: int = SLIDING_CHUNK_TOKENS,
    overlap: int = SLIDING_CHUNK_OVERLAP,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """RAG/embedding-pipeline sliding-window chunking with provenance
    offsets — the sibling of ``chunk_documents`` with the OTHER contract
    the retrieval stack wants: chunk k covers tokens
    [k·(C−O), k·(C−O)+C) of the analyzer token array (C=chunk_tokens,
    O=overlap), the final chunk keeps its partial tail, a document
    shorter than one chunk yields exactly one chunk, empty docs none,
    and **no chunk ever starts past the end** (chunk count =
    1 + ceil(max(n−C, 0)/(C−O)) — chunk_documents by contrast emits a
    window at every stride start up to n−1). Returns
    (id, chunk_idx, start_tok, n_tokens, chunk_fp): start_tok is the
    0-based token offset of the chunk in its document (the provenance
    pointer a retriever needs to highlight the source span) and
    chunk_fp = md5 of the space-rejoined chunk — the identity an
    embedding/dedup stage keys on.

    Scale: ZERO shuffles — tokenize once per row, chunk indices are a
    JVM ``sequence``, the explode is row-local, the fingerprint a
    per-chunk md5; embarrassingly parallel at any corpus size with
    bounded fan-out ≈ n/(C−O) per document."""
    w = chunk_windows(df, chunk_tokens, overlap, id_col, text_col)
    return w.select(
        id_col,
        "chunk_idx",
        "start_tok",
        F.size(F.col("piece")).cast("long").alias("n_tokens"),
        F.md5(F.concat_ws(" ", F.col("piece")).cast("binary")).alias(
            "chunk_fp"
        ),
    )


def chunk_windows(
    df: DataFrame,
    chunk_tokens: int = SLIDING_CHUNK_TOKENS,
    overlap: int = SLIDING_CHUNK_OVERLAP,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The raw token windows behind ``sliding_chunks`` — same coverage
    contract, but KEEPS the token slice: (id, chunk_idx, start_tok,
    piece array<string>). Consumers that need the chunk CONTENT (the
    embedding stage, operators/retrieval.py) build on this; consumers
    that need only identity use ``sliding_chunks``. Zero shuffles —
    row-local tokenize + sequence + explode + slice."""
    stride = int(chunk_tokens) - int(overlap)
    assert stride > 0, "chunk_tokens must exceed overlap"
    toks = df.select(F.col(id_col), tokenize(F.col(text_col)).alias("_t"))
    t = F.col("_t")
    n = F.size(t)
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.lit(1) + F.ceil((n - F.lit(chunk_tokens)) / F.lit(stride))
    )
    chunks = toks.filter(n > 0).select(
        id_col,
        F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias(
            "chunk_idx"
        ),
        t.alias("_t"),
    )
    start = F.col("chunk_idx") * stride
    return chunks.select(
        id_col,
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        start.cast("long").alias("start_tok"),
        F.slice(F.col("_t"), start + 1, chunk_tokens).alias("piece"),
    )


def kn_trigram_logprob_scores(
    df: DataFrame,
    d: float = TRIGRAM_D,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Interpolated Kneser-Ney trigram fluency score — the KenLM
    estimator proper (Kneser & Ney 1995; Chen & Goodman 1999), closing
    the declared gap ``trigram_logprob_scores`` left open: the lower
    levels now use CONTINUATION counts (in how many distinct contexts
    does this word/bigram appear) instead of raw frequencies, which is
    what makes "francisco" — frequent but only ever after "san" —
    score low as a novel continuation. Per trigram position (x, y, z),
    with N1+ counting distinct types:

        P_uni(z)     = N1+(·z) / N1+(··)          (bigram-type fractions)
        P_bi(z|y)    = max(N1+(·yz) − D, 0)/N1+(·y·)
                       + (D·N1+c(y·)/N1+(·y·))·P_uni(z)
        P_tri(z|x,y) = max(c3(x,y,z) − D, 0)/c2(x,y)
                       + (D·N1+(x,y,·)/c2(x,y))·P_bi(z|y)

    where N1+(·yz) = |{x : c3(x,y,z) > 0}| (distinct left contexts of
    the bigram yz), N1+(·y·) = Σ_z N1+(·yz) (trigram types with middle
    y), N1+c(y·) = |{z : N1+(·yz) > 0}| (the follower count on the SAME
    continuation counts the level is built from — Chen & Goodman's
    normalizing choice), N1+(·z) = |{y : c2(y,z) > 0}| and N1+(··) =
    distinct bigram types. Fixed D=0.75 at both discounted levels;
    highest level keeps raw counts (standard interpolated KN).
    Self-scored corpus ⟹ every factor's denominator ≥ 1 (each observed
    trigram IS a left context of its own (y,z), and its (y,z) IS a
    bigram type), so probabilities are positive and finite. Returns
    (id, n_trigrams, kn_logprob = avg ln P_tri, 6dp); docs with < 3
    tokens score NULL.

    Scale: identical shape to ``trigram_logprob_scores`` — every model
    relation is VOCABULARY-sized (c3/c2 count tables plus four
    type-count aggregates DERIVED from them, each map-side combined;
    the continuation tables are strictly smaller than the count tables
    they group), and the scoring pass joins the trigram occurrence
    stream with fan-out exactly 1 per join; the single crossJoin is the
    1-row bigram-type total. Nothing force-broadcast (web trigram vocab
    is huge; AQE converts genuinely small sides)."""
    dd = float(d)
    toks = df.select(F.col(id_col), tokenize(F.col(text_col)).alias("_toks"))
    t = F.col("_toks")
    triples = toks.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.size(t) >= 3,
                F.transform(
                    F.slice(t, 1, F.size(t) - 2),
                    lambda x, i: F.struct(
                        x.alias("x"),
                        F.element_at(t, i + 2).alias("y"),
                        F.element_at(t, i + 3).alias("z"),
                    ),
                ),
            ).otherwise(
                F.array().cast("array<struct<x:string,y:string,z:string>>")
            )
        ).alias("q"),
    ).select(
        id_col, F.col("q.x").alias("x"), F.col("q.y").alias("y"),
        F.col("q.z").alias("z"),
    )
    pairs = toks.select(
        F.explode(
            F.when(
                F.size(t) >= 2,
                F.transform(
                    F.slice(t, 1, F.size(t) - 1),
                    lambda x, i: F.struct(
                        x.alias("x"), F.element_at(t, i + 2).alias("y")
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<x:string,y:string>>"))
        ).alias("p")
    ).select(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
    c3 = triples.groupBy("x", "y", "z").agg(F.count(F.lit(1)).alias("cnt3"))
    c2 = pairs.groupBy("x", "y").agg(F.count(F.lit(1)).alias("cnt2"))
    f3 = c3.groupBy("x", "y").agg(F.count(F.lit(1)).alias("n1p3"))
    # Continuation tables — all derived from the TYPE sets, not tokens:
    cont2 = c3.groupBy("y", "z").agg(F.count(F.lit(1)).alias("cont2"))
    midy = c3.groupBy("y").agg(F.count(F.lit(1)).alias("midy"))
    nf2 = cont2.groupBy("y").agg(F.count(F.lit(1)).alias("nf2"))
    cont1 = c2.groupBy("y").agg(F.count(F.lit(1)).alias("cont1")).select(
        F.col("y").alias("z"), "cont1"
    )
    btypes = c2.agg(F.count(F.lit(1)).alias("btypes"))

    D = F.lit(dd)
    p_uni = F.col("cont1") / F.col("btypes")
    p_bi = (
        F.greatest(F.col("cont2") - D, F.lit(0.0)) / F.col("midy")
        + ((D * F.col("nf2")) / F.col("midy")) * p_uni
    )
    p_tri = (
        F.greatest(F.col("cnt3") - D, F.lit(0.0)) / F.col("cnt2xy")
        + ((D * F.col("n1p3")) / F.col("cnt2xy")) * p_bi
    )
    scored = (
        triples.join(c3, ["x", "y", "z"])
        .join(
            c2.select("x", "y", F.col("cnt2").alias("cnt2xy")), ["x", "y"]
        )
        .join(f3, ["x", "y"])
        .join(cont2, ["y", "z"])
        .join(midy, "y")
        .join(nf2, "y")
        .join(cont1, "z")
        .crossJoin(btypes)  # 1-row combine, the bigram-type total
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_trigrams"),
            F.round(F.avg(F.log(p_tri)), 6).alias("kn_logprob"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_trigrams"), F.lit(0)).cast("long").alias(
                "n_trigrams"
            ),
            "kn_logprob",
        )
    )


def chunk_dupes(
    df: DataFrame,
    chunk_tokens: int = SLIDING_CHUNK_TOKENS,
    overlap: int = SLIDING_CHUNK_OVERLAP,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-document duplicated chunks at the RAG chunk grain — the
    dedup step a retrieval index runs BEFORE embedding (embedding the
    same 64-token window twice wastes GPU time and skews nearest-
    neighbor lists toward duplicated boilerplate). A chunk fingerprint
    appearing in ≥ 2 distinct documents is a dup group; the canonical
    location is the (min doc, min chunk_idx within it) — the dedup
    family's keep-min rule at chunk grain. Returns
    (chunk_fp, n_occurrences, n_docs, first_doc, first_chunk_idx).

    Scale: ``sliding_chunks`` is the zero-shuffle explode; this adds
    only aggregation keyed by the md5 fingerprint (Catalyst lowers the
    distinct-doc count to its standard two-phase (fp, doc) → fp
    expansion, both phases map-side combined) — group count is bounded
    by corpus chunk count, values are five scalars; no joins, no
    windows."""
    ch = sliding_chunks(df, chunk_tokens, overlap, id_col, text_col)
    first = F.min(F.struct(F.col(id_col), F.col("chunk_idx")))
    return (
        ch.groupBy("chunk_fp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.countDistinct(F.col(id_col)).cast("long").alias("n_docs"),
            first.getField(id_col).alias("first_doc"),
            first.getField("chunk_idx").alias("first_chunk_idx"),
        )
        .filter(F.col("n_docs") >= 2)
    )
