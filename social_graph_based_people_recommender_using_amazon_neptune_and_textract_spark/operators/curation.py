"""End-to-end training-corpus curation — the composition the individual
north-star operators exist for (BASELINE.json): language gate → quality
gate → exact-dedup canonical filter → near-dup drop → deterministic
train/dev/test split, as ONE declarative plan.

Pipeline rule (declared): the stages compose as INDEPENDENT predicates
over the corpus —

- keep iff predicted language == ``lang`` (functions/text.language_id),
- keep iff quality_score >= ``min_quality`` (functions/text.quality_scores),
- keep iff the doc is the canonical (min-id) member of its exact-text
  group (operators/dedup.dedup_exact),
- drop iff the doc is the larger member of ANY MinHash-verified near-dup
  pair at ``near_dup_threshold`` (operators/dedup.dedup_minhash_lsh),
  independent of whether its partner survives the other gates —

rather than a sequential cascade. Order-independence makes the result
well-defined without specifying stage order, keeps both engines' plans
trivially equivalent, and lets Spark evaluate everything as one pass over
the corpus plus three semi/anti-joins against small derived relations.

Scale: the expensive derived relations (shingle bag, LSH candidates, the
verified pair table) are the SAME pinned relations the standalone dedup
queries use (keys embed ``semanticHash``), so a curation run after a
dedup audit re-reads the cached index rather than re-shingling 100 TB.
The two text gates (language, quality) read from a pinned per-doc
gate-metadata relation (``text_gate_stats`` — the doc-stats table a
curation warehouse materializes): the heavy tokenize/score expressions
evaluate once per corpus in a single projection (where whole-stage
codegen eliminates the shared subexpressions), and every curation run —
at any threshold — filters the cached (doc_id, predicted_lang,
quality_score) rows. Only the relational gates (exact-canonical,
near-dup) join, against small derived relations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import checkpoints
from ..functions.text import language_pred, quality_score_col
from ..pinned import pinned
from .dedup import dedup_exact, dedup_minhash_lsh
from .sampling import hash_split

# Row cap for broadcasting the per-document (doc_id, source) dimension
# into the media manifests. The dim has one row PER DOCUMENT of the
# spawning corpus — trivially broadcastable at bench scale, an
# executor-OOM at 100 TB. Same convention as
# graph/linkpred.WHALE_BROADCAST_CAP.
DIM_BROADCAST_CAP = 5_000_000


def _gated_dim_broadcast(df: DataFrame, cap: int | None = None) -> DataFrame:
    """Broadcast ``df`` only if a bounded probe proves it small.

    ``limit(cap+1).count()`` is the cap+1 probe the repo uses elsewhere
    (operators/components.py:73): it early-terminates the scan once
    cap+1 rows exist, so the gate costs O(cap) rows regardless of
    corpus size. Above the cap the dim rides the shuffle and AQE picks
    the join strategy at runtime."""
    cap = DIM_BROADCAST_CAP if cap is None else cap
    return F.broadcast(df) if df.limit(cap + 1).count() <= cap else df


def text_gate_stats(corpus: DataFrame) -> DataFrame:
    """(doc_id, predicted_lang, quality_score) — per-document gate
    metadata, pinned once per corpus. One corpus scan, one projection;
    thresholds stay OUT of the pinned relation so any (lang,
    min_quality) combination reuses it."""
    (gates,) = pinned(
        ("text_gates", corpus.semanticHash()),
        lambda: (
            corpus.select(
                "doc_id",
                language_pred(F.col("text")).alias("predicted_lang"),
                quality_score_col(F.col("text")).alias("quality_score"),
            ),
        ),
    )
    return gates


def classifier_margins(corpus: DataFrame, n_buckets: int = 256) -> DataFrame:
    """(doc_id, margin) — the learned-quality-classifier margins
    (functions/text.quality_classifier_margin), pinned once per corpus
    exactly like ``text_gate_stats``: thresholds stay OUT of the pinned
    relation so every (gate, threshold) combination reuses it."""
    from ..functions.text import quality_classifier_margin

    (m,) = pinned(
        ("clf_margin", corpus.semanticHash(), n_buckets),
        lambda: (quality_classifier_margin(corpus, n_buckets),),
    )
    return m


def curate(
    corpus: DataFrame,
    lang: str = "en",
    min_quality: float = 0.7,
    near_dup_threshold: float = 0.5,
    train: float = 0.8,
    dev: float = 0.1,
    classifier_min_margin: int | None = None,
) -> DataFrame:
    """(doc_id, split) for documents surviving every gate, split
    deterministically by key hash (leak-free; operators/sampling).

    ``classifier_min_margin`` (optional) adds the model-based quality
    gate: keep iff the learned classifier's integer margin ≥ the
    threshold (functions/text.quality_classifier_margin) — one more
    independent predicate under the module's composition rule, served
    from the pinned margin relation."""
    canon = dedup_exact(corpus).select(
        F.col("canonical_doc_id").alias("doc_id")
    )
    near_b = (
        dedup_minhash_lsh(corpus, threshold=near_dup_threshold)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    kept = (
        text_gate_stats(corpus)
        .filter(
            (F.col("predicted_lang") == F.lit(lang))
            & (F.col("quality_score") >= F.lit(min_quality))
        )
        .select("doc_id")
        .join(canon, "doc_id", "left_semi")
        .join(near_b, "doc_id", "left_anti")
    )
    if classifier_min_margin is not None:
        ok = classifier_margins(corpus).filter(
            F.col("margin") >= F.lit(int(classifier_min_margin))
        )
        kept = kept.join(ok.select("doc_id"), "doc_id", "left_semi")
    return hash_split(kept, "doc_id", train, dev).select("doc_id", "split")


def training_manifest(corpus: DataFrame, budget: int = 10_000) -> DataFrame:
    """The artifact a trainer's data loader actually consumes — the
    composition of the whole LLM-pipeline surface over one corpus:
    ``curate`` gates + split, then FOR THE TRAIN SPLIT a token-budget
    shard assignment (operators/packing.token_shards) and the
    temperature-scaled per-source repetition factor
    (operators/sampling.source_mixture_weights, α = 1/2). Returns
    (doc_id, source, n_tokens, shard_id, boost).

    Mixing weights are computed over the POST-curation train split —
    the distribution the sampler sees — not the raw corpus.

    Scale: everything here is a reuse — the dedup relations are the
    standalone queries' pins, the shard assignment is the two-phase
    prefix sum, the mixture is a |sources|-row broadcast; composing
    adds two semi-joins and one broadcast join, no new corpus pass."""
    from .packing import token_shards
    from .sampling import source_mixture_weights

    kept = curate(corpus)
    train_ids = kept.filter(F.col("split") == "train").select("doc_id")
    docs_t = corpus.join(train_ids, "doc_id", "left_semi").select(
        "doc_id", "text", "source"
    )
    shards = token_shards(docs_t, budget)
    mix = source_mixture_weights(docs_t).select("source", "boost")
    return (
        shards.join(docs_t.select("doc_id", "source"), "doc_id")
        .join(F.broadcast(mix), "source")
        .select("doc_id", "source", "n_tokens", "shard_id", "boost")
    )


def pinned_training_manifest(
    corpus: DataFrame, budget: int = 10_000
) -> DataFrame:
    """``training_manifest`` as a PINNED per-snapshot product — the
    manifest is by nature a build-once artifact (a trainer's loader
    reads it for an entire run); the composition (gates + split +
    prefix-sum shards + mixture) executes once per (corpus, budget) and
    every serve reads the |train|-row relation."""
    (m,) = pinned(
        ("training_manifest", corpus.semanticHash(), int(budget)),
        lambda: (training_manifest(corpus, budget),),
    )
    return m


def media_training_manifest(
    documents: DataFrame, cap: int = 20, byte_budget: int = 4096
) -> DataFrame:
    """The image-side twin of ``training_manifest`` — the composed
    end-to-end story the multimodal tier feeds: decode + quality gates
    → perceptual-hash dedup (canonical survivors only) → per-source
    quota → byte-budget shard packing. Returns
    (media_id, source, n_bytes, shard_id) — what an image trainer's
    loader reads.

    Gates (independent predicates, the module's composition rule):
    - aspect: max(w,h) ≤ 2·min(w,h), integer arithmetic;
    - feature score ≥ FEATURE_SCORE_MIN (mean of the extracted
      features — the aesthetic-scorer gate shape);
    - keep iff NOT a non-canonical member of a pHash dup cluster
      (the base image survives, its re-encodes drop);
    - at most ``cap`` images per source (domain_quota's salted
      two-phase top-k), source inherited from the spawning document.

    Scale: every constituent is a pin or a reuse — image_quality_stats
    and the pHash cluster closure are the standalone queries' pinned
    relations; the quota is the salted two-phase top-k; the shard
    assignment is the generic two-phase prefix sum (weighted_shards)
    with BYTES as the unit. Composing adds two semi/anti joins and one
    dimension join, no new decode pass."""
    from .packing import weighted_shards
    from .quota import domain_quota

    # The unit stream feeds the quota, the semi-join AND (via quota) the
    # final re-attach; unmaterialized, its whole gated/deduped subtree
    # would be instantiated once per consumer — and the eager prefix-sum
    # checkpoint inside weighted_shards executes them all at build time.
    # One tracked localCheckpoint runs it once (guide §3.3: materialize
    # to truncate duplicated subtrees); the relation is skinny
    # (id, source, n_bytes) — survivors only, no payloads.
    src, _ = checkpoints.checkpoint(_image_units(documents))
    quota = domain_quota(
        src, cap, domain_col="source", id_col="media_id"
    ).select("media_id", "source")
    weighted = src.select("media_id", "n_bytes").join(
        quota, "media_id", "left_semi"
    )
    shards = weighted_shards(
        weighted, byte_budget, id_col="media_id", weight_col="n_bytes"
    )
    return shards.join(quota, "media_id").select(
        "media_id", "source", "n_bytes", "shard_id"
    )


def _image_units(documents: DataFrame) -> DataFrame:
    """The image manifest's pre-quota unit stream — gated, pHash-
    canonical survivors with their spawning document's source:
    (media_id, source, n_bytes). Shared by ``media_training_manifest``
    and the cross-modal ``training_manifest_unified``."""
    from .multimodal import (
        ASPECT_MAX_RATIO,
        FEATURE_SCORE_MIN,
        MEDIA_VARIANT_OFFSET,
        image_quality_stats,
        media_dup_clusters,
        synth_media_aug,
    )

    media = synth_media_aug(documents)
    stats = image_quality_stats(media)
    gated = stats.filter(
        (
            F.greatest(F.col("width"), F.col("height"))
            <= F.lit(int(ASPECT_MAX_RATIO))
            * F.least(F.col("width"), F.col("height"))
        )
        & (F.col("score") >= F.lit(float(FEATURE_SCORE_MIN)))
    )
    noncanon = media_dup_clusters(media).filter(
        ~F.col("is_canonical")
    ).select("media_id")
    kept = gated.join(noncanon, "media_id", "left_anti")
    return kept.withColumn(
        "src_id",
        F.when(
            F.col("media_id") >= MEDIA_VARIANT_OFFSET,
            F.col("media_id") - MEDIA_VARIANT_OFFSET,
        ).otherwise(F.col("media_id")),
    ).join(
        _gated_dim_broadcast(
            documents.select(F.col("doc_id").alias("src_id"), "source")
        ),
        "src_id",
    ).select("media_id", "source", F.col("n_bytes").cast("long").alias("n_bytes"))


def pinned_media_training_manifest(
    documents: DataFrame, cap: int = 20, byte_budget: int = 4096
) -> DataFrame:
    """``media_training_manifest`` as a PINNED per-snapshot product —
    the same build-once contract as ``pinned_training_manifest``: an
    image trainer's loader reads the manifest for an entire run, so the
    composition executes once per (corpus, cap, budget)."""
    (m,) = pinned(
        (
            "media_training_manifest",
            documents.semanticHash(),
            int(cap),
            int(byte_budget),
        ),
        lambda: (media_training_manifest(documents, cap, byte_budget),),
    )
    return m


#: AV duration gates: a video needs enough sampled frames / an audio
#: clip enough fingerprint windows to be trainable (the Video-LAION /
#: audio-crawl minimum-duration filter shape — integer header reads).
AV_MIN_FRAMES = 6
AV_MIN_WINDOWS = 4


def media_training_manifest_av(
    documents: DataFrame, cap: int = 20, byte_budget: int = 4096
) -> DataFrame:
    """The video+audio twin of ``media_training_manifest`` — what makes
    the AV dedup tier consumable end-to-end by a trainer's loader:
    duration/aspect gates → copy-detection canonical survivors →
    per-source quota → byte-budget shard packing over the UNIFIED AV
    stream. Returns (media_id, kind, source, n_bytes, shard_id).

    Gates (independent predicates, the module's composition rule):
    - video: aspect max(w,h) ≤ 2·min(w,h) AND n_frames ≥ AV_MIN_FRAMES;
    - audio: window count ≥ AV_MIN_WINDOWS (the container's frame field
      carries duration, read like a real decoder reads it);
    - keep iff NOT a non-canonical member of the modality's copy
      closure — video edges are the UNION of the aligned re-encode
      matches (video_dup_pairs) and the offset-consistent clip matches
      (video_clip_pairs) over the same pinned frame-hash index, audio
      edges are audio_dup_pairs; canonical = min media_id, so the base
      upload survives its re-encodes AND its trimmed re-uploads;
    - at most ``cap`` media per source across BOTH modalities (the
      salted two-phase top-k), source inherited from the spawning
      document.

    Scale: every constituent is a pin or a reuse — the frame/window
    hash indexes and the pair closures are the standalone dedup
    queries' pinned relations; decode headers are pinned per corpus
    (the image tier's quality-stats pattern); the quota is the salted
    two-phase top-k; shards are the generic two-phase byte prefix sum.
    Composition adds two anti-joins, one dimension join and one union —
    no new decode pass, no new candidate generation."""
    from .packing import weighted_shards
    from .quota import domain_quota

    # Materialized once for the same reason as the image manifest: the
    # stream feeds quota + semi-join + the kind re-attach (three plan
    # consumers), and weighted_shards' eager checkpoint would execute
    # the copy-closure subtree per consumer at build time.
    src, _ = checkpoints.checkpoint(_av_units(documents))
    quota = domain_quota(
        src, cap, domain_col="source", id_col="media_id"
    ).select("media_id", "source")
    weighted = src.select("media_id", "n_bytes").join(
        quota, "media_id", "left_semi"
    )
    shards = weighted_shards(
        weighted, byte_budget, id_col="media_id", weight_col="n_bytes"
    )
    return (
        shards.join(quota, "media_id")
        .join(src.select("media_id", "kind"), "media_id")
        .select("media_id", "kind", "source", "n_bytes", "shard_id")
    )


def pinned_media_training_manifest_av(
    documents: DataFrame, cap: int = 20, byte_budget: int = 4096
) -> DataFrame:
    """``media_training_manifest_av`` as a PINNED per-snapshot product —
    the same build-once contract as the image manifest's
    ``pinned_media_training_manifest``: the composition (gates, copy
    closures, quota, shards) executes once per (corpus, cap, budget);
    either release hook drops it and the cold pass re-pays the build."""
    (m,) = pinned(
        (
            "media_training_manifest_av",
            documents.semanticHash(),
            int(cap),
            int(byte_budget),
        ),
        lambda: (media_training_manifest_av(documents, cap, byte_budget),),
    )
    return m


def _av_units(documents: DataFrame) -> DataFrame:
    """The AV manifest's pre-quota unit stream — duration/aspect-gated,
    copy-closure-canonical survivors with their spawning document's
    source: (media_id, kind, source, n_bytes). Shared by
    ``media_training_manifest_av`` and ``training_manifest_unified``."""
    from .components import pinned_connected_components
    from .multimodal import (
        ASPECT_MAX_RATIO,
        MEDIA_CLIP_OFFSET,
        MEDIA_VARIANT_OFFSET,
        decode_media,
        pinned_audio_dup_pairs,
        pinned_video_clip_pairs,
        pinned_video_dup_pairs,
        synth_audio_corpus,
        synth_media_clip_aug,
    )

    videos = synth_media_clip_aug(documents).filter(F.col("kind") == "video")
    audio = synth_audio_corpus(documents)
    (vmeta,) = pinned(
        ("av_video_meta", videos.semanticHash()),
        lambda: (decode_media(videos),),
    )
    (ameta,) = pinned(
        ("av_audio_meta", audio.semanticHash()),
        lambda: (decode_media(audio),),
    )

    vgate = vmeta.filter(
        (
            F.greatest(F.col("width"), F.col("height"))
            <= F.lit(int(ASPECT_MAX_RATIO))
            * F.least(F.col("width"), F.col("height"))
        )
        & (F.col("n_frames") >= F.lit(int(AV_MIN_FRAMES)))
    )
    agate = ameta.filter(F.col("n_frames") >= F.lit(int(AV_MIN_WINDOWS)))

    # The verified pair tables are the standalone dedup queries' PINNED
    # indexes — reused here, not regenerated (the banded join + exact
    # verification runs once per corpus snapshot for ALL consumers).
    vedges = (
        pinned_video_dup_pairs(videos)
        .select("media_a", "media_b")
        .unionByName(
            pinned_video_clip_pairs(videos).select("media_a", "media_b")
        )
        .distinct()
    )
    aedges = (
        pinned_audio_dup_pairs(audio).select("media_a", "media_b").distinct()
    )

    def _noncanon(edges):
        cc = pinned_connected_components(
            edges, a_col="media_a", b_col="media_b"
        )
        return cc.filter(F.col("label") != F.col("node")).select(
            F.col("node").alias("media_id")
        )

    vkept = vgate.join(_noncanon(vedges), "media_id", "left_anti").select(
        "media_id",
        F.lit("video").alias("kind"),
        F.col("payload_len").cast("long").alias("n_bytes"),
    )
    akept = agate.join(_noncanon(aedges), "media_id", "left_anti").select(
        "media_id",
        F.lit("audio").alias("kind"),
        F.col("payload_len").cast("long").alias("n_bytes"),
    )
    kept = vkept.unionByName(akept)

    mid = F.col("media_id")
    return kept.withColumn(
        "src_id",
        F.when(mid >= MEDIA_CLIP_OFFSET, mid - MEDIA_CLIP_OFFSET)
        .when(mid >= MEDIA_VARIANT_OFFSET, mid - MEDIA_VARIANT_OFFSET)
        .otherwise(mid),
    ).join(
        _gated_dim_broadcast(
            documents.select(F.col("doc_id").alias("src_id"), "source")
        ),
        "src_id",
    ).select("media_id", "kind", "source", "n_bytes")


def _text_units(corpus: DataFrame) -> DataFrame:
    """The text modality's unit stream for the cross-modal manifest:
    curation-gated TRAIN-split documents, weighted in BYTES (the unit
    the unified shard stream packs — octet_length, so text competes
    with media payloads in one budget):
    (doc_id, source, n_bytes)."""
    train = curate(corpus).filter(F.col("split") == "train").select("doc_id")
    return corpus.join(train, "doc_id", "left_semi").select(
        "doc_id",
        "source",
        F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
    )


def training_manifest_unified(
    documents: DataFrame, cap: int = 20, byte_budget: int = 4096
) -> DataFrame:
    """ONE manifest across text + image + video + audio — the r12
    verdict's cross-modal gap closed: the three per-modality manifests
    each applied their own per-source quota, so a source at cap in one
    modality could still hold 3× cap across the corpus. Here every
    modality's pre-quota unit stream (the SAME gated/deduped survivors
    the standalone manifests consume — _text_units, _image_units,
    _av_units) is unioned under a composite unit identity
    uid = kind || '#' || id, ONE ``domain_quota`` caps each source
    across all modalities, and ONE byte-budget prefix-sum shard stream
    packs the survivors in uid order. Returns
    (kind, unit_id, source, n_bytes, shard_id).

    Declared rules: quota preference is the house md5(uid) order —
    modality-blind, so a source's cap slots go to its md5-first units
    regardless of kind; the shard stream's total order is uid
    lexicographic (audio < image < text < video — deterministic in
    both engines); text weighs in at octet_length(text) bytes.

    Scale: the three unit streams are pure reuses of pinned/gated
    relations (no new corpus pass, no new candidate generation); the
    union adds no shuffle; the quota is the salted two-phase top-k
    (bounded survivors per source regardless of skew); the shard
    assignment is the generic two-phase prefix sum over the ≤
    |sources|·cap quota survivors — output-sized."""
    from .packing import weighted_shards
    from .quota import domain_quota

    uid = F.concat(
        F.col("kind"), F.lit("#"), F.col("unit_id").cast("string")
    )
    text = _text_units(documents).select(
        F.lit("text").alias("kind"),
        F.col("doc_id").alias("unit_id"),
        "source",
        "n_bytes",
    )
    img = _image_units(documents).select(
        F.lit("image").alias("kind"),
        F.col("media_id").alias("unit_id"),
        "source",
        "n_bytes",
    )
    av = _av_units(documents).select(
        "kind", F.col("media_id").alias("unit_id"), "source", "n_bytes"
    )
    # ONE materialization of the cross-modal unit stream: it feeds the
    # quota, the weighted semi-join and the final re-attach join — three
    # plan consumers over the union of the three modality subtrees
    # (text gates + image dedup closure + AV copy closure). Lazy, that
    # subtree executed ~3× per call (twice eagerly inside
    # weighted_shards' prefix-sum checkpoint, once in the final join)
    # and produced a ~6,300-line physical plan; checkpointed, every
    # consumer reads the skinny (kind, unit_id, source, n_bytes, uid)
    # survivors relation (guide §3.3).
    units, _ = checkpoints.checkpoint(
        text.unionByName(img).unionByName(av).withColumn("uid", uid)
    )
    quota = domain_quota(
        units, cap, domain_col="source", id_col="uid"
    ).select("uid")
    weighted = units.select("uid", "n_bytes").join(quota, "uid", "left_semi")
    shards = weighted_shards(
        weighted, byte_budget, id_col="uid", weight_col="n_bytes"
    )
    return shards.join(
        units.select("uid", "kind", "unit_id", "source"), "uid"
    ).select("kind", "unit_id", "source", "n_bytes", "shard_id")


def pinned_training_manifest_unified(
    documents: DataFrame, cap: int = 20, byte_budget: int = 4096
) -> DataFrame:
    """``training_manifest_unified`` as a PINNED per-snapshot product —
    the same build-once contract as the per-modality manifests."""
    (m,) = pinned(
        (
            "training_manifest_unified",
            documents.semanticHash(),
            int(cap),
            int(byte_budget),
        ),
        lambda: (training_manifest_unified(documents, cap, byte_budget),),
    )
    return m
