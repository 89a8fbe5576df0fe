"""Link-prediction scores: Jaccard and Adamic-Adar PYMK variants.

The reference's PYMK (neptune_recommend_bizcard.py:56-73) ranks
candidates by raw 2-hop path count. The two classic refinements of that
score (Liben-Nowell & Kleinberg, "The Link Prediction Problem for Social
Networks", CIKM'03 — public) reweight the same candidate set:

- **Jaccard**: |N(u) ∩ N(c)| / |N(u) ∪ N(c)| — normalizes mutual-friend
  count by the combined neighborhood, so a candidate who shares 3 of
  their 5 friends with you outranks a celebrity who shares 3 of 5,000.
- **Adamic-Adar**: Σ_{w ∈ N(u) ∩ N(c)} 1 / ln(deg(w)) — a shared friend
  who knows only 3 people is stronger evidence than one who knows 3,000.

Both use SET neighborhood semantics (distinct neighbors), unlike the
flagship's bag semantics — declared; the candidate set and the
source/friend exclusion rule are identical to the Gremlin traversal
(``aggregate('friends')`` … ``without('friends')``).

Scale design (single-user query):
- The set-symmetrized view + set-degree table are pinned per edge
  relation (shared by both scores and reused across calls).
- The friend list of ONE user is small in the common case → broadcast to
  the scoring join, so the only shuffle is the per-candidate aggregate.
  A whale source (friend list too big to broadcast) flips to plain
  shuffle joins — runtime-adaptive, same discipline as pymk.py's
  FRIEND_SIDE_COLLECT_CAP gate.
- Degrees attach AFTER the candidate aggregate (candidates ≤ 2-hop
  frontier, far smaller than the vertex set); the source degree enters
  as a broadcast 1-row relation, never a driver collect.
- Top-k orders on the ROUNDED score (Jaccard 9dp — one exact IEEE
  division, both engines identical; Adamic-Adar 6dp — a float sum whose
  addend order differs across engines) then id: deterministic,
  oracle-identical, TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..pinned import effective_key, memo, pinned
from .model import symmetrize

#: Above this many friends the broadcast hint is withheld and the scoring
#: join runs as a plain shuffle join (AQE may still re-plan it). 5M ids
#: ≈ 40 MB — the practical broadcast ceiling on a production executor.
WHALE_BROADCAST_CAP = 5_000_000


def _bs_deg(edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(bs, deg): the SET-symmetrized neighbor view (distinct (src, dst))
    and the set-degree table (id, d), pinned together per edge relation.

    bs is re-hashed on src after the distinct: every consumer joins or
    aggregates it on the tail vertex (the scoring joins here, each LPA
    round in communities.py, the degree aggregate below), so paying one
    exchange at pin time gives hash(src) co-location to all of them —
    per-round loops then shuffle only their vertex-sized state."""
    return pinned(
        ("graph_bs", edges.semanticHash()),
        lambda: (
            (
                bs := symmetrize(edges)
                .select("src", "dst")
                .distinct()
                .repartition(F.col("src"))
            ),
            bs.groupBy(F.col("src").alias("id")).agg(
                F.count(F.lit(1)).alias("d")
            ),
        ),
    )


def _friends(bs: DataFrame, user_id) -> DataFrame:
    """Distinct neighbor set of the source — (id) rows; bs is already
    distinct so no dedup needed."""
    return bs.filter(F.col("src") == user_id).select(F.col("dst").alias("id"))


def _n_friends(edges: DataFrame, friends: DataFrame, user_id) -> int:
    """The whale-gate degree probe, memoized on the pinned view's
    lifecycle (the BM25 CollectionStatistics pattern): the count job
    runs once per (edge relation, user), not once per scoring call."""
    parent = effective_key(("graph_bs", edges.semanticHash()))
    return memo(
        ("n_friends", parent, user_id), lambda: friends.count(), parent=parent
    )


def _maybe_broadcast(df: DataFrame, n: int):
    return F.broadcast(df) if n <= WHALE_BROADCAST_CAP else df


def jaccard_pymk(edges: DataFrame, user_id, k: int = 10) -> DataFrame:
    """Top-``k`` (id, jaccard) candidates for ``user_id`` — 2-hop
    non-friends ranked by Jaccard neighborhood overlap."""
    bs, deg = _bs_deg(edges)
    friends = _friends(bs, user_id)
    n_friends = _n_friends(edges, friends, user_id)
    fr = _maybe_broadcast(friends, n_friends)

    # Common-neighbor count per candidate: bs is distinct on (src, dst),
    # so count(*) per dst counts distinct shared friends. One shuffle.
    common = (
        bs.join(fr, bs["src"] == fr["id"])
        .groupBy(bs["dst"].alias("id"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    dc = deg.select("id", F.col("d").alias("dc"))
    du = deg.filter(F.col("id") == user_id).select(F.col("d").alias("du"))
    return (
        common.join(dc, "id")
        .crossJoin(F.broadcast(du))  # 1-row source degree
        .filter(F.col("id") != user_id)
        .join(fr.select("id"), "id", "left_anti")
        .select(
            "id",
            F.round(
                F.col("c").cast("double")
                / (F.col("du") + F.col("dc") - F.col("c")),
                9,
            ).alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), F.col("id").asc())
        .limit(k)
    )


def adamic_adar_pymk(edges: DataFrame, user_id, k: int = 10) -> DataFrame:
    """Top-``k`` (id, aa) candidates for ``user_id`` — 2-hop non-friends
    ranked by Adamic-Adar (Σ 1/ln(deg(w)) over shared friends w).

    deg(w) ≥ 2 for every term that reaches an included candidate (w
    neighbors both the source and the candidate, which are distinct), so
    ln never sees 1. The friend-degree relation is built by restricting
    the degree table to the friend set BEFORE the edge-scan join — the
    big table is scanned once and joined against a friend-sized side."""
    bs, deg = _bs_deg(edges)
    friends = _friends(bs, user_id)
    n_friends = _n_friends(edges, friends, user_id)
    deg_f = _maybe_broadcast(
        deg.join(_maybe_broadcast(friends, n_friends), "id"), n_friends
    )

    scored = (
        bs.join(deg_f, bs["src"] == deg_f["id"])
        .groupBy(bs["dst"].alias("id"))
        .agg(F.sum(F.lit(1.0) / F.log(F.col("d"))).alias("s"))
    )
    fr = _maybe_broadcast(friends, n_friends)
    return (
        scored.filter(F.col("id") != user_id)
        .join(fr, "id", "left_anti")
        .select("id", F.round("s", 6).alias("aa"))
        .orderBy(F.col("aa").desc(), F.col("id").asc())
        .limit(k)
    )


def negative_edge_samples(edges: DataFrame) -> DataFrame:
    """Deterministic negative sampling for link-prediction training
    (the standard 1:1 negatives-per-positive recipe, e.g. node2vec's
    training-pair generation — public): for every positive edge (u, v),
    propose the partner at rank ``md5(u:v) mod |V|`` in the vertex-id
    total order — a fixed pseudo-random pick both engines compute
    identically — then drop proposals that collide with a REAL edge
    (either direction) or a self-loop. Returns (u, v_neg);
    |output| ≤ |edges| (proposals lost to collisions are dropped, not
    re-drawn — declared, keeps the operator one-pass).

    Scale: the vertex ranking is the two-phase range-partitioned
    row_number (no single-partition window); |V| enters as a broadcast
    1-row aggregate; the proposal→vertex resolution is ONE equi-join on
    the rank; the edge-collision filter is a key-partitioned anti-join
    on the symmetrized view. Nothing driver-side, nothing quadratic."""
    from ..operators.dedup import md5_long
    from ..operators.ranking import global_row_number

    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    ranked = global_row_number(verts, [F.col("id").asc()], rn_col="rn")
    total = ranked.agg(F.count(F.lit(1)).alias("n_verts"))
    prop = (
        edges.select(
            F.col("src").alias("u"),
            md5_long(F.concat_ws(":", F.col("src"), F.col("dst")), 15).alias(
                "h"
            ),
        )
        .crossJoin(F.broadcast(total))
        .select("u", ((F.col("h") % F.col("n_verts")) + 1).alias("rn"))
    )
    cand = prop.join(ranked, "rn").select(
        "u", F.col("id").alias("v_neg")
    )
    from .model import symmetrize

    bi = symmetrize(edges).select(
        F.col("src").alias("u"), F.col("dst").alias("v_neg")
    )
    return cand.filter(F.col("u") != F.col("v_neg")).join(
        bi, ["u", "v_neg"], "left_anti"
    )
