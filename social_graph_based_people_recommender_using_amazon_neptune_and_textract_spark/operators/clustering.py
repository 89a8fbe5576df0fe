"""Deterministic k-means (Lloyd) over the embeddings table — the *train*
step of the IVF index (operators/similarity.ann_ivf consumes any label
column; this produces one from the data).

Design for oracle-checkability (the reason this is NOT `pyspark.ml`):

- **Deterministic seeding**: centroids start from the ``k`` smallest
  ``vec_id`` vectors — no RNG, so both engines and every replay converge
  identically (kmeans++ would trade that for recall of a better local
  optimum; declared).
- **Unrolled iterations**: ``iters`` is a small fixed constant and each
  Lloyd round is a static DataFrame stage (assign = broadcast-centroid
  cross join + per-vector argmin; update = element-wise mean), so the
  whole fit is ONE declarative plan — no driver loop state, and the
  DuckDB twin is the same CTE chain unrolled.
- **Declared tie orders**: assignment argmin breaks distance ties by
  cluster id ascending; an emptied cluster keeps its previous centroid.

Scale: per round the work is one N×k broadcast nested-loop (k centroids
are a tiny broadcast list) and one groupBy(cluster) mean — the textbook
distributed k-means shape. The N side is never collected; doubling
``iters`` adds stages, not shuffles per stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from .similarity import _to_double, dot, norm2


def _assign(base: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, v, n2, cluster): nearest centroid by squared L2
    (‖x‖² + ‖c‖² − 2·x·c); ties → smallest cluster id."""
    d2 = F.col("n2") + F.col("cn2") - 2 * dot(F.col("v"), F.col("centroid"))
    w = Window.partitionBy("vec_id").orderBy(
        F.asc("d2"), F.asc("cluster")
    )
    return (
        base.crossJoin(F.broadcast(cents))
        .select("vec_id", "v", "n2", "cluster", F.round(d2, 6).alias("d2"))
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select("vec_id", "v", "n2", "cluster")
    )


def _update(assigned: DataFrame, cents: DataFrame) -> DataFrame:
    """Element-wise mean per cluster; clusters that lost every member
    keep their previous centroid (left join + coalesce)."""
    pos = assigned.select(
        "cluster", F.posexplode(F.col("v")).alias("pos", "x")
    )
    # means rounded to 6dp: makes the fitted centroids reproducible
    # across engines/summation orders (the determinism contract every
    # float in this engine follows) before they feed the next argmin.
    means = (
        pos.groupBy("cluster", "pos")
        .agg(F.round(F.avg("x"), 6).alias("m"))
        .groupBy("cluster")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("new_centroid")
        )
    )
    kept = cents.join(means, "cluster", "left").select(
        "cluster",
        F.coalesce(F.col("new_centroid"), F.col("centroid")).alias("centroid"),
    )
    return kept.withColumn("cn2", norm2(F.col("centroid")))


def kmeans_fit(base: DataFrame, k: int = 4, iters: int = 2) -> DataFrame:
    """Fitted centroids after ``iters - 1`` Lloyd update rounds from the
    deterministic seed. ``base`` must carry (vec_id, v, n2). Returns
    (cluster, centroid, cn2) — the train half of the train/search split
    (ann_pq fits one of these per subspace)."""
    # TakeOrdered k seeds (distributed top-k, NOT a global window — a
    # single-partition window over N rows would serialize the scan);
    # the k-row result then gets its 0..k-1 ids from a tiny local sort.
    w = Window.orderBy(F.asc("vec_id"))
    seeds = (
        base.orderBy(F.asc("vec_id"))
        .limit(k)
        .withColumn("cluster", (F.row_number().over(w) - 1).cast("int"))
        .select(
            "cluster",
            F.col("v").alias("centroid"),
            F.col("n2").alias("cn2"),
        )
    )

    cents = seeds
    for _ in range(iters - 1):
        cents = _update(_assign(base, cents), cents)
    return cents


def kmeans_assign(
    embeddings: DataFrame, k: int = 4, iters: int = 2
) -> DataFrame:
    """Cluster assignment under the centroids produced by ``iters - 1``
    Lloyd update rounds from the deterministic seed (i.e. ``iters``
    assignment passes total). Returns (vec_id, cluster)."""
    base = embeddings.select(
        "vec_id", _to_double(F.col("embedding")).alias("v")
    ).withColumn("n2", norm2(F.col("v")))
    cents = kmeans_fit(base, k, iters)
    return _assign(base, cents).select(
        "vec_id", F.col("cluster").cast("int").alias("cluster")
    )
