"""Synthesize an sf1 dataset (10x sf0.1) for local scale probes.

The driver ships sf0.001/0.01/0.1 only (TESTDATA.md); the 100 TB story
needs at least one decade of measured scaling (r5 verdict item 4), so
this script replicates sf0.1 ten times with disjoint key spaces into
``/root/repo/.scratch/sf1`` (gitignored — derived data, ~10x sf0.1 on
disk). Replica 0 is the identity, so every sf0.1 row exists verbatim.

Replication is key-offset, preserving every foreign-key relationship
(each replica is a self-contained copy, like TPC-H's repeatable
portion): custkey/suppkey/partkey/vec_id/user_id +1e6·r, orderkey +1e7·r,
event_id/doc_id +1e8·r (doc_id clears the aug-corpus +1e6/+2e6 bands).
region/nation stay fixed — TPC-H keeps them constant across SF.

Two content perturbations keep workload character honest at 10x:
- documents: for r > 0 every 3rd token is salted with the replica tag,
  so every 3-gram shingle contains >=1 salted token and cross-replica
  near-dup similarity collapses to ~0 (10 verbatim copies of the corpus
  would instead add 45 exact-dup pairs per doc and turn the dedup
  benches into a different, artificially quadratic workload). ~2/3 of
  tokens — including most stopwords — survive, so language-ID/quality
  distributions stay close to sf0.1. n_chars is recomputed.
- embeddings: +r·1e-3 on every coordinate, so ANN top-k has no 10-way
  exact distance ties.

Run:  python tools/make_sf1.py   (idempotent; ~1 min on local[32])
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"
DST = os.path.join(REPO, ".scratch", "sf1")
REPLICAS = 10

#: (table, {column: per-replica offset}) — columns not listed copy as-is.
OFFSETS = {
    "customer": {"c_custkey": 10**6},
    "supplier": {"s_suppkey": 10**6},
    "part": {"p_partkey": 10**6},
    "orders": {"o_orderkey": 10**7, "o_custkey": 10**6},
    "lineitem": {"l_orderkey": 10**7, "l_partkey": 10**6, "l_suppkey": 10**6},
    "events": {"event_id": 10**8, "user_id": 10**6},
    "documents": {"doc_id": 10**8},
    "embeddings": {"vec_id": 10**6},
}
COPY_ONLY = ["region", "nation"]


def main() -> None:
    from pyspark.sql import functions as F

    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.session import (
        get_spark,
    )

    spark = get_spark(
        "make-sf1", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    os.makedirs(DST, exist_ok=True)

    for t in COPY_ONLY:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{DST}/{t}.parquet")
        print(f"{t}: copied")

    for t, offs in OFFSETS.items():
        base = spark.read.parquet(f"{SRC}/{t}.parquet")
        reps = []
        for r in range(REPLICAS):
            rep = base
            for col, step in offs.items():
                rep = rep.withColumn(col, F.col(col) + F.lit(r * step))
            if t == "documents" and r > 0:
                toks = F.split(F.col("text"), " ")
                salted = F.array_join(
                    F.transform(
                        toks,
                        lambda x, i: F.when(
                            i % 3 == 0, F.concat(x, F.lit(f"q{r}"))
                        ).otherwise(x),
                    ),
                    " ",
                )
                rep = rep.withColumn("text", salted).withColumn(
                    "n_chars", F.length("text").cast("long")
                )
            if t == "embeddings" and r > 0:
                rep = rep.withColumn(
                    "embedding",
                    F.transform(
                        F.col("embedding"),
                        lambda x: (x + F.lit(r * 1e-3)).cast("float"),
                    ),
                )
            reps.append(rep)
        out = reps[0]
        for rep in reps[1:]:
            out = out.unionByName(rep)
        out.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
        print(f"{t}: {out.count()} rows")

    spark.stop()


if __name__ == "__main__":
    main()
