"""Data-quality audit operators: referential integrity, key uniqueness,
null/blank profiling.

The reference enforces its integrity invariants imperatively at write
time — the validity filter drops body-less records (O13,
upsert_bizcard_to_es.py), the graph upsert refuses self-loops and
duplicate (src, dst) pairs (O33, upsert_bizcard_to_graph_db.py:104-109),
and DynamoDB/ES conditional writes keep one row per key (O6/O7). A
100 TB lake can't re-validate row-at-a-time on every write; the
warehouse equivalent is a SCAN-TIME AUDIT: declarative checks that run
as ordinary aggregations and produce a small metrics relation a pipeline
gate can assert on (the batch analog of O23's stream counters).

Every check is one scan + one shuffle at most, no broadcast assumptions:

- ``referential_orphan_count``: child rows whose FK misses the parent —
  LEFT ANTI against the parent's DISTINCT key set (the distinct bounds
  join fan-out to 1 per child row; both sides shuffle on the key, AQE
  handles skewed FKs).
- ``duplicate_key_count``: keys with >1 row — groupBy + HAVING, map-side
  combine does the heavy lifting on mostly-unique keys.
- ``null_or_blank_count``: conditional agg in a single pass.

``dq_audit`` assembles named checks into ONE one-row relation via the
1×1 crossJoin device (graph_counts, O34) — each input table is scanned
exactly once per check that needs it, and the tiny result is what a
scheduler alerts on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def referential_orphan_count(
    child: DataFrame, parent: DataFrame, fk: str, pk: str, name: str
) -> DataFrame:
    """One row, one column ``name``: count of child rows whose ``fk``
    has no match in the parent's ``pk`` (NULL FKs count as orphans —
    they reference nothing)."""
    keys = parent.select(F.col(pk).alias(fk)).distinct()
    return (
        child.select(fk)
        .join(keys, fk, "left_anti")
        .agg(F.count(F.lit(1)).alias(name))
    )


def duplicate_key_count(df: DataFrame, key_cols: list[str], name: str) -> DataFrame:
    """One row, one column ``name``: number of key tuples that occur
    more than once."""
    dups = (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 1)
    )
    return dups.agg(F.count(F.lit(1)).alias(name))


def null_or_blank_count(df: DataFrame, col: str, name: str) -> DataFrame:
    """One row, one column ``name``: rows where ``col`` is NULL, or (for
    strings) empty after trim."""
    c = F.col(col)
    cond = c.isNull()
    if dict(df.dtypes)[col] == "string":
        cond = cond | (F.trim(c) == "")
    return df.agg(F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name))


def dq_audit(checks: list[DataFrame]) -> DataFrame:
    """Fold single-metric relations into one one-row audit relation —
    each input is a 1×1; the crossJoins are free."""
    out = checks[0]
    for c in checks[1:]:
        out = out.crossJoin(c)
    return out


def split_source_balance(documents: DataFrame) -> DataFrame:
    """Split-representativeness audit: does the hash split preserve
    each source's share, or did a source land disproportionately in one
    split? The check a pipeline owner runs before trusting dev/test
    numbers — a source over-represented in test makes every eval score
    on it unshippable. One row per (source × split) — including EMPTY
    cells, which are the very skew being audited: (source, split, n,
    n_expected, chi2_term) with n_expected = n_source·n_split/N under
    independence and chi2_term = (n − n_expected)²/n_expected (the
    standard contingency contribution; the caller sums terms against
    its own χ² threshold).

    Determinism: counts are exact integers; n_expected and chi2_term
    are fixed-order IEEE expressions on those integers, rounded at 6dp
    only for display — the oracle spells the identical tree.

    Scale: three count aggregates over one scan each (map-side
    combined); the full grid is |sources|×|splits| — dimension-sized,
    built from the two tiny aggregate relations (the bounded-relation
    cross device, same as dq_audit's 1×1 fold) and left-joined against
    the observed cells.

    The split dimension is the KNOWN domain hash_split emits
    (train/dev/test as a constant relation), not the observed distinct
    splits — a split with ZERO documents overall is the most extreme
    skew of all and must appear in the grid as n=0 rows rather than
    vanish. Its cells have n_expected = 0; the χ² contribution of a
    0-expected 0-observed cell is defined 0 (the standard limit
    convention — and n>0 with n_expected=0 is impossible, since
    n_expected=0 only when the whole split is empty)."""
    from .sampling import SPLIT_NAMES, hash_split

    d = hash_split(documents.select("doc_id", "source"), "doc_id")
    # ONE corpus scan: the finest-grain contingency counts are collected
    # (dimension-sized — |sources|×|splits| rows, the bounded-relation
    # device) and every marginal (per-source, per-split, grand total) is
    # an exact-integer driver fold over them, instead of three more full
    # scans of the split relation computing the same counts.
    spark = documents.sparkSession
    obs_rows = (
        d.groupBy("source", "split").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    n_src: dict[str, int] = {}
    n_split: dict[str, int] = {}
    n_all = 0
    for r in obs_rows:
        n_src[r["source"]] = n_src.get(r["source"], 0) + int(r["n"])
        n_split[r["split"]] = n_split.get(r["split"], 0) + int(r["n"])
        n_all += int(r["n"])
    # The driver already holds every marginal, so the FULL grid is one
    # dimension-sized local relation — no crossJoins of parallelized
    # 1-row frames (each arrives in defaultParallelism partitions, and
    # CartesianProduct multiplies them: 32³ = 32768 tasks for 9 rows).
    # The χ² terms stay SPARK expressions over the exact-integer
    # columns so the IEEE operation order (and hence every rounded
    # float) is identical to the joined form the oracle spells.
    #
    # The grid ships via pandas → Arrow (guide §6): a plain local LIST
    # parallelizes into defaultParallelism pickled Python partitions
    # whose EVERY downstream action pays one Python-worker round trip
    # per partition (measured ~0.15 s × 32 here — and a coalesce(1)
    # serializes the 32 visits into one ~5 s task); the Arrow batch is
    # scanned JVM-side in ~0.1 s.
    import pandas as pd

    obs_n = {(r["source"], r["split"]): int(r["n"]) for r in obs_rows}
    grid = spark.createDataFrame(
        pd.DataFrame(
            [
                (src, spl, obs_n.get((src, spl), 0), ns, n_split.get(spl, 0), n_all)
                for src, ns in sorted(n_src.items())
                for spl in SPLIT_NAMES
            ],
            columns=["source", "split", "n", "n_src", "n_split", "n_all"],
        ).astype(
            {"n": "int64", "n_src": "int64", "n_split": "int64", "n_all": "int64"}
        ),
        "source string, split string, n bigint, "
        "n_src bigint, n_split bigint, n_all bigint",
    )
    ne = F.col("n_src") * F.col("n_split") / F.col("n_all")
    n = F.col("n").cast("long")
    chi2 = F.when(ne == 0, F.lit(0.0)).otherwise((n - ne) * (n - ne) / ne)
    return grid.select(
        "source",
        "split",
        n.alias("n"),
        F.round(ne, 6).alias("n_expected"),
        F.round(chi2, 6).alias("chi2_term"),
    )
