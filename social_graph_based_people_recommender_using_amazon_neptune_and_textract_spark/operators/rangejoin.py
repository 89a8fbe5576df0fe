"""Bounded range join — pairs within a time window (SURVEY §4 extension
family: "every click within 5 minutes before an error", feature windows,
impression↔conversion attribution). A range predicate is trivial SQL,
but Spark plans a bare ``l.key = r.key AND r.ts BETWEEN …`` as a
BroadcastNestedLoopJoin whenever the equi-key is skew-small or absent —
O(|L|·|R|) compared pairs and a forced broadcast: the classic 100 TB
killer. DuckDB/Databricks ship a dedicated range-join optimization; this
operator is that device composed from built-in DataFrame ops.

Physical strategy — bucketize + equi-join + residual:

    bucket width w = hi - lo (the window span). Each right row lands in
    bucket floor(ts/w); each left row's admissible interval
    [l+lo, l+hi] spans AT MOST two consecutive buckets, so the left side
    explodes into ≤2 (key, bucket) probe rows, the join is a plain
    EQUI-join on (key, bucket) — hash-partitioned, AQE-skew-handled,
    codegen — and the exact window is enforced by a residual filter.

Work is O(|L| + |R| + |matching bucket pairs|): each compared pair
shares a bucket, so comparisons are proportional to genuine temporal
locality, never |L|·|R| per key. The explode factor is a constant 2.

The join is INNER ("pairs within the window"); rows with no partner
drop. Output columns: left row + right row with ``r_`` prefix on
collisions (declared), plus nothing else — deterministic row set, no
tie-breaking needed (all matches are returned, not an argmax).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bounded_range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower_s: float,
    upper_s: float,
    prefix: str = "r_",
) -> DataFrame:
    """All (left, right) pairs with equal ``on`` keys and
    ``left_ts + lower_s <= right_ts <= left_ts + upper_s`` (seconds,
    either bound may be negative — "5 minutes BEFORE" is lower=-300,
    upper=0). Right columns that collide with left names come back
    ``{prefix}``-renamed."""
    if upper_s < lower_s:
        raise ValueError(f"empty window: [{lower_s}, {upper_s}]")
    on = list(on)
    w = upper_s - lower_s
    if w <= 0:
        # zero-width window: an equi-join on (key, exact shifted ts)
        w = 1.0

    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))
    w_us = int(w * 1_000_000)
    lo_us = int(lower_s * 1_000_000)
    hi_us = int(upper_s * 1_000_000)

    # Left probes the ≤2 buckets its window can touch.
    lo_bucket = F.floor((l_us + F.lit(lo_us)) / F.lit(w_us))
    hi_bucket = F.floor((l_us + F.lit(hi_us)) / F.lit(w_us))
    l_exploded = left.withColumn(
        "_bucket",
        F.explode(F.array_distinct(F.array(lo_bucket, hi_bucket))),
    )
    r_bucketed = right.withColumn("_bucket", F.floor(r_us / F.lit(w_us)))

    collide = set(left.columns) & set(right.columns)
    r_renamed = r_bucketed.select(
        "_bucket",
        *[
            F.col(c).alias(f"{prefix}{c}" if c in collide else c)
            for c in right.columns
        ],
    )
    r_ts_out = f"{prefix}{right_ts}" if right_ts in collide else right_ts
    on_pairs = [
        (k, f"{prefix}{k}" if k in collide else k) for k in on
    ]
    cond = l_exploded["_bucket"] == r_renamed["_bucket"]
    for lk, rk in on_pairs:
        cond = cond & (l_exploded[lk] == r_renamed[rk])

    delta = F.unix_micros(F.col(r_ts_out)) - F.unix_micros(F.col(left_ts))
    return (
        l_exploded.join(r_renamed, cond)
        .filter((delta >= F.lit(lo_us)) & (delta <= F.lit(hi_us)))
        .drop("_bucket")
        .drop(*[rk for lk, rk in on_pairs if rk != lk])
    )
