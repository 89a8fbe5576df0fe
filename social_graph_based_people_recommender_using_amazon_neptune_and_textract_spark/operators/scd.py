"""Slowly-changing-dimension (type 2) history from an event log.

The reference keeps only the *latest* status per key (DynamoDB upsert,
upsert_bizcard_to_es.py's last-write-wins — O7/O6); a warehouse wants the
full validity history: one row per *run* of equal values with
``valid_from`` / ``valid_to`` / ``is_current``. This is the standard SCD2
build from an append-only change log.

Shape: two window functions over the SAME partitioning+ordering
(partition by key, order by event time then id) — Catalyst plans them in
a single Window operator after one shuffle:

1. change filter: keep a row iff its tracked value differs from the
   previous row's (lag), i.e. the first row of each run;
2. validity: ``valid_to`` = next change's ``valid_from`` (lead), null on
   the open (current) run.

Scale: one hash exchange on the key + per-partition sort — the same
budget as ``latest_by_key``; no self-joins, no driver state. Skewed keys
(one entity with millions of events) sort within a partition — the same
boundary as every windowed operator here, handled by AQE skew splitting
upstream of the window when it bites.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key: Sequence[str],
    ts: str,
    order_tiebreak: Sequence[str],
    tracked: str,
) -> DataFrame:
    """SCD2 rows for ``tracked``: adds valid_from, valid_to, is_current.

    A row survives iff it *changes* the tracked value for its key;
    consecutive equal values collapse into the run's first row. Total
    order within a key is (ts, *order_tiebreak) ascending — the declared
    deterministic tie rule (SURVEY R4).
    """
    order = [F.col(ts).asc()] + [F.col(c).asc() for c in order_tiebreak]
    w = Window.partitionBy(*key).orderBy(*order)
    prev = F.lag(F.col(tracked)).over(w)
    changed = prev.isNull() | (prev != F.col(tracked))
    runs = df.withColumn("_chg", changed).filter(F.col("_chg")).drop("_chg")
    # lead() over the filtered rows, same partitioning -> same exchange.
    w2 = Window.partitionBy(*key).orderBy(*order)
    return (
        runs.withColumn("valid_from", F.col(ts))
        .withColumn("valid_to", F.lead(F.col(ts)).over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
    )
