"""Interval-overlap join — the two-sided range join Spark lacks (DuckDB
ships ASOF + range joins; Spark would plan the raw inequality join as a
BroadcastNestedLoop, O(|A|·|B|) per key).

The scalable composition (custom-operator ladder case (a)): bucket every
interval into coarse time CELLS (``explode(sequence(start_cell,
end_cell))``), equi-join on (key, cell) — co-partitioned, map-side
plannable — dedupe the pairs that shared several cells, then apply the
EXACT overlap predicate and compute the overlap length. Work is
O(overlapping pairs + interval-span/cell fan-out), never the per-key
cross product. Day cells fit the testdata's session/run spans; a
production deployment picks the cell so typical intervals span O(1)
cells (multi-resolution cells are the refinement for mixed scales).

Open-ended intervals (NULL end — the SCD2 current run) are capped by
the DECLARED far-future sentinel for arithmetic, and their cell
fan-out is capped by the other side's maximum cell — an open run can
only overlap sessions that exist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DAY_US = 86_400_000_000
#: Declared +inf for open interval ends: 2100-01-01 UTC in micros.
OPEN_END_US = 4102444800000000


def sessions_status_overlap(events: DataFrame) -> DataFrame:
    """Every (session, concurrent status run) pair with its overlap
    length: sessions (closed [start, end] micros, from the gap
    sessionizer) joined to the user's signup/error SCD2 runs
    (half-open [from, to), NULL to = current). Overlap iff
    ``session_start < run_end AND run_start <= session_end``;
    overlap_us = min(end, run_end) − max(start, run_start) — exact
    integer arithmetic. Returns (user_id, session_seq,
    status_event_id, status_type, overlap_us)."""
    from .scd import scd2_history
    from .sessionize import session_stats

    sess = session_stats(events).select(
        "user_id", "session_seq", "start_us", "end_us"
    )

    dim_src = events.filter(F.col("event_type").isin("signup", "error"))
    runs_raw = scd2_history(
        dim_src, ["user_id"], "ts", ["event_id"], "event_type"
    )
    w = Window.partitionBy("user_id", "valid_from").orderBy(
        F.col("event_id").desc()
    )
    runs = (
        runs_raw.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("status_event_id"),
            F.col("event_type").alias("status_type"),
            F.unix_micros("valid_from").alias("r_start"),
            F.coalesce(
                F.unix_micros("valid_to"), F.lit(OPEN_END_US)
            ).alias("r_end"),
        )
    )

    max_cell = sess.agg(
        F.max((F.col("end_us") / DAY_US).cast("long")).alias("__mx")
    )
    s_cells = sess.withColumn(
        "cell",
        F.explode(
            F.sequence(
                (F.col("start_us") / DAY_US).cast("long"),
                (F.col("end_us") / DAY_US).cast("long"),
            )
        ),
    )
    # An overlapping run must START no later than the last session
    # cell — filtering on that BEFORE the explode both prunes the
    # fan-out and guarantees start ≤ stop in the sequence (with
    # start > stop, F.sequence silently DESCENDS, exploding cells
    # before the run even begins). Empty sessions → NULL __mx → the
    # predicate is NULL → no run cells, explicitly: no sessions can
    # mean no overlaps.
    r_cells = (
        runs.crossJoin(F.broadcast(max_cell))
        .filter((F.col("r_start") / DAY_US).cast("long") <= F.col("__mx"))
        .withColumn(
            "cell",
            F.explode(
                F.sequence(
                    (F.col("r_start") / DAY_US).cast("long"),
                    F.least(
                        (F.col("r_end") / DAY_US).cast("long"), F.col("__mx")
                    ),
                )
            ),
        )
        .drop("__mx")
    )

    pairs = (
        s_cells.join(r_cells, ["user_id", "cell"])
        .drop("cell")
        .distinct()  # a pair sharing several cells collapses to one row
    )
    return (
        pairs.filter(
            (F.col("start_us") < F.col("r_end"))
            & (F.col("r_start") <= F.col("end_us"))
        )
        .select(
            "user_id",
            "session_seq",
            "status_event_id",
            "status_type",
            (
                F.least(F.col("end_us"), F.col("r_end"))
                - F.greatest(F.col("start_us"), F.col("r_start"))
            ).cast("long").alias("overlap_us"),
        )
    )
