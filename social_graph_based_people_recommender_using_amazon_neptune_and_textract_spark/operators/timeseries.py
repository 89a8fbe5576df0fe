"""Time-series smoothing over aggregated series — simple exponential
smoothing (SES), the first model every forecasting stack ships
(level_t = α·y_t + (1−α)·level_{t−1}, Brown 1956).

The Spark-shape question for ANY sequential recurrence: where does the
sequential part run? Answer: the HEAVY work (aggregating raw facts into
the series) is distributed; the recurrence itself runs over the
aggregated series — bounded rows per series (84 months here), collected
into an ordered array INSIDE the row and folded with a JVM
``aggregate`` lambda. No window over raw facts, no driver loop, and for
many series (per segment/store/SKU) the same shape groups by series key
with per-group state bounded by the series length.

Determinism across engines: the fold is sequential by construction, so
Spark's left fold and the oracle's recursive CTE execute the identical
IEEE op sequence (α and 1−α are written as the same literals, never
derived); the input series values are exact-decimal sums rounded at
4dp. Levels round at 6dp for display only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Smoothing factor and its complement — BOTH literal, so neither
#: engine computes 1−α (a differently-rounded constant would diverge).
ALPHA = 0.3
ONE_MINUS_ALPHA = 0.7


def ses_levels(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    alpha: float = ALPHA,
    one_minus_alpha: float = ONE_MINUS_ALPHA,
) -> DataFrame:
    """Monthly exact-decimal sums of ``value_col`` smoothed by SES.
    Returns (month_us, revenue, level): level₀ = y₀, then the
    recurrence. One distributed aggregate + one single-row fold."""
    monthly = (
        df.groupBy(F.date_trunc("month", F.col(ts_col)).alias("mon"))
        .agg(
            F.round(
                F.sum(F.col(value_col).cast("decimal(18,6)")).cast("double"),
                4,
            ).alias("y")
        )
    )
    series = monthly.agg(
        F.sort_array(F.collect_list(F.struct("mon", "y"))).alias("s")
    )
    step = lambda acc, x: F.concat(
        acc,
        F.array(
            F.when(F.size(acc) == 0, x["y"]).otherwise(
                F.lit(alpha) * x["y"]
                + F.lit(one_minus_alpha) * F.element_at(acc, -1)
            )
        ),
    )
    leveled = series.select(
        "s",
        F.aggregate(
            "s", F.array().cast("array<double>"), step
        ).alias("levels"),
    )
    return leveled.select(
        F.posexplode("s").alias("i", "row"), F.col("levels")
    ).select(
        F.unix_micros(F.col("row.mon")).alias("month_us"),
        F.col("row.y").alias("revenue"),
        F.round(F.element_at("levels", F.col("i") + 1), 6).alias("level"),
    )


def ses_levels_by(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = ALPHA,
    one_minus_alpha: float = ONE_MINUS_ALPHA,
) -> DataFrame:
    """Multi-series SES: one independent recurrence per ``key_col``
    group. Returns (key, month_us, revenue, level).

    The grouped form is where the shape earns its keep at scale: the
    month aggregate shuffles once on (key, month), the per-series fold
    runs inside each group's single row, and series process in
    parallel across the cluster — a million SKUs cost a million small
    folds, not a million driver loops."""
    monthly = (
        df.groupBy(
            F.col(key_col).alias("k"),
            F.date_trunc("month", F.col(ts_col)).alias("mon"),
        )
        .agg(
            F.round(
                F.sum(F.col(value_col).cast("decimal(18,6)")).cast("double"),
                4,
            ).alias("y")
        )
    )
    series = monthly.groupBy("k").agg(
        F.sort_array(F.collect_list(F.struct("mon", "y"))).alias("s")
    )
    step = lambda acc, x: F.concat(
        acc,
        F.array(
            F.when(F.size(acc) == 0, x["y"]).otherwise(
                F.lit(alpha) * x["y"]
                + F.lit(one_minus_alpha) * F.element_at(acc, -1)
            )
        ),
    )
    leveled = series.select(
        "k",
        "s",
        F.aggregate("s", F.array().cast("array<double>"), step).alias(
            "levels"
        ),
    )
    return leveled.select(
        "k", F.posexplode("s").alias("i", "row"), F.col("levels")
    ).select(
        F.col("k").alias(key_col),
        F.unix_micros(F.col("row.mon")).alias("month_us"),
        F.col("row.y").alias("revenue"),
        F.round(F.element_at("levels", F.col("i") + 1), 6).alias("level"),
    )
