"""As-of join — for each left row, the most recent right row at or
before its timestamp, per key (SURVEY §4 extension family: the temporal
point-lookup every event/feature pipeline needs — "the user's last click
before this error", "the feature value in effect at training time").
The reference has no temporal operator at all; Spark has no ASOF JOIN
either (DuckDB/kdb/Polars do), so this is the (a)-case of the custom-
operator ladder: a composition of built-in DataFrame ops.

Physical strategy — union + window, ONE shuffle, no join:

    tag left rows (is_l=1) and right rows (is_l=0) into one relation,
    shuffle it ONCE by key, sort within partitions by (ts, is_l,
    tie-break), and fill every left row with ``last(right_values,
    ignorenulls=True)`` over the unbounded-preceding row window.

The naive formulations both die at scale: an inequality join
(l.key = r.key AND r.ts <= l.ts) explodes to O(|L_k|·|R_k|) rows per key
before its argmax, and a per-key collect is a driver loop. The union
form is linear: |L|+|R| rows, one hash partition on key, one sort —
exactly the merge an ASOF JOIN performs, expressed declaratively so
Catalyst/AQE still handle skewed keys. Window functions stay inside
whole-stage codegen.

Tie semantics (declared, mirrored in the DuckDB oracle twin):
- A right row with ts EQUAL to the left row's ts matches ("at or
  before"); pass ``strict=True`` for strictly-before.
- Among right rows sharing (key, ts), the greatest ``tie_break`` value
  wins — supply a unique right-side column (an event id) to make the
  result deterministic; without one, equal-ts right rows are unordered.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    tie_break: str | None = None,
    prefix: str = "asof_",
    strict: bool = False,
) -> DataFrame:
    """left.* plus ``{prefix}{c}`` for each right ``value_cols`` column,
    holding the value from the latest right row with
    ``right_ts <= left_ts`` (``<`` when ``strict``) and equal ``on``
    keys; NULL when no such row exists (left-outer semantics)."""
    on = list(on)
    value_cols = list(value_cols)
    val_struct = F.struct(*[F.col(c) for c in value_cols])
    # A typed NULL struct for the left side of the union.
    val_type = right.select(val_struct.alias("_v")).schema["_v"].dataType
    tb_type = (
        right.schema[tie_break].dataType.simpleString() if tie_break else "long"
    )
    tb_col = F.col(tie_break) if tie_break else F.lit(None).cast(tb_type)

    l_tagged = left.select(
        *[F.col(k) for k in on],
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_is_l"),
        F.lit(None).cast(tb_type).alias("_tb"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(val_type).alias("_rval"),
    )
    l_type = l_tagged.schema["_lrow"].dataType
    r_tagged = right.select(
        *[F.col(k) for k in on],
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_is_l"),
        tb_col.alias("_tb"),
        F.lit(None).cast(l_type).alias("_lrow"),
        val_struct.alias("_rval"),
    )

    # At equal ts: inclusive ⇒ right (is_l=0) sorts before left; strict ⇒
    # after. Explicit NULLS FIRST on the tie-break keeps Spark and the
    # DuckDB oracle twin on identical total orders.
    is_l_order = F.col("_is_l").asc() if not strict else F.col("_is_l").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ats").asc(), is_l_order, F.col("_tb").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        l_tagged.unionByName(r_tagged)
        .withColumn("_m", F.last("_rval", ignorenulls=True).over(w))
        .filter(F.col("_is_l") == 1)
    )
    return filled.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in value_cols],
    )
