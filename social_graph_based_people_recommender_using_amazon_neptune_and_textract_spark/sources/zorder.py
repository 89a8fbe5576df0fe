"""Z-order (Morton-curve) clustered layout — MULTI-column file skipping,
the fourth member of the physical-layout family: bucketed.py (exchange
elimination), partitioned.py (directory pruning), clustered.py
(single-column min/max skipping), and this module (min/max skipping on
TWO high-cardinality columns at once).

Single-column range clustering gives one column tight disjoint per-file
ranges and leaves every other column's per-file range spanning the whole
domain — a predicate on the second column skips nothing. Interleaving
the bits of both columns' quantized values onto one space-filling curve
(Morton/Z-order — Delta OPTIMIZE ZORDER BY and Iceberg's sort-order
rewrite are this exact device, public) makes files contiguous on the
CURVE, so each file's footer min/max is tight on BOTH columns
(each file covers ~a square cell of the value grid, side ~sqrt(cell
area), instead of a full-width stripe). A conjunctive range predicate
then intersects ~(sel_x · sel_y)-proportional files instead of sel_x
alone.

Everything is JVM-side expression arithmetic: per-column min/max from
one tiny aggregate (broadcast back via 1-row crossJoin), 16-bit
quantization, the classic bit-spreading shifts, one range shuffle on
the z-value, an in-partition sort. Like clustering/compaction this is a
full-table maintenance rewrite on a cadence, not a per-append path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .clustered import DEFAULT_FILES

#: Bits per dimension (two dimensions → 32-bit z-values). 16 bits ≈
#: 65k cells per axis — far finer than any practical file count, so
#: quantization never limits skipping granularity.
ZBITS = 16


def _spread_bits(x: Column) -> Column:
    """Interleave-ready bit spread: the classic Morton magic-number
    sequence, placing each of the low 16 bits of ``x`` at even
    positions of a 32-bit value."""
    x = (x.bitwiseOR(F.shiftleft(x, 8))).bitwiseAND(F.lit(0x00FF00FF))
    x = (x.bitwiseOR(F.shiftleft(x, 4))).bitwiseAND(F.lit(0x0F0F0F0F))
    x = (x.bitwiseOR(F.shiftleft(x, 2))).bitwiseAND(F.lit(0x33333333))
    x = (x.bitwiseOR(F.shiftleft(x, 1))).bitwiseAND(F.lit(0x55555555))
    return x


def _quantized(col: Column, cmin: Column, cmax: Column) -> Column:
    """Min-max quantization of ``col`` to [0, 2^ZBITS): rank position
    along the column's global range. Degenerate (constant) columns
    quantize to 0 — the curve then degrades to single-column order."""
    span = (cmax - cmin).cast("double")
    frac = F.when(
        span > 0, (col.cast("double") - cmin.cast("double")) / span
    ).otherwise(F.lit(0.0))
    q = F.floor(frac * F.lit((1 << ZBITS) - 1)).cast("long")
    return F.greatest(F.lit(0), F.least(q, F.lit((1 << ZBITS) - 1)))


def zorder_value(df: DataFrame, col_x: str, col_y: str) -> Column:
    """The 32-bit Morton code column for (col_x, col_y); requires the
    per-column bounds to be attached as _xmin/_xmax/_ymin/_ymax."""
    xq = _quantized(F.col(col_x), F.col("_xmin"), F.col("_xmax"))
    yq = _quantized(F.col(col_y), F.col("_ymin"), F.col("_ymax"))
    return _spread_bits(xq).bitwiseOR(F.shiftleft(_spread_bits(yq), 1))


def write_zordered(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    n_files: int = DEFAULT_FILES,
) -> None:
    """Rewrite ``df`` Z-order-clustered on (col_x, col_y): one bounds
    aggregate (1-row broadcast), one range shuffle on the Morton code,
    one sorted file per curve segment."""
    reserved = {"_xmin", "_xmax", "_ymin", "_ymax", "_z"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            f"write_zordered reserves column names {sorted(reserved)}; "
            f"input already has {sorted(clash)}"
        )
    bounds = df.agg(
        F.min(col_x).alias("_xmin"),
        F.max(col_x).alias("_xmax"),
        F.min(col_y).alias("_ymin"),
        F.max(col_y).alias("_ymax"),
    )
    out_cols = df.columns
    (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("_z", zorder_value(df, col_x, col_y))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .select(*out_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def read_zordered(spark: SparkSession, path: str) -> DataFrame:
    """Plain path read — skipping comes from the parquet footer
    statistics the files already carry (no catalog support needed)."""
    return spark.read.parquet(path)
