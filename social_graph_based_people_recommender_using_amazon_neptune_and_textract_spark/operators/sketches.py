"""Mergeable distinct-count sketches (Apache DataSketches HLL, built
into Spark 3.5+ as ``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate``).

The 100 TB story exact COUNT(DISTINCT) cannot tell: build a fixed-size
sketch per fine grain ONCE (per day, per partition file), persist the
binary, and answer every coarser rollup — weekly, monthly, arbitrary
day sets — by MERGING sketches, never re-scanning the fact. Merge is
register-wise max: associative, commutative, idempotent — exactly the
algebra partial aggregation and incremental pipelines need (a late
backfill just re-sketches its day and the rollup re-merges).

Accuracy is the standard HLL relative standard error ~1.04/sqrt(2^lgK)
(~1.6% at the default lgK=12). Estimates are NOT bit-stable across
partitionings (partial-merge structure perturbs the register set while
in sparse mode), so there is no DuckDB oracle — the registered query is
rows-only by declaration, and the suite pins the error bound against
the exact count plus the merge-vs-direct consistency instead (the same
evidence style as the multimodal codec boundary).

The exact twin (``rolling_active_users``-style countDistinct) remains
the oracle-checked path; this module is its declared drop-in for scales
where exactness stops being worth a fact re-scan per rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def daily_user_sketches(events: DataFrame, lg_k: int = 12) -> DataFrame:
    """(day, sketch): one fixed-size HLL binary per day — the persisted
    sketch table every coarser distinct rollup merges from. One
    map-side-combined aggregate; sketch size is 2^lg_k registers
    regardless of row count."""
    return events.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", F.lit(lg_k)).alias("sketch")
    )


def rollup_distinct_users(
    daily: DataFrame, period_col=None
) -> DataFrame:
    """Merge daily sketches to a coarser period (default: calendar
    month) and estimate distinct users per period — no fact access,
    work ∝ #days, not #events."""
    period = (
        period_col
        if period_col is not None
        else F.date_trunc("month", F.col("day")).cast("date").alias("month")
    )
    return daily.groupBy(period).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("users_est")
    )


def monthly_distinct_users(events: DataFrame, lg_k: int = 12) -> DataFrame:
    """End-to-end composition: sketch per day, merge per month."""
    return rollup_distinct_users(daily_user_sketches(events, lg_k))


def monthly_distinct_users_exact(events: DataFrame) -> DataFrame:
    """The sketch rollup's exact twin through the SAME monthly scaffold
    — (month, users) by COUNT(DISTINCT user_id). This is the
    hash-checkable half of the pair (r7 verdict item 2): the grouping
    pipeline the HLL query rides is verified against the DuckDB oracle
    here, and the suite pins |HLL estimate − exact| within the declared
    rsd bound per month, so the only unverified bytes left in the
    sketch path are the DataSketches registers themselves."""
    return (
        events.groupBy(
            F.date_trunc("month", F.to_date("ts")).cast("date").alias("month")
        )
        .agg(F.count_distinct("user_id").alias("users"))
    )


# --- count-min sketch (deterministic, oracle-checkable) --------------------

#: Count-min geometry: depth d=3 pairwise-independent-ish hash rows of
#: width w=1024. Overestimate bound: est ≤ true + 2N/w with probability
#: ≥ 1 − (1/2)^d over the hash draw (Cormode & Muthukrishnan, public);
#: the hashes here are FIXED affine maps over the engine's md5 base
#: hash, so — unlike the HLL binaries — the whole sketch is a plain
#: (depth, bucket, cnt) relation both engines compute bit-identically.
CMS_DEPTH = 3
CMS_WIDTH = 1024
CMS_P = 2147483647  # 2^31 − 1, the engine's minhash modulus
CMS_A = [974711, 2356097, 3811949]
CMS_B = [15485863, 32452843, 49979687]


def _cms_base(col):
    from .dedup import md5_long

    return md5_long(col.cast("string")) % CMS_P


def cms_sketch(df: DataFrame, col: str) -> DataFrame:
    """(depth, bucket, cnt): the d×w counter table for the values of
    ``col`` — the mergeable frequency summary (counters ADD across
    partitions/days, the same algebra as the HLL register-max).

    One scan: each row explodes to its d (depth, bucket) coordinates
    (declared constant fan-out), then one map-side-combined aggregate.
    The materialized sketch is ≤ d·w rows regardless of input size."""
    base = _cms_base(F.col(col))
    coords = F.array(
        *[
            F.struct(
                F.lit(i).alias("depth"),
                (
                    (F.lit(CMS_A[i]) * base + F.lit(CMS_B[i]))
                    % CMS_P
                    % CMS_WIDTH
                ).alias("bucket"),
            )
            for i in range(CMS_DEPTH)
        ]
    )
    return (
        df.select(F.explode(coords).alias("c"))
        .groupBy(F.col("c.depth").alias("depth"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimates(sketch: DataFrame, items: DataFrame, col: str) -> DataFrame:
    """min-over-depths point estimates for ``items[col]`` against a
    ``cms_sketch`` table: one equi-join on (depth, bucket) with constant
    per-item fan-out d, then a min aggregate. Never scans the fact."""
    base = _cms_base(F.col(col))
    probes = items.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("depth"),
                        (
                            (F.lit(CMS_A[i]) * base + F.lit(CMS_B[i]))
                            % CMS_P
                            % CMS_WIDTH
                        ).alias("bucket"),
                    )
                    for i in range(CMS_DEPTH)
                ]
            )
        ).alias("c"),
    ).select("*", F.col("c.depth").alias("depth"), F.col("c.bucket").alias("bucket"))
    group_cols = [c for c in items.columns]
    return (
        probes.join(F.broadcast(sketch), ["depth", "bucket"])
        .groupBy(*group_cols)
        .agg(F.min("cnt").alias("cms_est"))
    )


def cms_heavy_hitters(events: DataFrame, k: int = 10) -> DataFrame:
    """Top-``k`` users by exact event count with their count-min
    estimate beside: (user_id, exact_cnt, cms_est) — the sketch-audit
    relation (est ≥ exact always; est − exact is collision mass, the
    quantity the 2N/w bound governs).

    At 100 TB the exact side is the expensive auditable baseline and
    the sketch is the serving path; both are produced here so the
    registered query hash-checks the ENTIRE sketch pipeline against the
    oracle — the deterministic counterpoint to the rows-only HLL."""
    exact = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    top = exact.orderBy(F.col("exact_cnt").desc(), F.col("user_id").asc()).limit(k)
    sk = cms_sketch(events, "user_id")
    return cms_estimates(sk, top, "user_id").select(
        "user_id", "exact_cnt", "cms_est"
    )


class StreamingCmsAccumulator:
    """Incremental count-min maintenance — the frequency-sketch member
    of the engine's incrementally-maintained index family (inverted
    search index: search/incremental.py; LSH signature index:
    streaming/neardup.py; this: CMS counters).

    Per micro-batch: sketch the BATCH (d·w-bounded relation) and fold
    it into the stored counter table by bucket-wise addition — the CMS
    merge algebra, so a drained stream's counters are IDENTICAL to the
    batch sketch of the full corpus (the convergence contract the test
    pins). State on disk is ≤ d·w rows forever; each batch's write is a
    materialize-then-swap of that tiny table (the neardup compaction
    device), so a crash leaves the old or the new counters, never a
    partial sum.

    Replay-safe under foreachBatch's at-least-once contract: the
    last-applied ``batch_id`` is written as an underscore-prefixed
    marker INSIDE the swap directory before the rename, so the counters
    and the marker become visible in the same atomic swap (underscore
    files are invisible to Spark's parquet reader). A batch re-delivered
    after a driver crash between swap and checkpoint commit is detected
    (``batch_id <= marker``) and skipped instead of double-summed."""

    _MARKER = "_applied_batch_id"

    def __init__(self, spark, out_dir: str, col: str) -> None:
        self.spark = spark
        self.col = col
        self.table_dir = f"{out_dir}/cms"

    def _applied_batch_id(self) -> int | None:
        from .. import fsutil

        fsutil.recover_swap(self.spark, self.table_dir, self._MARKER)
        raw = fsutil.read_utf8(
            self.spark, f"{self.table_dir}/{self._MARKER}"
        )
        return int(raw) if raw is not None else None

    def _process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        from .. import fsutil

        applied = self._applied_batch_id()
        if applied is not None and batch_id <= applied:
            return
        delta = cms_sketch(batch_df, self.col)
        if fsutil.exists(self.spark, self.table_dir):
            merged = (
                self.spark.read.parquet(self.table_dir)
                .unionByName(delta)
                .groupBy("depth", "bucket")
                .agg(F.sum("cnt").alias("cnt"))
            )
        else:
            merged = delta
        tmp = fsutil.prepare_swap(self.spark, self.table_dir, self._MARKER)
        merged.write.mode("overwrite").parquet(tmp)
        fsutil.write_utf8(self.spark, f"{tmp}/{self._MARKER}", str(batch_id))
        fsutil.commit_swap(self.spark, self.table_dir)

    def run_available_now(
        self, landing_dir: str, checkpoint_dir: str, schema: str,
        max_files_per_trigger: int | None = None, timeout_s: int = 300,
    ) -> None:
        reader = self.spark.readStream.schema(schema)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        q = (
            reader.parquet(landing_dir)
            .writeStream.foreachBatch(self._process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_s)
        if q.isActive:
            q.stop()
            raise TimeoutError("streaming CMS did not drain in time")
        if q.exception() is not None:
            raise q.exception()

    def counters(self) -> DataFrame:
        from .. import fsutil

        fsutil.recover_swap(self.spark, self.table_dir, self._MARKER)
        if not fsutil.exists(self.spark, self.table_dir):
            return self.spark.createDataFrame(
                [], "depth int, bucket long, cnt long"
            )
        return self.spark.read.parquet(self.table_dir)
