"""Incremental ANN-index maintenance — the vector twin of the BM25
maintainer (search/incremental.py): new embeddings arrive per
micro-batch and are upserted into the IVF cell assignments WITHOUT a
full rebuild, so `ann_ivf`-shaped queries serve ingest-time vectors.

State (one atomically-swapped snapshot root, family swap protocol —
fsutil.prepare_swap/commit_swap with recover-on-read):

- ``cells``  (vec_id, label, embedding) — the inverted cell lists,
             append-only with arrival dedup: a batch's vectors are
             anti-joined against the current cell table, so an
             at-least-once re-delivery adds nothing (vectors are
             immutable by declaration — re-ingest of a known vec_id is
             a no-op, the boilerplate-dictionary FROZEN-state pattern).
- ``cstats`` (label, pos, n, s) — per-cell running centroid partials
             (count + per-dimension sum) folded in additively per
             batch; the codebook at read time is s/n per dimension, so
             a drained stream's centroids equal the batch per-label
             means over the full corpus — no read-time scan of the
             vector corpus (the reason the partials are maintained
             rather than derived: re-aggregating means is a full-index
             pass at every serve).

The last-applied batch id rides an underscore marker inside the swapped
root: replayed batch ids are skipped whole (crash-atomicity for the
two-table update — both tables swap together), and the cells anti-join
covers cross-restart redelivery below the marker's granularity.

Invariant (pinned by tests + the shared driver oracle): after draining
the corpus in ANY batch split, ``query()`` row-equals batch
``ann_ivf`` over the same corpus — operators/similarity.ivf_serve is
shared verbatim, only the index construction differs.

Scale: per batch the work is O(batch) for the partials + one anti-join
against the cell table + the snapshot rewrite (the declared local
simplification — a Delta/Iceberg MERGE at warehouse scale, same
semantics); cstats is k·dim rows — constant; nothing driver-side."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import fsutil
from ..operators.similarity import _to_double, ivf_serve, norm2, with_norm


class IncrementalANNIndexer:
    _MARKER = "_applied_batch_id"

    def __init__(self, spark: SparkSession, out_dir: str) -> None:
        self.spark = spark
        self.root = f"{out_dir}/annix"

    # -- state access ------------------------------------------------------

    def _applied_batch_id(self) -> int | None:
        fsutil.recover_swap(self.spark, self.root, self._MARKER)
        raw = fsutil.read_utf8(self.spark, f"{self.root}/{self._MARKER}")
        return int(raw) if raw is not None else None

    def _read(self, sub: str) -> DataFrame | None:
        if not fsutil.exists(self.spark, f"{self.root}/{sub}"):
            return None
        return self.spark.read.parquet(f"{self.root}/{sub}")

    # -- maintenance -------------------------------------------------------

    def _process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        applied = self._applied_batch_id()
        if applied is not None and batch_id <= applied:
            return
        cur_cells = self._read("cells")
        cur_stats = self._read("cstats")
        b = batch_df.select("vec_id", "label", "embedding").dropDuplicates(
            ["vec_id"]
        )
        new = (
            b
            if cur_cells is None
            else b.join(cur_cells.select("vec_id"), "vec_id", "left_anti")
        )
        partial = (
            new.select(
                "label",
                F.posexplode(_to_double(F.col("embedding"))).alias(
                    "pos", "x"
                ),
            )
            .groupBy("label", "pos")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("x").alias("s"),
            )
        )
        stats = (
            partial
            if cur_stats is None
            else cur_stats.unionByName(partial)
            .groupBy("label", "pos")
            .agg(
                F.sum("n").cast("long").alias("n"),
                F.sum("s").alias("s"),
            )
        )
        cells = new if cur_cells is None else cur_cells.unionByName(new)
        tmp = fsutil.prepare_swap(self.spark, self.root, self._MARKER)
        cells.write.mode("overwrite").parquet(f"{tmp}/cells")
        stats.write.mode("overwrite").parquet(f"{tmp}/cstats")
        fsutil.write_utf8(self.spark, f"{tmp}/{self._MARKER}", str(batch_id))
        fsutil.commit_swap(self.spark, self.root)

    def run_available_now(
        self,
        landing_dir: str,
        checkpoint_dir: str,
        schema: str = "vec_id long, embedding array<float>, label int",
        max_files_per_trigger: int | None = None,
        timeout_s: int = 300,
    ) -> None:
        reader = self.spark.readStream.schema(schema)
        if max_files_per_trigger is not None:
            reader = reader.option(
                "maxFilesPerTrigger", max_files_per_trigger
            )
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
            raise TimeoutError("ANN index maintainer did not drain in time")
        if q.exception() is not None:
            raise q.exception()

    # -- serving -----------------------------------------------------------

    def index(self) -> tuple[DataFrame, DataFrame]:
        """(base, cents) over the CURRENT snapshots — ivf_serve's
        contract. Raises if nothing was ever ingested."""
        fsutil.recover_swap(self.spark, self.root, self._MARKER)
        cells = self._read("cells")
        stats = self._read("cstats")
        if cells is None or stats is None:
            raise ValueError(f"no ANN index under {self.root}: ingest first")
        base = with_norm(cells.select("vec_id", "label", "embedding"))
        cents = (
            stats.withColumn("m", F.col("s") / F.col("n"))
            .groupBy("label")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("centroid")
            )
            .withColumn("cn2", norm2(F.col("centroid")))
        )
        return base, cents

    def query(
        self, query_ids: list[int], k: int = 10, nprobe: int = 1
    ) -> DataFrame:
        """`ann_ivf` over the live index — shared search path, so a
        drained index answers identically to the batch operator."""
        base, cents = self.index()
        return ivf_serve(base, cents, query_ids, k, nprobe)
