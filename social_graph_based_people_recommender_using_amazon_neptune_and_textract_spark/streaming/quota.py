"""Incremental domain-quota maintenance — the corpus-composition member
of the engine's incrementally-maintained index family (inverted search
index: search/incremental.py; LSH signature index: streaming/neardup.py;
CMS counters: operators/sketches.py).

Per micro-batch: union the stored kept-set with the batch's documents
and re-rank per domain, keeping ≤ cap rows each — state on disk is
bounded by |domains|·cap FOREVER, regardless of how many documents have
streamed past.

Convergence contract (the property the test pins): a drained stream's
kept-set is IDENTICAL to batch ``operators/quota.domain_quota`` over the
full corpus. The greedy prune loses nothing because the md5 preference
is STATIC: a document dropped in batch k was beaten by ``cap`` better
documents, each of which can only ever be displaced by still-better
ones — so the dropped document could never re-enter the final top-cap.

Replay-safe under foreachBatch's at-least-once contract by the same
device as the CMS accumulator: the last-applied batch id rides an
underscore marker INSIDE the swap directory, so counters and marker
become visible in one atomic rename and a re-delivered batch is
detected and skipped. (Quota re-application is actually idempotent —
re-ranking the same union changes nothing — but the guard keeps the
family's protocol uniform and saves the wasted rewrite.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import fsutil
from ..operators.quota import _pref


class StreamingQuotaAccumulator:
    _MARKER = "_applied_batch_id"

    def __init__(
        self,
        spark,
        out_dir: str,
        cap: int,
        domain_col: str = "source",
        id_col: str = "doc_id",
        id_type: str = "long",
    ) -> None:
        """``id_type``: DDL type of ``id_col`` for the never-ran empty
        relation (r7 ADVICE: hardcoding it diverges the empty-state
        schema from the oracle's when the id is not a long)."""
        self.spark = spark
        self.cap = cap
        self.domain_col = domain_col
        self.id_col = id_col
        self.id_type = id_type
        self.table_dir = f"{out_dir}/quota"

    def _applied_batch_id(self) -> int | None:
        fsutil.recover_swap(self.spark, self.table_dir, self._MARKER)
        raw = fsutil.read_utf8(self.spark, f"{self.table_dir}/{self._MARKER}")
        return int(raw) if raw is not None else None

    def _process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        applied = self._applied_batch_id()
        if applied is not None and batch_id <= applied:
            return
        cand = batch_df.select(self.domain_col, self.id_col)
        if fsutil.exists(self.spark, self.table_dir):
            cand = (
                self.spark.read.parquet(self.table_dir)
                .select(self.domain_col, self.id_col)
                .unionByName(cand)
            )
        w = Window.partitionBy(self.domain_col).orderBy(*_pref(self.id_col))
        kept = (
            cand.withColumn("rk", F.row_number().over(w).cast("long"))
            .filter(F.col("rk") <= self.cap)
        )
        tmp = fsutil.prepare_swap(self.spark, self.table_dir, self._MARKER)
        kept.write.mode("overwrite").parquet(tmp)
        fsutil.write_utf8(self.spark, f"{tmp}/{self._MARKER}", str(batch_id))
        fsutil.commit_swap(self.spark, self.table_dir)

    def run_available_now(
        self,
        landing_dir: str,
        checkpoint_dir: str,
        schema: str,
        max_files_per_trigger: int | None = None,
        timeout_s: int = 300,
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
            raise TimeoutError("streaming quota did not drain in time")
        if q.exception() is not None:
            raise q.exception()

    def kept(self) -> DataFrame:
        """The accumulated kept-set (domain, id, rk); empty relation if
        no batch ever ran (degrade, don't crash on a missing path)."""
        fsutil.recover_swap(self.spark, self.table_dir, self._MARKER)
        if not fsutil.exists(self.spark, self.table_dir):
            return self.spark.createDataFrame(
                [],
                f"{self.domain_col} string, "
                f"{self.id_col} {self.id_type}, rk long",
            )
        return self.spark.read.parquet(self.table_dir)
