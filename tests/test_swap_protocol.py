"""Crash matrix for the ONE directory-swap protocol every swapped table
now shares (fsutil.prepare_swap / commit_swap / recover_swap — r7
verdict item 5: the rollup, quota, CMS accumulators, LSH candidate
compaction, and sources/compact.py were four near-duplicate copies of
the same subtle dance, and the r6/r7 ADVICE bugs both lived in those
seams).

The protocol's states, in commit order:

  A. temp fully written, live intact          (crash before any rename)
  B. live renamed to trash, temp intact       (crash between renames)
  C. temp renamed to live, trash present      (crash before trash GC)

Matrix: from every state, a reader (recover_swap) and the next writer
(prepare_swap) must land on a complete table — old content for A,
new content for B and C — never an empty dir, never a phantom sibling
visible to Spark's discovery.
"""

from pyspark.sql import functions as F

from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
    fsutil,
)


def _write(spark, path, lo, hi):
    spark.range(lo, hi).withColumn("v", F.col("id") * 2).write.mode(
        "overwrite"
    ).parquet(path)


def _ids(spark, path):
    return sorted(r["id"] for r in spark.read.parquet(path).collect())


def _staged_swap(spark, tmp_path):
    """A swap advanced to state A: old table live, new table fully
    written in the hidden temp."""
    live = str(tmp_path / "t")
    _write(spark, live, 0, 10)  # old content: ids 0..9
    tmp = fsutil.prepare_swap(spark, live)
    _write(spark, tmp, 100, 110)  # new content: ids 100..109
    return live, tmp


def test_state_a_crash_before_renames_keeps_old_table(spark, tmp_path):
    live, tmp = _staged_swap(spark, tmp_path)
    # crash here: live intact, temp visible only as a dot-sibling
    assert fsutil.recover_swap(spark, live) is False
    assert _ids(spark, live) == list(range(10))
    # the dot-prefixed temp is invisible to a parent-directory scan
    assert not any(
        n.startswith(".") is False and "__swap" in n
        for n in fsutil.list_names(spark, str(tmp_path))
    )
    # the NEXT writer clears the stale temp before writing its own
    tmp2 = fsutil.prepare_swap(spark, live)
    assert tmp2 == tmp
    assert not fsutil.exists(spark, tmp2)


def test_state_b_crash_between_renames_recovers_new_table(spark, tmp_path):
    live, tmp = _staged_swap(spark, tmp_path)
    _, trash = fsutil.swap_siblings(live)
    fsutil.rename(spark, live, trash)  # first rename, then crash
    assert not fsutil.exists(spark, live)
    # reader restores the fully-written NEW table (temp preferred)
    assert fsutil.recover_swap(spark, live) is True
    assert _ids(spark, live) == list(range(100, 110))
    assert fsutil.recover_swap(spark, live) is False  # idempotent


def test_state_b_without_temp_recovers_old_from_trash(spark, tmp_path):
    """If the temp vanished too (e.g. its store GC'd it), the trash —
    the complete OLD table — still comes back: never nothing."""
    live, tmp = _staged_swap(spark, tmp_path)
    _, trash = fsutil.swap_siblings(live)
    fsutil.rename(spark, live, trash)
    fsutil.delete(spark, tmp)
    assert fsutil.recover_swap(spark, live) is True
    assert _ids(spark, live) == list(range(10))


def test_state_c_crash_before_trash_gc_serves_new_table(spark, tmp_path):
    live, tmp = _staged_swap(spark, tmp_path)
    _, trash = fsutil.swap_siblings(live)
    fsutil.rename(spark, live, trash)
    fsutil.rename(spark, tmp, live)  # second rename, then crash
    assert fsutil.recover_swap(spark, live) is False  # live is complete
    assert _ids(spark, live) == list(range(100, 110))
    # next writer GCs the stale trash
    fsutil.prepare_swap(spark, live)
    assert not fsutil.exists(spark, trash)


def test_full_commit_swap_roundtrip(spark, tmp_path):
    live, tmp = _staged_swap(spark, tmp_path)
    fsutil.commit_swap(spark, live)
    _, trash = fsutil.swap_siblings(live)
    assert _ids(spark, live) == list(range(100, 110))
    assert not fsutil.exists(spark, tmp)
    assert not fsutil.exists(spark, trash)


def test_rollup_survives_crash_between_renames(spark, tmp_path):
    """Accumulator-level regression for the r7 ADVICE window: a crash
    between the two renames used to leave NO live table and no marker,
    so the replayed batch rebuilt state from itself alone, silently
    discarding every previously accumulated sum. With the shared
    protocol, the recover at next batch start restores the swapped
    table (marker included) and the replay is detected and skipped."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.streaming.rollup import (
        StreamingSumRollup,
    )

    acc = StreamingSumRollup(
        spark, str(tmp_path / "wh"), ["k"], "v", key_schema="k string"
    )
    b0 = spark.createDataFrame([("a", 1.0), ("b", 2.0)], "k string, v double")
    b1 = spark.createDataFrame([("a", 10.0)], "k string, v double")
    acc._process_batch(b0, 0)
    acc._process_batch(b1, 1)
    # simulate the crash window inside a partially re-delivered batch 1:
    # the swap got as far as live → trash
    _, trash = fsutil.swap_siblings(acc.table_dir)
    fsutil.delete(spark, trash)
    fsutil.rename(spark, acc.table_dir, trash)
    fsutil.delete(spark, fsutil.swap_siblings(acc.table_dir)[0])
    # re-delivery of batch 1 after restart: recover → marker says 1 →
    # skip; accumulated sums intact
    acc._process_batch(b1, 1)
    rows = {
        r["k"]: (r["n"], r["value_sum"]) for r in acc.table().collect()
    }
    assert rows == {"a": (2, 11.0), "b": (1, 2.0)}


def test_first_write_crash_mid_parquet_discards_half_temp(spark, tmp_path):
    """r8 ADVICE (fsutil.recover_swap): on the FIRST-ever write (live
    never existed, so no trash either) a crash mid-parquet-write leaves
    a temp holding only Spark's ``_temporary`` staging dir. The old
    unconditional restore renamed that half-written temp into place and
    every subsequent read failed. Now: no completeness proof → the temp
    is deleted and False returned (the streaming checkpoint has not
    committed the batch, so the replay rebuilds from scratch)."""
    live = str(tmp_path / "t")
    tmp, _ = fsutil.swap_siblings(live)
    fsutil.mkdirs(spark, f"{tmp}/_temporary/0")  # job staging, no commit
    assert fsutil.recover_swap(spark, live) is False
    assert not fsutil.exists(spark, live)
    assert not fsutil.exists(spark, tmp)  # half temp GC'd, not restored


def test_first_write_crash_before_marker_is_not_restored(spark, tmp_path):
    """r8 ADVICE second window: first write crashed AFTER the parquet
    job commit (``_SUCCESS`` present) but BEFORE the batch-id marker
    write. Restoring that marker-less temp as live makes the replayed
    batch see ``_applied_batch_id = None`` plus an existing table and
    double-count its own data. With the protocol marker declared,
    recover refuses the markerless temp; without one, ``_SUCCESS``
    still suffices (compaction protocols, whose live pre-exists)."""
    live = str(tmp_path / "t")
    tmp, _ = fsutil.swap_siblings(live)
    _write(spark, tmp, 0, 5)  # parquet committed: _SUCCESS inside
    assert fsutil.recover_swap(spark, live, "_applied_batch_id") is False
    assert not fsutil.exists(spark, live)
    assert not fsutil.exists(spark, tmp)


def test_first_write_crash_after_marker_is_restored(spark, tmp_path):
    """The moment the marker lands, the temp IS the committed batch —
    a crash before commit_swap's rename must restore it, and the
    replayed batch must be detected and skipped via the marker."""
    live = str(tmp_path / "t")
    tmp, _ = fsutil.swap_siblings(live)
    _write(spark, tmp, 0, 5)
    fsutil.write_utf8(spark, f"{tmp}/_applied_batch_id", "0")
    assert fsutil.recover_swap(spark, live, "_applied_batch_id") is True
    assert _ids(spark, live) == list(range(5))
    assert fsutil.read_utf8(spark, f"{live}/_applied_batch_id") == "0"


def test_success_marker_suffices_without_protocol_marker(spark, tmp_path):
    live = str(tmp_path / "t")
    tmp, _ = fsutil.swap_siblings(live)
    _write(spark, tmp, 0, 5)
    assert fsutil.recover_swap(spark, live) is True
    assert _ids(spark, live) == list(range(5))


def test_rollup_first_batch_replay_does_not_double_count(spark, tmp_path):
    """Accumulator-level regression for the r8 ADVICE double-count: the
    rollup's batch 0 crashes after its parquet commit but before its
    marker write; the replayed batch 0 must produce the same sums as a
    clean single delivery — not 2× (the old recover restored the
    marker-less temp as live, and the replay merged into it)."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.streaming.rollup import (
        StreamingSumRollup,
    )

    acc = StreamingSumRollup(
        spark, str(tmp_path / "wh"), ["k"], "v", key_schema="k string"
    )
    b0 = spark.createDataFrame([("a", 1.0), ("b", 2.0)], "k string, v double")
    # simulate the crash: parquet landed in the temp, marker never did
    tmp, _ = fsutil.swap_siblings(acc.table_dir)
    acc._batch_partial(b0).select(
        "k",
        F.col("n").cast("long"),
        F.col("s").cast("decimal(28,6)"),
    ).write.mode("overwrite").parquet(tmp)
    # re-delivery of batch 0 after restart
    acc._process_batch(b0, 0)
    rows = {r["k"]: (r["n"], r["value_sum"]) for r in acc.table().collect()}
    assert rows == {"a": (1, 1.0), "b": (1, 2.0)}


def test_rollup_empty_state_honors_key_schema(spark, tmp_path):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.streaming.rollup import (
        StreamingSumRollup,
    )

    acc = StreamingSumRollup(
        spark,
        str(tmp_path / "wh"),
        ["mon"],
        "v",
        key_schema="mon timestamp",
    )
    empty = acc.table()
    assert dict(empty.dtypes)["mon"] == "timestamp"
    # the registered query's downstream projection must not crash
    assert empty.select(F.unix_micros("mon")).count() == 0


def test_quota_empty_state_honors_id_type(spark, tmp_path):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.streaming.quota import (
        StreamingQuotaAccumulator,
    )

    acc = StreamingQuotaAccumulator(
        spark, str(tmp_path / "wh"), cap=3, id_col="doc_id", id_type="string"
    )
    assert dict(acc.kept().dtypes)["doc_id"] == "string"
