"""Events timestamp normalization: the load-time cast must be
timezone-EXPLICIT — identical instants whatever
``spark.sql.session.timeZone`` is at query time (round-3 ADVICE) — and
must agree with DuckDB's direct reading of the parquet wall clock."""

import duckdb
from pyspark.sql import functions as F

from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.sources import (
    tables,
)

SF = "/root/testdata/sf0.001"


def _epoch_micros_sum(spark, tz: str) -> int:
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", tz)
        df = tables.load_table(spark, SF, "events")
        # load_table pins the session zone back to UTC; re-apply the probe
        # zone AFTER load so the expression evaluates under it (the cast
        # runs at query time, which is exactly what this test exercises).
        spark.conf.set("spark.sql.session.timeZone", tz)
        return df.select(
            F.sum(F.unix_micros("ts")).alias("s")
        ).collect()[0]["s"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_events_ts_instant_is_session_tz_independent(spark):
    utc = _epoch_micros_sum(spark, "UTC")
    assert _epoch_micros_sum(spark, "America/New_York") == utc
    assert _epoch_micros_sum(spark, "Asia/Seoul") == utc


def test_events_ts_matches_duckdb_wall_clock(spark):
    """DuckDB reads the parquet NTZ/nanos wall clock directly; the Spark
    instant (read as UTC) must land on the same wall clock."""
    oracle = duckdb.sql(
        "SELECT sum(CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS HUGEINT)) AS s "
        f"FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    assert _epoch_micros_sum(spark, "UTC") == int(oracle)


# --------------------------------------------------------------------------
# compaction (sources/compact.py)
# --------------------------------------------------------------------------


def test_compact_dir_preserves_rows_and_reduces_files(spark, tmp_path):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.sources.compact import (
        compact_dir,
        n_data_files,
    )

    path = str(tmp_path / "many")
    df = spark.range(0, 10_000).withColumn("v", F.col("id") * 2)
    df.repartition(32).write.parquet(path)
    # simulate micro-batch appends
    df.limit(100).repartition(8).write.mode("append").parquet(path)
    before = n_data_files(spark, path)
    assert before >= 40

    expected = sorted(
        (r.id, r.v) for r in spark.read.parquet(path).collect()
    )
    n_out = compact_dir(spark, path)
    after = n_data_files(spark, path)
    assert after == n_out and after < before
    got = sorted((r.id, r.v) for r in spark.read.parquet(path).collect())
    assert got == expected


def test_compact_tmp_is_invisible_to_partition_discovery(spark, tmp_path):
    """A crash after the temp write must not surface a phantom
    partition: the temp lives under a dot-prefixed sibling that Spark's
    partition discovery skips (r6 ADVICE against the LSH index)."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.sources.compact import (
        _swap_paths,
    )

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(100)], "id long, k string"
    )
    df.write.partitionBy("k").parquet(path)
    # simulate a crash that left a fully-written temp beside a leaf
    tmp, _ = _swap_paths(f"{path}/k=a")
    spark.read.parquet(f"{path}/k=a").write.parquet(tmp)

    whole = spark.read.parquet(path)
    assert set(r.k for r in whole.select("k").distinct().collect()) == {
        "a",
        "b",
    }
    assert whole.count() == 100  # temp rows not double-read


def test_compact_recover_dir_restores_lost_bucket(spark, tmp_path):
    """Crash between the two swap renames leaves the live path missing;
    recover_dir (called by the next compact_dir too) must restore the
    fully-written temp."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.sources.compact import (
        _swap_paths,
        compact_dir,
        recover_dir,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
        fsutil,
    )

    path = str(tmp_path / "bucket")
    spark.range(0, 500).write.parquet(path)
    expected = sorted(r.id for r in spark.read.parquet(path).collect())

    # crash window: live renamed to trash, temp not yet renamed in
    tmp, trash = _swap_paths(path)
    spark.read.parquet(path).coalesce(1).write.parquet(tmp)
    fsutil.rename(spark, path, trash)
    assert not fsutil.exists(spark, path)

    assert recover_dir(spark, path) is True
    got = sorted(r.id for r in spark.read.parquet(path).collect())
    assert got == expected
    # stale trash is swept by the next compaction, which still works
    compact_dir(spark, path)
    assert not fsutil.exists(spark, trash)
    assert sorted(r.id for r in spark.read.parquet(path).collect()) == expected
    # no-op when the live path is healthy
    assert recover_dir(spark, path) is False


def test_compact_partitioned_touches_only_named_partition(spark, tmp_path):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.sources.compact import (
        compact_partitioned,
        n_data_files,
    )

    path = str(tmp_path / "part")
    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(1000)], "id long, k string"
    )
    df.repartition(16).write.partitionBy("k").parquet(path)
    before_b = n_data_files(spark, f"{path}/k=b")
    out = compact_partitioned(spark, path, partitions=["k=a"])
    assert set(out) == {"k=a"}
    assert n_data_files(spark, f"{path}/k=a") == out["k=a"] < 16
    # untouched partition keeps its layout
    assert n_data_files(spark, f"{path}/k=b") == before_b
    # table still reads whole, with partition column intact
    whole = spark.read.parquet(path)
    assert whole.count() == 1000
    assert whole.filter(F.col("k") == "a").count() == 500


def test_partitioned_backfill_rewrites_only_named_day(spark, tmp_path):
    """Dynamic partition overwrite: re-writing one day's data replaces
    ONLY that directory; other days' files and rows stay untouched —
    the idempotent-backfill contract of sources/partitioned.py."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.sources.partitioned import (
        read_partitioned,
        write_partitioned,
    )

    path = str(tmp_path / "days")
    full = spark.createDataFrame(
        [(1, "2024-01-01", 1.0), (2, "2024-01-01", 2.0), (3, "2024-01-02", 3.0)],
        "id long, d string, v double",
    )
    write_partitioned(full, path, "d")

    # backfill day 1 with corrected values (one fewer row)
    fix = spark.createDataFrame([(9, "2024-01-01", 99.0)], "id long, d string, v double")
    (
        fix.repartition("d")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("d")
        .parquet(path)
    )

    # partition-type inference reads the directory names back as dates
    got = sorted(
        (r.id, str(r.d), r.v) for r in read_partitioned(spark, path).collect()
    )
    assert got == [(3, "2024-01-02", 3.0), (9, "2024-01-01", 99.0)]


def test_range_clustered_files_have_disjoint_minmax(spark, tmp_path):
    """The skipping contract: per-file parquet footer min/max on the
    cluster column are pairwise non-overlapping (modulo a shared
    boundary value), so a narrow range predicate can intersect at most
    a couple of the N files — the structural evidence behind
    events_user_range_pruned."""
    import glob

    import pyarrow.parquet as pq

    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.sources.clustered import (
        read_range_clustered,
        write_range_clustered,
    )

    ev = tables.load_table(spark, SF, "events")
    path = str(tmp_path / "ev_clustered")
    write_range_clustered(ev, path, "user_id", n_files=8)

    ranges = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        lo = min(
            md.row_group(i).column(c).statistics.min
            for i in range(md.num_row_groups)
            for c in range(md.num_columns)
            if md.row_group(i).column(c).path_in_schema == "user_id"
        )
        hi = max(
            md.row_group(i).column(c).statistics.max
            for i in range(md.num_row_groups)
            for c in range(md.num_columns)
            if md.row_group(i).column(c).path_in_schema == "user_id"
        )
        ranges.append((lo, hi))
    ranges.sort()
    assert len(ranges) >= 4, "expected several files for skipping to matter"
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        # contiguous ranges may share only the boundary value
        assert hi1 <= lo2, f"overlapping file ranges {(lo1, hi1)} vs {(lo2, hi2)}"

    # a narrow predicate (2 of sf0.001's 15 users ~= 13% selectivity)
    # intersects at most ceil(sel·N)+1 = 3 of the 8 file ranges
    hit = sum(1 for lo, hi in ranges if not (hi < 4 or lo > 5))
    assert hit <= 3

    # and the layout round-trips content
    assert read_range_clustered(spark, path).count() == ev.count()


def _file_col_ranges(path, col):
    import glob

    import pyarrow.parquet as pq

    out = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        los, his = [], []
        for i in range(md.num_row_groups):
            for c in range(md.num_columns):
                if md.row_group(i).column(c).path_in_schema == col:
                    st = md.row_group(i).column(c).statistics
                    los.append(st.min)
                    his.append(st.max)
        out.append((min(los), max(his)))
    return out


def test_zorder_skips_on_both_columns(spark, tmp_path):
    """The Z-order contract: per-file footer min/max is TIGHT on both
    cluster columns (each file covers ~a grid cell, not a full-width
    stripe), so a conjunctive range predicate skips files on either
    column. Quantified against the single-column alternative: range
    clustering on user_id alone leaves every file's ts range spanning
    ~the whole month; the Morton layout's mean per-file ts span must be
    a small fraction of that. Round-trip content identity is covered by
    the events_zorder_pruned oracle parity."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.sources.clustered import (
        write_range_clustered,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.sources.zorder import (
        read_zordered,
        write_zordered,
    )

    ev = tables.load_table(spark, SF, "events").withColumn(
        "_ts_epoch", F.unix_timestamp("ts")
    )
    zpath = str(tmp_path / "ev_zorder")
    write_zordered(ev, zpath, "user_id", "_ts_epoch", n_files=16)
    rpath = str(tmp_path / "ev_range")
    write_range_clustered(ev, rpath, "user_id", n_files=16)

    def mean_span(path, col):
        ranges = _file_col_ranges(path, col)
        assert len(ranges) >= 8
        return sum(hi - lo for lo, hi in ranges) / len(ranges)

    # the single-column layout's ts spans ~the full domain per file
    full_ts = mean_span(rpath, "_ts_epoch")
    z_ts = mean_span(zpath, "_ts_epoch")
    z_user = mean_span(zpath, "user_id")
    full_user_domain = ev.agg(
        (F.max("user_id") - F.min("user_id")).alias("d")
    ).collect()[0]["d"]
    assert z_ts < 0.6 * full_ts, f"ts not clustered: {z_ts} vs {full_ts}"
    assert z_user < 0.6 * full_user_domain

    # layout must be content-preserving
    assert read_zordered(spark, zpath).count() == ev.count()
