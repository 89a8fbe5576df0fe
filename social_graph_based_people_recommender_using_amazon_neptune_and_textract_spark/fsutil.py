"""Hadoop FileSystem helpers — filesystem state for operators that keep
tables on a (possibly remote) store.

Driver-local ``os.path`` probes are wrong for any non-local store
(S3/HDFS/DBFS): ``os.path.isdir("s3://…")`` is always False, so a
stateful operator would silently treat its accumulated state as missing
(the round-4 ADVICE finding against the streaming LSH index). Every
existence probe, small-file read/write, rename, and listing that backs a
table protocol goes through the JVM's ``org.apache.hadoop.fs.FileSystem``
instead — resolved per-path, so one process can address file:/, hdfs:/
and s3a:/ URIs simultaneously.

These helpers are for CONTROL-PLANE metadata (pointer files, existence,
GC listings) — data still moves through spark.read/write.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def fs_and_path(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path``, resolved against the session's
    Hadoop configuration (honors fs.defaultFS and per-scheme impls)."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def exists(spark: SparkSession, path: str) -> bool:
    fs, p = fs_and_path(spark, path)
    return bool(fs.exists(p))


def mkdirs(spark: SparkSession, path: str) -> None:
    fs, p = fs_and_path(spark, path)
    fs.mkdirs(p)


def delete(spark: SparkSession, path: str, recursive: bool = True) -> bool:
    fs, p = fs_and_path(spark, path)
    return bool(fs.delete(p, recursive))


def rename(spark: SparkSession, src: str, dst: str) -> bool:
    fs, s = fs_and_path(spark, src)
    _, d = fs_and_path(spark, dst)
    return bool(fs.rename(s, d))


def list_names(spark: SparkSession, path: str) -> list[str]:
    """Basenames of the direct children of ``path`` ([] if absent)."""
    fs, p = fs_and_path(spark, path)
    if not fs.exists(p):
        return []
    return [st.getPath().getName() for st in fs.listStatus(p)]


def read_utf8(spark: SparkSession, path: str) -> str | None:
    """Small-file read (pointer files); None if the file is absent."""
    fs, p = fs_and_path(spark, path)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        return str(
            spark._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        )
    finally:
        stream.close()


def swap_siblings(path: str) -> tuple[str, str]:
    """Hidden (dot-prefixed, partition-discovery-invisible) temp and
    trash siblings for ``path``'s atomic-ish directory swap. Dot names
    are invisible to Spark's partition discovery AND its parquet file
    listing, so a crash mid-write can never surface a phantom partition
    or a half-written sibling table (r6 ADVICE against the LSH index
    compaction, where a bare ``sigb=Y__compact`` sibling WAS
    discoverable)."""
    parent, _, name = path.rstrip("/").rpartition("/")
    return f"{parent}/.{name}__swap", f"{parent}/.{name}__old"


def recover_swap(
    spark: SparkSession, path: str, marker: str | None = None
) -> bool:
    """Close the swap's crash window: if ``path`` is missing but its
    hidden temp or trash sibling exists, rename it back into place.
    Prefers the temp (newer). Returns True if a recovery happened.
    Idempotent; every reader and every writer of a swapped table calls
    this first.

    The temp is restored ONLY when it is provably COMPLETE (r8 ADVICE:
    on the FIRST-ever write — no live, no trash — a crash mid-parquet-
    write leaves a half-written temp holding only ``_temporary``, and
    the old unconditional restore renamed it into place, breaking every
    subsequent read; worse, a crash after the parquet job commit but
    before the batch-id marker write restored a marker-less temp as
    live, so the replayed batch saw ``_applied_batch_id = None`` plus
    an existing table and double-counted its own data). Completeness
    proof, in order:

    - the trash sibling exists → ``commit_swap`` was in flight, and it
      only runs after the caller finished writing the temp;
    - ``marker`` (the caller's protocol-completion file, written LAST
      before ``commit_swap`` — e.g. ``_applied_batch_id`` for the
      batch-merge protocols) exists inside the temp;
    - no ``marker`` declared: Spark's own job-commit ``_SUCCESS``
      inside the temp (sufficient for the single-file-set protocols —
      compaction — whose live table always pre-exists anyway).

    An incomplete temp is deleted and False returned: the only state
    that produces one is a first-write crash, where the streaming
    checkpoint has NOT committed the batch, so the replay rebuilds the
    table from scratch — correct, where restoring would not be."""
    if exists(spark, path):
        return False
    tmp, trash = swap_siblings(path)
    if exists(spark, tmp):
        complete = (
            exists(spark, trash)
            or exists(spark, f"{tmp}/{marker or '_SUCCESS'}")
        )
        if complete:
            rename(spark, tmp, path)
            delete(spark, trash)
            return True
        delete(spark, tmp)
    if exists(spark, trash):
        rename(spark, trash, path)
        return True
    return False


def prepare_swap(
    spark: SparkSession, path: str, marker: str | None = None
) -> str:
    """Begin a swap of the directory at ``path``: recover any crashed
    prior swap, clear stale temp/trash, and return the hidden temp path
    the caller should write the NEW table to before ``commit_swap``.
    ``marker`` is the caller's completion file, forwarded to
    ``recover_swap`` (see its completeness contract)."""
    recover_swap(spark, path, marker)
    tmp, trash = swap_siblings(path)
    delete(spark, tmp)
    delete(spark, trash)
    return tmp


def commit_swap(spark: SparkSession, path: str) -> None:
    """Publish the fully-written hidden temp over ``path`` via two
    atomic renames — live → hidden trash, temp → live — deleting the
    trash last. Each rename is atomic on HDFS/posix; the only
    non-atomic window is between the two renames, and ``recover_swap``
    closes it (the r7 ADVICE against the family's former
    delete-then-rename, whose crash window left NO live table and no
    marker, so a replayed batch would silently rebuild state from one
    batch). Readers therefore see the old or the new table, never a
    half one, and never nothing. (On S3, rename is copy+delete; a
    committer-based swap or a catalog pointer — streaming/table.py's
    device — replaces this.)"""
    tmp, trash = swap_siblings(path)
    if exists(spark, path):
        rename(spark, path, trash)
    rename(spark, tmp, path)
    delete(spark, trash)


def write_utf8(spark: SparkSession, path: str, content: str) -> None:
    """Small-file write via tmp + delete + rename. The rename itself is
    atomic on HDFS/posix; the delete-then-rename pair is not one atomic
    swap on every store — acceptable for the single-writer pointer
    protocols here (a reader races into either the old or the new
    pointer, never a torn file, because the tmp is fully written and
    closed before the swap)."""
    fs, p = fs_and_path(spark, path)
    tmp = path + ".tmp"
    _, tp = fs_and_path(spark, tmp)
    out = fs.create(tp, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()
    if fs.exists(p):
        fs.delete(p, False)
    fs.rename(tp, p)
