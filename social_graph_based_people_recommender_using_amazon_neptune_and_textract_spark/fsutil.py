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
