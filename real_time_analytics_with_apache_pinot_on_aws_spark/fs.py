"""Hadoop FileSystem helpers: storage ops that survive a real object store.

The engine's maintenance tasks (compaction, layout introspection) must work
against whatever filesystem backs the deep store — local ``file:`` in the
sandbox, ``s3a://`` in the reference's deployment (S3 deep storage,
pinot-controller.conf:34-40).  ``pathlib`` only speaks the local filesystem,
so every file operation here goes through the JVM Hadoop FS API the Spark
session already carries (same credentials/config as the read/write paths —
no second client to configure).

All helpers take/return plain path strings; callers never touch py4j objects.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath, jvm


def glob_status(spark: SparkSession, pattern: str) -> list[dict]:
    """Glob (Hadoop-style) -> [{path, is_dir, size}] sorted by path."""
    fs, hpath, _ = _fs_and_path(spark, pattern)
    statuses = fs.globStatus(hpath)
    out = []
    for st in statuses or []:
        out.append(
            {
                "path": st.getPath().toString(),
                "is_dir": st.isDirectory(),
                "size": st.getLen(),
            }
        )
    return sorted(out, key=lambda d: d["path"])


def list_files(spark: SparkSession, directory: str, suffix: str = "") -> list[dict]:
    """Non-recursive listing of a directory -> [{path, size}] sorted."""
    fs, hpath, _ = _fs_and_path(spark, directory)
    if not fs.exists(hpath):
        return []
    out = []
    for st in fs.listStatus(hpath):
        p = st.getPath().toString()
        if not st.isDirectory() and p.endswith(suffix):
            out.append({"path": p, "size": st.getLen()})
    return sorted(out, key=lambda d: d["path"])


def delete(spark: SparkSession, path: str, recursive: bool = False) -> bool:
    fs, hpath, _ = _fs_and_path(spark, path)
    return bool(fs.delete(hpath, recursive))


def rename(spark: SparkSession, src: str, dst: str) -> bool:
    """Hadoop rename (atomic on HDFS/local; copy+delete on S3A — still the
    canonical move primitive for both)."""
    fs, src_p, jvm = _fs_and_path(spark, src)
    return bool(fs.rename(src_p, jvm.org.apache.hadoop.fs.Path(dst)))


def exists(spark: SparkSession, path: str) -> bool:
    fs, hpath, _ = _fs_and_path(spark, path)
    return bool(fs.exists(hpath))


def basename(path: str) -> str:
    return path.rstrip("/").rsplit("/", 1)[-1]
