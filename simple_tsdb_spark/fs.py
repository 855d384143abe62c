"""Metadata filesystem shim — every sidecar / partition-listing I/O in the
engine routes through here.

The data plane (parquet read/write) already goes through Spark and is
object-store safe by construction.  The *metadata* plane — layout.json,
time_first.json, rollup marks, partition-directory listings — used to be
raw ``os``/``open`` calls, which silently pins the engine to a local
filesystem.  This module gives those call sites one seam:

- ``LocalFS`` — plain-path implementation (this sandbox, bare metal).
- ``HadoopFS`` — any URI scheme the Spark runtime can reach (``s3a://``,
  ``gs://``, ``abfss://``, ``hdfs://``, ``file://``) via the JVM's
  ``org.apache.hadoop.fs.FileSystem``, i.e. the exact connector stack the
  parquet data plane uses, with the same credentials/conf.  Requires an
  active SparkSession (there always is one when the engine runs).

``get_fs(path)`` dispatches on the path's scheme.  Semantics required by
callers:

- ``write_text_atomic`` must publish all-or-nothing: LocalFS uses
  tmp-file + ``os.replace``; HadoopFS writes ``.tmp`` then ``rename`` —
  single-object publish (on S3 a small-file copy+delete, atomic enough
  for a pointer flip because readers see either old or new object, never
  a torn one).
- ``remove_tree`` is best-effort (compaction GC, fully-covered-partition
  unlink); on object stores deletes only hide future LISTs, so in-flight
  readers of a removed generation finish undisturbed.
"""

from __future__ import annotations

import os
import shutil


def _scheme(path: str) -> str:
    i = path.find("://")
    return path[:i] if i > 0 else ""


class LocalFS:
    """Plain-path metadata I/O (POSIX rename gives atomic publish)."""

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path)

    def mkdirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def read_text(self, path: str) -> str:
        with open(path) as fh:
            return fh.read()

    def write_text_atomic(self, path: str, text: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(text)
        os.replace(tmp, path)

    def remove_tree(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)


class HadoopFS:
    """Metadata I/O through the JVM Hadoop FileSystem of the active
    SparkSession — works on every scheme the data plane works on."""

    def __init__(self, spark=None):
        if spark is None:
            from pyspark.sql import SparkSession

            spark = SparkSession.getActiveSession()
            if spark is None:
                raise RuntimeError("HadoopFS needs an active SparkSession")
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()

    def _fs_path(self, path: str):
        p = self._jvm.org.apache.hadoop.fs.Path(path)
        return p.getFileSystem(self._conf), p

    def exists(self, path: str) -> bool:
        fs, p = self._fs_path(path)
        return bool(fs.exists(p))

    def isdir(self, path: str) -> bool:
        fs, p = self._fs_path(path)
        return bool(fs.exists(p) and fs.getFileStatus(p).isDirectory())

    def listdir(self, path: str) -> list[str]:
        fs, p = self._fs_path(path)
        return [st.getPath().getName() for st in fs.listStatus(p)]

    def mkdirs(self, path: str) -> None:
        fs, p = self._fs_path(path)
        fs.mkdirs(p)

    def read_text(self, path: str) -> str:
        # py4j cannot fill a Python-side buffer from Java, so drain the
        # stream JVM-side (commons-io ships with Spark).
        fs, p = self._fs_path(path)
        stream = fs.open(p)
        try:
            return self._jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
        finally:
            stream.close()

    def write_text_atomic(self, path: str, text: str) -> None:
        fs, p = self._fs_path(path)
        tmp = self._jvm.org.apache.hadoop.fs.Path(path + ".tmp")
        stream = fs.create(tmp, True)
        try:
            stream.write(bytearray(text.encode("utf-8")))
        finally:
            stream.close()
        # single-object publish: delete-then-rename (HDFS rename won't
        # clobber; object-store rename is copy+delete of ONE small object)
        if fs.exists(p):
            fs.delete(p, False)
        if not fs.rename(tmp, p):
            raise OSError(f"atomic publish failed: {tmp} -> {p}")

    def remove_tree(self, path: str) -> None:
        fs, p = self._fs_path(path)
        if fs.exists(p):
            fs.delete(p, True)


def get_fs(path: str):
    """Dispatch on scheme: bare paths → LocalFS; any URI scheme (file,
    s3a, gs, abfss, hdfs, …) → the active session's HadoopFS.  ``file://``
    going through HadoopFS makes the object-store code path exercisable
    in local tests."""
    if _scheme(path) == "":
        return LocalFS()
    return HadoopFS()
