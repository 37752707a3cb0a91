"""Filesystem shim for LakeTable metadata IO.

LakeTable keeps its transaction metadata (VERSION pointer, manifest
JSONs) as tiny text files next to the data. On a laptop that's POSIX
IO; on a cluster the table root is an object-store / HDFS URI and the
same operations must go through the Hadoop FileSystem API so data and
metadata live in the same store (reference precedent: all reference
state lives in object storage, /root/reference/load/S3Utility.py:62-91,
/root/reference/load/DBPRunFilesS3.py:12-48).

Two implementations behind one duck-typed surface:

* ``LocalFS`` — plain POSIX for plain paths. Pointer publish is
  ``os.replace`` (atomic); manifest creation is tmp-write+fsync then
  ``os.link`` (atomic, complete-or-absent, exclusive), so two racing
  writers of the same snapshot id cannot both succeed — the second
  gets ``FileExistsError`` — and a crash mid-write leaves no partial
  manifest.
* ``HadoopFS`` — routes through ``spark._jvm``'s
  ``org.apache.hadoop.fs.FileSystem``, so the root may be ``hdfs://``,
  ``s3a://``, ``gs://``, ``abfs://``, or ``file:``. Exclusive create
  maps to ``FileSystem.create(path, overwrite=False)`` — atomic on
  HDFS; on S3A it is check-then-act, so the single-writer discipline
  documented on LakeTable applies.

``fs_for(root, spark)`` picks the implementation from the root's
scheme. Everything here is tiny-metadata IO (a few KB per commit) —
the data plane always goes through Spark readers/writers.
"""

from __future__ import annotations

import os
import uuid


class Filesystem:
    """Duck-typed interface (documentation only)."""

    def mkdirs(self, path: str) -> None: ...
    def exists(self, path: str) -> bool: ...
    def read_text(self, path: str) -> str: ...
    def write_text(self, path: str, content: str) -> None: ...
    def create_text_exclusive(self, path: str, content: str) -> None: ...
    def list_names(self, path: str) -> list[str]: ...
    def delete(self, path: str, recursive: bool = False) -> bool: ...
    def is_dir(self, path: str) -> bool: ...
    def mtime(self, path: str) -> float: ...
    def size(self, path: str) -> int: ...


class LocalFS(Filesystem):
    def mkdirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def write_text(self, path: str, content: str) -> None:
        """Atomic replace (tmp file + rename); overwrite allowed."""
        tmp = f"{path}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(content)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    def create_text_exclusive(self, path: str, content: str) -> None:
        """Atomic complete-or-absent exclusive create: the content is
        fully written+fsynced to a tmp name, then hard-linked into
        place. link() fails if the path exists (exclusivity) and the
        visible file is never partial (a crash mid-write leaves only
        the tmp). Raises FileExistsError if path exists."""
        tmp = f"{path}.new.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(content)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, path)
        finally:
            os.unlink(tmp)

    def list_names(self, path: str) -> list[str]:
        return sorted(os.listdir(path))

    def delete(self, path: str, recursive: bool = False) -> bool:
        """Delete a file or directory; missing path is a no-op (returns
        False) so cleanup passes are idempotent across crash/retry."""
        try:
            if os.path.isdir(path):
                if recursive:
                    import shutil

                    shutil.rmtree(path)
                else:
                    os.rmdir(path)  # only if empty — caller's contract
            else:
                os.remove(path)
            return True
        except FileNotFoundError:
            return False

    def is_dir(self, path: str) -> bool:
        return os.path.isdir(path)

    def mtime(self, path: str) -> float:
        return os.path.getmtime(path)

    def size(self, path: str) -> int:
        return os.path.getsize(path)


class HadoopFS(Filesystem):
    """Hadoop FileSystem-backed metadata IO via the Spark JVM gateway.

    Works for any scheme the session's Hadoop conf can resolve. All
    methods raise the underlying Py4J error on IO failure except
    ``create_text_exclusive``, which normalizes already-exists into
    ``FileExistsError`` so callers can treat it as a CAS loss.
    """

    def __init__(self, spark, root: str):
        self._jvm = spark._jvm
        self._Path = self._jvm.org.apache.hadoop.fs.Path
        self._conf = spark._jsc.hadoopConfiguration()
        self._fs = self._Path(root).getFileSystem(self._conf)

    def _p(self, path: str):
        return self._Path(path)

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._p(path))

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._p(path)))

    def read_text(self, path: str) -> str:
        stream = self._fs.open(self._p(path))
        try:
            return self._jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
        finally:
            stream.close()

    def _write_stream(self, jpath, content: str, overwrite: bool) -> None:
        out = self._fs.create(jpath, overwrite)
        try:
            out.write(bytearray(content.encode("utf-8")))
        finally:
            out.close()

    def write_text(self, path: str, content: str) -> None:
        """Write to a tmp name, then rename over the destination.

        Uses FileContext's overwrite-rename, which is a single atomic
        metadata op on HDFS (readers see old or new, never absent). If
        FileContext is unavailable for the scheme, falls back to
        delete+rename — NOT atomic, so on such stores the pointer swap
        is best-effort and single-writer discipline applies.
        """
        tmp = self._p(f"{path}.tmp.{uuid.uuid4().hex}")
        self._write_stream(tmp, content, overwrite=True)
        dst = self._p(path)
        jvm = self._jvm
        try:
            # session Hadoop conf so logical URIs (HDFS HA nameservices)
            # resolve the same way the data plane resolves them
            fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
                dst.toUri(), self._conf
            )
        except Exception as e:
            if "UnsupportedFileSystem" not in str(e):
                raise
            # scheme without FileContext support: non-atomic fallback
            # (documented: pointer swap is best-effort there)
            if self._fs.exists(dst):
                self._fs.delete(dst, False)
            if not self._fs.rename(tmp, dst):
                raise IOError(f"rename {tmp} -> {dst} failed") from None
            return
        overwrite = jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
        arr = jvm.java.lang.reflect.Array.newInstance(overwrite.getClass(), 1)
        arr[0] = overwrite
        fc.rename(tmp, dst, arr)

    def create_text_exclusive(self, path: str, content: str) -> None:
        """Exclusive create via ``FileSystem.create(overwrite=False)``:
        the create call is the atomic existence arbiter on HDFS (it
        raises if the path exists on EVERY scheme — unlike rename,
        which POSIX-clobbers on file:). A crash mid-write can leave a
        torn (partial) file; LakeTable tolerates torn manifests by
        validating JSON before trusting them."""
        from py4j.protocol import Py4JJavaError

        try:
            self._write_stream(self._p(path), content, overwrite=False)
        except Py4JJavaError as e:
            # Classify by the JAVA EXCEPTION CLASS, not a message
            # substring — an unrelated IO failure whose message happens
            # to contain "exists" must surface as the real error, not be
            # misread as a CAS loss (which would make _commit replace
            # the manifest it failed to read).
            cls = ""
            je = getattr(e, "java_exception", None)
            if je is not None:
                try:
                    cls = je.getClass().getName()
                except Exception:
                    cls = ""
            if cls.endswith("FileAlreadyExistsException") or (
                # HDFS RPC wraps the server-side class in RemoteException;
                # the wrapped class name rides in the message
                cls.endswith("RemoteException")
                and "FileAlreadyExistsException" in str(e)
            ):
                raise FileExistsError(path) from e
            raise

    def list_names(self, path: str) -> list[str]:
        statuses = self._fs.listStatus(self._p(path))
        return sorted(s.getPath().getName() for s in statuses)

    def delete(self, path: str, recursive: bool = False) -> bool:
        return bool(self._fs.delete(self._p(path), recursive))

    def is_dir(self, path: str) -> bool:
        p = self._p(path)
        return bool(self._fs.exists(p)) and bool(self._fs.getFileStatus(p).isDirectory())

    def mtime(self, path: str) -> float:
        return self._fs.getFileStatus(self._p(path)).getModificationTime() / 1000.0

    def size(self, path: str) -> int:
        return int(self._fs.getFileStatus(self._p(path)).getLen())


def is_uri(root: str) -> bool:
    return "://" in root or root.startswith("file:")


def fs_for(root: str, spark=None) -> Filesystem:
    """Pick the metadata filesystem from the root's scheme."""
    if is_uri(root):
        if spark is None:
            from pyspark.sql import SparkSession

            spark = SparkSession.getActiveSession()
            if spark is None:
                raise ValueError(
                    f"URI table root {root!r} needs a SparkSession for Hadoop FS access"
                )
        return HadoopFS(spark, root)
    return LocalFS()


def copy_file(src_fs: Filesystem, src_path: str, dst_fs: Filesystem, dst_path: str) -> None:
    """Byte-copy one file between (possibly different) filesystems.

    Local→local uses shutil; any pair involving a Hadoop-resolved
    scheme routes through ``FileUtil.copy`` on the JVM, which streams
    scheme-to-scheme (file:→s3a:, hdfs:→file:, …) without pulling the
    bytes into Python."""
    if isinstance(src_fs, LocalFS) and isinstance(dst_fs, LocalFS):
        import shutil

        os.makedirs(os.path.dirname(dst_path), exist_ok=True)
        shutil.copyfile(src_path, dst_path)
        return
    h = src_fs if isinstance(src_fs, HadoopFS) else dst_fs
    assert isinstance(h, HadoopFS)
    # A LocalFS-side path is scheme-less; resolved via the HadoopFS
    # handle's conf it would land on fs.defaultFS (hdfs:// on a real
    # cluster) instead of the local disk — pin it to file:// explicitly.
    if isinstance(src_fs, LocalFS) and not is_uri(src_path):
        src_path = "file://" + os.path.abspath(src_path)
    if isinstance(dst_fs, LocalFS) and not is_uri(dst_path):
        dst_path = "file://" + os.path.abspath(dst_path)
    jvm = h._jvm
    Path = jvm.org.apache.hadoop.fs.Path
    sp, dp = Path(src_path), Path(dst_path)
    sfs = sp.getFileSystem(h._conf)
    dfs = dp.getFileSystem(h._conf)
    ok = jvm.org.apache.hadoop.fs.FileUtil.copy(sfs, sp, dfs, dp, False, False, h._conf)
    if not ok:
        raise IOError(f"copy {src_path} -> {dst_path} failed")
