"""Commit lock service: writer mutual exclusion for non-atomic stores.

LakeTable's CAS is carried by the atomic exclusive create of the
snapshot manifest (lake/fs.py). That primitive is real on POSIX
(link(2)) and HDFS (create overwrite=false), but an S3A-style store
implements "exclusive" create as check-then-act — two racing writers
can both pass the check and the second silently clobbers the first
(lost update). The standard fix (what Iceberg does with its catalog
lock / DynamoDB lock manager, and what S3's newer conditional-PUT
enables) is to route commit arbitration through a SMALL side service
that does have an atomic compare-and-set, while the data and manifests
stay on the big store.

``LockService`` is that seam. ``FileLockService`` implements it over
any filesystem whose ``create_text_exclusive`` IS atomic (a POSIX
scratch dir, HDFS, a DynamoDB-style table behind the same interface):

* a lock is a lease file ``{name}.lock`` holding (owner, expires_at);
* acquire = atomic exclusive create; a crashed holder's lease is taken
  over once expired (delete + re-create — the re-create's atomicity
  arbitrates racing takers);
* release deletes only a lease the caller still owns.

Wire it into a table via ``table.lock = FileLockService(dir)`` —
``_commit`` then serializes its head-check → manifest-create →
pointer-swing critical section under the lease, giving loser-fails
semantics even where the manifest store's exclusive create is
check-then-act. Single-writer deployments need none of this.

Reference analog: the reference serializes all applies through one
controller process (/root/reference/load/DBPLoadController.py:118-141);
this is the multi-writer generalization.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from dbp_etl_spark.lake.fs import Filesystem, LocalFS


class LockTimeout(RuntimeError):
    """Could not acquire the commit lock within the deadline."""


class LockService:
    """Duck-typed interface (documentation only)."""

    def acquire(self, name: str, ttl_sec: float, timeout_sec: float) -> str: ...
    def release(self, name: str, token: str) -> None: ...


class FileLockService(LockService):
    """Lease-file lock over a filesystem with ATOMIC exclusive create.

    ``ttl_sec`` bounds how long a crashed holder can block others: an
    expired lease may be taken over. Size it well above the longest
    commit critical section (metadata-only: sub-second; the data write
    happens OUTSIDE the lock).
    """

    def __init__(self, root: str, fs: Filesystem | None = None):
        self.root = root
        self._fs = fs or LocalFS()
        self._fs.mkdirs(root)

    def _path(self, name: str) -> str:
        return os.path.join(self.root, f"{name}.lock")

    def acquire(self, name: str, ttl_sec: float = 60.0, timeout_sec: float = 30.0) -> str:
        """Block until the lease is ours (or LockTimeout). Returns an
        owner token that release() requires — a stale process cannot
        release a lease that was taken over from it."""
        token = uuid.uuid4().hex
        deadline = time.time() + timeout_sec
        path = self._path(name)
        while True:
            payload = json.dumps({"owner": token, "expires_at": time.time() + ttl_sec})
            try:
                self._fs.create_text_exclusive(path, payload)
                return token
            except FileExistsError:
                pass
            try:
                lease = json.loads(self._fs.read_text(path))
            except (ValueError, OSError):
                lease = None  # torn/deleted under us: retry the create
            if lease is not None and lease.get("expires_at", 0) < time.time():
                # expired holder: delete and loop back to the atomic
                # create — of N racing takers exactly one create wins
                self._fs.delete(path)
            if time.time() >= deadline:
                raise LockTimeout(f"lock {name!r} held past deadline ({path})")
            time.sleep(0.05)

    def release(self, name: str, token: str) -> None:
        path = self._path(name)
        try:
            lease = json.loads(self._fs.read_text(path))
        except (ValueError, OSError, FileNotFoundError):
            return
        if lease.get("owner") == token:
            self._fs.delete(path)
