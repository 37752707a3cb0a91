"""Commit arbitration on stores WITHOUT atomic exclusive create.

S3A-style stores implement "create if absent" as check-then-act: two
racing writers can both pass the check and the second clobbers the
first (lost update). These tests first DEMONSTRATE that hazard with a
simulated non-atomic filesystem, then show the FileLockService lease
restores loser-fails semantics: exactly one of two racing commits
wins, the other gets CommitConflict and succeeds on retry.
"""

import os
import threading

import pytest

from dbp_etl_spark.lake import LakeTable, TableSchema
from dbp_etl_spark.lake.fs import LocalFS
from dbp_etl_spark.lake.lock import FileLockService, LockTimeout
from dbp_etl_spark.lake.table import CommitConflict
from tests.test_lake import PAGES, mk_rows


class NonAtomicFS(LocalFS):
    """LocalFS whose exclusive create is CHECK-THEN-ACT (S3A model).

    ``between`` runs between the existence check and the write — the
    window where a second writer can sneak in.
    """

    def __init__(self, between=None):
        self.between = between

    def create_text_exclusive(self, path: str, content: str) -> None:
        if os.path.exists(path):
            raise FileExistsError(path)
        if self.between is not None:
            self.between()
        with open(path, "w") as f:
            f.write(content)


# ---------------------------------------------------------------- lock unit


def test_lock_basic_mutual_exclusion(tmp_path):
    svc = FileLockService(str(tmp_path / "locks"))
    tok = svc.acquire("commit", ttl_sec=60, timeout_sec=1)
    with pytest.raises(LockTimeout):
        svc.acquire("commit", ttl_sec=60, timeout_sec=0.3)
    svc.release("commit", tok)
    tok2 = svc.acquire("commit", ttl_sec=60, timeout_sec=1)
    svc.release("commit", tok2)


def test_lock_expired_lease_takeover_and_stale_release(tmp_path):
    svc = FileLockService(str(tmp_path / "locks"))
    stale = svc.acquire("commit", ttl_sec=0.05, timeout_sec=1)  # "crashed" holder
    import time

    time.sleep(0.1)
    tok = svc.acquire("commit", ttl_sec=60, timeout_sec=1)  # takeover
    # the stale owner's release must NOT free the new holder's lease
    svc.release("commit", stale)
    with pytest.raises(LockTimeout):
        svc.acquire("commit", ttl_sec=60, timeout_sec=0.3)
    svc.release("commit", tok)


# ------------------------------------------------------------- table races


def _mk_table(spark, tmp_path):
    return LakeTable.create(
        spark, str(tmp_path / "pages"), TableSchema.from_struct(PAGES), key="url", num_buckets=4
    )


def _racing_writers(spark, root, fs_factory, lock_factory=None):
    """Two threads append different batches; both handles share the
    table head. Returns (exceptions, ledger_after)."""
    barrier = threading.Barrier(2, timeout=20)

    def between():
        # rendezvous INSIDE the check-then-act window: if both writers
        # get here concurrently, the race is real. Under the lock the
        # partner is blocked outside, so the barrier times out — broken
        # barrier = mutual exclusion held.
        try:
            barrier.wait()
        except threading.BrokenBarrierError:
            pass

    errors: dict[str, Exception] = {}

    def writer(name, batch_id, tag):
        t = LakeTable.load(spark, root)
        t._fs = fs_factory(between)
        if lock_factory is not None:
            t.lock = lock_factory()
        try:
            try:
                t.append(mk_rows(spark, 3, tag=tag), batch_id=batch_id)
            except CommitConflict as e:
                errors[name] = e
                t = LakeTable.load(spark, root)
                t._fs = fs_factory(None)
                if lock_factory is not None:
                    t.lock = lock_factory()
                t.append(mk_rows(spark, 3, tag=tag), batch_id=batch_id)
        except Exception as e:  # pragma: no cover - surfaced by assert
            errors[name] = e
            raise

    ta = threading.Thread(target=writer, args=("a", "batch-a", "aa"))
    tb = threading.Thread(target=writer, args=("b", "batch-b", "bb"))
    ta.start(), tb.start()
    ta.join(120), tb.join(120)
    final = LakeTable.load(spark, root)
    return errors, final.committed_batches()


def test_nonatomic_store_loses_update_without_lock(spark, tmp_path):
    """The hazard itself: both writers pass the existence check, the
    second manifest write clobbers the first — one batch vanishes."""
    _mk_table(spark, tmp_path)
    root = str(tmp_path / "pages")
    errors, ledger = _racing_writers(spark, root, lambda between: NonAtomicFS(between))
    assert not errors  # neither writer saw a conflict...
    # ...yet only one batch survived: the silent lost update
    assert len({"batch-a", "batch-b"} & set(ledger)) == 1


def test_lock_service_restores_loser_fails(spark, tmp_path):
    """Same non-atomic store + FileLockService: commits serialize, the
    loser gets CommitConflict, retries, and BOTH batches land."""
    _mk_table(spark, tmp_path)
    root = str(tmp_path / "pages")
    lock_dir = str(tmp_path / "locks")
    errors, ledger = _racing_writers(
        spark,
        root,
        lambda between: NonAtomicFS(between),
        lock_factory=lambda: FileLockService(lock_dir),
    )
    assert {"batch-a", "batch-b"} <= set(ledger)
    assert set(errors) <= {"a", "b"} and len(errors) == 1  # exactly one loser
    final = LakeTable.load(spark, root)
    assert final.read().count() == 6


def test_takeover_race_single_winner(tmp_path):
    """The review-flagged hazard: N concurrent takers of an EXPIRED
    lease must produce exactly one holder (delete-then-recreate designs
    let several win; the generational create is the single arbiter)."""
    import threading
    import time

    svc = FileLockService(str(tmp_path / "locks"))
    svc.acquire("commit", ttl_sec=0.05, timeout_sec=1)  # crashed holder
    time.sleep(0.1)
    barrier = threading.Barrier(6, timeout=10)
    tokens, timeouts = [], []
    lock = threading.Lock()

    def taker():
        barrier.wait()
        try:
            tok = svc.acquire("commit", ttl_sec=60, timeout_sec=0.5)
            with lock:
                tokens.append(tok)
        except LockTimeout:
            with lock:
                timeouts.append(1)

    threads = [threading.Thread(target=taker) for _ in range(6)]
    [t.start() for t in threads]
    [t.join(20) for t in threads]
    assert len(tokens) == 1  # exactly one winner holds the lease
    assert len(timeouts) == 5


def test_stale_release_cannot_free_successor(tmp_path):
    """A stalled ex-holder's late release must not delete the
    successor's lease (the read-check-delete window of a single-file
    design): generations give each holder its own file."""
    import time

    svc = FileLockService(str(tmp_path / "locks"))
    stale_tok = svc.acquire("commit", ttl_sec=0.05, timeout_sec=1)
    time.sleep(0.1)
    succ_tok = svc.acquire("commit", ttl_sec=60, timeout_sec=1)  # takeover
    svc.release("commit", stale_tok)  # late release from the ex-holder
    with pytest.raises(LockTimeout):
        svc.acquire("commit", ttl_sec=60, timeout_sec=0.3)  # still held
    svc.release("commit", succ_tok)
    tok = svc.acquire("commit", ttl_sec=60, timeout_sec=1)
    svc.release("commit", tok)


# ------------------------------------------------- multi-writer end-to-end


def test_two_runners_concurrent_apply_equals_serial(spark, tmp_path):
    """VERDICT r3 #6: two REAL CDCRunners drive disjoint batch ranges of
    one change log against one table concurrently (lock + conflict
    retry). The losers' retries recompute against the winner's head, so
    the final state is byte-identical to a serial single-runner apply —
    the merge guards realize a total order, making ANY interleave
    converge."""
    from dbp_etl_spark.cdc import CDCRunner, generate_changes

    log = generate_changes(spark, 1500, 60, n_batches=6)
    # serial reference state
    t_serial = LakeTable.create(
        spark, str(tmp_path / "serial"), TableSchema.from_struct(PAGES), key="url", num_buckets=4
    )
    CDCRunner(t_serial).run(log)

    LakeTable.create(
        spark, str(tmp_path / "conc"), TableSchema.from_struct(PAGES), key="url", num_buckets=4
    )
    root = str(tmp_path / "conc")
    lock_dir = str(tmp_path / "locks")
    from pyspark.sql import functions as F

    errors = {}

    def writer(name, lo, hi):
        try:
            t = LakeTable.load(spark, root)
            t.lock = FileLockService(lock_dir)
            runner = CDCRunner(t, retry_conflicts=10)
            runner.run(log.filter((F.col("batch_id") >= lo) & (F.col("batch_id") < hi)))
        except Exception as e:  # pragma: no cover
            errors[name] = e
            raise

    ta = threading.Thread(target=writer, args=("a", 0, 3))
    tb = threading.Thread(target=writer, args=("b", 3, 6))
    ta.start(), tb.start()
    ta.join(300), tb.join(300)
    assert not errors
    final = LakeTable.load(spark, root)
    assert {str(b) for b in range(6)} <= set(final.committed_batches())
    assert final.state_hash() == t_serial.state_hash()


def test_two_runners_nonatomic_store_with_lock(spark, tmp_path):
    """Same e2e through a check-then-act store: the lease serializes the
    commit sections, conflict retry absorbs head races, both runners'
    batches land, state equals serial."""
    from dbp_etl_spark.cdc import CDCRunner, generate_changes
    from pyspark.sql import functions as F

    log = generate_changes(spark, 800, 40, n_batches=4)
    t_serial = LakeTable.create(
        spark, str(tmp_path / "serial2"), TableSchema.from_struct(PAGES), key="url", num_buckets=4
    )
    CDCRunner(t_serial).run(log)

    LakeTable.create(
        spark, str(tmp_path / "conc2"), TableSchema.from_struct(PAGES), key="url", num_buckets=4
    )
    root = str(tmp_path / "conc2")
    lock_dir = str(tmp_path / "locks2")
    errors = {}

    def writer(name, lo, hi):
        try:
            t = LakeTable.load(spark, root)
            t._fs = NonAtomicFS(None)
            t.lock = FileLockService(lock_dir)
            runner = CDCRunner(t, retry_conflicts=10)
            runner.run(log.filter((F.col("batch_id") >= lo) & (F.col("batch_id") < hi)))
        except Exception as e:  # pragma: no cover
            errors[name] = e
            raise

    ta = threading.Thread(target=writer, args=("a", 0, 2))
    tb = threading.Thread(target=writer, args=("b", 2, 4))
    ta.start(), tb.start()
    ta.join(300), tb.join(300)
    assert not errors
    final = LakeTable.load(spark, root)
    assert {str(b) for b in range(4)} <= set(final.committed_batches())
    assert final.state_hash() == t_serial.state_hash()
