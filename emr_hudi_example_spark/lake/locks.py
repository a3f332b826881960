"""Writer-lock providers — the engine's seam for the reference's
optimistic-concurrency lock configuration (``SRC/package.scala:38-47``,
``SRC/util/HudiConfig.scala:50-56``: ZooKeeper lock provider + lazy
failed-write cleaning).

Hudi abstracts OCC behind a ``LockProvider`` interface (ZK, DynamoDB,
filesystem, in-process); this module is the same seam.
:class:`FileLockProvider` is the default — an ``O_EXCL`` lock file that
is correct across *processes on one host* (the sandbox's reach). A
multi-host deployment plugs in a provider backed by a real coordination
service by implementing the same two methods; every ``LakeTable``
code path goes through the provider, so nothing else changes.

Contention surfaces as :class:`LockContention` (a ``RuntimeError``
subclass — existing broad handlers keep working), so callers can
distinguish "a live writer holds the lock, retry" from real failures:
the async compactor retries a bounded number of times, the streaming
ingest tick retries instead of crashing the query, and genuinely stale
locks (crashed writer) still fail loudly with the lock path surfaced.
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager


class LockContention(RuntimeError):
    """The writer lock stayed held for the whole wait window."""


class LockProvider:
    """Interface: mutual exclusion for one table's commit timeline."""

    def acquire(self, wait_seconds: float) -> None:
        """Block up to ``wait_seconds`` for the lock; raise
        :class:`LockContention` if it never frees."""
        raise NotImplementedError

    def release(self) -> None:
        raise NotImplementedError

    @contextmanager
    def held(self, wait_seconds: float):
        self.acquire(wait_seconds)
        try:
            yield
        finally:
            self.release()


class FileLockProvider(LockProvider):
    """``O_EXCL`` lock file under the table root — atomic on POSIX
    filesystems across processes; the single-host analog of the
    reference's ZooKeeper lock. A crashed writer leaves a stale lock an
    operator can remove (matching the reference's LAZY failed-write
    cleaning: the cleaner handles orphan data, the operator the lock).
    """

    def __init__(self, table_path: str, poll_seconds: float = 0.05) -> None:
        self.lock_path = os.path.join(table_path, "_writer.lock")
        self.poll_seconds = poll_seconds
        self._fd: int | None = None

    def acquire(self, wait_seconds: float) -> None:
        os.makedirs(os.path.dirname(self.lock_path), exist_ok=True)
        deadline = time.monotonic() + wait_seconds
        while True:
            try:
                self._fd = os.open(
                    self.lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY
                )
                # owner pid, for operators inspecting a stale lock
                os.write(self._fd, str(os.getpid()).encode())
                return
            except FileExistsError:
                if time.monotonic() >= deadline:
                    raise LockContention(
                        f"concurrent writer holds {self.lock_path} "
                        f"(remove if stale)"
                    ) from None
                time.sleep(self.poll_seconds)

    def release(self) -> None:
        if self._fd is not None:
            os.close(self._fd)
            self._fd = None
            try:
                os.unlink(self.lock_path)
            except FileNotFoundError:
                pass  # operator removed a lock they judged stale


def retry_on_contention(
    fn,
    attempts: int = 8,
    backoff_seconds: float = 0.25,
):
    """Run ``fn()``, retrying on :class:`LockContention` up to
    ``attempts`` times with linear backoff. The streaming-ingest guard
    (round-2 advice): a micro-batch that loses the lock race to a long
    compaction retries instead of terminating the whole streaming query;
    a lock held beyond every retry (stale/crashed writer) still raises.
    """
    last: LockContention | None = None
    for i in range(attempts):
        try:
            return fn()
        except LockContention as exc:
            last = exc
            time.sleep(backoff_seconds * (i + 1))
    raise last  # type: ignore[misc]
