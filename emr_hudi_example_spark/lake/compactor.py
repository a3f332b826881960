"""Async compaction executor — the engine's analog of the reference's
async compaction on the KDS ingest path (``SRC/KDS2Hudi.scala:131-133``,
``hoodie.datasource.compaction.async.enable``).

The ingest thread only *schedules* plans (cheap, driver-side pin of the
live-file set); this daemon thread *executes* them off the ingest
critical path. Writer-lock contention with an in-flight micro-batch is
expected — the executor retries after a short backoff, exactly the role
Hudi's lock provider plays between its ingest and compactor.
"""

from __future__ import annotations

import threading
import time

from emr_hudi_example_spark.lake.table import LakeTable


class AsyncCompactor:
    """Background executor for scheduled compaction plans.

    Usage::

        compactor = AsyncCompactor(table).start()
        ...  # ingest keeps calling table.schedule_compaction()
        compactor.stop()   # drains pending plans, then joins

    ``executed`` collects the committed compaction instants (for tests /
    observability).
    """

    def __init__(
        self,
        table: LakeTable,
        poll_seconds: float = 0.2,
        lock_backoff_seconds: float = 0.2,
    ) -> None:
        self.table = table
        self.poll_seconds = poll_seconds
        self.lock_backoff_seconds = lock_backoff_seconds
        self.executed: list[str] = []
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def start(self) -> "AsyncCompactor":
        self._thread = threading.Thread(
            target=self._loop, name=f"compactor-{self.table.table}",
            daemon=True,
        )
        self._thread.start()
        return self

    def _drain_once(self) -> bool:
        """Execute one pending plan; True if progress was made (executed
        or discarded-as-stale)."""
        pending = self.table.pending_compactions()
        if not pending:
            return False
        try:
            inst = self.table.run_compaction(pending[0])
        except RuntimeError:
            # writer lock held by an in-flight micro-batch — back off
            time.sleep(self.lock_backoff_seconds)
            return False
        if inst is not None:
            self.executed.append(inst)
        return True

    def _loop(self) -> None:
        while not self._stop.is_set():
            if not self._drain_once():
                self._stop.wait(self.poll_seconds)

    def stop(self, drain: bool = True, timeout: float = 60.0) -> None:
        """Stop the executor; with ``drain`` (default), finish any
        still-pending plans first so shutdown leaves no orphan plans."""
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout)
        if drain:
            deadline = time.monotonic() + timeout
            while (
                self.table.pending_compactions()
                and time.monotonic() < deadline
            ):
                self._drain_once()
