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

from emr_hudi_example_spark.lake.locks import LockContention
from emr_hudi_example_spark.lake.table import LakeTable


class AsyncCompactor:
    """Background executor for scheduled compaction plans.

    Usage::

        compactor = AsyncCompactor(table).start()
        ...  # ingest keeps calling table.schedule_compaction()
        compactor.stop()   # drains pending plans, then joins

    ``executed`` collects the committed compaction instants, ``failed``
    the (plan_id, error) pairs of plans abandoned after a non-lock
    failure or too many lock-contention rounds (for tests /
    observability). Only :class:`LockContention` is retried — a plan
    that genuinely fails (e.g. corrupt plan JSON) is abandoned after
    ``max_attempts_per_plan`` instead of spinning the daemon forever.
    """

    def __init__(
        self,
        table: LakeTable,
        poll_seconds: float = 0.2,
        lock_backoff_seconds: float = 0.2,
        max_attempts_per_plan: int = 300,
    ) -> None:
        self.table = table
        self.poll_seconds = poll_seconds
        self.lock_backoff_seconds = lock_backoff_seconds
        self.max_attempts_per_plan = max_attempts_per_plan
        self.executed: list[str] = []
        self.failed: list[tuple[str, Exception]] = []
        self._attempts: dict[str, int] = {}
        self._abandoned: set[str] = set()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def start(self) -> "AsyncCompactor":
        self._thread = threading.Thread(
            target=self._loop, name=f"compactor-{self.table.table}",
            daemon=True,
        )
        self._thread.start()
        return self

    def _abandon(self, plan_id: str, exc: Exception) -> None:
        self._abandoned.add(plan_id)
        self.failed.append((plan_id, exc))
        # discard the plan FILE too (r13 review): the in-memory
        # _abandoned set dies with this process, so leaving the .json
        # would (a) keep pending_compactions() reporting it forever and
        # (b) make every fresh AsyncCompactor after a restart re-spin
        # its max_attempts_per_plan on a plan already judged dead. The
        # abandonment stays observable in ``failed``; an operator
        # re-schedules if the intent still matters.
        import os

        self.table._discard_plan(
            os.path.join(
                self.table.commits_dir, "_compaction", plan_id + ".json"
            )
        )

    def _drain_once(self) -> bool:
        """Execute one pending plan; True if progress was made (executed,
        discarded-as-stale, or abandoned)."""
        pending = [
            p
            for p in self.table.pending_compactions()
            if p not in self._abandoned
        ]
        if not pending:
            return False
        plan_id = pending[0]
        self._attempts[plan_id] = self._attempts.get(plan_id, 0) + 1
        try:
            inst = self.table.run_compaction(plan_id)
        except LockContention as exc:
            # writer lock held by an in-flight micro-batch — back off;
            # but a lock that NEVER frees (stale from a crashed writer)
            # must not spin forever: cap the rounds, then abandon
            if self._attempts[plan_id] >= self.max_attempts_per_plan:
                self._abandon(plan_id, exc)
                return True
            time.sleep(self.lock_backoff_seconds)
            return False
        except Exception as exc:  # noqa: BLE001 — abandon, don't spin
            self._abandon(plan_id, exc)
            return True
        if inst is not None:
            self.executed.append(inst)
        self._attempts.pop(plan_id, None)
        return True

    def _loop(self) -> None:
        while not self._stop.is_set():
            if not self._drain_once():
                self._stop.wait(self.poll_seconds)

    def stop(self, drain: bool = True, timeout: float = 60.0) -> bool:
        """Stop the executor; with ``drain`` (default), finish any
        still-pending plans first so shutdown leaves no orphan plans.

        Returns True when the daemon exited and the drain completed
        within ``timeout``. If the daemon is still mid-fold when the
        join times out (a fold is minutes of I/O at scale and cannot
        be interrupted), stop() returns False WITHOUT draining on the
        caller thread — two unsynchronized executors folding the same
        pinned plan would waste one whole fold at publish and mutate
        the attempt/result lists from two threads (r13 review). The
        daemon re-checks ``_stop`` after its in-flight plan and exits;
        call stop() again to finish the drain."""
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout)
            if self._thread.is_alive():
                return False
        if drain:
            deadline = time.monotonic() + timeout
            while (
                any(
                    p not in self._abandoned
                    for p in self.table.pending_compactions()
                )
                and time.monotonic() < deadline
            ):
                self._drain_once()
        return True
