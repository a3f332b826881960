"""Aggregated query registry: importing this module registers every
catalog entry (relational core, lakehouse semantics, pipelines,
extensions) into the shared Q/ORACLE dicts.

The driver's CORRECTNESS gate verifies the first 50 *registered* queries
only (round-2 verdict), so registration order is signal-bearing. Since
round 7 the order is COMPUTED from the recorded ``CORRECTNESS_r*.json``
files instead of a hand-maintained list (r6 verdict #3 — the list was
the only place a stale-row query could silently hide):

1. queries whose LATEST driver row failed (err / any mismatch) — must
   be re-graded immediately;
2. never-driver-graded queries (new this round, or overflow from a
   previous round's window) — no row can exist yet;
3. everything else by ASCENDING latest-graded round — the stalest
   driver signal refreshes first, so over successive rounds the window
   rotates through the whole catalog.

Ties inside a group break by ``_SUBSTRATE_HINTS`` (name prefixes of the
subsystems most churned this round — their queries deserve the freshest
driver signal), then original registration order. All 165+ queries are
still value-verified locally every session by
``tests/test_catalog_oracle.py`` regardless of window position.
"""

from __future__ import annotations

import glob
import json
import os
import re

import emr_hudi_example_spark.catalog as _catalog  # noqa: F401  (registers)
import emr_hudi_example_spark.catalog_lake as _lake  # noqa: F401
import emr_hudi_example_spark.catalog_ext as _ext  # noqa: F401
import emr_hudi_example_spark.catalog_pipelines as _pipes  # noqa: F401
from emr_hudi_example_spark.catalog import ORACLE, Q

#: name prefixes of the subsystems whose substrate changed most this
#: round, in priority order — used only as a TIE-BREAK within the same
#: staleness group. Round 14: the lake kernel (merge_into TOCTOU
#: re-derivation under the writer lock, archival-horizon pre-table
#: point reads, compactor abandonment sidecar, lease grace hygiene) and
#: the pipelines (ods2dwd cold-start cursor), then similarity (the
#: ivfpq envelope work).
_SUBSTRATE_HINTS: list[str] = [
    "lake_", "pipe_", "sim_",
]


def latest_driver_rows(root: str | None = None) -> dict[str, tuple[int, bool]]:
    """Parse every recorded ``CORRECTNESS_r<N>.json`` under the repo
    root: query name -> (newest round with a row, that row was green).
    A green row has no ``err`` and no *_match field that is literally
    False (None = the weaker rows-only check, not a failure)."""
    if root is None:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    newest: dict[str, tuple[int, bool]] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", os.path.basename(path))
        if not m:
            continue
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        rnd = int(m.group(1))
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if name in newest and newest[name][0] >= rnd:
                continue
            green = isinstance(row, dict) and row.get("err") is None and not any(
                row.get(k) is False
                for k in ("rows_match", "schema_match", "hash_match")
            )
            newest[name] = (rnd, green)
    return newest


def compute_priority(
    names: list[str],
    newest: dict[str, tuple[int, bool]],
    hints: list[str] | None = None,
) -> list[str]:
    """Stable full ordering of ``names`` per the module-docstring
    policy. Pure function of its inputs (unit-tested directly;
    ``hints`` defaults to the round's ``_SUBSTRATE_HINTS`` and is
    injectable so the unit test doesn't chase the per-round list)."""
    if hints is None:
        hints = _SUBSTRATE_HINTS
    reg_idx = {n: i for i, n in enumerate(names)}

    def hint_rank(n: str) -> int:
        for i, p in enumerate(hints):
            if n.startswith(p):
                return i
        return len(hints)

    def key(n: str):
        rnd, green = newest.get(n, (None, True))
        if rnd is not None and not green:
            group, stale = 0, rnd  # latest row RED: regrade first
        elif rnd is None:
            group, stale = 1, 0  # never graded
        else:
            group, stale = 2, rnd  # stalest driver signal first
        return (group, stale, hint_rank(n), reg_idx[n])

    return sorted(names, key=key)


def _reorder() -> None:
    ordered = compute_priority(list(Q), latest_driver_rows())
    for registry in (Q, ORACLE):
        snapshot = dict(registry)
        registry.clear()
        registry.update({n: snapshot[n] for n in ordered if n in snapshot})


_reorder()

__all__ = ["Q", "ORACLE", "compute_priority", "latest_driver_rows"]
