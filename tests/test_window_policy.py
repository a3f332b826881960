"""Correctness-window ordering policy (r6 verdict #3): the registry
order is COMPUTED from recorded CORRECTNESS_r*.json rows — red-latest
first, then never-graded, then ascending staleness — so a stale-row
query can never hide in a hand-maintained list."""

from __future__ import annotations

import json


def test_compute_priority_groups_and_ties():
    from emr_hudi_example_spark.all_queries import compute_priority

    names = ["q_new", "lake_old", "q_old", "q_fresh", "q_red", "pipe_old"]
    newest = {
        "lake_old": (3, True),
        "q_old": (3, True),
        "pipe_old": (3, True),
        "q_fresh": (6, True),
        "q_red": (6, False),  # latest row failed
        # q_new: never graded
    }
    got = compute_priority(names, newest, hints=["lake_", "pipe_"])
    # red first, never-graded second, then ascending round with
    # injected substrate hints (lake_ before pipe_ before others)
    # breaking ties — hints are passed explicitly so this test doesn't
    # chase the per-round _SUBSTRATE_HINTS list
    assert got == [
        "q_red", "q_new", "lake_old", "pipe_old", "q_old", "q_fresh"
    ]


def test_compute_priority_is_stable_within_groups():
    from emr_hudi_example_spark.all_queries import compute_priority

    names = [f"q{i}" for i in range(10)]
    newest = {n: (4, True) for n in names}
    assert compute_priority(names, newest) == names  # registration order


def test_registry_window_holds_the_stalest_rows():
    """On the REAL recorded data: no query outside the 50-slot window
    may have a staler green row than any query inside it (the window is
    exactly the never-graded + stalest rows)."""
    from emr_hudi_example_spark.all_queries import Q, latest_driver_rows

    rows = latest_driver_rows()
    names = list(Q)
    assert len(names) >= 50

    def rank(n):
        rnd, green = rows.get(n, (None, True))
        if rnd is not None and not green:
            return (0, rnd)
        if rnd is None:
            return (1, 0)
        return (2, rnd)

    window, tail = names[:50], names[50:]
    worst_in = max(rank(n) for n in window)
    best_out = min(rank(n) for n in tail)
    assert worst_in <= best_out
    # red-latest rows would be a regression to fix, not a policy state;
    # never-graded (new) queries are fine but must sit INSIDE the
    # window so the driver grades them next round
    assert all(rank(n)[0] != 0 for n in names)
    assert all(rank(n)[0] == 2 for n in tail)


def test_latest_driver_rows_parses_recorded_files(tmp_path):
    from emr_hudi_example_spark.all_queries import latest_driver_rows

    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps({
        "a": {"rows_match": True, "schema_match": True,
              "hash_match": True, "err": None},
        "b": {"rows_match": True, "schema_match": True,
              "hash_match": False, "err": None},
    }))
    (tmp_path / "CORRECTNESS_r05.json").write_text(json.dumps({
        "b": {"rows_match": True, "schema_match": True,
              "hash_match": True, "err": None},
        "c": {"rows_match": True, "schema_match": None,
              "hash_match": None, "err": None},  # rows-only check: green
        "d": {"rows_match": False, "schema_match": True,
              "hash_match": True, "err": "boom"},
    }))
    got = latest_driver_rows(str(tmp_path))
    assert got == {
        "a": (3, True),
        "b": (5, True),  # newest row wins; the old red row is history
        "c": (5, True),
        "d": (5, False),
    }
