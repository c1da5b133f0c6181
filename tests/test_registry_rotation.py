"""Pin the driver-window rotation invariants.

The external correctness gate checks only the FIRST 50 registry entries
per round.  The rotation contract: every name with a recorded driver-green
verdict sorts AFTER every name without one, so each round's window is
spent on never-checked queries until the backlog drains.
"""

from __future__ import annotations

import json
import pathlib

from admob_data_pipeline_spark.plans import registry

ROOT = pathlib.Path(__file__).resolve().parent.parent


def _recorded_green() -> set[str]:
    names: set[str] = set()
    for f in sorted(ROOT.glob("CORRECTNESS_r*.json")):
        rows = json.loads(f.read_text())
        names |= {
            k
            for k, v in rows.items()
            if v.get("hash_match")
            or (v.get("rows_match") and v.get("err") is None)
        }
    return names


def test_driver_green_covers_all_recorded_verdicts():
    recorded = _recorded_green()
    missing = recorded - registry.DRIVER_GREEN
    assert not missing, (
        f"CORRECTNESS rows not in DRIVER_GREEN (stalls rotation): {missing}"
    )


def test_window_prefers_unchecked_queries():
    window = list(registry.QUERIES)[:50]
    unchecked_total = sum(
        1 for k in registry.QUERIES if k not in registry.DRIVER_GREEN
    )
    stale = [k for k in window if k in registry.DRIVER_GREEN]
    # Green names may enter the window only once the backlog is smaller
    # than the window itself.
    allowed_stale = max(0, 50 - unchecked_total)
    assert len(stale) <= allowed_stale, (
        f"window wastes slots on already-green queries: {stale}"
    )


def test_every_query_name_unique_and_oracled_names_exist():
    assert len(registry.QUERIES) == len(set(registry.QUERIES))
    orphans = [k for k in registry.ORACLES if k not in registry.QUERIES]
    assert not orphans, f"oracles without queries: {orphans}"


def test_recheck_names_lead_the_window():
    """A RECHECK name (semantics changed after its green record) must
    re-enter the driver's 50-query window even though it stays in
    DRIVER_GREEN for the rotation-coverage invariant above."""
    window = list(registry.QUERIES)[:50]
    for name in registry.RECHECK:
        if name in registry.QUERIES:
            assert name in window, f"RECHECK name {name} not in window"
            assert name in registry.DRIVER_GREEN
