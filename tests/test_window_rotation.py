"""Driver-window rotation is ledger-derived (VERDICT r12 next-step 7).

The window (first 50 registry entries) must equal the ledger-derived
priority order: never-driver-checked queries first in registry order, then
changed-unverified queries (a ``plans/r<K>/<name>_after.txt`` dump newer
than the query's last green round — VERDICT r15 #8), then ascending
last-green round with name tiebreak. This test recomputes that order
independently of ``queries/window.py``'s implementation, straight from the
CORRECTNESS_r*.json artifacts and the plans/ dumps, so a regression in the
derivation (or a reintroduced hand-maintained list drifting from the
ledger) fails loudly. No SparkSession needed.
"""

from __future__ import annotations

import glob
import json
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _ledger_last_green(names: list[str]) -> dict[str, int | None]:
    per_round: dict[int, set[str]] = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        if rnd < 4:  # pre-generation-change rounds are not evidence
            continue
        rows = json.load(open(path))
        per_round[rnd] = {
            n
            for n, r in rows.items()
            if r.get("rows_match") and r.get("schema_match") and r.get("hash_match")
        }
    return {
        n: max((r for r, g in per_round.items() if n in g), default=None)
        for n in names
    }


def _plans_last_changed() -> dict[str, int]:
    out: dict[str, int] = {}
    for path in glob.glob(os.path.join(REPO, "plans", "r*", "*_after.txt")):
        m = re.search(r"[/\\]r(\d+)[/\\]([^/\\]+)_after\.txt$", path)
        if m:
            rnd, name = int(m.group(1)), m.group(2)
            out[name] = max(out.get(name, 0), rnd)
    return out


def test_window_equals_stalest_50_by_ledger():
    if not glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        pytest.skip("no correctness ledger present (fresh clone)")
    from metricq_db_hta_spark.queries import REGISTRY

    names = list(REGISTRY)
    lg = _ledger_last_green(names)
    lc = _plans_last_changed()
    never = [n for n in names if lg[n] is None]
    changed = sorted(
        (n for n in names if lg[n] is not None and lc.get(n, 0) > lg[n]),
        key=lambda n: (lg[n], n),
    )
    seen = sorted(
        (n for n in names if lg[n] is not None and lc.get(n, 0) <= lg[n]),
        key=lambda n: (lg[n], n),
    )
    expected = (never + changed + seen)[: min(50, len(names))]
    assert names[: len(expected)] == expected


def test_no_query_staler_than_window_can_cover():
    """Every non-scheduled query must be fresher than every scheduled one —
    the defining property of stalest-first (no starved query can hide
    outside the window)."""
    if not glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        pytest.skip("no correctness ledger present (fresh clone)")
    from metricq_db_hta_spark.queries import REGISTRY

    names = list(REGISTRY)
    if len(names) <= 50:
        pytest.skip("registry fits entirely in the window")
    lg = _ledger_last_green(names)
    lc = _plans_last_changed()
    scheduled, rest = names[:50], names[50:]
    assert all(lg[n] is not None for n in rest), "new query left unscheduled"
    assert all(
        lc.get(n, 0) <= lg[n] for n in rest
    ), "changed-unverified query left unscheduled"
    oldest_unscheduled = min(lg[n] for n in rest)
    newest_scheduled = max(
        (
            lg[n]
            for n in scheduled
            if lg[n] is not None and lc.get(n, 0) <= lg[n]
        ),
        default=0,
    )
    assert newest_scheduled <= oldest_unscheduled
