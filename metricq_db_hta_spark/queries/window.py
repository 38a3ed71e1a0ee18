"""Ledger-derived driver-window rotation (VERDICT r12 next-step 7).

The correctness harness records only the first 50 registry entries per
round, so the registry (122 queries) must rotate through the window. Up to
round 12 the rotation was a hand-maintained list in ``queries/__init__.py``;
the r11 off-by-one (``rel_join_anti`` silently displaced) is the failure
mode of hand maintenance. This module derives the window from the same
freshness ledger ``scripts/window_coverage.py`` audits — the
``CORRECTNESS_r*.json`` artifacts at the repo root — so the schedule and
the audit can never disagree:

* **new-queries-first**: a query with no green driver row on the current
  testdata generation is scheduled before everything else (registry
  insertion order — i.e. the order the domain modules register them —
  so a freshly added operator is checked the round it lands);
* **changed-unverified next** (VERDICT r15 #8): a query whose physical
  plan changed in an optimization round NEWER than its last green driver
  row — detected mechanically from the committed plan-dump deliverable
  ``plans/r<K>/<name>_after.txt`` (an ``_after`` dump exists exactly when
  a change landed on that query) — is scheduled before merely-stale
  queries, so the driver's oracle covers every rewrite the round after it
  lands instead of whenever staleness happens to rotate it in;
* **stalest-first** for the rest: ascending last-green round, ties broken
  by name for determinism.

Rounds before ``FIRST_VALID_ROUND`` don't count: the testdata generation
changed before round 4 (events.ts became a plain µs timestamp), so earlier
green rows are not evidence about the current data.

Fallback: when no ledger files are found (fresh clone without artifacts,
package imported outside the repo), the registry order is left untouched —
deterministic, and the driver still records a valid 50-query window.
"""

from __future__ import annotations

import glob
import json
import os
import re

#: first round on the current testdata generation (see module docstring)
FIRST_VALID_ROUND = 4
#: the driver records this many registry entries per round
WINDOW_SIZE = 50

_ROUND_RE = re.compile(r"_r(\d+)\.json$")


def _ledger_dir() -> str | None:
    """Locate the directory holding CORRECTNESS_r*.json.

    Walk up from this file (covers the normal in-repo layout), then try the
    working directory (covers an installed package run from the repo root).
    """
    here = os.path.dirname(os.path.abspath(__file__))
    for _ in range(6):
        if glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
            return here
        parent = os.path.dirname(here)
        if parent == here:
            break
        here = parent
    if glob.glob(os.path.join(os.getcwd(), "CORRECTNESS_r*.json")):
        return os.getcwd()
    return None


def green_rounds(ledger_dir: str) -> dict[int, set[str]]:
    """round -> names with a fully-green driver row (rows+schema+hash)."""
    out: dict[int, set[str]] = {}
    for path in glob.glob(os.path.join(ledger_dir, "CORRECTNESS_r*.json")):
        m = _ROUND_RE.search(path)
        if not m or int(m.group(1)) < FIRST_VALID_ROUND:
            continue
        try:
            rows = json.load(open(path))
        except (OSError, ValueError):
            continue
        out[int(m.group(1))] = {
            name
            for name, r in rows.items()
            if isinstance(r, dict)
            and r.get("rows_match")
            and r.get("schema_match")
            and r.get("hash_match")
        }
    return out


def last_green(registry_names: list[str], ledger_dir: str) -> dict[str, int | None]:
    rounds = green_rounds(ledger_dir)
    return {
        name: max((r for r, g in rounds.items() if name in g), default=None)
        for name in registry_names
    }


def last_changed(ledger_dir: str) -> dict[str, int]:
    """name -> newest round with a committed ``plans/r<K>/<name>_after.txt``.

    The ``_after`` plan dump is the optimization-round deliverable written
    exactly when a query's physical plan changed, so it doubles as a
    machine-readable change ledger (``_before``-only dumps are baseline
    captures of untouched queries and do not count)."""
    out: dict[str, int] = {}
    for path in glob.glob(os.path.join(ledger_dir, "plans", "r*", "*_after.txt")):
        m = re.search(r"[/\\]r(\d+)[/\\]([^/\\]+)_after\.txt$", path)
        if not m:
            continue
        rnd, name = int(m.group(1)), m.group(2)
        out[name] = max(out.get(name, 0), rnd)
    return out


def derive_window(
    registry_names: list[str],
    size: int = WINDOW_SIZE,
    ledger_dir: str | None = None,
) -> list[str]:
    """The next driver window: new-queries-first, then stalest-first.

    ``registry_names`` must be in registry insertion order (new queries are
    scheduled in that order). Returns the first ``size`` names of the
    derived priority order; with no ledger available, returns the input
    order unchanged (truncated to ``size``).
    """
    ledger_dir = ledger_dir or _ledger_dir()
    if ledger_dir is None:
        return list(registry_names)[:size]
    lg = last_green(list(registry_names), ledger_dir)
    lc = last_changed(ledger_dir)
    never = [n for n in registry_names if lg[n] is None]
    changed = sorted(
        (
            n
            for n in registry_names
            if lg[n] is not None and lc.get(n, 0) > lg[n]
        ),
        key=lambda n: (lg[n], n),
    )
    seen = sorted(
        (
            n
            for n in registry_names
            if lg[n] is not None and lc.get(n, 0) <= lg[n]
        ),
        key=lambda n: (lg[n], n),
    )
    return (never + changed + seen)[:size]
