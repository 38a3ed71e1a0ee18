#!/usr/bin/env python
"""Driver-window rotation hygiene (VERDICT r5 next-step 6).

The correctness harness records only the first 50 registry entries per
round; the registry has outgrown the window (len(REGISTRY) is printed in
the summary line below — no hardcoded count here, per ADVICE r6 the
docstring drifted), so the window must rotate. This script makes the
rotation enumerable and enforceable: for every registry query it prints
the last round with a fully-green driver row (rows + schema + hash) and
fails if any query is more than ``--max-stale`` rounds stale.

Only rounds >= 4 count: the testdata generation changed before round 4
(events.ts became a plain µs timestamp), so earlier green rows are not
evidence about the current data.

Queries inside the CURRENT window (the first 50 registry entries) are
"scheduled" — the next driver run refreshes them — and are reported as
such rather than stale.

Exit status: 0 when every query is fresh or scheduled, 1 otherwise.
"""

from __future__ import annotations

import argparse
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

from metricq_db_hta_spark.queries.window import (  # noqa: E402
    FIRST_VALID_ROUND,  # noqa: F401 — re-exported; the docstring references it
    WINDOW_SIZE,
    green_rounds as _green_rounds,
)


def green_rounds() -> dict[int, set[str]]:
    # Since r13 the parsing lives in queries/window.py — the same ledger
    # logic that DERIVES the window — so audit and schedule cannot diverge.
    return _green_rounds(REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-stale", type=int, default=2,
                    help="fail when a query's last green row is older than "
                    "this many rounds (default 2)")
    args = ap.parse_args()

    from metricq_db_hta_spark.queries import PENDING_NEXT_WINDOW, REGISTRY

    rounds = green_rounds()
    if not rounds:
        print("no CORRECTNESS_r*.json on the current generation found")
        return 1
    latest = max(rounds)
    scheduled = set(list(REGISTRY)[:WINDOW_SIZE])
    # queries added after the current window filled, with the rotation
    # promise recorded in queries/__init__.py — exempt from the
    # never-checked failure; the NEXT window must drain this list
    pending = set(PENDING_NEXT_WINDOW) - scheduled

    last_green: dict[str, int | None] = {}
    for name in REGISTRY:
        last_green[name] = max(
            (r for r, g in rounds.items() if name in g), default=None
        )

    failures = []
    print(f"{'query':44s} {'last-green':>10s} {'status':>10s}")
    for name, lg in sorted(last_green.items(), key=lambda kv: (kv[1] or 0, kv[0])):
        stale = None if lg is None else latest - lg
        if name in scheduled:
            status = "scheduled"
        elif lg is None and name in pending:
            status = "pending"
        elif lg is None:
            status = "NEVER"
            failures.append(name)
        elif stale > args.max_stale:
            status = f"STALE({stale})"
            failures.append(name)
        else:
            status = "ok"
        print(f"{name:44s} {str(lg or '-'):>10s} {status:>10s}")

    n_never = sum(1 for v in last_green.values() if v is None)
    print(
        f"\n{len(last_green)} queries; latest round r{latest:02d}; "
        f"{n_never} never driver-checked; "
        f"{len(scheduled & set(last_green))} scheduled in current window"
    )
    if pending:
        print(f"NOTE: {len(pending)} new quer{'y' if len(pending)==1 else 'ies'} "
              f"pending next-window rotation (PENDING_NEXT_WINDOW): "
              f"{sorted(pending)}")
    if failures:
        print(f"FAIL: {len(failures)} unscheduled quer{'y is' if len(failures)==1 else 'ies are'} "
              f"stale beyond {args.max_stale} rounds: {failures}")
        return 1
    print("OK: every query is fresh, scheduled, or pending rotation")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
