"""Promote the driver-slot rotation queue after a driver round.

The driver certifies the FIRST 50 entries of ``queries()`` per round
(CORRECTNESS_r{N}.json). ``_DRIVER_PRIORITY`` in ``plans/_core.py``
holds the full never-certified rotation queue; after each round the
newly-certified names must leave the queue so the next 50 promote
into the driver window.

This script computes the still-uncertified queue from the committed
CORRECTNESS_r*.json files and PRINTS it (it does not edit _core.py —
the list lives next to hand-written grouping comments that a blind
rewrite would clobber). Paste the output over the stale block, or
use --check in CI/tests to assert the current prefix is all-fresh.

Usage:
    python scripts/promote_slots.py           # print the new queue
    python scripts/promote_slots.py --check   # exit 1 if any of the
                                              # first 50 already has a
                                              # driver CORRECTNESS row
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def certified_names() -> set[str]:
    out: set[str] = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(path) as fh:
            out.update(json.load(fh).keys())
    return out


def main() -> int:
    from loan_default_prediction_app_big_data_spark.plans import registry as R

    cert = certified_names()
    queue = [n for n in R._DRIVER_PRIORITY if n not in cert]
    stale = [n for n in R._DRIVER_PRIORITY if n in cert]
    uncovered = [
        n for n in R.REGISTRY if n not in cert and n not in set(queue)
    ]

    if "--check" in sys.argv[1:]:
        first50 = list(R.queries())[:50]
        uncert = [n for n in R.REGISTRY if n not in cert]
        if len(uncert) >= 50:
            already = [n for n in first50 if n in cert]
            if already:
                print(f"STALE driver slots (already certified): {already}")
                return 1
            print("driver window is all-fresh (50/50 never certified)")
            return 0
        # Queue smaller than the window: certified names re-verify in
        # the leftover slots; require only that every uncertified name
        # leads the window.
        missing = [n for n in uncert if n not in set(first50)]
        if missing:
            print(f"uncertified queries outside the window: {missing}")
            return 1
        print(
            f"driver window is fresh-first ({len(uncert)} uncertified "
            "names all inside the 50-slot window)"
        )
        return 0

    print(f"# certified so far: {len(cert)}; still queued: {len(queue)}; "
          f"stale entries to drop: {len(stale)}")
    if uncovered:
        print(f"# WARNING: registered-but-unqueued and uncertified: {uncovered}")
    for n in queue:
        print(f'    "{n}",')
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
