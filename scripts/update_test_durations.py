#!/usr/bin/env python
"""Promote the last pytest run's measured durations to tests/durations.json.

The conftest auto-tags tests >= SLOW_SECS as `slow` from this committed file
(r4 verdict: the hand-maintained _SLOW_TESTS name list rots as tests are
added). Workflow:

    python -m pytest tests/ -q          # full suite; writes /tmp/test_durations_last.json
    python scripts/update_test_durations.py
    git add tests/durations.json

Merges into the existing file (a partial run must not drop measurements for
tests it skipped); pass --replace to start fresh.
"""

from __future__ import annotations

import argparse
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DST = os.path.join(REPO, "tests", "durations.json")
SRC = "/tmp/test_durations_last.json"


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--replace", action="store_true",
                   help="discard existing measurements instead of merging")
    args = p.parse_args()

    with open(SRC) as f:
        new = json.load(f)
    old: dict = {}
    if not args.replace and os.path.exists(DST):
        with open(DST) as f:
            old = json.load(f)
    merged = {**old, **new}
    # Drop entries for tests that no longer exist is impossible without
    # collection; prune obviously-stale files instead.
    merged = {k: v for k, v in merged.items()
              if os.path.exists(os.path.join(REPO, k.split("::")[0]))}
    with open(DST, "w") as f:
        json.dump(merged, f, indent=0, sort_keys=True)
    n_slow = sum(1 for v in merged.values() if v >= 8.0)
    print(f"wrote {DST}: {len(merged)} tests measured, {n_slow} >= 8s (slow)")


if __name__ == "__main__":
    main()
