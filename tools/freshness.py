#!/usr/bin/env python
"""Derive the driver-window FRESHNESS QUEUE for the next round.

With the never-driver-checked backlog drained (r10), window policy
becomes: [new/changed code, reverse-landing order] + the OLDEST driver
attestations first. This tool derives that queue deterministically from
the CORRECTNESS_r*.json files on disk — each query's latest green round
— sorted (latest_round ASC, name ASC), excluding anything already in
the current round's window. Run at round open:

    python tools/freshness.py [n]

prints the oldest-n queue (default 50) as JSON. The derivation is pure
(files -> list), so the next round's `_R{N}_WINDOW` literal pasted from
it stays auditable against the same files.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def latest_attestation_rounds() -> dict[str, int]:
    latest: dict[str, int] = {}
    for path in sorted(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"_r(\d+)\.json", p).group(1)),
    ):
        rnd = int(re.search(r"_r(\d+)\.json", path).group(1))
        for name in json.load(open(path)):
            latest[name] = rnd
    return latest


def freshness_queue(exclude: set[str] | None = None) -> list[tuple[str, int]]:
    """Oldest-attestation-first queue. Entries with NO attestation yet
    must be exactly the current round's window (the driver hasn't run
    yet) — anything else means a query was dropped from a window."""
    from labelspark_spark import queries as Q

    latest = latest_attestation_rounds()
    names = [n for n in Q.REGISTRY if n not in (exclude or set())]
    never = {n for n in names if n not in latest}
    current_window = set(list(Q.REGISTRY)[:50])
    orphans = never - current_window
    assert not orphans, f"never-driver-checked entries outside the current window: {sorted(orphans)}"
    return sorted(
        ((n, latest[n]) for n in names if n in latest), key=lambda t: (t[1], t[0])
    )


if __name__ == "__main__":
    from labelspark_spark.queries import REGISTRY

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    # exclude the CURRENT window (the registry prefix): its entries are
    # being re-attested this round, so even if their on-disk rows are
    # old they must not be double-queued into the next window
    print(json.dumps(freshness_queue(exclude=set(list(REGISTRY)[:50]))[:n]))
