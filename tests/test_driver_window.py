"""Pin the r9/r10 driver-window plan (VERDICT r8 items 1-2).

The driver hash-checks the FIRST 50 registry entries each round; the
round-9 job is draining the never-driver-checked backlog in two
provable windows. These tests freeze that contract in code:

- _R9_WINDOW is exactly 50 names, forms the registry prefix, and its
  only non-backlog entry is the round's one new query.
- _R9_WINDOW and _R10_BACKLOG partition the full never-driver-checked
  set (union of every CORRECTNESS_r*.json on disk vs the registry) —
  no name dropped, none double-queued, so after r9+r10 every declared
  query has a driver row.
"""

import glob
import json
import os

from labelspark_spark import queries as Q

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# registry entries added in round 9 (never checkable before this round)
R9_NEW = {"kmeans_ivf_recall", "triangle_count_oriented"}


def _ever_driver_checked() -> set[str]:
    names: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r0[1-8].json")):
        names.update(json.load(open(path)).keys())
    return names


def test_r9_window_is_the_driver_prefix():
    assert len(Q._R9_WINDOW) == 50
    assert len(set(Q._R9_WINDOW)) == 50
    assert list(Q.REGISTRY)[:50] == Q._R9_WINDOW


def test_r9_r10_partition_the_never_checked_backlog():
    checked = _ever_driver_checked()
    assert checked, "driver CORRECTNESS files missing"
    never = {n for n in Q.REGISTRY if n not in checked}
    window, backlog = set(Q._R9_WINDOW), set(Q._R10_BACKLOG)
    assert not (window & backlog), sorted(window & backlog)
    assert window | backlog == never, {
        "queued_but_not_backlog": sorted((window | backlog) - never),
        "backlog_but_not_queued": sorted(never - (window | backlog)),
    }
    # every window entry beyond the new code is a first attestation
    assert window - never == set(), sorted(window - never)
    assert R9_NEW <= window


def test_r9_window_names_have_oracles_or_are_declared():
    # every r9 window slot must produce a hash row: all 50 carry oracles
    missing = [n for n in Q._R9_WINDOW if Q.REGISTRY[n][1] is None]
    assert missing == [], missing
