"""Pin the r10 driver-window plan (VERDICT r9 item 1).

The driver hash-checks the FIRST 50 registry entries each round; r8-r10
drain the never-driver-checked backlog in provable windows. r10 is the
LAST drain round: its window is this round's four new/changed entries
(one genuinely new query + three re-attestations of changed code paths)
followed by all 46 frozen `_R10_BACKLOG` entries — after it runs, every
declared registry query has a driver CORRECTNESS row. These tests
freeze that contract in code:

- _R10_WINDOW is exactly 50 names, forms the registry prefix, and is
  exactly R10_HEAD + _R10_BACKLOG in declared order.
- The backlog covers the whole never-driver-checked set (union of every
  CORRECTNESS_r*.json on disk vs the registry) — no name dropped, so
  after r10 the ever-checked set equals the registry.
- Every window slot carries an oracle (all 50 are hash-checkable; the
  rows-only approximate entries were all driver-checked in r1-r9).
"""

import glob
import json
import os

from labelspark_spark import queries as Q

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# r10 window head: the new probe-twin bit-identity and AQE skew-split
# attestations, plus re-attestations of the two queries whose code
# paths changed this round (struct-ordered triangle orientation; the
# shared exact_cosine_rescore helper behind both IVF probe strategies)
R10_NEW = ["ivf_probe_twin_equality", "aqe_skew_join"]
R10_REATTEST = [
    "triangle_count_oriented",
    "knn_ivf_agreement",
]


def _ever_driver_checked() -> set[str]:
    names: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r0[1-9].json")):
        names.update(json.load(open(path)).keys())
    return names


def test_r10_window_is_the_driver_prefix():
    assert len(Q._R10_WINDOW) == 50
    assert len(set(Q._R10_WINDOW)) == 50
    assert list(Q.REGISTRY)[:50] == Q._R10_WINDOW


def test_r10_window_is_head_plus_frozen_backlog():
    assert Q._R10_WINDOW == R10_NEW + R10_REATTEST + Q._R10_BACKLOG


def test_r10_drains_the_backlog_to_zero():
    checked = _ever_driver_checked()
    assert checked, "driver CORRECTNESS files missing"
    never = {n for n in Q.REGISTRY if n not in checked}
    window = set(Q._R10_WINDOW)
    # every never-checked name is in this window: after r10 the
    # ever-checked set covers the registry
    assert never <= window, sorted(never - window)
    # the window's non-backlog head is exactly the new + re-attested
    # entries; re-attested names are by definition already checked
    assert never - set(Q._R10_BACKLOG) == set(R10_NEW), sorted(
        never - set(Q._R10_BACKLOG)
    )
    assert set(R10_REATTEST) <= checked, sorted(set(R10_REATTEST) - checked)


def test_r10_window_names_all_carry_oracles():
    # every r10 window slot must produce a hash row: all 50 carry oracles
    missing = [n for n in Q._R10_WINDOW if Q.REGISTRY[n][1] is None]
    assert missing == [], missing
