"""Pin the r11 driver-window plan — the FIRST FRESHNESS ROTATION
(VERDICT r10 item 1).

The driver hash-checks the FIRST 50 registry entries each round. The
r8-r10 windows drained the never-driver-checked backlog to zero; from
r11 on the window policy is:

    [this round's new/changed code, reverse-landing order]
    + the FRESHNESS QUEUE: oldest driver attestation first, derived
      deterministically from the CORRECTNESS_r*.json files on disk by
      tools/freshness.py (sort by (latest_green_round ASC, name ASC)).

These tests freeze the ROTATION INVARIANTS in code (not one round's
literal list alone):

- _R11_WINDOW is exactly 50 names, distinct, and forms the registry
  prefix the driver checks.
- Its head is exactly the never-attested entries (nothing new is ever
  dropped from a window), its tail is exactly the first 49 names of
  the freshness queue RE-DERIVED here from the same files.
- The rotation horizon moves: the window covers the COMPLETE oldest
  cohort, so after the round runs the stalest attestation age strictly
  decreases.
- Window entries without an oracle are confined to the frozen
  declared-approximate set (driver records a weaker rows-only check
  for those; each has a hash-checked companion elsewhere).
"""

import glob
import json
import os
import re

from labelspark_spark import queries as Q

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# r11 window head, per the rotation policy (new/changed code first):
# the hierarchical (two-level) k-means fit attestation is NEW; the
# flat-path companion is CHANGED (r11 code-review extraction of the
# shared _kmeans_recall_bound scaffold), so it re-attests in the head
# instead of waiting out its natural rotation slot (last attested r9)
R11_NEW = ["kmeans_twolevel_recall"]
R11_CHANGED = ["kmeans_ivf_recall"]
R11_HEAD = R11_NEW + R11_CHANGED

# the frozen declared-approximate set (VERDICT r10: 12 rows-only
# entries, every one carrying a driver-green hash-checked companion)
ROWS_ONLY = {
    "knn_label_vote_ivf", "similarity_pq", "hll_distinct",
    "percentiles_approx", "similarity_kmeans_ivf", "dedup_embedding_ivf",
    "dedup_embedding_lsh", "similarity_ivf_probe", "approx_distinct",
    "dedup_minhash_lsh", "similarity_lsh", "similarity_ivf",
}


# The round whose window this file pins. The derivation below must see
# exactly the CORRECTNESS files that existed at THIS round's open —
# including the in-flight round's own file (written by the driver while
# the round runs) would make the never-attested set empty and reshuffle
# the re-derived queue, going red the moment the pinned window succeeds
# (the r10 analog guarded this with a r0[1-9] glob; caught again by r11
# code review).
PINNED_ROUND = 11


def _latest_attestation_rounds() -> dict[str, int]:
    """Each query's latest CORRECTNESS round among rounds BEFORE the
    pinned one, from the files on disk (same derivation as
    tools/freshness.py, kept inline so the test can't drift from what
    it pins)."""
    latest: dict[str, int] = {}
    for path in sorted(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"_r(\d+)\.json", p).group(1)),
    ):
        rnd = int(re.search(r"_r(\d+)\.json", path).group(1))
        if rnd >= PINNED_ROUND:
            continue
        for name in json.load(open(path)):
            latest[name] = rnd
    return latest


def test_r11_window_is_the_driver_prefix():
    assert len(Q._R11_WINDOW) == 50
    assert len(set(Q._R11_WINDOW)) == 50
    assert list(Q.REGISTRY)[:50] == Q._R11_WINDOW


def test_r11_head_is_exactly_the_new_and_changed_set():
    # nothing is ever dropped: every registry entry with NO driver row
    # (as of this round's open) must sit first in the window head;
    # changed-but-previously-attested code follows it; the head holds
    # nothing else
    latest = _latest_attestation_rounds()
    assert latest, "driver CORRECTNESS files missing"
    never = sorted(n for n in Q.REGISTRY if n not in latest)
    assert never == sorted(R11_NEW), never
    # changed entries must already have a driver row (else they'd be NEW)
    assert all(n in latest for n in R11_CHANGED)
    assert Q._R11_WINDOW[: len(R11_HEAD)] == R11_HEAD


def test_r11_tail_is_the_freshness_queue_prefix():
    # re-derive the queue from the CORRECTNESS files (latest round ASC,
    # name ASC — the tools/freshness.py order), drop head names, and
    # pin the tail to its first 48 names. Entries attested in the
    # newest round on disk sort last, so excluding the previous window
    # is a no-op by construction.
    latest = _latest_attestation_rounds()
    queue = sorted(
        (n for n in Q.REGISTRY if n in latest and n not in R11_HEAD),
        key=lambda n: (latest[n], n),
    )
    assert Q._R11_WINDOW[len(R11_HEAD):] == queue[: 50 - len(R11_HEAD)]


def test_r11_rotation_horizon_strictly_advances():
    # the window must swallow the ENTIRE oldest cohort: once this
    # round's driver rows land, no attestation of that vintage remains,
    # so the stalest age strictly decreases every rotation
    latest = _latest_attestation_rounds()
    oldest = min(latest[n] for n in Q.REGISTRY if n in latest)
    cohort = {n for n in Q.REGISTRY if latest.get(n) == oldest}
    assert cohort <= set(Q._R11_WINDOW), sorted(cohort - set(Q._R11_WINDOW))


def test_r11_no_oracle_slots_are_declared_approximate():
    no_oracle = {n for n in Q._R11_WINDOW if Q.REGISTRY[n][1] is None}
    assert no_oracle <= ROWS_ONLY, sorted(no_oracle - ROWS_ONLY)
    # and the frozen approximate set itself hasn't silently grown
    registry_no_oracle = {n for n, (f, s) in Q.REGISTRY.items() if s is None}
    assert registry_no_oracle == ROWS_ONLY, sorted(
        registry_no_oracle ^ ROWS_ONLY
    )
