"""Pin the r12 driver-window plan — the review-completion rotation
(VERDICT r11 item 1) with a DERIVED changed-code head (r11 stretch
item 7).

The driver hash-checks the FIRST 50 registry entries each round. From
r11 on the window policy is:

    [this round's new/changed code, reverse-landing order]
    + the FRESHNESS QUEUE: oldest driver attestation first, derived
      deterministically from the CORRECTNESS_r*.json files on disk by
      tools/freshness.py (sort by (latest_green_round ASC, name ASC)).

These tests freeze the ROTATION INVARIANTS in code (not one round's
literal list alone):

- _R12_WINDOW is exactly 50 names, distinct, and forms the registry
  prefix the driver checks.
- Its head is exactly the changed-code set: the 33 queries the three
  post-r11-close review batches touched (hand accounting, SURVEY close
  addenda) plus the 6 whose code round 12 itself changed — AND, new
  this round, the head provably covers every attested query that
  tools/changed_head.py flags from the actual
  `git diff r11-close..worktree`, by DERIVATION rather than prose.
- Its tail is exactly the first 11 names of the freshness queue
  RE-DERIVED here from the same files — the queue is consumed in
  order, oldest vintage first. (With a 39-name head the oldest cohort
  does NOT fully drain this round: changed-code re-attestation
  outranks rotation speed by policy, so the horizon advances as fast
  as head pressure allows, no faster.)
- Window entries without an oracle are confined to the frozen
  declared-approximate set (driver records a weaker rows-only check
  for those; each has a hash-checked companion elsewhere).
"""

import glob
import json
import os
import re
import subprocess

import pytest

from labelspark_spark import queries as Q

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The r11 builder-close commit ("round 11: verdict/advice/correctness/
# bench") — the attestation baseline every r12 source change is
# measured against.
R11_CLOSE_SHA = "ae0d373"

# r12 window head, per the rotation policy: no NEW queries this round
# (registry saturated at 364, all attested), 33 CHANGED — the three
# post-r11-close review-fix batches, reverse-landing order (SURVEY
# r11 close addenda items (3)/(4)/(5)).
R12_NEW: list[str] = []
R12_CHANGED = [
    # r12 session changes (ADVICE fixes + this round's own review):
    # conversion_latency join-vs-post-filter semantics (post-close
    # queries.py slice review), asof struct-carry, funnel repeated-step
    # match, salted_join note; derived by tools/changed_head.py (see
    # the derivation test below)
    "conversion_latency",
    "asof_join", "asof_tolerance", "attribution_last_touch",
    "funnel_steps", "salted_join",
    # batch 3 (51e11e7): uploads/silver/flatten/readers/DSv2/text
    "python_datasource_scan", "python_datasource_sink",
    "python_datasource_stream", "python_udtf_sentences",
    "lateral_column_alias", "silver_answers_pivot",
    "silver_object_counts", "upsert_skip", "upsert_suffix",
    "video_frames_silver",
    # batch 2 (d4e7282): multimodal codecs / connector
    "multimodal_audio_adpcm", "multimodal_audio_features",
    "multimodal_audio_g711", "multimodal_audio_meta",
    "multimodal_audio_native", "multimodal_audio_resample",
    "multimodal_bmp_pixels", "multimodal_gif_frames",
    "multimodal_image_tiles", "multimodal_jpeg_pixels",
    # batch 1 (c2103da): dedup/similarity/stateful
    "dedup_canonicalize", "dedup_char_ngram", "dedup_containment",
    "dedup_embedding_ivf", "dedup_embedding_ivf_recall",
    "dedup_embedding_lsh", "dedup_embedding_lsh_recall",
    "dedup_incremental", "dedup_jaccard_prefix",
    "events_stream_session_timeout", "events_stream_stateful",
    "near_dup_threshold_curve", "ngram_novelty",
]
R12_HEAD = R12_NEW + R12_CHANGED

# Attested queries whose code changes since R11_CLOSE_SHA are NOT
# re-attested in the r12 head — every entry needs a reason and is a
# NEXT-round head candidate. Empty at round open; post-close review
# batches append here (with the full-replay-green evidence noted in
# SURVEY) instead of silently growing the prose list.
R12_CHANGED_NOT_IN_HEAD: dict[str, str] = {}

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
# the round runs) would make the re-derived queue reshuffle and go red
# the moment the pinned window succeeds.
PINNED_ROUND = 12


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


def test_r12_window_is_the_driver_prefix():
    assert len(Q._R12_WINDOW) == 50
    assert len(set(Q._R12_WINDOW)) == 50
    assert list(Q.REGISTRY)[:50] == Q._R12_WINDOW


def test_r12_head_is_exactly_the_new_and_changed_set():
    # nothing is ever dropped: every registry entry with NO driver row
    # (as of this round's open) must sit first in the window head;
    # changed-but-previously-attested code follows it; the head holds
    # nothing else
    latest = _latest_attestation_rounds()
    assert latest, "driver CORRECTNESS files missing"
    never = sorted(n for n in Q.REGISTRY if n not in latest)
    assert never == sorted(R12_NEW), never
    # changed entries must already have a driver row (else they'd be NEW)
    assert all(n in latest for n in R12_CHANGED)
    assert Q._R12_WINDOW[: len(R12_HEAD)] == R12_HEAD


def test_r12_tail_is_the_freshness_queue_prefix():
    # re-derive the queue from the CORRECTNESS files (latest round ASC,
    # name ASC — the tools/freshness.py order), drop head names, and
    # pin the tail to its first 12 names: the queue is consumed in
    # order, no name skipped ahead of an older one.
    latest = _latest_attestation_rounds()
    queue = sorted(
        (n for n in Q.REGISTRY if n in latest and n not in R12_HEAD),
        key=lambda n: (latest[n], n),
    )
    assert Q._R12_WINDOW[len(R12_HEAD):] == queue[: 50 - len(R12_HEAD)]


def test_r12_tail_starts_at_the_oldest_vintage():
    # the head is policy-mandated changed code; the tail must still
    # begin at the globally stalest attestation (nothing older than
    # the tail's first name exists outside the window)
    latest = _latest_attestation_rounds()
    tail = Q._R12_WINDOW[len(R12_HEAD):]
    assert tail, "window has no freshness tail"
    oldest_overall = min(
        latest[n] for n in Q.REGISTRY if n in latest and n not in R12_HEAD
    )
    assert latest[tail[0]] == oldest_overall


def test_r12_no_oracle_slots_are_declared_approximate():
    no_oracle = {n for n in Q._R12_WINDOW if Q.REGISTRY[n][1] is None}
    assert no_oracle <= ROWS_ONLY, sorted(no_oracle - ROWS_ONLY)
    # and the frozen approximate set itself hasn't silently grown
    registry_no_oracle = {n for n, (f, s) in Q.REGISTRY.items() if s is None}
    assert registry_no_oracle == ROWS_ONLY, sorted(
        registry_no_oracle ^ ROWS_ONLY
    )


def test_r12_head_covers_the_derived_changed_set():
    """VERDICT r11 stretch item 7: 'did the head include every changed
    attested path?' by DERIVATION. tools/changed_head.py walks each
    registry query's package-internal dependency closure (AST + object
    introspection, conservative: docstring edits inside a reachable
    span count) and intersects it with the actual git diff since the
    r11 close. Every flagged attested query must re-attest in the r12
    head — or carry an explicit, reasoned entry in
    R12_CHANGED_NOT_IN_HEAD (full-replay-verified, next-round head
    candidate)."""
    import importlib.util

    probe = subprocess.run(
        ["git", "rev-parse", "--verify", R11_CLOSE_SHA],
        cwd=REPO, capture_output=True, text=True,
    )
    if probe.returncode != 0:
        pytest.skip("r11-close commit not reachable in this checkout")
    spec = importlib.util.spec_from_file_location(
        "changed_head", os.path.join(REPO, "tools", "changed_head.py")
    )
    ch = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ch)
    flagged = set(ch.changed_queries(R11_CLOSE_SHA))
    allowed = set(R12_HEAD) | set(R12_CHANGED_NOT_IN_HEAD)
    uncovered = flagged - allowed
    assert not uncovered, (
        "attested queries changed since r11-close but absent from the "
        f"r12 head and the documented exception list: {sorted(uncovered)}"
    )
