#!/usr/bin/env python
"""Boundary-data probe: turn the mutation audit's "boundary value
absent from data" adjudications into MEASUREMENT.

The r13 mutation audit (tools/mutate_oracle.py, SURVEY §5) left a
class of surviving mutants adjudicated as benign-at-this-data: the
flipped comparison only matters for a row sitting EXACTLY on the
predicate boundary (an order at the date-literal midnight, a purchase
at the signup instant, a 30-minute-exact session gap, a Levenshtein
pair at the threshold...), and the driver's synthetic data happens to
contain no such row. That adjudication was prose. This tool makes it
evidence: for each such survivor it

  1. builds an OVERLAY dataset — the sf dir with the boundary row(s)
     INJECTED (unmodified tables symlinked; modified tables rewritten
     with pyarrow against the original schema so physical types
     survive),
  2. asserts the UNMUTATED query/oracle pair is still hash-GREEN on
     the overlay (both engines agree at the boundary — if they don't,
     that is a real gate defect this tool just found), and
  3. re-runs the exact surviving mutant (same deterministic
     mutants_of index as the at-rest MUTATION*.json detail order) on
     the overlay and asserts it now goes RED.

A mutant still green on its boundary overlay means the adjudication
was WRONG — the oracle pair genuinely cannot see that semantic axis
and must be strengthened. Exit 1 in that case (and when step 2 fails).

Survivors NOT probed here are the algebraic-equivalence class (the
adjudication's class b): provably input-independent no-ops (pruning
guards re-filtered downstream, rank-invariant shifts, single-value
min==max). They are listed with reasons in CLASS_B so the accounting
covers the full survivor union.

    python tools/boundary_probe.py [sf_dir] [--out BOUNDARY.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
from datetime import datetime

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, os.path.join(REPO, "tools"))

from mutate_oracle import mutants_of  # noqa: E402
from oracle_util import TABLES, compare, register_views  # noqa: E402


def _ctx(sf_dir: str) -> dict:
    """One-time lookups the injections need: fresh surrogate keys and
    clone-donor rows, read with pyarrow (no Spark needed)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = {n: pq.read_table(os.path.join(sf_dir, f"{n}.parquet"))
         for n in ("customer", "orders", "lineitem", "supplier", "part",
                   "events", "documents")}
    first = {n: t[n].slice(0, 1).to_pylist()[0] for n in t}
    building = t["customer"].filter(
        pc.equal(t["customer"]["c_mktsegment"], "BUILDING")
    ).slice(0, 1).to_pylist()[0]["c_custkey"]
    part_pdf = t["part"].to_pandas()
    q16_part = part_pdf[
        (part_pdf.p_brand != "Brand#3")
        & (part_pdf.p_type != "PROMO")
        & (part_pdf.p_size.isin([1, 5, 9, 15, 20, 25, 30, 35]))
    ].iloc[0]["p_partkey"]
    # an ASIA-nation supplier for the q5 locality chain
    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet")).to_pandas()
    reg = pq.read_table(os.path.join(sf_dir, "region.parquet")).to_pandas()
    asia_keys = set(
        nat[nat.n_regionkey.isin(
            reg[reg.r_name == "ASIA"].r_regionkey)].n_nationkey
    )
    supp_pdf = t["supplier"].to_pandas()
    asia_supp = supp_pdf[supp_pdf.s_nationkey.isin(asia_keys)].iloc[0]
    # per-arm user counts and max per-user spend for the ks_test tie
    # construction (arms = user_id parity, spend = sum of event cents)
    import math

    evp = t["events"].to_pandas()
    cents = evp["value"].map(lambda v: math.floor(v * 100 + 0.5))
    totals = cents.groupby(evp["user_id"]).sum()
    arm0 = int((totals.index % 2 == 0).sum())
    arm1 = int((totals.index % 2 == 1).sum())
    max_spend = int(totals.max())
    # exact corpus token count, replicating normalize_text +
    # whitespace_tokens (lower + \s+ split, empties dropped — .split()
    # with no args is the same fold on this ASCII corpus); feeds the
    # heavy_hitters exact-ppm solve, which asserts the landing anyway
    total_tokens = sum(
        len(txt.split()) for txt in t["documents"]["text"].to_pylist()
        if txt is not None
    )
    return {
        "total_tokens": int(total_tokens),
        "arm0": arm0, "arm1": arm1, "max_spend": max_spend,
        "asia_suppkey": int(asia_supp["s_suppkey"]),
        "asia_nationkey": int(asia_supp["s_nationkey"]),
        "max_custkey": int(pc.max(t["customer"]["c_custkey"]).as_py()),
        "first": first,
        "building_custkey": int(building),
        "q16_partkey": int(q16_part),
        "max_orderkey": int(pc.max(t["orders"]["o_orderkey"]).as_py()),
        "max_suppkey": int(pc.max(t["supplier"]["s_suppkey"]).as_py()),
        "max_partkey": int(pc.max(t["part"]["p_partkey"]).as_py()),
        "max_docid": int(pc.max(t["documents"]["doc_id"]).as_py()),
    }


def _ev(eid, ts, uid, etype, value=1.0):
    return {"event_id": eid, "ts": ts, "user_id": uid,
            "event_type": etype, "value": value, "props": "{}"}


def _doc(did, text, source="boundary-probe"):
    return {"doc_id": did, "text": text, "lang": "en",
            "source": source, "n_chars": len(text)}


def _li(c, orderkey, shipdate, price=100.0, partkey=None, suppkey=None,
        linestatus=None, qty=1.0):
    f = c["first"]["lineitem"]
    return {
        "l_orderkey": orderkey,
        "l_partkey": partkey if partkey is not None else f["l_partkey"],
        "l_suppkey": suppkey if suppkey is not None else f["l_suppkey"],
        "l_linenumber": 9, "l_quantity": qty, "l_extendedprice": price,
        "l_discount": 0.0, "l_tax": 0.0,
        "l_returnflag": f["l_returnflag"],
        "l_linestatus": linestatus if linestatus is not None
        else f["l_linestatus"],
        "l_shipdate": shipdate,
    }


def _order(c, orderkey, orderdate, custkey=None):
    f = c["first"]["orders"]
    return {
        "o_orderkey": orderkey,
        "o_custkey": custkey if custkey is not None else f["o_custkey"],
        "o_orderstatus": f["o_orderstatus"], "o_totalprice": 1000.0,
        "o_orderdate": orderdate, "o_orderpriority": f["o_orderpriority"],
    }


# Each scenario: query name -> (note, mods_fn). mods_fn(ctx) returns
# {table: [row dicts]} to APPEND. The boundary each targets is the one
# the surviving cmp/eq mutant flips (SURVEY §5 adjudication class a).
def _sc_q3(c):
    k = c["max_orderkey"] + 1
    return {
        "orders": [_order(c, k, datetime(2000, 3, 15),
                          custkey=c["building_custkey"])],
        "lineitem": [_li(c, k, datetime(2000, 4, 1), price=9_999_999.0)],
    }


def _sc_conversion_latency(c):
    t0 = datetime(2024, 1, 10, 12, 0, 0)
    return {"events": [_ev(100001, t0, 9001, "signup"),
                       _ev(100002, t0, 9001, "purchase")]}


def _sc_session_funnel(c):
    t0 = datetime(2024, 1, 10, 12, 0, 0)
    t1 = datetime(2024, 1, 10, 12, 30, 0)  # exactly the 30-min gap
    return {"events": [_ev(100003, t0, 9002, "view"),
                       _ev(100004, t1, 9002, "purchase")]}


def _sc_q4(c):
    k = c["max_orderkey"] + 2
    return {"orders": [_order(c, k, datetime(1997, 1, 1))],
            "lineitem": [_li(c, k, datetime(1997, 1, 15))]}


def _sc_q16(c):
    s = c["max_suppkey"] + 1
    f = c["first"]["supplier"]
    return {
        "supplier": [{"s_suppkey": s, "s_name": "boundary supplier",
                      "s_nationkey": f["s_nationkey"], "s_acctbal": 0.0}],
        "lineitem": [_li(c, c["first"]["lineitem"]["l_orderkey"],
                         c["first"]["lineitem"]["l_shipdate"],
                         partkey=c["q16_partkey"], suppkey=s)],
    }


def _sc_counter_rate(c):
    mk = lambda i, s, v: _ev(100005 + i, datetime(2024, 1, 11, 12, 0, s),
                             9003, "view", value=v)
    # user 9003: a zero delta (kills the `delta < 0` cmp flip); user
    # 9007: a SINGLE sample, span 0 — the max_ms > min_ms guard drops
    # the row on both sides, so the drop-filter mutant keeps a row the
    # oracle doesn't (the first-batch adjudication filed this guard as
    # an algebraic no-op; it is not — this row kills it)
    return {"events": [mk(0, 0, 5.0), mk(1, 1, 5.0), mk(2, 2, 7.0),
                       _ev(100014, datetime(2024, 1, 11, 14), 9007,
                           "view", value=3.0)]}


def _sc_bitmap_funnel(c):
    return {"events": [_ev(100008, datetime(2024, 1, 11, 13), 9004, "signup")]}


def _sc_explode_outer(c):
    return {"documents": [_doc(c["max_docid"] + 1, "abcdefg xyz")]}


def _sc_er_blocking(c):
    f = c["first"]["part"]
    mk = lambda k, name: {"p_partkey": k, "p_name": name,
                          "p_brand": f["p_brand"], "p_type": f["p_type"],
                          "p_size": f["p_size"],
                          "p_retailprice": f["p_retailprice"]}
    return {"part": [mk(c["max_partkey"] + 1, "zz aaaaaaaaaa"),
                     mk(c["max_partkey"] + 2, "zz bbbbbbbbbb")]}


def _sc_funnel_windowed(c):
    t0 = datetime(2024, 1, 12, 9, 0, 0)
    return {"events": [_ev(100009, t0, 9005, "signup"),
                       _ev(100010, t0, 9005, "click"),
                       _ev(100011, datetime(2024, 1, 12, 10), 9005,
                           "purchase")]}


def _sc_chunk_dedup(c):
    return {"documents": [_doc(c["max_docid"] + 2, "")]}


def _sc_gopher(c):
    return {"documents": [_doc(c["max_docid"] + 3,
                               ("the " * 100000).strip())]}


def _sc_repeated_spans(c):
    return {"documents": [_doc(c["max_docid"] + 4,
                               "aa bb cc dd ee ff gg hh")]}


def _sc_langid(c):
    return {"documents": [_doc(c["max_docid"] + 5, "the le el der")]}


def _sc_stream_outer(c):
    p = datetime(2024, 1, 20, 12, 0, 0)
    cl = datetime(2024, 1, 20, 6, 0, 0)  # exactly p_ts - 6 hours
    return {"events": [_ev(100012, p, 9006, "purchase"),
                       _ev(100013, cl, 9006, "click")]}


def _sc_q5(c):
    k = c["max_orderkey"] + 3
    cust = c["max_custkey"] + 1
    f = c["first"]["customer"]
    return {
        "customer": [{"c_custkey": cust, "c_name": "boundary cust",
                      "c_nationkey": c["asia_nationkey"],
                      "c_acctbal": f["c_acctbal"],
                      "c_mktsegment": f["c_mktsegment"]}],
        "orders": [_order(c, k, datetime(1996, 1, 1), custkey=cust)],
        "lineitem": [_li(c, k, datetime(1996, 2, 1),
                         suppkey=c["asia_suppkey"])],
    }


def _sc_phrase_search(c):
    return {"documents": [
        _doc(c["max_docid"] + 6, "stream column stream column"),
        _doc(c["max_docid"] + 7, "stream column x"),
    ]}


def _sc_weighted_median(c):
    # a fresh l_linestatus group with an even weight split: at the
    # lower cents the running weight is EXACTLY half the total
    return {"lineitem": [
        _li(c, c["first"]["lineitem"]["l_orderkey"],
            c["first"]["lineitem"]["l_shipdate"], price=1.0,
            linestatus="X"),
        _li(c, c["first"]["lineitem"]["l_orderkey"],
            c["first"]["lineitem"]["l_shipdate"], price=2.0,
            linestatus="X"),
    ]}


def _sc_decontaminate(c):
    # a NULL-text benchmark doc: every non-null text yields >= 1
    # shingle (short docs degrade to one try_element_at shingle, empty
    # text hashes the seed) and so self-matches when train includes
    # bench — but _hash_shingled DROPS null-text rows from the posting,
    # so with the train-side source filter gone this doc is never
    # flagged and leaks into the decontaminated output. The source
    # filter is load-bearing exactly for null-text bench docs.
    return {"documents": [{"doc_id": c["max_docid"] + 8, "text": None,
                           "lang": "en", "source": "src0",
                           "n_chars": 0}]}


def _sc_heavy_hitters(c):
    # solve for a token at EXACTLY 1000 ppm: m copies of a new token
    # plus k filler copies so floor(m*1e6/(T+m+k) + 0.5) == 1000. For
    # any m the admissible total T' = T+m+k spans an interval of width
    # ~m, so an integer solution exists once m ~ T/1000.
    T = c["total_tokens"]
    m = max(1, T // 999)
    while True:
        lo = int(m * 1_000_000 / 1000.5) + 1   # T' > m*1e6/1000.5
        hi = int(m * 1_000_000 / 999.5)        # T' <= m*1e6/999.5
        if hi >= T + m and lo <= hi:
            tprime = max(lo, T + m)
            k = tprime - T - m
            break
        m += 1
    # sanity: the exact ppm formula lands on the boundary
    import math
    assert math.floor(m * 1_000_000 / tprime + 0.5) == 1000, (m, k, T)
    text = " ".join(["zzboundaryhitter"] * m + ["zzfiller"] * k)
    return {"documents": [_doc(c["max_docid"] + 9, text)]}


def _sc_interval_coverage(c):
    # two events exactly 300s apart: the second interval starts at the
    # instant the first one ends (_s == prev_max_end)
    return {"events": [_ev(100017, datetime(2024, 1, 14, 8, 0, 0), 9009,
                           "view"),
                       _ev(100018, datetime(2024, 1, 14, 8, 5, 0), 9009,
                           "view")]}


def _sc_benford(c):
    # three boundary rows at once: cents == 0 (the > 0 -> >= flip),
    # negative cents (the dropped filter feeds '-' into an ANSI int
    # cast), and a NEW event type observing only digit 1 (the dense
    # grid's left join keeps its 8 zero rows; inner drops them)
    return {"events": [
        _ev(100019, datetime(2024, 1, 14, 9, 0, 0), 9012, "view",
            value=0.0),
        _ev(100020, datetime(2024, 1, 14, 9, 1, 0), 9012, "view",
            value=-2.5),
        _ev(100021, datetime(2024, 1, 14, 9, 2, 0), 9012, "boundary_et",
            value=1.0),
    ]}


def _sc_scd2_asof(c):
    # purchase at EXACTLY the interval's valid_from instant
    t0 = datetime(2024, 1, 14, 10, 0, 0)
    return {"events": [_ev(100022, t0, 9010, "view"),
                       _ev(100023, t0, 9010, "purchase")]}


def _sc_time_weighted_avg(c):
    # a user whose two samples share ONE timestamp: the only interval
    # has dt == 0, so the span-sum is 0 and the _dt > 0 guard is the
    # only thing between the oracle and a 0/0 row
    t0 = datetime(2024, 1, 14, 11, 0, 0)
    return {"events": [_ev(100024, t0, 9011, "view", value=2.0),
                       _ev(100025, t0, 9011, "view", value=4.0)]}


def _sc_ks_tie(c):
    """Force a THREE-way tie in the KS argmax so min-vs-max over the
    tie set differ. With old arm sizes A (even ids) and B (odd ids),
    inject three spend blocks strictly above every old per-user total:

        arm0: 5B-A users at v1   arm1: 3B users at v2   arm0: 3B at v3

    Then n0' = 8B, n1' = 4B, and |c0_cum*n1' - c1_cum*n0'| equals
    12B^2 at v1, v2 AND v3 (algebra in the three plateau segments),
    while every old value is bounded by max(4B*A, 8B*B) = 8B^2 < 12B^2
    — the global max is the tie set {v1, v2, v3}, so F.min('v') vs
    F.max('v') pick different at_v. Requires 5B > A (holds for any
    near-balanced split)."""
    A, B, maxv = c["arm0"], c["arm1"], c["max_spend"]
    assert 5 * B > A, (A, B)
    blocks = [(0, 5 * B - A, maxv + 100), (1, 3 * B, maxv + 200),
              (0, 3 * B, maxv + 300)]
    rows, eid = [], 110000
    uid_even, uid_odd = 20000, 20001
    for arm, count, v in blocks:
        for _ in range(count):
            if arm == 0:
                uid, uid_even = uid_even, uid_even + 2
            else:
                uid, uid_odd = uid_odd, uid_odd + 2
            rows.append(_ev(eid, datetime(2024, 1, 15, 6, 0, 0), uid,
                            "view", value=v / 100.0))
            eid += 1
    return {"events": rows}


def _sc_cuped(c):
    # covariate event at EXACTLY the pre/post cutover midnight
    return {"events": [_ev(110900, datetime(2024, 1, 16, 0, 0, 0), 9013,
                           "view", value=3.0),
                       _ev(110901, datetime(2024, 1, 20, 0, 0, 0), 9013,
                           "view", value=7.0)]}


def _sc_diff_in_diff(c):
    return {"events": [_ev(110902, datetime(2024, 1, 16, 0, 0, 0), 9014,
                           "view", value=3.0),
                       _ev(110903, datetime(2024, 1, 20, 0, 0, 0), 9014,
                           "view", value=7.0)]}


def _sc_log_odds(c):
    # 40 leading-space non-English docs: the dropped token != ''
    # filter admits 40 copies of the empty token concentrated in one
    # class — an extreme log-odds keyword plus a shifted n2 total
    return {"documents": [
        _doc(c["max_docid"] + 20 + i, " zzfill", source="src1")
        | {"lang": "fr"}
        for i in range(40)
    ]}


def _sc_vocab_growth(c):
    # a novel token whose first appearance IS the new max doc_id — it
    # sits exactly on the 100% checkpoint cut (first_doc == mx)
    return {"documents": [_doc(c["max_docid"] + 100, "zzgrowth token")]}


def _sc_l_diversity(c):
    # three fresh (lang, source) groups aimed at the three survivors:
    # bsrc-a {100, 200}: the <200 -> <=200 flip merges short+medium
    # bsrc-b {100, 600, 700}: the <600 -> <=600 flip splits long
    # bsrc-c {100, 250, 700}: l_distinct exactly 3 (>=3 vs >3)
    mk = lambda did, src, nc: {"doc_id": did, "text": "x", "lang": "xx",
                               "source": src, "n_chars": nc}
    d = c["max_docid"]
    return {"documents": [
        mk(d + 200, "bsrc-a", 100), mk(d + 201, "bsrc-a", 200),
        mk(d + 202, "bsrc-b", 100), mk(d + 203, "bsrc-b", 600),
        mk(d + 204, "bsrc-b", 700),
        mk(d + 205, "bsrc-c", 100), mk(d + 206, "bsrc-c", 250),
        mk(d + 207, "bsrc-c", 700),
    ]}


def _sc_winnowing_fp(c):
    # a doc with EXACTLY 6 [a-z]+ tokens (the >= 6 guard boundary) and
    # one with 3 (enters only when the guard is dropped)
    return {"documents": [_doc(c["max_docid"] + 210, "aa bb cc dd ee ff"),
                          _doc(c["max_docid"] + 211, "gg hh ii")]}


def _sc_dq_checks(c):
    # an orphan lineitem (no matching order): the FK check's only food
    return {"lineitem": [_li(c, c["max_orderkey"] + 50,
                             c["first"]["lineitem"]["l_shipdate"])]}


def _sc_ohlc_bars(c):
    # a day OUTSIDE the data's range: the injected pair IS the whole
    # (type, day) bar, so the same-microsecond id tie-break alone
    # decides open/close (inside a populated day the pair is interior
    # and the bar's open/close never see it — first attempt's miss)
    ts = datetime(2024, 2, 5, 12, 0, 0)
    return {"events": [_ev(100015, ts, 9008, "view", value=1.0),
                       _ev(100016, ts, 9008, "view", value=9.0)]}


SCENARIOS: list[tuple[str, str, object]] = [
    ("q3_shipping_priority",
     "order at the 2000-03-15 midnight date literal, top-revenue line",
     _sc_q3),
    ("conversion_latency",
     "purchase at exactly the signup timestamp (p_ts >= s_ts boundary)",
     _sc_conversion_latency),
    ("session_funnel",
     "view->purchase gap of exactly 30 minutes (gap > 30min boundary)",
     _sc_session_funnel),
    ("tpch_q4_order_priority",
     "order at exactly 1997-01-01 00:00:00 with a qualifying shipment",
     _sc_q4),
    ("tpch_q16_supplier_counts",
     "supplier with s_acctbal exactly 0 shipping a qualifying part",
     _sc_q16),
    ("counter_rate",
     "consecutive equal readings: a zero delta (delta < 0 boundary)",
     _sc_counter_rate),
    ("bitmap_funnel",
     "user whose ONLY event is a signup (signup/other bits separable)",
     _sc_bitmap_funnel),
    ("explode_outer_nulls",
     "document containing a token of exactly 7 chars (length > 7)",
     _sc_explode_outer),
    ("er_blocking_pairs",
     "same-block name pair at Levenshtein distance exactly 10",
     _sc_er_blocking),
    ("funnel_windowed",
     "click at exactly the signup timestamp (ts > s_ts boundary)",
     _sc_funnel_windowed),
    ("chunk_dedup_global",
     "document with zero tokens (n > 0 guard boundary)",
     _sc_chunk_dedup),
    ("quality_gopher_rules",
     "document with exactly 100000 tokens (n <= 100000 boundary)",
     _sc_gopher),
    ("dedup_repeated_spans",
     "document with exactly 8 tokens (n >= 8 boundary)",
     _sc_repeated_spans),
    ("text_langid",
     "one stopword per language: 4-way score tie (>= argmax chain)",
     _sc_langid),
    ("events_stream_outer_join",
     "click at exactly p_ts - 6 hours (join-window lower bound)",
     _sc_stream_outer),
    ("tpch_q5_local_volume",
     "locality-chain order at exactly 1996-01-01 00:00:00",
     _sc_q5),
    ("phrase_search",
     "docs with DISTINCT phrase-hit counts (2 vs 1) break the tie",
     _sc_phrase_search),
    ("weighted_median",
     "even-weight group: running weight exactly half the total",
     _sc_weighted_median),
    ("decontaminate",
     "src0 doc with < n tokens (no 3-grams) leaks if the filter drops",
     _sc_decontaminate),
    ("ohlc_bars",
     "two events at the IDENTICAL microsecond: id tie-break direction",
     _sc_ohlc_bars),
    ("heavy_hitters",
     "token at EXACTLY 1000 ppm (solved m/k injection)",
     _sc_heavy_hitters),
    ("interval_coverage",
     "second interval starting at the instant the first ends",
     _sc_interval_coverage),
    ("benford_conformance",
     "zero cents + negative cents + a digit-sparse new event type",
     _sc_benford),
    ("scd2_asof_lookup",
     "purchase at exactly the dimension interval's valid_from",
     _sc_scd2_asof),
    ("time_weighted_avg",
     "two samples at one timestamp: zero total span",
     _sc_time_weighted_avg),
    ("dq_checks",
     "an orphan lineitem row (FK violation exists at last)",
     _sc_dq_checks),
    ("ks_test_2sample",
     "constructed 3-way tie in the KS argmax (12B^2 plateau)",
     _sc_ks_tie),
    ("cuped_adjustment",
     "covariate event at exactly the pre-period cutover midnight",
     _sc_cuped),
    ("diff_in_diff",
     "event at exactly the post-period cutover midnight",
     _sc_diff_in_diff),
    ("log_odds_keywords",
     "40 leading-space docs in one class: the empty token goes extreme",
     _sc_log_odds),
    ("vocab_growth",
     "novel token first appearing exactly at the 100% checkpoint cut",
     _sc_vocab_growth),
    ("l_diversity_audit",
     "three fresh groups hitting the 200/600 class edges and l==3",
     _sc_l_diversity),
    ("winnowing_fingerprints",
     "docs with exactly 6 and with 3 alpha tokens (>=6 guard)",
     _sc_winnowing_fp),
]

# Survivor class b — algebraic equivalences NOT probed here, with the
# provable reason (input-independent, so no boundary row can kill them;
# SURVEY §5 adjudication).
CLASS_B: dict[str, str] = {
    "asof_join": "rn==1 pre-dedup subsumed by the carry's latest-row"
                 " semantics (drop-filter)",
    "dedup_winnowing": "<6-token guard excludes docs producing no windows;"
                       " df band / nonempty guards are candidate pruning"
                       " the downstream re-filters",
    "dedup_simhash": "nonempty-token guard is candidate pruning the"
                     " downstream re-filters",
    "quality_auc": "floor(x+0.5)->floor(x-0.5) is a uniform score shift"
                   " rank-sum AUC is invariant to; n_pos/n_neg>0 guard"
                   " needs single-class languages that cannot exist"
                   " in a tie-broken argmax output",
    "dedup_canonicalize": "max(when(rn==1,..)) aggregates one non-null"
                          " value; min==max",
    "token_ids": "size(toks)>0 guard: empty docs posexplode to zero rows"
                 " either way",
    "spatial_grid_join": "d2 <= r2 -> < is PROVABLY unreachable for any"
                         " customer table: d2 == 2^20 needs lattice"
                         " offsets (+-1024,0)/(0,+-1024) (the only"
                         " two-square representations of 2^20), and the"
                         " LCG coords are bijections of c_custkey mod"
                         " 2^16 (both multipliers odd), so equal x"
                         " forces equal key forces equal y — no pair"
                         " sits at the boundary, ever",
    "anomaly_zscore": "floor(x+0.5)->floor(x-0.5) is a uniform -1 shift"
                      " on every row's cents (the floors differ by"
                      " exactly 1 for any real); z-scores are"
                      " translation-invariant and the output carries"
                      " raw value + z only. The var>0 -> >= flip:"
                      " var==0 forces every deviation to 0, so"
                      " z=0/0=NaN and |NaN|>2.5 is false either way",
    "anomaly_mad": "same two proofs as anomaly_zscore: uniform cents"
                   " shift is MAD-z invariant; _mad==0 forces rz=NaN,"
                   " dropped by the |rz|>3.5 compare either way",
    "ewma_exact": "slice(xs, 2, size-1) vs size+1: slice clamps at the"
                  " array end, both take the entire tail from index 2",
    "market_basket": "dropping the support>=2 filter only ADDS"
                     " support-1 pairs, which can never displace the"
                     " top-20 by n_cooccur desc while >=20 pairs of"
                     " support>=2 exist (verified present at sf0.01);"
                     " appends can only raise support — killable only"
                     " by corpus reduction, not injection",
    "gini_by_nation": "floor(+0.5)->floor(-0.5) shifts each customer's"
                      " revenue by exactly -n_orders cents (<~30 on"
                      " ~1e7-cent totals, <3e-6 relative); under the"
                      " ppm-floored Gini output the flip can only"
                      " surface on an exact floor edge of the global"
                      " rank-sum ratio — a measure-zero coincidence"
                      " with no plateau algebra to force it (unlike"
                      " the solved ks tie); quantization-shielded",
    "rfm_segments": "arith-flip: same -n_orders-cents perturbation"
                    " against equal-width monetary bins ~1e6 cents"
                    " wide, and the bin EDGES drift with it (the"
                    " extrema definers shift too) — a guaranteed"
                    " straddle is another global coincidence equation;"
                    " quantization-shielded. minmax-swap on the"
                    " recency anchor: PROVABLE no-op — rec_days shifts"
                    " by a constant and the equal-width bin of a"
                    " translated value against translated extrema is"
                    " identical; only bins are output",
}


def build_overlay(sf_dir: str, out_dir: str, mods: dict) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    for t in TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        dst = os.path.join(out_dir, f"{t}.parquet")
        if t not in mods:
            os.symlink(src, dst)
            continue
        tab = pq.read_table(src)
        extra = pa.Table.from_pylist(mods[t], schema=tab.schema)
        pq.write_table(pa.concat_tables([tab, extra]), dst)


def survivor_indices() -> dict[str, list[tuple[int, str]]]:
    """(index, op) of every 'survived' mutant per query, in the
    deterministic mutants_of order, from the at-rest MUTATION files."""
    import glob

    out: dict[str, list[tuple[int, str]]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "MUTATION*.json"))):
        detail = json.load(open(path)).get("detail", {})
        for name, d in detail.items():
            idxs = [(i, m["op"]) for i, m in enumerate(d.get("mutants", []))
                    if m["outcome"] == "survived"]
            if idxs:
                out[name] = idxs
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
        else "/root/testdata/sf0.01"
    out_path = os.path.join(REPO, "BOUNDARY.json")
    for i, a in enumerate(sys.argv):
        if a == "--out":
            out_path = sys.argv[i + 1]

    import duckdb
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .getOrCreate())

    import labelspark_spark.queries as Q

    ctx = _ctx(sf_dir)
    survivors = survivor_indices()
    report: dict[str, dict] = {}
    failures = 0

    for name, note, mods_fn in SCENARIOS:
        fn, sql = Q.REGISTRY[name]
        overlay = tempfile.mkdtemp(prefix=f"boundary_{name}_")
        try:
            build_overlay(sf_dir, overlay, mods_fn(ctx))
            con = duckdb.connect()
            register_views(con, overlay)
            base = compare(fn(spark, overlay), con, sql)
            entry: dict = {"note": note,
                           "boundary_green": bool(base["values_match"])}
            if not base["values_match"]:
                entry["base_detail"] = {
                    k: v for k, v in base.items() if k != "values_match"}
                failures += 1
            muts = list(mutants_of(fn, 4))
            checked = []
            for idx, op in survivors.get(name, []):
                if idx >= len(muts):
                    checked.append({"idx": idx, "op": op,
                                    "outcome": "index-out-of-range"})
                    failures += 1
                    continue
                mop, msrc = muts[idx]
                ns = dict(vars(Q))
                try:
                    exec(compile(msrc, f"<b:{name}:{idx}>", "exec"), ns)
                    r = compare(ns[fn.__name__](spark, overlay), con, sql)
                    outcome = ("killed-at-boundary" if not r["values_match"]
                               else "STILL-SURVIVES")
                except Exception as e:
                    outcome = "killed-by-crash"
                    _ = e
                if outcome == "STILL-SURVIVES":
                    failures += 1
                checked.append({"idx": idx, "op": mop, "outcome": outcome})
                print(f"# {name}[{idx}/{mop}]: {outcome}", file=sys.stderr)
            entry["mutants"] = checked
            report[name] = entry
        finally:
            shutil.rmtree(overlay, ignore_errors=True)

    probed = {n for n, _, _ in SCENARIOS}
    unprobed = {n: ops for n, ops in survivors.items() if n not in probed}
    n_killed = sum(1 for d in report.values()
                   for m in d["mutants"] if m["outcome"].startswith("killed"))
    n_targeted = sum(len(d["mutants"]) for d in report.values())
    out = {
        "sf_dir": sf_dir,
        "n_scenarios": len(SCENARIOS),
        "n_boundary_green": sum(d["boundary_green"] for d in report.values()),
        "n_mutants_targeted": n_targeted,
        "n_killed_at_boundary": n_killed,
        "unprobed_survivors": unprobed,
        "class_b_reasons": CLASS_B,
        "detail": report,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("n_scenarios", "n_boundary_green",
                       "n_mutants_targeted", "n_killed_at_boundary")}))
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
