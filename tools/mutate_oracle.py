#!/usr/bin/env python
"""Mutation-test the oracle gate (VERDICT r12 stretch item 5).

The repo-wide review program closed the "query and oracle wrong the
same way" residual by READING; this tool makes that residual
MEASURABLE. For a sample of attested hash-checked queries it
mechanically mutates the Spark query body — the oracle SQL is left
untouched — and asserts the driver-style comparison goes RED for each
mutant. A mutant that stays green is a blind spot: either the data
can't distinguish the two plans at this SF (equivalent-at-this-data)
or the oracle pair is genuinely insensitive to that semantic axis and
should be strengthened.

    python tools/mutate_oracle.py [sf_dir] [--names a,b,...]
                                  [--per-query N] [--out f]

Mutation operators (AST, one site per mutant, deterministic order):

  cmp-boundary   Lt <-> LtE, Gt <-> GtE        (off-by-one predicates)
  eq-flip        Eq <-> NotEq
  join-flip      'inner' <-> 'left', semi <-> anti join-type strings
  drop-filter    X.filter(...) / X.where(...) -> X
  frame-shift    int literals inside rowsBetween/rangeBetween +1
  minmax-swap    F.min <-> F.max
  arith-flip     + <-> - in binary arithmetic
  sort-flip      .desc() <-> .asc() (incl. the _nulls_ variants)
  limit-shift    .limit(n) -> .limit(n + 1)

A mutant that RAISES is counted as killed-by-crash (the driver would
surface it just as loudly as a hash mismatch). Output: kill rate per
query and the survivor list for adjudication.
"""

from __future__ import annotations

import ast
import copy
import inspect
import json
import os
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

JOIN_FLIP = {
    "inner": "left", "left": "inner", "left_outer": "inner",
    "leftouter": "inner", "right": "inner", "full": "inner",
    "outer": "inner", "full_outer": "inner",
    "left_semi": "left_anti", "leftsemi": "leftanti",
    "left_anti": "left_semi", "leftanti": "leftsemi",
    "cross": "inner",
}

SORT_FLIP = {
    "desc": "asc", "asc": "desc",
    "desc_nulls_first": "asc_nulls_first",
    "desc_nulls_last": "asc_nulls_last",
    "asc_nulls_first": "desc_nulls_first",
    "asc_nulls_last": "desc_nulls_last",
}


class SiteCollector(ast.NodeVisitor):
    """Enumerate mutation sites as (operator, path-id) pairs; the
    mutator re-walks and applies at the matching counter."""

    def __init__(self):
        self.sites: list[tuple[str, int]] = []
        self._n = 0

    def _add(self, op):
        self.sites.append((op, self._n))
        self._n += 1

    def generic_visit(self, node):
        if isinstance(node, ast.Compare) and len(node.ops) == 1 and isinstance(
            node.ops[0], (ast.Lt, ast.LtE, ast.Gt, ast.GtE)
        ):
            self._add("cmp-boundary")
        if isinstance(node, ast.Constant) and isinstance(node.value, str) \
                and node.value in JOIN_FLIP:
            self._add("join-flip")
        if isinstance(node, ast.Call) and isinstance(node.func, ast.Attribute) \
                and node.func.attr in ("filter", "where"):
            self._add("drop-filter")
        if isinstance(node, ast.Call) and isinstance(node.func, ast.Attribute) \
                and node.func.attr in ("rowsBetween", "rangeBetween"):
            for a in node.args:
                v = a.operand if isinstance(a, ast.UnaryOp) else a
                if isinstance(v, ast.Constant) and isinstance(v.value, int):
                    self._add("frame-shift")
                    break
        if isinstance(node, ast.Attribute) and isinstance(node.value, ast.Name) \
                and node.value.id == "F" and node.attr in ("min", "max"):
            self._add("minmax-swap")
        if isinstance(node, ast.BinOp) and isinstance(node.op, (ast.Add, ast.Sub)):
            self._add("arith-flip")
        if isinstance(node, ast.Compare) and len(node.ops) == 1 and isinstance(
            node.ops[0], (ast.Eq, ast.NotEq)
        ):
            self._add("eq-flip")
        if isinstance(node, ast.Call) and isinstance(node.func, ast.Attribute) \
                and node.func.attr in SORT_FLIP and not node.args:
            self._add("sort-flip")
        if isinstance(node, ast.Call) and isinstance(node.func, ast.Attribute) \
                and node.func.attr == "limit" and len(node.args) == 1 \
                and isinstance(node.args[0], ast.Constant) \
                and isinstance(node.args[0].value, int):
            self._add("limit-shift")
        super().generic_visit(node)


class Mutator(ast.NodeTransformer):
    def __init__(self, target_idx: int):
        self.target = target_idx
        self._n = 0
        self.applied: str | None = None

    def _hit(self, op) -> bool:
        hit = self._n == self.target
        self._n += 1
        if hit:
            self.applied = op
        return hit

    def generic_visit(self, node):
        # mirror SiteCollector's counter EXACTLY (same checks, same order)
        if isinstance(node, ast.Compare) and len(node.ops) == 1 and isinstance(
            node.ops[0], (ast.Lt, ast.LtE, ast.Gt, ast.GtE)
        ):
            if self._hit("cmp-boundary"):
                flip = {ast.Lt: ast.LtE, ast.LtE: ast.Lt,
                        ast.Gt: ast.GtE, ast.GtE: ast.Gt}
                node.ops[0] = flip[type(node.ops[0])]()
        if isinstance(node, ast.Constant) and isinstance(node.value, str) \
                and node.value in JOIN_FLIP:
            if self._hit("join-flip"):
                node.value = JOIN_FLIP[node.value]
        if isinstance(node, ast.Call) and isinstance(node.func, ast.Attribute) \
                and node.func.attr in ("filter", "where"):
            if self._hit("drop-filter"):
                return super().generic_visit(node.func.value)
        if isinstance(node, ast.Call) and isinstance(node.func, ast.Attribute) \
                and node.func.attr in ("rowsBetween", "rangeBetween"):
            has_int = any(
                isinstance(
                    (a.operand if isinstance(a, ast.UnaryOp) else a), ast.Constant
                ) and isinstance(
                    (a.operand if isinstance(a, ast.UnaryOp) else a).value, int
                )
                for a in node.args
            )
            if has_int and self._hit("frame-shift"):
                for i, a in enumerate(node.args):
                    v = a.operand if isinstance(a, ast.UnaryOp) else a
                    if isinstance(v, ast.Constant) and isinstance(v.value, int):
                        # +1 on the first int arg (negate-aware: -5 -> -4)
                        if isinstance(a, ast.UnaryOp) and isinstance(a.op, ast.USub):
                            node.args[i] = ast.copy_location(
                                ast.UnaryOp(op=ast.USub(),
                                            operand=ast.Constant(v.value - 1)), a
                            ) if v.value > 0 else a
                        else:
                            node.args[i] = ast.copy_location(
                                ast.Constant(v.value + 1), a)
                        break
        if isinstance(node, ast.Attribute) and isinstance(node.value, ast.Name) \
                and node.value.id == "F" and node.attr in ("min", "max"):
            if self._hit("minmax-swap"):
                node.attr = "max" if node.attr == "min" else "min"
        if isinstance(node, ast.BinOp) and isinstance(node.op, (ast.Add, ast.Sub)):
            if self._hit("arith-flip"):
                node.op = ast.Sub() if isinstance(node.op, ast.Add) else ast.Add()
        if isinstance(node, ast.Compare) and len(node.ops) == 1 and isinstance(
            node.ops[0], (ast.Eq, ast.NotEq)
        ):
            if self._hit("eq-flip"):
                node.ops[0] = (
                    ast.NotEq() if isinstance(node.ops[0], ast.Eq) else ast.Eq()
                )
        if isinstance(node, ast.Call) and isinstance(node.func, ast.Attribute) \
                and node.func.attr in SORT_FLIP and not node.args:
            if self._hit("sort-flip"):
                node.func.attr = SORT_FLIP[node.func.attr]
        if isinstance(node, ast.Call) and isinstance(node.func, ast.Attribute) \
                and node.func.attr == "limit" and len(node.args) == 1 \
                and isinstance(node.args[0], ast.Constant) \
                and isinstance(node.args[0].value, int):
            if self._hit("limit-shift"):
                node.args[0] = ast.copy_location(
                    ast.Constant(node.args[0].value + 1), node.args[0]
                )
        return super().generic_visit(node)


def mutants_of(fn, per_query: int):
    """Yield (op, mutated_source) for up to per_query sites, spread
    round-robin across operator kinds so one noisy kind (arith-flip)
    doesn't crowd out the rare ones (join-flip)."""
    src = textwrap.dedent(inspect.getsource(fn))
    tree = ast.parse(src)
    coll = SiteCollector()
    coll.visit(tree)
    by_op: dict[str, list[int]] = {}
    for op, idx in coll.sites:
        by_op.setdefault(op, []).append(idx)
    picked: list[tuple[str, int]] = []
    rank = 0
    while len(picked) < per_query:
        added = False
        for op in sorted(by_op):
            if rank < len(by_op[op]) and len(picked) < per_query:
                picked.append((op, by_op[op][rank]))
                added = True
        if not added:
            break
        rank += 1
    for op, idx in picked:
        m = Mutator(idx)
        mutated = m.visit(copy.deepcopy(tree))
        ast.fix_missing_locations(mutated)
        yield op, ast.unparse(mutated)


# Deterministic default sample: a spread across families — relational
# core, windows, joins, dedup, text, events, data management. All
# hash-checked (rows-only queries cannot go red by definition).
DEFAULT_SAMPLE = [
    "q1_pricing_summary", "q3_shipping_priority", "topk_orders",
    "window_running_sum", "window_rownum", "join_left_outer",
    "asof_join", "range_join_binned", "conversion_latency",
    "funnel_steps", "dedup_winnowing", "dedup_simhash",
    "dedup_repeated_spans", "quality_gopher_rules", "text_langid",
    "ngram_novelty", "session_funnel", "scd2_history",
    "stratified_sample", "er_score_pairs",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
        else "/root/testdata/sf0.01"
    names = DEFAULT_SAMPLE
    per_query = 4
    out_path = os.path.join(REPO, "MUTATION.json")
    for i, a in enumerate(sys.argv):
        if a == "--names":
            names = sys.argv[i + 1].split(",")
        if a == "--per-query":
            per_query = int(sys.argv[i + 1])
        if a == "--out":
            out_path = sys.argv[i + 1]

    import duckdb
    from pyspark.sql import SparkSession

    from oracle_util import compare, register_views

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    con = duckdb.connect()
    register_views(con, sf_dir)

    import labelspark_spark.queries as Q

    report: dict[str, dict] = {}
    total = killed = 0
    for name in names:
        fn, sql = Q.REGISTRY[name]
        if sql is None:
            report[name] = {"skipped": "rows-only query, cannot go red"}
            continue
        # sanity: the UNMUTATED pair must be green, else kills are noise
        base = compare(fn(spark, sf_dir), con, sql)
        if not base["values_match"]:
            report[name] = {"skipped": f"baseline not green: {base}"}
            continue
        rows = []
        for op, msrc in mutants_of(fn, per_query):
            ns = dict(vars(Q))
            try:
                exec(compile(msrc, f"<mutant:{name}:{op}>", "exec"), ns)
                mfn = ns[fn.__name__]
                r = compare(mfn(spark, sf_dir), con, sql)
                outcome = "survived" if r["values_match"] else "killed"
            except Exception as e:
                outcome = "killed-by-crash"
                r = {"exc": f"{type(e).__name__}: {e}"[:160]}
            rows.append({"op": op, "outcome": outcome})
            total += 1
            killed += outcome != "survived"
            print(f"# {name} {op}: {outcome}", file=sys.stderr)
        report[name] = {"mutants": rows}

    out = {
        "sf_dir": sf_dir,
        "n_queries": len(names),
        "n_mutants": total,
        "n_killed": killed,
        "kill_rate": round(killed / total, 3) if total else None,
        "survivors": {
            n: [m["op"] for m in d.get("mutants", []) if m["outcome"] == "survived"]
            for n, d in report.items()
            if any(m["outcome"] == "survived" for m in d.get("mutants", []))
        },
        "detail": report,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("n_queries", "n_mutants", "n_killed", "kill_rate",
                       "survivors")}))


if __name__ == "__main__":
    main()
