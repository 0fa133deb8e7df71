#!/usr/bin/env python
"""Derive the CHANGED-CODE head of the next driver window from git.

VERDICT r11 stretch item: each round's window head must contain every
attested registry query whose code changed since its last driver
attestation. Until now that list was hand-maintained prose in
SURVEY.md's close notes; this tool DERIVES it, turning "did the head
include every changed attested path?" into a check.

    python tools/changed_head.py <base-ref> [--evidence]

prints the sorted list of registry query names whose dependency
closure overlaps `git diff <base-ref> -- labelspark_spark` (new-side
line ranges), as one JSON line. `--evidence` adds, per query, the
(file, line-range) hits that flagged it.

How the query -> source map is built (no hand-maintained table):

- Start from each registry entry's callable (REGISTRY[name][0]) and
  its oracle-SQL constant (located in the queries module by object
  identity, span by top-level AST assignment).
- BFS the package-internal dependency closure: parse each reachable
  function/class source with `ast`, resolve plain names through its
  ``__globals__`` and ``module.attr`` pairs through the referenced
  module, follow function-local imports, and keep anything defined
  under labelspark_spark/. Each reachable object contributes its
  (file, source-span); package module-level CONSTANTS contribute
  their top-level assignment span; a bare module reference (rare)
  contributes the whole file, conservatively.
- A query is CHANGED iff any contributed span overlaps any new-side
  diff range of the same file.

Best-effort by design: purely dynamic dispatch (getattr by computed
string) is invisible to the AST walk — the tool AUGMENTS the close
notes, it does not replace judgement. It over-flags rather than
under-flags on everything it can see: comment/docstring edits inside a
reachable span count as changes (re-attesting an unchanged query is
cheap; missing a changed one is the failure mode that matters).
"""

from __future__ import annotations

import ast
import inspect
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PKG_ROOT = os.path.join(REPO, "labelspark_spark")


def _relpath(path: str) -> str | None:
    path = os.path.abspath(path)
    if not path.startswith(PKG_ROOT + os.sep) and path != PKG_ROOT:
        return None
    return os.path.relpath(path, REPO)


def diff_ranges(
    base_ref: str, target_ref: str | None = None
) -> dict[str, list[tuple[int, int]]]:
    """New-side changed line ranges per package file, from a zero-
    context diff of the WORKING TREE (or target_ref, when auditing a
    historical range — note spans still come from the CURRENT import,
    so historical audits are approximate) against base_ref. A pure
    deletion (new length 0) marks the single boundary line so the
    enclosing span still overlaps."""
    cmd = ["git", "diff", "--unified=0", base_ref]
    if target_ref:
        cmd.append(target_ref)
    out = subprocess.run(
        cmd + ["--", "labelspark_spark"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    ranges: dict[str, list[tuple[int, int]]] = {}
    current: str | None = None
    for line in out.splitlines():
        if line.startswith("+++ "):
            # a deleted file's new side is `+++ /dev/null`: current must
            # RESET, else its hunks attribute to the previous file
            current = line[6:] if line.startswith("+++ b/") else None
        elif line.startswith("@@") and current:
            m = re.match(r"@@ -\d+(?:,\d+)? \+(\d+)(?:,(\d+))? @@", line)
            if not m:
                continue
            start = int(m.group(1))
            length = int(m.group(2)) if m.group(2) is not None else 1
            if length == 0:
                start, length = max(start, 1), 1
            ranges.setdefault(current, []).append((start, start + length - 1))
    return ranges


class _DepWalker:
    """Package-internal dependency closure with per-object caching."""

    def __init__(self) -> None:
        self._edges: dict[int, list[object]] = {}
        self._spans: dict[int, tuple[str, int, int] | None] = {}
        self._keep: list[object] = []  # ids stay valid
        self._module_ast: dict[str, ast.Module] = {}
        self.extra_spans: dict[int, list[tuple[str, int, int]]] = {}

    # -- source spans -------------------------------------------------
    def span_of(self, obj: object) -> tuple[str, int, int] | None:
        key = id(obj)
        if key in self._spans:
            return self._spans[key]
        self._keep.append(obj)
        span = None
        try:
            target = inspect.unwrap(obj) if callable(obj) else obj
            fname = inspect.getsourcefile(target)
            rel = _relpath(fname) if fname else None
            if rel:
                if inspect.ismodule(target):
                    span = (rel, 1, 10**9)
                else:
                    lines, start = inspect.getsourcelines(target)
                    span = (rel, start, start + len(lines) - 1)
        except (TypeError, OSError):
            span = None
        self._spans[key] = span
        return span

    def module_assign_span(
        self, module, name: str
    ) -> tuple[str, int, int] | None:
        """Top-level `name = ...` span inside a package module — the
        precise footprint of a module-level constant."""
        try:
            fname = inspect.getsourcefile(module)
        except TypeError:
            return None
        rel = _relpath(fname) if fname else None
        if rel is None:
            return None
        if rel not in self._module_ast:
            with open(os.path.join(REPO, rel)) as fh:
                self._module_ast[rel] = ast.parse(fh.read())
        for node in self._module_ast[rel].body:
            targets = []
            if isinstance(node, ast.Assign):
                targets = node.targets
            elif isinstance(node, (ast.AnnAssign, ast.AugAssign)):
                targets = [node.target]
            for t in targets:
                if isinstance(t, ast.Name) and t.id == name:
                    return (rel, node.lineno, node.end_lineno or node.lineno)
        return None

    # -- reference resolution ------------------------------------------
    def _globals_of(self, obj: object) -> dict:
        if inspect.isfunction(obj):
            return obj.__globals__
        mod = sys.modules.get(getattr(obj, "__module__", None) or "")
        return getattr(mod, "__dict__", {})

    def edges_of(self, obj: object) -> list[object]:
        """Objects (and (module, const-name) spans) referenced by obj's
        source. Returns resolved objects; constant spans are recorded
        directly into self.extra_spans during the call."""
        key = id(obj)
        if key in self._edges:
            return self._edges[key]
        self._keep.append(obj)
        self._edges[key] = []  # cycle guard
        try:
            target = inspect.unwrap(obj) if callable(obj) else obj
            src = inspect.getsource(target)
            fname = inspect.getsourcefile(target)
        except (TypeError, OSError):
            return self._edges[key]
        if not fname or _relpath(fname) is None:
            return self._edges[key]
        try:
            tree = ast.parse(_dedent(src))
        except SyntaxError:
            return self._edges[key]
        g = self._globals_of(target)
        aliases = _local_import_aliases(tree)
        found: list[object] = []
        const_spans: list[tuple[str, int, int]] = []

        def _lookup(name: str):
            val = g.get(name)
            return val if val is not None else aliases.get(name)

        # names used as `mod.attr` bases resolve through the Attribute
        # branch precisely; their bare-Name node must NOT also pull in
        # the whole module file
        attr_bases = {
            id(node.value)
            for node in ast.walk(tree)
            if isinstance(node, ast.Attribute)
            and isinstance(node.value, ast.Name)
        }
        for node in ast.walk(tree):
            if isinstance(node, ast.Attribute) and isinstance(
                node.value, ast.Name
            ):
                base = _lookup(node.value.id)
                if inspect.ismodule(base) and _in_pkg(base):
                    attr = getattr(base, node.attr, None)
                    if attr is not None:
                        if callable(attr) or inspect.ismodule(attr):
                            found.append(attr)
                        else:
                            s = self.module_assign_span(base, node.attr)
                            if s:
                                const_spans.append(s)
                elif (
                    (inspect.isclass(base) or inspect.isfunction(base))
                    and _obj_in_pkg(base)
                ):
                    # a package class referenced ONLY as `Cls.attr` would
                    # otherwise vanish: the Name branch skips attribute
                    # bases and this branch resolved modules only
                    found.append(base)
            elif isinstance(node, ast.Name) and isinstance(
                node.ctx, ast.Load
            ):
                if id(node) in attr_bases:
                    continue
                val = _lookup(node.id)
                if val is None:
                    continue
                if inspect.isfunction(val) or inspect.isclass(val):
                    if _obj_in_pkg(val):
                        found.append(val)
                elif inspect.ismodule(val):
                    if _in_pkg(val):
                        found.append(val)
                else:
                    mod = sys.modules.get(getattr(target, "__module__", ""))
                    if mod is not None and _in_pkg(mod) and node.id in getattr(
                        mod, "__dict__", {}
                    ):
                        s = self.module_assign_span(mod, node.id)
                        if s:
                            const_spans.append(s)
        self.extra_spans.setdefault(key, []).extend(const_spans)
        self._edges[key] = found
        return found

    def closure_spans(self, roots: list[object]) -> list[tuple[str, int, int]]:
        seen: set[int] = set()
        stack = list(roots)
        spans: list[tuple[str, int, int]] = []
        while stack:
            obj = stack.pop()
            if id(obj) in seen:
                continue
            seen.add(id(obj))
            span = self.span_of(obj)
            if span is None and not inspect.ismodule(obj):
                continue  # outside the package
            if span:
                spans.append(span)
            for nxt in self.edges_of(obj):
                if id(nxt) not in seen:
                    stack.append(nxt)
            spans.extend(self.extra_spans.get(id(obj), []))
        return spans


def _dedent(src: str) -> str:
    import textwrap

    return textwrap.dedent(src)


def _in_pkg(module) -> bool:
    f = getattr(module, "__file__", None)
    return bool(f and _relpath(f))


def _obj_in_pkg(obj) -> bool:
    mod = sys.modules.get(getattr(obj, "__module__", "") or "")
    return mod is not None and _in_pkg(mod)


def _local_import_aliases(tree: ast.AST) -> dict[str, object]:
    """Bound-name -> object map for function-local package imports.
    The bound names live in the function's LOCALS, invisible to
    ``__globals__`` — resolve them here so `from ..streaming import
    stateful as st` followed by `st.foo(...)` narrows to foo's span
    instead of vanishing. Relative imports (level>0) don't occur in
    this package's function bodies."""
    import importlib

    aliases: dict[str, object] = {}
    for node in ast.walk(tree):
        try:
            if isinstance(node, ast.Import):
                for a in node.names:
                    if a.name.startswith("labelspark_spark"):
                        mod = importlib.import_module(a.name)
                        # `import a.b.c` binds `a` unless aliased
                        aliases[a.asname or a.name.split(".")[0]] = (
                            mod if a.asname else sys.modules["labelspark_spark"]
                        )
            elif (
                isinstance(node, ast.ImportFrom)
                and node.module
                and node.module.startswith("labelspark_spark")
            ):
                mod = importlib.import_module(node.module)
                for a in node.names:
                    val = getattr(mod, a.name, None)
                    if val is None:
                        # `from pkg import submodule` where the
                        # submodule was never imported: the parent has
                        # no attribute yet — import it directly
                        try:
                            val = importlib.import_module(
                                f"{node.module}.{a.name}"
                            )
                        except ImportError:
                            continue
                    aliases[a.asname or a.name] = val
        except Exception:
            continue
    return aliases


def _overlaps(span: tuple[str, int, int], ranges: dict) -> tuple[int, int] | None:
    rel, lo, hi = span
    for a, b in ranges.get(rel, ()):  # new-side ranges
        if a <= hi and lo <= b:
            return (a, b)
    return None


def changed_queries(
    base_ref: str, target_ref: str | None = None
) -> dict[str, list]:
    from labelspark_spark import queries as Q

    ranges = diff_ranges(base_ref, target_ref)
    walker = _DepWalker()
    sql_name_by_id = {
        id(v): k
        for k, v in vars(Q).items()
        if isinstance(v, str) and k.startswith("SQL_")
    }
    hits: dict[str, list] = {}
    for name, (fn, sql) in Q.REGISTRY.items():
        spans = walker.closure_spans([fn])
        if sql is not None:
            const = sql_name_by_id.get(id(sql))
            if const:
                s = walker.module_assign_span(Q, const)
                if s:
                    spans.append(s)
        evidence = []
        for span in spans:
            ov = _overlaps(span, ranges)
            if ov:
                evidence.append(
                    {"file": span[0], "span": [span[1], span[2]], "diff": list(ov)}
                )
        if evidence:
            # dedupe evidence rows, keep deterministic order
            uniq = {json.dumps(e, sort_keys=True) for e in evidence}
            hits[name] = [json.loads(e) for e in sorted(uniq)]
    return hits


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not args:
        print(
            "usage: changed_head.py <base-ref> [<target-ref>] [--evidence]",
            file=sys.stderr,
        )
        raise SystemExit(2)
    hits = changed_queries(args[0], args[1] if len(args) > 1 else None)
    if "--evidence" in sys.argv:
        print(json.dumps(hits, indent=1, sort_keys=True))
    else:
        print(json.dumps(sorted(hits)))


if __name__ == "__main__":
    main()
