"""Plan-inspection helpers (100 TB discipline enforcement).

Used by tests to assert the physical plan is the one we want — filters
pushed to the parquet scan, projections pruned, broadcasts where
expected, codegen spans present — not just that results are correct.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def has_pushed_filters(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "PushedFilters: [" in plan and "PushedFilters: []" not in plan


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the scan (column-pruning check)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            inner = line.split("struct<", 1)[-1].rstrip(">")
            cols.extend(part.split(":")[0].strip() for part in inner.split(",") if part)
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def count_shuffles(df: DataFrame) -> int:
    """Number of SHUFFLE exchanges in the plan. Counted off the
    numbered node headers so `BroadcastExchange` (not a shuffle) and
    `ReusedExchange` (no second shuffle happens) don't inflate the
    count the way a bare substring count did (r12 review)."""
    import re

    return len(re.findall(r"\(\d+\) Exchange\b", formatted_plan(df)))


def codegen_stage_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen stages in the FINAL (post-AQE)
    physical plan. Executes the frame (AQE only finalizes plans at
    runtime), then counts codegen stage markers."""
    df.collect()
    text = df._jdf.queryExecution().executedPlan().toString()
    return max(text.count("WholeStageCodegen"), text.count("*("))


def _top_level_bracket_groups(s: str) -> list[str]:
    """Split ``[a], [b, [c]], [d]`` into its top-level bracket groups."""
    groups: list[str] = []
    depth = 0
    cur = ""
    for ch in s:
        if ch == "[":
            depth += 1
            if depth == 1:
                cur = ""
                continue
        if ch == "]":
            depth -= 1
            if depth == 0:
                groups.append(cur)
                continue
        if depth >= 1:
            cur += ch
    return groups


def global_window_specs(df: DataFrame) -> list[str]:
    """Arguments of every UNPARTITIONED Window node in the plan.

    A fully-specified Window's formatted ``Arguments:`` carries three
    top-level bracket groups ``[exprs], [partitionSpec], [orderSpec]``.
    Two groups is ambiguous: a window with partitionBy but no orderBy
    (``count(*) over (partition by k)``) ALSO prints two —
    ``[exprs], [partitionSpec]`` — and that one shuffles per key, not
    to a single task. The groups are distinguishable by content: an
    orderSpec item always prints a sort direction (``ASC``/``DESC``),
    a partitionSpec item never does. Unpartitioned WindowExec moves
    ALL input rows to one task — the 100 TB straggler the two-phase
    top-k (queries._global_topk) exists to avoid — so any occurrence
    must be justified by a bounded input.
    """
    import re

    out: list[str] = []
    plan = formatted_plan(df)
    for m in re.finditer(r"\(\d+\) Window(?:\n[^\n(]*)*?\nArguments: (.*)", plan):
        groups = _top_level_bracket_groups(m.group(1))
        if len(groups) == 2 and re.search(r"\b(ASC|DESC)\b", groups[1]):
            out.append(m.group(1))
        elif (
            # defensive (r12 review): a printer that keeps the empty
            # partitionSpec as its own group — [exprs], [], [x ASC] —
            # is the same unpartitioned window and must not slip by
            len(groups) == 3
            and not groups[1].strip()
            and re.search(r"\b(ASC|DESC)\b", groups[2])
        ):
            out.append(m.group(1))
    return out
