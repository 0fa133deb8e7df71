"""t2-style correctness: every declared query vs its DuckDB oracle at
sf0.001 (fast) — the driver runs the same thing at sf0.01."""

from __future__ import annotations

import pytest

from labelspark_spark.queries import REGISTRY

from .conftest import SF_SMOKE
from .oracle_util import compare, register_views

ORACLE_CASES = [(n, fn, sql) for n, (fn, sql) in REGISTRY.items() if sql is not None]
ROWS_ONLY_CASES = [(n, fn) for n, (fn, sql) in REGISTRY.items() if sql is None]


@pytest.mark.parametrize("name,fn,sql", ORACLE_CASES, ids=[c[0] for c in ORACLE_CASES])
def test_oracle_parity(spark, duck, name, fn, sql):
    register_views(duck, SF_SMOKE)
    df = fn(spark, SF_SMOKE)
    result = compare(df, duck, sql)
    assert result["cols_match"], f"{name}: columns differ {result}"
    assert result["rows_match"], (
        f"{name}: rowcount {result['spark_rows']} vs {result['duck_rows']}"
    )
    assert result["values_match"], f"{name}: value hash mismatch"


@pytest.mark.parametrize("name,fn", ROWS_ONLY_CASES, ids=[c[0] for c in ROWS_ONLY_CASES])
def test_rows_only_queries_run(spark, name, fn):
    # declared-approximate queries carry their real signal in the
    # recall/error-bound companion suites; this only guards against a
    # silently-EMPTY result sneaking through (count >= 0 was vacuous)
    df = fn(spark, SF_SMOKE)
    assert df.count() > 0, f"{name}: approximate query returned no rows"
    assert len(df.schema.fields) > 0


def test_driver_window_rows_only_slots_are_declared_approximate():
    """r11 policy update: during the backlog era (r8-r10) the window
    held hash-checkable entries only — a rows-only query in a slot
    burned a hard signal on a weak check while never-attested queries
    queued. With the backlog drained, the window is a FRESHNESS
    ROTATION (VERDICT r10 item 1) over the whole registry, and the
    oldest cohorts legitimately contain the declared-approximate
    (no-oracle) entries, which also must not age past the rotation
    horizon. The invariant that remains: any no-oracle window slot
    must belong to the frozen declared-approximate set — each of
    which carries a hash-checked recall/error companion elsewhere.
    (tests/test_driver_window.py pins the same set registry-wide.)"""
    from tests.test_driver_window import ROWS_ONLY

    window = list(REGISTRY.items())[:50]
    rows_only = {name for name, (_, sql) in window if sql is None}
    assert rows_only <= ROWS_ONLY, (
        f"undeclared rows-only queries occupy window slots: "
        f"{sorted(rows_only - ROWS_ONLY)}"
    )
