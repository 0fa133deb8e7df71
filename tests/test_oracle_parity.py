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


def test_driver_window_has_no_rows_only_slots():
    """The driver hash-checks only the FIRST 50 registry entries per
    round; a rows-only (no-oracle) query in a window slot burns a
    hard-signal slot on a weak check. Every window entry must carry
    an oracle; rows-only queries (declared-approximate ANN/sketches)
    live below the line with their recall-companion attestations."""
    window = list(REGISTRY.items())[:50]
    rows_only = [name for name, (_, sql) in window if sql is None]
    assert not rows_only, f"rows-only queries occupy window slots: {rows_only}"
