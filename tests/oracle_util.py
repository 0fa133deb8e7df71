"""Replica of the driver's oracle comparison: run a Spark query and its
DuckDB SQL twin, compare row count, column names, and an
order-insensitive value hash."""

from __future__ import annotations

import decimal
import math
from typing import Any

import numpy as np

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def register_views(con, sf_dir: str) -> None:
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )


def _norm(v: Any) -> Any:
    """Type-SENSITIVE normalization, as strict as the driver's hash.

    Python's cross-type equality makes Decimal('24851.00') == 24851.0,
    so a lax replica passes queries the driver fails (that is exactly
    how r4's salted_agg shipped green locally but red in the driver
    run: Spark emitted decimal(20,2), DuckDB surfaced float64). Tag
    Decimal with its own type marker so a decimal-vs-double output
    mismatch fails here first. Numpy scalars still fold into their
    Python equivalents — same type CLASS, just boxed differently."""
    if isinstance(v, decimal.Decimal):
        return ("decimal", str(v))
    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, np.floating):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Tag floats with their own type marker: Python's 123 == 123.0
        # hides int64-vs-float64 dtype splits that the driver's
        # pandas-hashtable hash DOES fail (r7 cusum_changepoint: DuckDB
        # widened a windowed SUM(BIGINT) to HUGEINT -> pandas float64
        # while Spark emitted int64; values equal, driver hash red).
        return ("float", round(v, 9))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        raise TypeError(
            "list-typed top-level cell reached the oracle hash: the DRIVER's "
            "pandas-hashtable hash cannot hash list cells (r5 token_ids red). "
            "Serialize array columns to a scalar (e.g. concat_ws) in BOTH the "
            f"Spark query and the DuckDB oracle. Offending value: {v!r:.80}"
        )
    return v


def rowset(cols: list[str], rows: list[tuple]) -> frozenset:
    """Order-insensitive multiset of rows with columns sorted by name."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out: dict = {}
    for r in rows:
        key = tuple(_norm(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return frozenset(out.items())


def compare(spark_df, con, sql: str) -> dict:
    sdf = spark_df.toPandas()
    ddf = con.sql(sql).df()
    s_cols = list(sdf.columns)
    d_cols = list(ddf.columns)
    s_rows = [tuple(r) for r in sdf.itertuples(index=False, name=None)]
    d_rows = [tuple(r) for r in ddf.itertuples(index=False, name=None)]
    result = {
        "rows_match": len(s_rows) == len(d_rows),
        "cols_match": sorted(s_cols) == sorted(d_cols),
        "spark_rows": len(s_rows),
        "duck_rows": len(d_rows),
        "spark_cols": s_cols,
        "duck_cols": d_cols,
    }
    if result["rows_match"] and result["cols_match"]:
        result["values_match"] = rowset(s_cols, s_rows) == rowset(d_cols, d_rows)
    else:
        result["values_match"] = False
    return result
