"""Replica of the driver's oracle comparison: run a Spark query and its
DuckDB SQL twin, compare row count, column names, and an
order-insensitive value hash."""

from __future__ import annotations

import math
from typing import Any

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
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
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
