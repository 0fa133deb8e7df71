"""Drop-in parity for the reference's semi-public DataFrame helpers
(reference: labelspark/connector.py:20-74). The five names are thin,
Spark-first wrappers — reimplemented, not copied: schema introspection
reads `df.schema` instead of round-tripping `dtypes` through strings,
and the unique-values collect is documented as a driver
materialization so callers treat it as a bounded-cardinality verb
(the reference collects too; at scale use `df.select(col).distinct()`
and keep the result distributed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "get_col_names",
    "get_unique_values",
    "add_col",
    "get_table_length",
    "rename_col",
]


def get_col_names(table: DataFrame, extra_client=None) -> list[str]:
    """All column names of a Spark DataFrame, as strings.

    Reference: labelspark/connector.py:20 (iterates `table.dtypes`;
    the schema fields ARE the names — no dtype round-trip needed).
    ``extra_client`` is accepted and ignored for signature parity.
    """
    return [f.name for f in table.schema.fields]


def get_unique_values(
    table: DataFrame, col: str, extra_client=None
) -> list[str | None]:
    """Unique values of one column, stringified, as a driver-side list.

    Reference: labelspark/connector.py:30. The distinct runs
    distributed (hash aggregate with map-side partials); only the
    distinct SET is collected — callers use this for enum-like columns
    (status flags, dataset names). For high-cardinality columns keep
    the DataFrame form instead: this verb's contract is a driver list,
    exactly like the reference.

    DELIBERATE DIVERGENCE from the reference for NULL values: the
    reference's ``str(x[col])`` (connector.py:39) turns SQL NULL into
    the literal string ``'None'``, indistinguishable from a real
    ``'None'`` string — callers enumerating enum options from the list
    would mint a bogus option. This implementation surfaces NULL as
    Python ``None`` instead (hence the ``str | None`` element type).
    Callers needing byte-for-byte reference output can post-process
    with ``str(v)``.
    """
    return [
        str(r[0]) if r[0] is not None else None
        for r in table.select(F.col(col).cast("string")).distinct().collect()
    ]


def add_col(table: DataFrame, col: str, default_value="", extra_client=None) -> DataFrame:
    """New column holding ``default_value`` in every row (narrow op,
    no shuffle). Reference: labelspark/connector.py:41."""
    return table.withColumn(col, F.lit(default_value))


def get_table_length(table: DataFrame, extra_client=None) -> int:
    """Row count (distributed count, no driver materialization of
    rows). Reference: labelspark/connector.py:54."""
    return table.count()


def rename_col(table: DataFrame, col: str, to: str) -> DataFrame:
    """Rename one column (metadata-only projection, no shuffle).
    Reference: labelspark/connector.py:65."""
    return table.withColumnRenamed(col, to)
