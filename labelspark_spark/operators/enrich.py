"""Type enrichment (SURVEY §2.2 P6/P7).

Reference: `labelspark/dataframe_schema_enrichment.py:4-15` casts each
column in a type dictionary inside try/except; the default dictionary is
`labelspark/constants.py:1-7`. Rebuilt: the schema is checked up front
(no exception-driven probing), the skip/raise policy is explicit, and
null normalization is a column expression instead of driver-side loops
(`client.py:64-69`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Reference default: labelspark/constants.py:1-7.
LABEL_DEFAULT_TYPE_DICTIONARY = {
    "Agreement": "integer",
    "Benchmark Agreement": "integer",
    "Created At": "timestamp",
    "Updated At": "timestamp",
    "Has Open Issues": "integer",
    "Seconds to Label": "float",
}


def enrich_types(
    df: DataFrame,
    type_dict: dict[str, str] | None = None,
    errors: str = "skip",
) -> DataFrame:
    """Cast known columns to declared types in one projection.

    ``errors='skip'`` ignores dictionary entries absent from the frame
    (the reference's silent behavior); ``errors='raise'`` surfaces them.
    """
    if type_dict is None:
        type_dict = LABEL_DEFAULT_TYPE_DICTIONARY
    if errors not in ("skip", "raise"):
        raise ValueError(f"errors must be 'skip' or 'raise', got {errors!r}")
    present = set(df.columns)
    missing = [c for c in type_dict if c not in present]
    if missing and errors == "raise":
        raise KeyError(f"columns not in DataFrame: {missing}")
    cols = [
        F.col(f"`{c}`").cast(type_dict[c]).alias(c) if c in type_dict else F.col(f"`{c}`")
        for c in df.columns
    ]
    return df.select(*cols)


def normalize_nulls(df: DataFrame, string_default: str = "") -> DataFrame:
    """P7: null -> '' on string cols, nested cols -> JSON strings.

    Reference does this on the driver per record (`client.py:64-69`);
    here it's one executor-side projection.
    """
    cols = []
    for field in df.schema.fields:
        name = field.name
        tn = field.dataType.typeName()
        if tn == "string":
            cols.append(F.coalesce(F.col(f"`{name}`"), F.lit(string_default)).alias(name))
        elif tn in ("struct", "array", "map"):
            cols.append(F.to_json(F.col(f"`{name}`")).alias(name))
        else:
            cols.append(F.col(f"`{name}`"))
    return df.select(*cols)


def to_string_frame(df: DataFrame) -> DataFrame:
    """Compat mode: the reference's all-strings export schema
    (`client.py:71-76`) for hash-stable goldens — every column cast to
    string, nested values serialized as JSON, nulls -> ''."""
    cols = []
    for field in df.schema.fields:
        name = field.name
        if field.dataType.typeName() in ("struct", "array", "map"):
            base = F.to_json(F.col(f"`{name}`"))
        else:
            base = F.col(f"`{name}`").cast("string")
        cols.append(F.coalesce(base, F.lit("")).alias(name))
    return df.select(*cols)
