"""Nested-schema flattener (SURVEY §2.2 P2/P3).

Reference: `labelspark/flatten_bronze_table.py:12-30` flattens by
*trial-selecting* every candidate dot-path and catching analysis
exceptions; `labelspark/spark_schema_to_string.py:10-23` enumerates
paths by recursing over the schema's JSON form. Both are rebuilt here as
a single pure schema walk — no exception-driven control flow, no
analysis round-trips — and arrays-of-arrays (which the reference punts
on, `flatten_bronze_table.py:8-10`) are handled via recursive explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType


def schema_paths(schema: StructType, prefix: str = "", descend_arrays: bool = True) -> list[str]:
    """P3: enumerate dot-paths of all leaf fields.

    Struct fields recurse; array-of-struct element fields are listed with
    the array's path prefix (Spark projects `arr.field` as array of the
    field). Scalar leaves return their own path.
    """
    paths: list[str] = []
    for field in schema.fields:
        name = f"{prefix}{field.name}"
        dtype = field.dataType
        if isinstance(dtype, StructType):
            paths.extend(schema_paths(dtype, prefix=f"{name}.", descend_arrays=descend_arrays))
        elif isinstance(dtype, ArrayType) and descend_arrays and isinstance(
            dtype.elementType, StructType
        ):
            paths.extend(
                schema_paths(dtype.elementType, prefix=f"{name}.", descend_arrays=descend_arrays)
            )
        else:
            paths.append(name)
    return paths


def flatten_structs(df: DataFrame, sep: str = ".") -> DataFrame:
    """P2: project every struct leaf to a top-level column.

    Arrays are kept as-is (use :func:`flatten` to explode them). Column
    names are full dot-paths, matching the reference's output naming
    (`flatten_bronze_table.py:30` ``.toDF(*cols_to_select)``).
    """
    # Leaf references are built by getField() chains, never by parsing
    # a dot-joined path string: bronze struct field names come from
    # user-defined ontology titles and can contain dots (e.g. 'Is this
    # O.K.'), which F.col('Label.Is this O.K.') would split on and
    # raise — the sibling flatten() already backticks for this reason
    # (r11 review). The alias keeps the reference's dot-path naming.
    cols: list = []

    def _walk(dtype: StructType, col, prefix: str) -> None:
        for f in dtype.fields:
            child = col.getField(f.name)
            path = f"{prefix}{sep}{f.name}"
            if isinstance(f.dataType, StructType):
                _walk(f.dataType, child, path)
            else:
                cols.append(child.alias(path))

    for field in df.schema.fields:
        if isinstance(field.dataType, StructType):
            _walk(field.dataType, F.col(f"`{field.name}`"), field.name)
        else:
            cols.append(F.col(f"`{field.name}`"))
    return df.select(*cols)


def flatten(df: DataFrame, explode_arrays: bool = True, outer: bool = True, sep: str = ".") -> DataFrame:
    """Fully flatten: recursively project structs and explode arrays.

    Handles arrays-of-arrays (the reference's punt) by repeated
    explosion. ``outer=True`` keeps rows whose arrays are null/empty
    (``explode_outer``), matching left-join-like semantics.
    """
    expl = F.explode_outer if outer else F.explode
    while True:
        struct_fields = [f for f in df.schema.fields if isinstance(f.dataType, StructType)]
        array_fields = (
            [f for f in df.schema.fields if isinstance(f.dataType, ArrayType)]
            if explode_arrays
            else []
        )
        if not struct_fields and not array_fields:
            return df
        # Spark allows one generator per Project: explode at most one
        # array per pass; structs all flatten in the same pass.
        exploded_one = False
        cols: list = []
        for field in df.schema.fields:
            if isinstance(field.dataType, StructType):
                for sub in field.dataType.fields:
                    cols.append(
                        F.col(f"`{field.name}`.`{sub.name}`").alias(f"{field.name}{sep}{sub.name}")
                    )
            elif isinstance(field.dataType, ArrayType) and explode_arrays and not exploded_one:
                cols.append(expl(F.col(f"`{field.name}`")).alias(field.name))
                exploded_one = True
            else:
                cols.append(F.col(f"`{field.name}`"))
        df = df.select(*cols)
