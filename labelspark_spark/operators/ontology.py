"""Ontology / metadata schema-id reconciliation (SURVEY §2.7 U6-U7).

The reference resolves every metadata field name against a remote
metadata ontology before upload:

- `labelspark/uploader.py:154-155` builds a driver dict
  ``{name: schema_id}`` (via labelbase) and ships it into per-row UDFs
  as a JSON literal that each row re-parses.
- `labelspark/create_labelbox_dataset.py:43-73` checks each metadata
  column against the remote field names and creates missing fields —
  for enums, collecting the column's distinct values as options
  (`create_labelbox_dataset.py:86-90`).

Spark-first rebuild: the ontology is a (tiny) DataFrame; resolution is
a **broadcast join** on the long-format metadata — no per-row JSON
re-parse, no driver dict in the row path. Unknown fields/options come
back as a *reconciliation DataFrame* instead of an implicit remote
mutation, so the caller decides what to auto-create.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from labelspark_spark.operators.uploads import DIVIDER, parse_convention_columns

ONTOLOGY_SCHEMA = (
    "array<struct<schema_id:string,name:string,kind:string,"
    "options:array<struct<schema_id:string,name:string>>>>"
)


def ontology_index(spark: SparkSession, ontology_json: str) -> DataFrame:
    """Remote metadata-ontology snapshot (JSON array of fields) -> long
    index DataFrame (field_name, field_schema_id, kind, option_name,
    option_schema_id) — one row per enum option, one row with null
    option columns for non-enum fields.

    Mirrors the name->schema-id index of `uploader.py:154` as a
    DataFrame instead of a driver dict.
    """
    raw = spark.createDataFrame([(ontology_json,)], "value string")
    fields = raw.select(
        F.explode(F.from_json("value", ONTOLOGY_SCHEMA)).alias("f")
    ).select(
        F.col("f.name").alias("field_name"),
        F.col("f.schema_id").alias("field_schema_id"),
        F.col("f.kind").alias("kind"),
        F.col("f.options").alias("options"),
    )
    return fields.select(
        "field_name",
        "field_schema_id",
        "kind",
        F.explode_outer("options").alias("o"),
    ).select(
        "field_name",
        "field_schema_id",
        "kind",
        F.col("o.name").alias("option_name"),
        F.col("o.schema_id").alias("option_schema_id"),
    )


def unpivot_metadata(
    df: DataFrame, key_cols: list[str], divider: str = DIVIDER
) -> DataFrame:
    """Wide metadata convention columns -> long (key, field_name,
    declared_type, value) via one explode — the shape the broadcast
    resolve joins on."""
    conv = [c for c in parse_convention_columns(df.columns, divider) if c.kind == "metadata"]
    if not conv:
        raise ValueError("no metadata convention columns found")
    entries = F.array(*[
        F.struct(
            F.lit(c.name).alias("field_name"),
            F.lit(c.value_type).alias("declared_type"),
            F.col(f"`{c.column}`").cast("string").alias("value"),
        )
        for c in conv
    ])
    return df.select(*key_cols, F.explode(entries).alias("m")).select(
        *key_cols,
        F.col("m.field_name").alias("field_name"),
        F.col("m.declared_type").alias("declared_type"),
        F.col("m.value").alias("value"),
    ).filter(F.col("value").isNotNull())


def resolve_metadata_schema_ids(
    meta_long: DataFrame, index: DataFrame
) -> DataFrame:
    """Attach field/option schema ids to long-format metadata by
    broadcast join (uploader.py:154-155, 223-233 rebuilt).

    Enum values join on (field_name, value=option_name); other kinds on
    field_name alone. Unresolved rows keep null schema ids — feed them
    to :func:`metadata_reconciliation`.
    """
    flds = index.select("field_name", "field_schema_id", "kind").distinct()
    opts = index.filter(F.col("option_name").isNotNull()).select(
        F.col("field_name").alias("_of"),
        F.col("option_name").alias("_on"),
        "option_schema_id",
    )
    out = meta_long.join(F.broadcast(flds), "field_name", "left")
    return out.join(
        F.broadcast(opts),
        (out["field_name"] == opts["_of"])
        & (out["value"] == opts["_on"])
        & (out["kind"] == F.lit("enum")),
        "left",
    ).drop("_of", "_on")


def metadata_reconciliation(resolved: DataFrame) -> DataFrame:
    """What the reference auto-creates (create_labelbox_dataset.py:64-72
    + 86-90), surfaced as data: distinct (field_name, declared_type,
    value, issue) where issue is 'missing_field' (no ontology field of
    that name) or 'missing_option' (enum field exists, value is not an
    option)."""
    return (
        resolved.withColumn(
            "issue",
            F.when(F.col("field_schema_id").isNull(), F.lit("missing_field")).when(
                (F.col("kind") == "enum") & F.col("option_schema_id").isNull(),
                F.lit("missing_option"),
            ),
        )
        .filter(F.col("issue").isNotNull())
        .select("field_name", "declared_type", "value", "issue")
        .distinct()
    )
