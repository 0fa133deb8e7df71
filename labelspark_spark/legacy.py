"""Legacy module-level verb parity with the reference package.

The reference exposes its API as free functions (reference
`labelspark/__init__.py:1-15`); a user migrating from it should be able
to keep calling the same names. Every function here is a thin delegate
to the Spark-first implementation — the heavy lifting (flattening,
enrichment, uploads, metadata sync) lives in ``operators/`` and
``client.py`` and is fully distributed; nothing in this module iterates
rows on the driver.

Driver-side micro-helpers (``is_json``, ``dictionary_collector``,
``add_json_answers_to_dictionary``) are kept as plain-Python utilities
for API compatibility only: the engine's silver path
(`operators/silver.py`) replaces their per-row role with column
expressions.
"""

from __future__ import annotations

import json as _json
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from labelspark_spark.operators.enrich import (
    LABEL_DEFAULT_TYPE_DICTIONARY,
    enrich_types,
)
from labelspark_spark.operators.flatten import flatten_structs, schema_paths
from labelspark_spark.operators.silver import bronze_to_silver as _bronze_to_silver
from labelspark_spark.sources.readers import json_literal_to_df

# Reference name for the default cast dictionary
# (`labelspark/constants.py:1-7`).
LABELBOX_DEFAULT_TYPE_DICTIONARY = LABEL_DEFAULT_TYPE_DICTIONARY


def is_json(value) -> bool:
    """True when ``value`` parses as JSON (`labelspark/is_json.py:2-7`)."""
    try:
        _json.loads(value)
    except (TypeError, ValueError):
        return False
    return True


class dictionary_collector:  # noqa: N801 - reference spelling
    """Row -> dict adapter (`labelspark/dictionary_collector.py:1-5`)."""

    @staticmethod
    def return_as_dict(row_object) -> dict:
        return row_object.asDict()


def _answer_title(answer: Any) -> Any:
    """Collapse a classification answer to its display string.

    Mirrors the semantics of
    `labelspark/add_json_answers_to_dictionary.py:16-32`: a JSON string
    is parsed, a dict yields its ``title``, a list of dicts folds to a
    comma-joined title string, scalars pass through.
    """
    if isinstance(answer, str) and is_json(answer):
        parsed = _json.loads(answer)
        if isinstance(parsed, dict) and "title" in parsed:
            return parsed["title"]
    if isinstance(answer, dict):
        return answer.get("title", answer)
    if isinstance(answer, list):
        titles = [a.get("title") if isinstance(a, dict) else a for a in answer]
        return ",".join(str(t) for t in titles)
    return answer


def add_json_answers_to_dictionary(title: str, answer: Any, my_dictionary: dict) -> dict:
    """First-wins insert of a (question, answer) pair into a dict
    (`labelspark/add_json_answers_to_dictionary.py:5-37`).

    A Python-literal list answer (the reference's ``ast.literal_eval``
    branch) recurses per item; otherwise the answer collapses to its
    title form. Existing keys are never overwritten — same first-wins
    rule the distributed silver pivot enforces
    (`operators/silver.py:50`).
    """
    if isinstance(answer, str):
        try:
            import ast

            literal = ast.literal_eval(answer)
        except (ValueError, SyntaxError):
            literal = None
        if isinstance(literal, list):
            for item in literal:
                my_dictionary = add_json_answers_to_dictionary(title, item, my_dictionary)
            return my_dictionary
    my_dictionary.setdefault(title, _answer_title(answer))
    return my_dictionary


def spark_schema_to_string(schema, progress: str = ""):
    """Dot-path enumeration of a schema's leaf fields
    (`labelspark/spark_schema_to_string.py:10-23`).

    Accepts a ``StructType`` or its ``jsonValue()`` dict (the form the
    reference takes). Pure schema walk — no trial-select round trips.
    """
    if isinstance(schema, dict):
        schema = StructType.fromJson(schema)
    prefix = progress.strip(".")
    if prefix:
        prefix += "."
    return schema_paths(schema, prefix=prefix)


def flatten_bronze_table(bronze_table: DataFrame) -> DataFrame:
    """Struct leaves -> top-level dot-named columns
    (`labelspark/flatten_bronze_table.py:5-32`).

    Arrays-of-structs stay as array columns (the reference's
    "up one level" fallback for paths inside arrays); use
    :func:`labelspark_spark.operators.flatten.flatten` to explode them.
    """
    return flatten_structs(bronze_table)


def dataframe_schema_enrichment(
    raw_dataframe: DataFrame, type_dictionary: dict[str, str] | None = None
) -> DataFrame:
    """Cast known columns per the type dictionary, skipping absentees
    (`labelspark/dataframe_schema_enrichment.py:4-15`) — one projection,
    no exception-driven control flow."""
    return enrich_types(raw_dataframe, type_dictionary, errors="skip")


def jsonToDataFrame(  # noqa: N802 - reference spelling
    json: str, spark: SparkSession, sc=None, schema: StructType | None = None
) -> DataFrame:
    """JSON literal -> DataFrame (`labelspark/jsonToDataFrame.py:1-6`).

    ``sc`` is accepted for signature parity and ignored: the literal is
    read through the datasource (parallelizable), not a driver RDD.
    """
    return json_literal_to_df(spark, json, schema=schema)


def bronze_to_silver(bronze_table: DataFrame, **kwargs) -> DataFrame:
    """Flattened analytics table (`labelspark/bronze_to_silver.py:13-76`),
    distributed explode/pivot — no ``iterrows``.

    The reference keys on "DataRow ID" and reads ``Label.objects`` /
    ``Label.classifications``; those conventions are the defaults here
    when the columns exist, overridable via the explicit kwargs of
    :func:`labelspark_spark.operators.silver.bronze_to_silver`.
    """
    cols = set(bronze_table.columns)
    if "key_cols" not in kwargs:
        kwargs["key_cols"] = ["DataRow ID"] if "DataRow ID" in cols else ["DataRowID"]
    label_fields = (
        {f.name for f in bronze_table.schema["Label"].dataType.fields}
        if "Label" in cols
        else set()
    )
    if "objects_col" not in kwargs and "objects" in label_fields:
        kwargs["objects_col"] = "Label.objects"
    if "classifications_col" not in kwargs and "classifications" in label_fields:
        kwargs["classifications_col"] = "Label.classifications"
    return _bronze_to_silver(bronze_table, **kwargs)


def get_annotations(client, project_id: str, spark=None, sc=None) -> DataFrame:
    """Label export -> enriched bronze table
    (`labelspark/get_annotations.py:6-12`): raw export scan + default
    type enrichment. ``spark``/``sc`` accepted for parity; the client's
    own session is used."""
    return dataframe_schema_enrichment(client.get_annotations(project_id))


def get_videoframe_annotations(first, second=None, spark=None, sc=None, *, client=None, **kwargs):
    """Frame-level bronze (`labelspark/get_videoframe_annotations.py:15-43`).

    Accepts BOTH call shapes:

    - reference positional: ``get_videoframe_annotations(bronze, api_key,
      spark, sc)`` — ``api_key``/``spark``/``sc`` are accepted and
      ignored (the fetch runs through the client's Transport, not raw
      HTTP on the driver); pass the client via the ``client=`` kwarg.
    - engine shape: ``get_videoframe_annotations(client, bronze)``.

    The reference fetches every row's frame URL on the driver and
    returns one DataFrame per row; here the fetch is partition-local
    and the result is ONE long (id, frameNumber) table — same
    information, join/groupBy-able, no driver loop.
    """
    del spark, sc
    if isinstance(first, DataFrame):
        bronze, resolved = first, client
        if resolved is None:
            raise TypeError(
                "get_videoframe_annotations(bronze, api_key, spark, sc) needs "
                "client=<SparkClient>: the engine fetches frames through a "
                "Transport, not a raw api_key"
            )
    else:
        bronze, resolved = second, first
    return resolved.get_videoframe_annotations(bronze, **kwargs)


def create_dataset(
    client,
    spark_dataframe: DataFrame,
    iam_integration: str = "DEFAULT",
    *,
    dataset_id: str = "legacy-dataset",
    **kwargs,
):
    """Upload an (external_id, row_data) frame as new data rows
    (`labelspark/create_dataset.py:10-28`).

    ``iam_integration`` is accepted for signature parity (it configures
    platform-side storage access, not the dataflow). The reference
    iterates a pandas frame on the driver; this delegates to the
    partition-parallel spool.
    """
    del iam_integration
    result = client.create_data_rows_from_table(
        spark_dataframe,
        dataset_id,
        external_id_col="external_id" if "external_id" in spark_dataframe.columns else None,
        **kwargs,
    )
    return result


def create_labelbox_dataset(
    client,
    spark_dataframe: DataFrame,
    dataset_name: str = "legacy-dataset",
    add_data_row_ids: bool = True,
    iam_integration: str = "DEFAULT",
    metadata_index: dict | bool = False,
    **kwargs,
):
    """Dataset creation with metadata sync and id back-fill
    (`labelspark/create_labelbox_dataset.py:9-41`).

    Steps match the reference: reconcile metadata fields against the
    remote ontology (when ``metadata_index`` names columns), build +
    post the uploads, and optionally attach a deterministic
    ``data_row_id`` column. Returns ``(dataset_id, spark_dataframe)``
    mirroring the reference's ``(lb_dataset, spark_dataframe)``.
    """
    del iam_integration
    meta_df = spark_dataframe
    if metadata_index:
        if isinstance(metadata_index, dict):
            # reference syntax {plain_column_name: 'enum'|'string'|'number'|
            # 'datetime'} (create_labelbox_dataset.py:43-73): alias each
            # named plain column to the metadata convention form the
            # unpivot expects; already-convention columns pass through.
            from pyspark.sql import functions as F

            from labelspark_spark.operators.uploads import DIVIDER

            renames = {
                col: f"metadata{DIVIDER}{typ}{DIVIDER}{col}"
                for col, typ in metadata_index.items()
                if col in meta_df.columns and not col.startswith(f"metadata{DIVIDER}")
            }
            if renames:
                meta_df = meta_df.select(
                    *[
                        F.col(f"`{c}`").alias(renames.get(c, c))
                        for c in meta_df.columns
                    ]
                )
        key_cols = [c for c in ("row_data", "external_id") if c in meta_df.columns]
        client.connect_spark_metadata(meta_df, dataset_name, key_cols)
    # upload the RENAMED frame: build_uploads discovers metadata through
    # the metadata///type///name convention columns, so posting the
    # original frame would sync the ontology above yet attach NO
    # metadata to any data row (r11 review — the reference uploads rows
    # WITH the metadata_index fields, create_labelbox_dataset.py:43-73)
    client.create_data_rows_from_table(
        meta_df,
        dataset_name,
        external_id_col="external_id" if "external_id" in meta_df.columns else None,
        **kwargs,
    )
    if add_data_row_ids:
        from pyspark.sql import functions as F

        # deterministic id from the asset pointer — the reference reads
        # ids back from the platform (create_labelbox_dataset.py:213-227);
        # the mock platform derives them the same way
        spark_dataframe = spark_dataframe.withColumn(
            "data_row_id", F.md5(F.col("row_data").cast("string"))
        )
    return dataset_name, spark_dataframe


def update_metadata(
    client, spark_dataframe: DataFrame, metadata_field_name: str, lb_dataset: str
) -> DataFrame:
    """Refresh one metadata column from the platform
    (`labelspark/update_metadata.py:5-51`): broadcast lookup join,
    remote value wins."""
    return client.update_metadata(
        spark_dataframe, lb_dataset, key_col="data_row_id", value_col=metadata_field_name
    )
