"""labelspark_spark — a PySpark-native analytics engine with the
capability surface of Labelbox/labelspark, rebuilt Spark-first and
extended with training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns, streaming).

Reference: /root/reference (read-only); design notes in SURVEY.md.
"""

from labelspark_spark.client import Client, LocalTransport
from labelspark_spark.http_transport import HttpTransport, TransportError
from labelspark_spark.connector import (
    add_col,
    get_col_names,
    get_table_length,
    get_unique_values,
    rename_col,
)
from labelspark_spark.legacy import (
    LABELBOX_DEFAULT_TYPE_DICTIONARY,
    add_json_answers_to_dictionary,
    bronze_to_silver,
    create_dataset,
    create_labelbox_dataset,
    dataframe_schema_enrichment,
    dictionary_collector,
    flatten_bronze_table,
    get_annotations,
    get_videoframe_annotations,
    is_json,
    jsonToDataFrame,
    spark_schema_to_string,
    update_metadata,
)
from labelspark_spark.session import get_spark_session

__version__ = "0.1.0"

__all__ = [
    "Client",
    "LocalTransport",
    "HttpTransport",
    "TransportError",
    "get_spark_session",
    "__version__",
    # reference module-level verb parity (labelspark/__init__.py:1-15)
    "LABELBOX_DEFAULT_TYPE_DICTIONARY",
    "add_json_answers_to_dictionary",
    "bronze_to_silver",
    "create_dataset",
    "create_labelbox_dataset",
    "dataframe_schema_enrichment",
    "dictionary_collector",
    "flatten_bronze_table",
    "get_annotations",
    "get_videoframe_annotations",
    "is_json",
    "jsonToDataFrame",
    "spark_schema_to_string",
    "update_metadata",
    # reference connector.py helper quintet (connector.py:20-74)
    "get_col_names",
    "get_unique_values",
    "add_col",
    "get_table_length",
    "rename_col",
]
