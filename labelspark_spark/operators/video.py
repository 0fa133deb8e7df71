"""Per-data-row video-frame ingest (SURVEY §1.3 / §2.1 S3).

Reference: `labelspark/get_videoframe_annotations.py:15-43` iterates the
bronze table on the DRIVER (`iterrows`), issues one HTTP GET per data
row, json-parses every ndjson line in Python, and returns one DataFrame
per data row. None of that survives 100 TB: here

- the fetch runs executor-side inside ``mapInPandas`` (one call per
  data row, partition-parallel, driver never sees payloads),
- the payload stays an opaque string until Spark parses it
  (``split`` + ``explode`` + ``from_json`` — JVM-side, codegen),
- the result is ONE long bronze table keyed (data_row_id, frameNumber)
  instead of a driver-side list of DataFrames, which the existing
  silver builder pivots per frame (`bronze_to_silver.py:19-23`'s video
  branch).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from labelspark_spark.operators.silver import bronze_to_silver

# The frame-label fields the reference's flow touches (FIXTURES.md §6:
# frame ndjson rows mirror Label with a frameNumber discriminator).
FRAME_SCHEMA = (
    "struct<frameNumber:int,"
    "objects:array<struct<title:string>>,"
    "classifications:array<struct<title:string,answer:string>>>"
)


def fetch_frames(
    bronze: DataFrame,
    fetch_fn: Callable[[str], str],
    id_col: str = "DataRowID",
    frames_url_col: str = "Label.frames",
    payload_col: str = "frames_payload",
) -> DataFrame:
    """One transport call per data row, executor-side.

    ``fetch_fn`` (e.g. ``transport.fetch_frames``) must be picklable; it
    receives the row's frames URL and returns the raw ndjson payload
    (one JSON object per line). Replaces the driver-side requests loop
    of `get_videoframe_annotations.py:28-37`. No JSON is parsed here —
    the payload goes back as ONE string column for the JVM to parse.
    """
    narrow = bronze.select(
        F.col(id_col).alias(id_col), F.col(frames_url_col).alias("_frames_url")
    )
    out_schema = StructType(
        [
            StructField(id_col, narrow.schema[0].dataType, True),
            StructField(payload_col, StringType(), True),
        ]
    )

    def _fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    payload_col: [
                        fetch_fn(u) if u is not None else None
                        for u in pdf["_frames_url"]
                    ],
                }
            )

    return narrow.mapInPandas(_fetch, schema=out_schema)


def parse_frames_ndjson(
    df: DataFrame,
    id_col: str = "DataRowID",
    payload_col: str = "frames_payload",
    frame_schema: str = FRAME_SCHEMA,
) -> DataFrame:
    """ndjson payload column -> long typed bronze, one row per frame.

    split + explode + from_json — all JVM-side (the reference
    json.loads's every line in Python, get_videoframe_annotations.py:34).
    Returns (id, frameNumber, objects, classifications).
    """
    lines = df.select(
        id_col,
        F.explode(F.split(F.col(payload_col), "\n")).alias("_line"),
    ).filter(F.length(F.trim(F.col("_line"))) > 0)
    parsed = lines.select(id_col, F.from_json("_line", frame_schema).alias("_f"))
    return parsed.select(
        id_col,
        F.col("_f.frameNumber").alias("frameNumber"),
        F.col("_f.objects").alias("objects"),
        F.col("_f.classifications").alias("classifications"),
    )


def video_frames_silver(
    frames_bronze: DataFrame,
    id_col: str = "DataRowID",
    object_titles: list[str] | None = None,
    question_titles: list[str] | None = None,
) -> DataFrame:
    """Frame-long bronze -> wide silver keyed (id, frameNumber) — the
    video branch of the medallion flow (`bronze_to_silver.py:19-23`
    re-keys on the frame column)."""
    return bronze_to_silver(
        frames_bronze,
        key_cols=[id_col, "frameNumber"],
        objects_col="objects",
        classifications_col="classifications",
        object_titles=object_titles,
        question_titles=question_titles,
    )
