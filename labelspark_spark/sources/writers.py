"""Sink operators (SURVEY §2.1 S7-S9).

The reference's REST sink collects the whole dataset to the driver and
POSTs serial 10k batches (`create_labelbox_dataset.py:188-210`,
`uploader.py:93-105`). At 100 TB that is a non-starter: our sink streams
partition-local batches through ``foreachPartition`` with a pluggable
transport, so the driver never holds the data.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VALID_MODES = ("append", "overwrite")


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
) -> None:
    """S7 durable sink. Mode validation mirrors client.py:120-121."""
    if mode not in VALID_MODES:
        raise ValueError(f"write mode must be one of {VALID_MODES}, got {mode!r}")
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_delta(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
) -> None:
    """S7: Delta sink (client.py:146). Parquet fallback ONLY when the
    Delta data source is absent from the classpath; genuine write errors
    (schema mismatch, concurrent-txn conflict) propagate so loose parquet
    never gets appended into a real Delta table directory."""
    from labelspark_spark.sources import readers as _readers

    if mode not in VALID_MODES:
        raise ValueError(f"write mode must be one of {VALID_MODES}, got {mode!r}")
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if _readers._DELTA_AVAILABLE is False:
        writer.parquet(path)
        return
    try:
        writer.format("delta").save(path)
        _readers._DELTA_AVAILABLE = True
    except Exception as exc:
        if _readers._is_missing_delta_source(exc):
            _readers._DELTA_AVAILABLE = False
            writer.parquet(path)
        else:
            raise


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: pre-shuffles data by join key at write
    time so later joins/aggregations on ``bucket_cols`` read co-located
    partitions and skip the exchange entirely (the core 100 TB move for
    repeatedly-joined fact tables; see tests/test_plan_quality.py for
    the no-Exchange assertion)."""
    # Align the write partitioning to the bucket spec (r13 optimization
    # round): without it every input task writes its own file into EACH
    # bucket it holds — n_tasks x num_buckets small files, and (worse)
    # more than one file per bucket makes the scan drop the per-bucket
    # sort property, forcing downstream SMJs to re-sort. One hash
    # exchange on the bucket key yields exactly one task and one file
    # per bucket (Spark's bucket hash and repartition hash agree by
    # construction), parallelizes the write across buckets, and keeps
    # the sorted-bucket metadata trustworthy. At scale the caller sizes
    # num_buckets to the cluster, so the alignment is also the write
    # parallelism.
    writer = (
        df.repartition(num_buckets, *[F.col(c) for c in bucket_cols])
        .write.mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    num_partitions: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-partitioned, within-partition-sorted parquet: rows clustered
    by ``sort_cols`` so every file covers a narrow key range and parquet
    row-group min/max stats prune reads on those keys (the data-skipping
    layout for a 100 TB fact table's hottest filter column; same idea as
    Delta OPTIMIZE ZORDER's single-column case)."""
    if mode not in VALID_MODES:
        raise ValueError(f"write mode must be one of {VALID_MODES}, got {mode!r}")
    parted = (
        df.repartitionByRange(num_partitions, *sort_cols)
        if num_partitions
        else df.repartitionByRange(*sort_cols)
    )
    parted.sortWithinPartitions(*sort_cols).write.mode(mode).parquet(path)


def register_view(df: DataFrame, name: str) -> None:
    """S8: SQL registration (notebooks/intro.ipynb cell 14)."""
    df.createOrReplaceTempView(name)


def rest_sink(
    df: DataFrame,
    post_batch: Callable[[list[dict]], None],
    batch_size: int = 10_000,
) -> None:
    """S9 rebuilt: partition-parallel batched POST.

    Reference collects everything to the driver then loops serial batches
    of 10,000 (`create_labelbox_dataset.py:35,188-210`). Here each
    executor partition drains itself in ``batch_size`` chunks; the
    transport is injected so tests never need a live service.
    """

    def _drain(rows: Iterator) -> None:
        buf: list[dict] = []
        for row in rows:
            buf.append(row.asDict(recursive=True))
            if len(buf) >= batch_size:
                post_batch(buf)
                buf = []
        if buf:
            post_batch(buf)

    df.foreachPartition(_drain)
