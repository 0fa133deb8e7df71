"""SparkSession factory.

Rebuilds the capability of the reference's ``get_spark_session``
(`labelspark/client.py:153-205`: Delta extension + cloud-store config)
as an idiomatic, scale-aware factory:

- AQE on (adaptive shuffle-partition coalescing, skew-join splitting,
  dynamic broadcast) — the 100 TB posture relies on runtime re-planning.
- Arrow-based pandas interchange on — every Pandas UDF path is
  Arrow-batched, never row-pickled.
- Session timezone pinned to UTC so timestamp semantics are stable
  across the DuckDB oracle, parquet NTZ data, and executors.
- Delta Lake / cloud-filesystem configs applied only when requested
  (the test environment has neither; parquet is the durable format).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark_session(
    app_name: str = "labelspark-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    enable_delta: bool = False,
    cloud_conf: dict[str, str] | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-sane defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster leave it unset and let spark-submit decide.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelismFirst stays at its default (true): byte-based
        # coalescing (false) looked attractive for the tiny LSH bucket
        # shuffles, but it collapses CPU-dense small-byte stages (the
        # n-gram verify's array_intersect work) onto too few tasks —
        # measured 2.2x slower end-to-end at local[32]. Bytes are the
        # wrong proxy for work on compute-bound pair verification.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Coalesce floor = 64KB, not the 1MB default (r13 optimization
        # round, guide §2.2/§2.5): AQE coalesces post-shuffle partitions
        # by BYTES, but this engine's reduce stages are routinely
        # CPU-dense over tiny rows — a 5 MB shuffle of 16-byte candidate
        # pairs fans out to array_intersect verification work, and the
        # 1MB floor collapsed it to 2 tasks on 32 cores (measured:
        # dedup_jaccard_prefix verify stage 3.0s wall on 2 tasks; 64KB
        # floor -> 1.6s total, 25-query subset -15%, micro subset -30%).
        # Scale-safe by construction: the floor only binds when a
        # shuffle's total bytes are below ~parallelism x 1MB, which a
        # 100 TB stage never is — production shuffles coalesce by the
        # advisory size exactly as before. 16KB was measured WORSE
        # (straggler-prone micro-tasks); keep 64KB. Parameterised like
        # the other scale-dependent settings.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION_SIZE", "64KB"),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # 100 TB posture: size scan splits so executor tasks stay memory-safe
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.parquet.filterPushdown", "true")
        # push MIN/MAX/COUNT of unfiltered scans down to parquet footer
        # stats — a metadata read instead of a data scan
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # testdata events.parquet stores TIMESTAMP(NANOS); Spark reads it
        # as bigint ns (converted to micros in sources.readers.read_table)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # single-JVM local mode: the driver heap IS the executor heap.
        # 8g forced GC pauses mid-query that cost the heavy dedup queries
        # ~0.4s each at sf0.1 (measured: minhash 1.9s @ 8g -> 1.5s @ 20g);
        # the box has 128 GiB, so size the heap to keep steady-state GC
        # off the hot path
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "20g"))
        .config("spark.ui.enabled", "false")
    )

    if enable_delta:
        # Reference: client.py:158-166 — Delta extension + catalog.
        builder = builder.config(
            "spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension"
        ).config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
    if cloud_conf:
        # Reference: client.py:168-205 — S3A/GCS credentials passthrough.
        for k, v in cloud_conf.items():
            builder = builder.config(k, v)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)

    return builder.getOrCreate()
