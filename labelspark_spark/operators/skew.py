"""Skew-mitigation joins (100 TB posture; SURVEY §4).

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
our session factory) handles sort-merge skew automatically. This module
adds the explicit **salted join** for the cases AQE can't fix: a
shuffle-hash/broadcast-resistant hot key on a large-to-medium join, or
a skewed aggregation.

Salting is deterministic here (hash-derived, not rand()) so plans stay
replayable and retries/speculative tasks produce identical rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_expr(cols: list[str], buckets: int) -> Column:
    """Deterministic salt in [0, buckets) from non-key columns (salting
    with rand() breaks task-retry determinism)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(buckets)).cast("int")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot-key shuffle spread over ``buckets`` salts.

    The large (left) side gets a deterministic salt from its non-key
    columns; the right side is replicated ``buckets`` times (explode of
    a literal range — cheap when right is the smaller side). The shuffle
    key becomes (key, salt), so one hot key spreads over ``buckets``
    reducers instead of one straggler task.

    Results are identical to ``left.join(right, on, how)`` for inner and
    left joins (each left row carries exactly one salt; each right row
    exists once per salt).

    Caveat (r12 review): when the left frame has NO non-key columns the
    salt falls back to hashing the key itself, which maps a hot key to
    ONE salt — zero spread. Key-only hot frames are count-shaped; use
    :func:`salted_group_count` (or add a payload column) instead.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    non_key = [c for c in left.columns if c not in on] or on
    l_salted = left.withColumn("_salt", _salt_expr(non_key, buckets))
    r_salted = right.withColumn(
        "_salt", F.explode_outer(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    out = l_salted.join(r_salted, [*on, "_salt"], how)
    return out.drop("_salt")


def salted_group_count(
    df: DataFrame, keys: list[str], buckets: int = 8
) -> DataFrame:
    """Two-phase skewed aggregation: count per (key, salt) partial, then
    final count per key. Spark's partial aggregation usually makes this
    redundant — use it when the partial map-side agg can't absorb the
    skew (e.g. high-cardinality composite state per key)."""
    non_key = [c for c in df.columns if c not in keys] or keys
    salted = df.withColumn("_salt", _salt_expr(non_key, buckets))
    partial = salted.groupBy(*keys, "_salt").agg(F.count(F.lit(1)).alias("_n"))
    return partial.groupBy(*keys).agg(F.sum("_n").alias("n"))
