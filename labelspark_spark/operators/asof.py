"""Temporal joins the reference lacks (SURVEY §2.3 gap row).

- :func:`asof_join` — for each left row, the latest right row with
  ``right.ts <= left.ts`` per key. Implemented as union + window
  last-value carry-forward: ONE shuffle on (key, ts), no range
  cross-product. This is the scalable formulation — a naive
  range-condition join degenerates to a per-key nested loop.
- :func:`range_join` — general interval join with an equi-key prefix so
  Catalyst plans a hash join with a range residual, not a pure BNLJ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: attach the most recent right values at-or-before each
    left timestamp (direction='backward'; 'forward' = next at-or-after).

    Union both sides tagged, sort within key by time, carry the last
    right ROW forward as one struct (ignorenulls last over an unbounded
    preceding frame). Single shuffle; robust to skew via AQE.

    The struct carry is load-bearing (r12 review): carrying each value
    column independently would (a) let an older row's value shine
    through a genuinely-NULL field of the latest right row, and (b)
    stitch values of DIFFERENT right rows into one output row when
    their null patterns differ. The struct is non-null for every right
    row, so the carried values always come from one row, nulls intact.

    NULL timestamps are "as of" nothing on EITHER side: right rows with
    a NULL timestamp are dropped (under a nulls-first sort they would
    seed the carry before the earliest real row), and left rows with a
    NULL timestamp get NULL values in both directions (the window sorts
    nulls FIRST in each direction so no right row precedes them — the
    default desc ordering puts nulls last, which would hand a forward
    NULL-ts left row the earliest right row's values).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in set(on) | {right_ts}]
    left_payload = [c for c in left.columns if c not in set(on) | {left_ts}]
    clash = set(value_cols) & (set(left_payload) | {left_ts} | set(on))
    if clash:
        raise ValueError(
            f"right value columns collide with left columns: {sorted(clash)}; "
            "rename one side before joining"
        )
    if not value_cols:
        # Nothing to attach (right frame holds only keys + timestamp, or
        # an explicit []). A zero-field struct is degenerate in Spark;
        # short-circuit with the normal output column order instead.
        return left.select(*on, *left_payload, F.col(left_ts))

    lt = left.withColumn("_ts", F.col(left_ts)).withColumn("_side", F.lit(1))
    rt = (
        right.filter(F.col(right_ts).isNotNull())
        .select(
            *on,
            F.col(right_ts).alias("_ts"),
            F.struct(*[F.col(c) for c in value_cols]).alias("_rvals"),
        )
        .withColumn("_side", F.lit(0))
    )
    # Align schemas: left lacks the right-row struct, right lacks left's
    # payload.
    lt = lt.withColumn("_rvals", F.lit(None).cast(rt.schema["_rvals"].dataType))
    for c in left_payload:
        rt = rt.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    lt = lt.select(*on, "_ts", "_side", "_rvals", *left_payload, F.col(left_ts))
    rt = rt.withColumn(left_ts, F.lit(None).cast(left.schema[left_ts].dataType)).select(
        *on, "_ts", "_side", "_rvals", *left_payload, F.col(left_ts)
    )
    unioned = lt.unionByName(rt)

    # backward: right rows sort before left rows at equal ts => "at or
    # before"; forward mirrors it on descending time => "at or after".
    # Nulls FIRST in both directions so a NULL-ts left row sees no right
    # row in its preceding frame (desc defaults to nulls LAST, which
    # would carry the earliest right row into it).
    order = (
        F.col("_ts").asc_nulls_first()
        if direction == "backward"
        else F.col("_ts").desc_nulls_first()
    )
    w = Window.partitionBy(*on).orderBy(order, F.col("_side").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    filled = unioned.select(
        *on,
        "_side",
        *left_payload,
        F.col(left_ts),
        F.last(F.col("_rvals"), ignorenulls=True).over(w).alias("_rvals"),
    )
    return filled.filter(F.col("_side") == 1).select(
        *on,
        *left_payload,
        F.col(left_ts),
        # getField, not a dotted path string (dotted field names parse
        # wrong — same class as the r11 flatten_structs fix)
        *[F.col("_rvals").getField(c).alias(c) for c in value_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_point: str,
    right_start: str,
    right_end: str,
    how: str = "inner",
) -> DataFrame:
    """Interval containment join: left.point in [right.start, right.end).

    The equi-key prefix keeps it a shuffled hash join with a residual
    range predicate. Without keys, pre-bucket the point/interval into
    coarse bins and join on bin (caller's responsibility at 100 TB).
    """
    cond = None
    for k in on:
        c = left[k] == right[k]
        cond = c if cond is None else (cond & c)
    rng = (left[left_point] >= right[right_start]) & (left[left_point] < right[right_end])
    cond = rng if cond is None else (cond & rng)
    return left.join(right, cond, how)


def binned_range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_start: str,
    right_end: str,
    bin_width: float,
    on: list[str] | None = None,
) -> DataFrame:
    """Keyless interval join made shuffleable: quantize the number line
    into ``bin_width`` bins, explode each interval over the bins it
    overlaps, equi-join the point's single bin, then apply the exact
    range residual.

    Turns the nested-loop cross product into a hash join whose fan-out is
    interval_span/bin_width rows per interval — pick ``bin_width`` near
    the typical interval length so the explode factor stays ~1-2. Each
    (point, interval) match appears exactly once because a point falls in
    exactly one bin. Point/start/end must be numeric (cast timestamps to
    epoch seconds first).
    """
    on = on or []
    l_binned = left.withColumn(
        "_bin", F.floor(F.col(left_point) / F.lit(bin_width)).cast("long")
    )
    r_binned = (
        right.withColumn(
            "_bin",
            F.explode(
                F.sequence(
                    F.floor(F.col(right_start) / F.lit(bin_width)).cast("long"),
                    F.floor(F.col(right_end) / F.lit(bin_width)).cast("long"),
                )
            ),
        )
    )
    joined = l_binned.join(r_binned, [*on, "_bin"])
    residual = (F.col(left_point) >= F.col(right_start)) & (
        F.col(left_point) < F.col(right_end)
    )
    return joined.filter(residual).drop("_bin")
