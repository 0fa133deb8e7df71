"""Event-analytics operators the reference lacks (SURVEY §2 widening,
round 5): funnel analysis, cohort retention, last-touch attribution.

These are the classic product/event-analytics verbs a warehouse user
expects from an engine that already does sessionization
(queries.py:q_events_sessionize) — each is expressed as a declarative
DataFrame plan so Catalyst handles pushdown/broadcast, and each avoids
the naive per-user nested-loop formulations:

- :func:`funnel_depth` — greedy ordered-subsequence match over the
  per-user time-sorted event array: ONE shuffle of the funnel-filtered
  events (the naive formulation is k chained join+min passes = k
  shuffles of the same rows).
- :func:`cohort_retention` — first-touch cohort x activity-period
  matrix; the (user, period) distinct happens BEFORE the cohort join so
  the join input is pre-shrunk to at most users x active-periods.

Reference parity anchor: the reference has no event analytics at all
(labelspark is ETL-only, client.py:38-81); these extend §2.9's
declared-query surface the same way the dedup/ANN families do.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_depth(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user funnel depth: the longest prefix of ``steps`` that occurs
    as a strictly time-ordered subsequence of the user's events.

    Greedy earliest-match over the time-sorted event list is optimal for
    fixed-pattern subsequence matching, and is exactly equivalent to the
    chained-min formulation (t1 = min ts of step1; t_k = min ts of
    step_k with ts > t_{k-1}) when timestamps are unique per user — the
    oracle SQL uses the chained form, this uses the one-shuffle form.

    Scale shape: filter to the |steps| relevant event types FIRST (the
    funnel types are typically a small fraction of the firehose), then a
    single groupBy(user) with sort_array(collect_list(...)) and a
    higher-order F.aggregate fold — all JVM codegen, no Python, no
    window. The per-user array is bounded by that user's funnel-type
    event count; a pathological single user with 10^8 funnel events
    would need salting, which is the same caveat sessionization has.
    """
    step_arr = F.array(*[F.lit(s) for s in steps])
    f = events.filter(F.col(type_col).isin(list(steps))).select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        # first-occurrence index, used ONLY as the equal-ts tiebreak
        # (earlier funnel position sorts first — the pre-r12 order)
        (F.array_position(step_arr, F.col(type_col)) - 1).cast("int").alias("step"),
        F.col(type_col).alias("et"),
    )
    seq = f.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("ts", "step", "et"))).alias("seq")
    )
    # fold: acc = number of funnel steps completed so far; an event
    # advances the funnel iff its TYPE equals the next needed step.
    # Comparing against element_at(steps, acc+1) — NOT a precomputed
    # array_position index — keeps funnels with a REPEATED step
    # (A -> B -> A) matchable: array_position maps every 'A' event to
    # the first occurrence, so the repeated third step could never be
    # reached (r12 review). try_element_at: once the funnel completes,
    # acc+1 runs past the pattern and must yield NULL (never advance),
    # not an ANSI out-of-bounds error.
    depth = F.aggregate(
        F.col("seq"),
        F.lit(0),
        lambda acc, x: F.when(
            x["et"] == F.try_element_at(step_arr, acc + F.lit(1)), acc + F.lit(1)
        ).otherwise(acc),
    )
    return seq.select("user_id", depth.alias("depth"))


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Daily cohort retention: users bucketed by first-event date, counted
    distinct per (cohort_day, day_offset) of later activity.

    Columns: cohort_day STRING (ISO date — the registry's cross-engine
    date convention), day_offset INT, n_active BIGINT.

    Scale shape: the (user, activity-day) pairs are distinct-ed BEFORE
    joining the per-user cohort table, so the join carries at most
    |users| x |active days| rows, not the raw event count; both sides
    shuffle on user_id once and AQE handles skewed power users.
    """
    first = events.groupBy(F.col(user_col).alias("user_id")).agg(
        F.to_date(F.min(ts_col)).alias("cohort_day")
    )
    activity = events.select(
        F.col(user_col).alias("user_id"), F.to_date(ts_col).alias("act_day")
    ).distinct()
    return (
        activity.join(first, "user_id")
        .groupBy(
            F.col("cohort_day").cast("string").alias("cohort_day"),
            F.datediff("act_day", "cohort_day").cast("int").alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )
