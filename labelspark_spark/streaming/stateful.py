"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY §2.8: the extension point for semantics windows can't express).

Example operator: per-user running session stats — event count, value
sum, and last-seen timestamp — maintained as explicit state with an
idle timeout. Arrow-batched (never row-pickled), keyed state partitioned
by user, and the state size is O(keys), not O(events), so it holds at
stream scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# sum held as exact integer cents: accumulating doubles across
# micro-batches is arrival-order-dependent (partial-sum rounding), so the
# emitted sum would be replay-nondeterministic; bigint cents folded in any
# order give the identical total, divided once at emit time.
STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sum_cents", LongType()),
        StructField("last_ts_micros", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("status", StringType()),
    ]
)


def _make_update_fn(idle_timeout_ms: int | None):
    def _update_user_state(key, pdfs, state: GroupState):
        """Fold a micro-batch of one user's events into running state.

        Emits one row per update; on idle timeout emits a final 'expired'
        row and drops the state.
        """
        import numpy as np
        import pandas as pd

        (user_id,) = key
        if state.hasTimedOut:
            n, cents, _ = state.get
            state.remove()
            yield pd.DataFrame(
                [{"user_id": user_id, "n_events": n, "sum_value": cents / 100.0, "status": "expired"}]
            )
            return

        n, cents, last_ts = state.get if state.exists else (0, 0, 0)
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                # floor(x*100 + 0.5): same cents shape as queries._money
                cents += int(
                    np.floor(pdf["value"].to_numpy() * 100 + 0.5).astype("int64").sum()
                )
                # explicit micros via a dtype cast, NOT int64//1000:
                # pandas may deliver datetime64[ns] or [us] depending
                # on the Arrow path, and the raw int64 view of [us]
                # divided by 1000 would store milliseconds (1000x off)
                # — the same hazard _sessionize normalizes against
                last_ts = max(
                    last_ts,
                    int(
                        pdf["ts"]
                        .to_numpy()
                        .astype("datetime64[us]")
                        .astype("int64")
                        .max()
                    ),
                )
        state.update((n, cents, last_ts))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            [{"user_id": user_id, "n_events": n, "sum_value": cents / 100.0, "status": "active"}]
        )

    return _update_user_state


def user_session_stats(
    events: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Stateful per-user stream aggregation, optional idle expiry.

    Input needs columns (user_id, ts, value); works only on streaming
    DataFrames (group state requires a streaming query).

    ``idle_timeout_ms=None`` uses NoTimeout: the query quiesces once the
    source is drained (processAllAvailable terminates — the right mode
    for bounded replays/tests). With a timeout, registered processing-time
    timers keep scheduling state-cleanup micro-batches until every key
    expires, so drive it with a real trigger loop, not processAllAvailable.
    """
    timeout = (
        GroupStateTimeout.NoTimeout
        if idle_timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_update_fn(idle_timeout_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )


SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_ms", LongType()),
        StructField("last_ms", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_cents", LongType()),
    ]
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_ms", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


def _make_session_fn(gap_ms: int):
    def _sessionize(key, pdfs, state: GroupState):
        """Gap-based sessionizer with EVENT-TIME timeout.

        In-batch gaps close sessions immediately; the session left open
        at batch end registers an event-time timer at last_ms + gap_ms,
        so the WATERMARK — not wall clock — flushes it (the semantics a
        replay can reproduce; a processing-time timer cannot). Rows are
        folded in (ts, event_id) order: a micro-batch delivers one
        user's rows unordered."""
        import numpy as np
        import pandas as pd

        (user_id,) = key
        if state.hasTimedOut:
            start, last, n, cents = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "user_id": user_id,
                        "session_start_ms": start,
                        "n_events": n,
                        "sum_value": cents / 100.0,
                    }
                ]
            )
            return

        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        # explicit ms conversion: pandas may deliver datetime64[ns] or
        # [us] depending on the Arrow path — a raw int64 view would be
        # off by 1000x on one of them
        ms = pdf["ts"].to_numpy().astype("datetime64[ms]").astype("int64")
        cents_arr = np.floor(pdf["value"].to_numpy() * 100 + 0.5).astype("int64")

        start, last, n, cents = (
            state.get if state.exists else (None, None, 0, 0)
        )
        out = []

        def _emit(s, k, cts):
            out.append(
                {
                    "user_id": user_id,
                    "session_start_ms": s,
                    "n_events": k,
                    "sum_value": cts / 100.0,
                }
            )

        # Watermark-admitted rows older than the open session's start
        # by MORE than the gap are EARLIER sessions, not extensions
        # (r12 ADVICE — the old unconditional min(start, t) fold
        # stretched one session across a silence wider than gap_ms).
        # The batch is sorted, so they form a prefix; gap-fold that
        # prefix into its own completed session(s) emitted now.
        # The boundary must be CHAIN-AWARE (r13 ADVICE): a row more
        # than gap_ms below the original `start` can still reach the
        # open session through later in-batch rows that each sit
        # within gap_ms of the next — the min(start, t) fold regresses
        # `start` as they land. So scan the sorted sub-`start` rows
        # BACKWARD from `start`, extending the reachable set while
        # each step is <= gap_ms; only rows before the earliest
        # chain-connected event are the emit-now prefix.
        # (Approximation: a very-late event in a LATER batch within
        # gap of one emitted here becomes its own session where a
        # full replay would have merged them — the closed session is
        # not reopened.)
        i = 0
        if start is not None:
            below = int(np.searchsorted(ms, start, side="left"))
            j = below - 1
            anchor = start
            while j >= 0 and anchor - int(ms[j]) <= gap_ms:
                anchor = int(ms[j])
                j -= 1
            ls = ll = ln = lc = None
            while i <= j:
                t, c = int(ms[i]), int(cents_arr[i])
                if ls is None:
                    ls, ll, ln, lc = t, t, 1, c
                elif t - ll > gap_ms:
                    _emit(ls, ln, lc)
                    ls, ll, ln, lc = t, t, 1, c
                else:
                    ll, ln, lc = t, ln + 1, lc + c
                i += 1
            if ls is not None:
                _emit(ls, ln, lc)

        for i in range(i, len(pdf)):
            t = int(ms[i])
            c = int(cents_arr[i])
            if start is None:
                start, last, n, cents = t, t, 1, c
            elif t - last > gap_ms:
                _emit(start, n, cents)
                start, last, n, cents = t, t, 1, c
            else:
                # fold into the open session WITHOUT regressing its
                # edges: cross-batch arrivals may be out of order (the
                # watermark permits it), and `last = t` on an older
                # event would corrupt the next gap check (spurious
                # split) and could set the event-time timer below the
                # current watermark (query crash). In-batch rows are
                # sorted, so only cross-batch input within the gap of
                # [start, last] hits this.
                start, last = min(start, t), max(last, t)
                n, cents = n + 1, cents + c
        state.update((start, last, n, cents))
        # the open session flushes when the WATERMARK passes its gap edge
        state.setTimeoutTimestamp(last + gap_ms)
        if out:
            yield pd.DataFrame(out)

    return _sessionize


TWS_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


def type_profile_tws(events: DataFrame) -> DataFrame:
    """Per-user per-event-type running profile through Spark 4's
    `transformWithStateInPandas` — the modern typed-state API
    (SPARK-46815 "state v2") succeeding applyInPandasWithState. Where
    the old API holds ONE tuple per key, this keeps a composite
    MapState (event_type -> counts) under the grouping key, letting a
    single keyed operator maintain per-sub-key state without folding
    the sub-key into the shuffle key. State is O(users x types); the
    per-type sums are exact integer cents (double accumulation across
    micro-batches is arrival-order-nondeterministic), divided once at
    emit. Emits the UPDATED (user, type) rows each micro-batch; the
    caller takes max(n_events) per pair for the final state.

    Requires the RocksDB state store provider (the caller sets
    `spark.sql.streaming.stateStore.providerClass`); timeMode='None'
    keeps the replay bounded (no timers -> processAllAvailable
    terminates — the same discipline as NoTimeout on the old API)."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class _TypeProfile(StatefulProcessor):
        def init(self, handle):
            self._counts = handle.getMapState(
                "counts", "event_type string", "n bigint, cents bigint"
            )

        def handleInputRows(self, key, rows, timerValues):
            import numpy as np
            import pandas as pd

            (user_id,) = key
            agg: dict = {}
            for pdf in rows:
                if not len(pdf):
                    continue
                cents = np.floor(pdf["value"].to_numpy() * 100 + 0.5).astype("int64")
                # one aggregation pass (count+sum together), not three
                g = (
                    pd.DataFrame({"t": pdf["event_type"].to_numpy(), "c": cents})
                    .groupby("t")["c"]
                    .agg(["count", "sum"])
                )
                for t, row in g.iterrows():
                    pn, pc = agg.get(t, (0, 0))
                    agg[t] = (pn + int(row["count"]), pc + int(row["sum"]))
            out = []
            for t, (n, c) in agg.items():
                if self._counts.containsKey((t,)):
                    pn, pc = self._counts.getValue((t,))
                    n, c = n + pn, c + pc
                self._counts.updateValue((t,), (n, c))
                out.append(
                    {
                        "user_id": user_id,
                        "event_type": t,
                        "n_events": n,
                        "sum_value": c / 100.0,
                    }
                )
            yield pd.DataFrame(out)

        def close(self):
            pass

    return (
        events.select("user_id", "event_type", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_TypeProfile(),
            outputStructType=TWS_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


def sessionize_event_time(events: DataFrame, gap_ms: int = 6 * 3600 * 1000) -> DataFrame:
    """Gap-sessionization as a CUSTOM stateful operator with event-time
    timeout — what `F.session_window` does built-in, re-expressed
    through applyInPandasWithState so arbitrary per-session logic can
    ride along. Input must be watermarked (event-time timers require
    it); emits one row per closed session."""
    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_session_fn(gap_ms),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
