"""Structured Streaming surface (SURVEY §2.8): file-source stream over
the events table, windowed aggs + watermark + dedup, checked against the
batch twins."""

from __future__ import annotations

import shutil
import time

import pyspark.sql.functions as F
import pytest

from labelspark_spark.sources import read_table
from labelspark_spark.streaming import events as se

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    """File-source streams need a DIRECTORY; stage the events parquet."""
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF_SMOKE}/events.parquet", d / "part-0.parquet")
    return str(d)


def _await(query, name, spark, expected_rows, timeout=60):
    deadline = time.time() + timeout
    while time.time() < deadline:
        query.processAllAvailable()
        n = spark.sql(f"SELECT count(*) FROM {name}").collect()[0][0]
        if n >= expected_rows:
            break
        time.sleep(0.5)
    query.stop()


def test_tumbling_stream_matches_batch(spark, events_dir):
    batch_events = read_table(spark, SF_SMOKE, "events")
    batch = se.tumbling_counts(batch_events).collect()
    expected = {(r.window_start, r.window_end, r.event_type): r.n_events for r in batch}

    from labelspark_spark.queries import _normalize_ts

    stream = _normalize_ts(se.read_events_stream(spark, events_dir))
    q = se.write_stream_to_memory(
        se.tumbling_counts(stream), "tumbling_out", mode="append"
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.window_start, r.window_end, r.event_type): r.n_events
        for r in spark.sql("SELECT * FROM tumbling_out").collect()
    }
    # append mode only emits windows the watermark has closed; every
    # emitted window must match its batch twin, and most windows close
    assert got, "no windows emitted"
    for k, v in got.items():
        assert expected[k] == v
    assert len(got) >= len(expected) - 3


def test_streaming_dedup(spark, events_dir):
    from labelspark_spark.queries import _normalize_ts

    stream = _normalize_ts(se.read_events_stream(spark, events_dir))
    doubled = stream.union(stream)  # duplicate every event
    q = se.write_stream_to_memory(
        se.streaming_dedup(doubled, keys=["event_id"]), "dedup_out", mode="append"
    )
    q.processAllAvailable()
    q.stop()
    n = spark.sql("SELECT count(*) FROM dedup_out").collect()[0][0]
    total = read_table(spark, SF_SMOKE, "events").count()
    assert n == total


def test_session_windows_batch(spark):
    ev = read_table(spark, SF_SMOKE, "events")
    out = se.session_windows(ev).collect()
    assert out
    # session invariant: end = last event + gap => end > start
    assert all(r.session_end > r.session_start for r in out)


def test_sliding_counts_batch(spark):
    ev = read_table(spark, SF_SMOKE, "events")
    rows = se.sliding_counts(ev, "1 hour", "30 minutes").collect()
    # every event lands in 2 sliding windows
    assert sum(r.n_events for r in rows) == 2 * ev.count()


def test_watermark_drops_late_events(spark, tmp_path):
    """Append-mode windowed agg: an event arriving behind the watermark
    must not resurrect or change an already-closed window."""
    src = tmp_path / "late_src"
    src.mkdir()

    def write_file(rows, name):
        df = spark.createDataFrame(rows, "ts string, event_type string, value double").select(
            F.to_timestamp("ts").alias("ts"), "event_type", "value"
        )
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / name))
        # move the single part file into the streaming source dir
        import glob as g, shutil as sh

        part = g.glob(str(tmp_path / name / "part-*.parquet"))[0]
        sh.copy(part, src / f"{name}.parquet")

    write_file(
        [("2025-01-01 10:05:00", "click", 1.0), ("2025-01-01 11:55:00", "click", 1.0)],
        "f1",
    )
    stream = spark.readStream.schema("ts timestamp, event_type string, value double").option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src))
    out = se.tumbling_counts(stream, window_size="1 hour", watermark="30 minutes")
    q = out.writeStream.format("memory").queryName("late_test").outputMode("append").start()
    try:
        q.processAllAvailable()  # watermark -> 11:25; window 10:00 closes with n=1
        write_file(
            [
                ("2025-01-01 10:10:00", "click", 1.0),  # LATE: behind 11:25 watermark
                ("2025-01-01 12:40:00", "click", 1.0),  # on time; advances watermark
            ],
            "f2",
        )
        q.processAllAvailable()  # closes window 11:00 with n=1; late row dropped
        rows = {
            r.window_start.strftime("%H:%M"): r.n_events
            for r in spark.sql("SELECT * FROM late_test").collect()
        }
        assert rows.get("10:00") == 1, f"late event leaked into closed window: {rows}"
        assert rows.get("11:00") == 1, rows
    finally:
        q.stop()


def test_normalize_ts_covers_all_physical_event_types(spark):
    """The driver's testdata builds have shipped events.ts as
    TIMESTAMP(NANOS) (reads as bigint under nanosAsLong) AND as
    TIMESTAMP_NTZ(us) (rejected by EventTimeWatermark unless cast):
    _normalize_ts must land every variant on plain TIMESTAMP with the
    same wall-clock values."""
    import datetime

    from labelspark_spark.queries import _normalize_ts

    wall = datetime.datetime(2025, 1, 1, 10, 30, 0, 123456)
    nanos = int(wall.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000) * 1000

    as_long = spark.createDataFrame([(nanos,)], "ts bigint")
    as_ntz = spark.sql(f"SELECT TIMESTAMP_NTZ'{wall}' AS ts")
    as_ts = spark.sql(f"SELECT TIMESTAMP'{wall}' AS ts")

    for df in (as_long, as_ntz, as_ts):
        out = _normalize_ts(df)
        assert dict(out.dtypes)["ts"] == "timestamp", out.dtypes
        got = out.first().ts
        assert got.replace(tzinfo=None) == wall, (df.dtypes, got)


def test_stream_static_enrichment_join(spark, events_dir):
    """§2.8 completion: a streaming fact joined against a static
    broadcastable dimension (the standard streaming-enrichment shape —
    the static side is re-read per micro-batch, never shuffled against
    the stream). Every event must land exactly once with its dim row."""
    from labelspark_spark.queries import _normalize_ts

    stream = _normalize_ts(se.read_events_stream(spark, events_dir))
    users = (
        read_table(spark, SF_SMOKE, "events")
        .select("user_id").distinct()
        .withColumn("segment", F.concat(F.lit("seg"), F.pmod("user_id", F.lit(3))))
    )
    enriched = stream.join(F.broadcast(users), "user_id")
    q = se.write_stream_to_memory(
        enriched.groupBy("segment").agg(F.count(F.lit(1)).alias("n")),
        "enrich_out",
        mode="complete",
    )
    q.processAllAvailable()
    q.stop()
    got = {r.segment: r.n for r in spark.sql("SELECT * FROM enrich_out").collect()}
    batch = (
        read_table(spark, SF_SMOKE, "events")
        .withColumn("segment", F.concat(F.lit("seg"), F.pmod("user_id", F.lit(3))))
        .groupBy("segment").agg(F.count(F.lit(1)).alias("n"))
    )
    expect = {r.segment: r.n for r in batch.collect()}
    assert got == expect


def test_transform_with_state_gate(spark):
    """transformWithStateInPandas (state v2) is environment-gated on
    google.protobuf (its Python<->JVM state protocol): without it the
    TWS driver worker crashes opaquely in PRE_INIT, so the query must
    fail FAST with a legible NotImplementedError and must NOT appear in
    the declared registry (a guaranteed-red driver row). Where protobuf
    exists, the replay must hash-match its batch oracle instead."""
    import pytest

    from labelspark_spark.queries import (
        REGISTRY,
        SQL_EVENTS_STREAM_TWS,
        _has_protobuf,
        q_events_stream_tws,
    )

    if not _has_protobuf():
        assert "events_stream_tws" not in REGISTRY
        with pytest.raises(NotImplementedError, match="protobuf"):
            q_events_stream_tws(spark, SF_SMOKE)
    else:
        assert "events_stream_tws" in REGISTRY
        import duckdb

        from .oracle_util import compare, register_views

        con = duckdb.connect()
        register_views(con, SF_SMOKE)
        r = compare(q_events_stream_tws(spark, SF_SMOKE), con, SQL_EVENTS_STREAM_TWS)
        assert r["values_match"], r


def test_trigger_available_now_bounded_multi_batch(spark, tmp_path):
    """Trigger.AvailableNow (the production backfill trigger): processes
    everything available at start across MULTIPLE rate-limited
    micro-batches (maxFilesPerTrigger=1 is honored, unlike the legacy
    Trigger.Once), then stops ON ITS OWN — no processAllAvailable babysitting.
    Three staged file copies must yield >= 3 batches and exactly tripled
    per-user counts."""
    import shutil

    from labelspark_spark.queries import _normalize_ts
    from labelspark_spark.sources import read_table

    d = tmp_path / "avnow_src"
    d.mkdir()
    for i in range(3):
        shutil.copy(f"{SF_SMOKE}/events.parquet", str(d / f"part-{i}.parquet"))
    stream = _normalize_ts(se.read_events_stream(spark, str(d)))
    agg = stream.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    q = (
        agg.writeStream.format("memory")
        .queryName("avnow_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "availableNow query did not self-terminate"
    n_batches = len(q.recentProgress)
    assert n_batches >= 3, f"expected >=3 rate-limited batches, got {n_batches}"
    got = {r.user_id: r.n for r in spark.sql("SELECT * FROM avnow_out").collect()}
    batch = (
        read_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg((3 * F.count(F.lit(1))).alias("n"))
    )
    expect = {r.user_id: r.n for r in batch.collect()}
    assert got == expect


def test_sessionize_very_late_events_form_earlier_sessions():
    # r12 ADVICE: a watermark-admitted event older than the open
    # session's start by MORE than the gap is an EARLIER session, not a
    # backward extension — the old unconditional min(start, t) fold
    # stretched one session across a silence wider than gap_ms. Pure
    # pandas-level check of the applyInPandasWithState fold.
    import pandas as pd

    from labelspark_spark.streaming.stateful import _make_session_fn

    class FakeState:
        hasTimedOut = False

        def __init__(self, tup):
            self._t = tup
            self.exists = tup is not None
            self.timeout = None

        @property
        def get(self):
            return self._t

        def update(self, t):
            self._t = t

        def setTimeoutTimestamp(self, ts):
            self.timeout = ts

    fn = _make_session_fn(gap_ms=1000)
    # open cross-batch session [10_000, 10_500], 2 events, 200 cents
    st = FakeState((10_000, 10_500, 2, 200))
    # 5_000/5_400: very late, within gap of each other -> ONE earlier
    # completed session (not two singletons, not a fold-in);
    # 9_600: within gap of start -> legitimate backward extension;
    # 10_800: within gap of last -> forward extension
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime([5_000, 5_400, 9_600, 10_800], unit="ms"),
            "event_id": [1, 2, 3, 4],
            "value": [1.0, 1.0, 1.0, 1.0],
        }
    )
    out = pd.concat(list(fn((7,), iter([pdf]), st)), ignore_index=True)
    assert len(out) == 1
    row = out.iloc[0]
    assert (row.session_start_ms, row.n_events, row.sum_value) == (5_000, 2, 2.0)
    # the open session extended to [9_600, 10_800] with 4 events
    assert st._t == (9_600, 10_800, 4, 400)
    assert st.timeout == 10_800 + 1000


def test_sessionize_very_late_prefix_is_chain_aware():
    # r13 ADVICE: the emit-now prefix boundary must account for
    # chain-merging — a row more than gap_ms below the ORIGINAL start
    # can still reach the open session through later in-batch rows that
    # each sit within gap_ms of the next (the min(start, t) fold
    # regresses start as they land). The old `t < start - gap_ms`
    # boundary emitted such a row as a spurious extra session.
    import pandas as pd

    from labelspark_spark.streaming.stateful import _make_session_fn

    class FakeState:
        hasTimedOut = False

        def __init__(self, tup):
            self._t = tup
            self.exists = tup is not None
            self.timeout = None

        @property
        def get(self):
            return self._t

        def update(self, t):
            self._t = t

        def setTimeoutTimestamp(self, ts):
            self.timeout = ts

    fn = _make_session_fn(gap_ms=1000)

    def run(state_tup, times_ms):
        st = FakeState(state_tup)
        pdf = pd.DataFrame(
            {
                "ts": pd.to_datetime(times_ms, unit="ms"),
                "event_id": list(range(len(times_ms))),
                "value": [1.0] * len(times_ms),
            }
        )
        out = list(fn((7,), iter([pdf]), st))
        out = pd.concat(out, ignore_index=True) if out else pd.DataFrame()
        return out, st

    # The ADVICE example: 8_900 is 1_100 below start (beyond the gap)
    # but chains through 9_600 — a full replay folds BOTH into the open
    # session; nothing may be emitted.
    out, st = run((10_000, 10_500, 2, 200), [8_900, 9_600])
    assert len(out) == 0, f"spurious emitted session(s): {out}"
    assert st._t == (8_900, 10_500, 4, 400)
    assert st.timeout == 10_500 + 1000
    # Chain break: 7_000 -> 8_900 is a 1_900 silence, so 7_000 alone is
    # the completed earlier session; 8_900/9_600 still fold in.
    out, st = run((10_000, 10_500, 2, 200), [7_000, 8_900, 9_600])
    assert len(out) == 1
    row = out.iloc[0]
    assert (row.session_start_ms, row.n_events, row.sum_value) == (7_000, 1, 1.0)
    assert st._t == (8_900, 10_500, 4, 400)
    assert st.timeout == 10_500 + 1000
