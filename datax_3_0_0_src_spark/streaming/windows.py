"""Streaming windowed aggregation + custom stateful operators.

Two Structured-Streaming capabilities the batch engine's users need on live
tails (SURVEY §2.6; reference parity: otsstreamreader consumes a change tail
continuously, RecordProcessor.java:137-248 — aggregation/session semantics on
that tail are what a warehouse does downstream):

- ``minutely_counts_stream``: event-time tumbling window + watermark, so late
  events (bounded by the watermark) still land in their window and state is
  evicted deterministically. This is the streaming twin of the batch
  ``events_minutely`` query.
- ``sessionize_stream``: a CUSTOM stateful operator via
  ``applyInPandasWithState`` (Arrow-batched, no per-row Python): 30-minute
  inactivity sessionization keyed by user, state carrying the open session
  across micro-batches; emits updated sessions each batch (update mode). The
  streaming twin of the batch ``events_sessionize`` query — a single
  availableNow pass produces exactly the batch result (tested).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

EVENTS_DDL = ("event_id long, user_id long, ts timestamp, "
              "event_type string, value double, props string")


def minutely_counts_stream(
    spark: SparkSession,
    events_dir: str,
    *,
    schema_ddl: str = EVENTS_DDL,
    watermark: str = "10 minutes",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Tumbling 1-minute counts per event_type with a late-data watermark."""
    reader = spark.readStream.schema(schema_ddl)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    ev = reader.parquet(events_dir)
    return (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 minute").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(F.col("w.start").alias("minute"), "event_type", "n", "total_value")
    )


MINUTELY_OUT_DDL = "minute timestamp, event_type string, n long, total_value double"
MINUTELY_STATE_DDL = "n long, total double"


def _strict_minutely_fn(key, pdf_iter, state):
    """Per-(minute, event_type) windowed aggregator with a STRICT late-data
    policy: rows whose window end <= the current watermark are dropped, rows
    inside it merge into the window state. Spark's built-in windowed
    aggregation only guarantees the POSITIVE side (within-watermark data is
    never lost); beyond-watermark rows may still be aggregated and emitted
    (observed on 4.1: a late row recreates evicted state and append mode
    emits the stale window). A CDC pipeline needs the drop to be
    deterministic, so this operator enforces it itself — the current
    watermark is visible to user code only through GroupState, which is why
    this is an applyInPandasWithState operator and not a groupBy().agg()."""
    minute, event_type = key
    wm_ms = state.getCurrentWatermarkMs()
    # key datetimes are naive UTC (session TZ is pinned UTC in session.py)
    window_end_ms = int(pd.Timestamp(minute).tz_localize("UTC").timestamp() * 1000) + 60_000
    if state.hasTimedOut or (wm_ms and window_end_ms <= wm_ms):
        # window already finalized: drop late input, expire the state
        for _ in pdf_iter:
            pass
        if state.exists:
            state.remove()
        return
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
    state.update((n, total))
    # expire the state once the watermark passes the window end
    state.setTimeoutTimestamp(int(window_end_ms))
    yield pd.DataFrame(
        [(minute, event_type, n, round(total, 4))],
        columns=["minute", "event_type", "n", "total_value"],
    )


def minutely_counts_strict_stream(
    spark: SparkSession,
    events_dir: str,
    *,
    schema_ddl: str = EVENTS_DDL,
    watermark: str = "10 minutes",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Tumbling 1-minute counts with a DETERMINISTIC late-data policy (see
    ``_strict_minutely_fn``): within-watermark late rows merge, beyond-
    watermark rows are dropped — both guaranteed, both oracle-tested."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    reader = spark.readStream.schema(schema_ddl)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    ev = reader.parquet(events_dir)
    return (
        ev.withWatermark("ts", watermark)
        .withColumn("minute", F.date_trunc("minute", F.col("ts")))
        .groupBy("minute", "event_type")
        .applyInPandasWithState(
            _strict_minutely_fn,
            outputStructType=MINUTELY_OUT_DDL,
            stateStructType=MINUTELY_STATE_DDL,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


SESSION_OUT_DDL = "user_id long, session_id long, n_events long, session_value double"
SESSION_STATE_DDL = "last_ts long, session_id long, n long, val double"
GAP_S = 1800


def _sessionize_fn(key, pdf_iter, state):
    """Per-user sessionizer: continue the open session from state, split on
    >30-min gaps, emit every session touched by this batch (update mode)."""
    (user_id,) = key
    if state.exists:
        last_ts, session_id, n, val = state.get
    else:
        last_ts, session_id, n, val = None, 0, 0, 0.0

    rows = []
    events = pd.concat(list(pdf_iter), ignore_index=True)
    events = events.sort_values(["ts", "event_id"])
    emitted: dict[int, tuple[int, float]] = {}
    for ts_val, v in zip(
        (events["ts"].astype("datetime64[us]").astype("int64") // 1_000_000),
        events["value"],
    ):
        if last_ts is None or ts_val - last_ts > GAP_S:
            session_id, n, val = session_id + 1, 0, 0.0
        n += 1
        val += float(v) if v == v else 0.0  # NaN-safe
        last_ts = int(ts_val)
        emitted[session_id] = (n, val)
    state.update((last_ts, session_id, n, val))
    for sid, (sn, sval) in emitted.items():
        rows.append((user_id, sid, sn, round(sval, 4)))
    yield pd.DataFrame(rows, columns=["user_id", "session_id", "n_events", "session_value"])


def _sessionize_evict_fn(timeout_s: int):
    """``_sessionize_fn`` with event-time state eviction: after updating, the
    state arms an event-time timeout at last_ts + timeout_s; when the
    watermark passes it the key's state is REMOVED — the open session was
    already emitted in update mode, so eviction loses no output, it bounds
    the state store (quiet keys would otherwise accumulate forever on an
    unbounded key space). A key reappearing after eviction starts a fresh
    session numbering (its gap necessarily exceeded the session gap, so the
    session SPLIT is correct; only the serial id restarts — downstream
    consumers needing globally unique session keys should key on
    (user_id, first emission) or use a start-ts-derived id)."""

    def fn(key, pdf_iter, state):
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(
                [], columns=["user_id", "session_id", "n_events", "session_value"])
            return
        out = list(_sessionize_fn(key, pdf_iter, state))
        last_ts = state.get[0]
        target_ms = (int(last_ts) + timeout_s) * 1000
        # a LATE key's last_ts + timeout can fall at/below the current
        # watermark, which Spark rejects at runtime — clamp to just past it
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(target_ms, wm_ms + 1))
        yield from out

    return fn


def sessionize_stream(
    spark: SparkSession,
    events_dir: str,
    *,
    schema_ddl: str = EVENTS_DDL,
    max_files_per_trigger: int | None = None,
    state_timeout_s: int | None = None,
    watermark_delay_s: int = 60,
) -> DataFrame:
    """30-minute-gap sessionization as a custom stateful streaming operator
    (``applyInPandasWithState``), keyed by user; state carries the open
    session across micro-batches. Event-time ordering within a user is
    guaranteed per-batch by sorting; cross-batch order relies on the source's
    epoch ordering (the WAL contract).

    ``state_timeout_s`` bounds the state store: a watermark is attached
    (``watermark_delay_s``) and each key's state is evicted once the
    watermark passes last_ts + state_timeout_s (see _sessionize_evict_fn).
    Without it state grows with the distinct-key count forever — fine for a
    bounded key space, wrong for an unbounded one."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    if state_timeout_s is not None and state_timeout_s < GAP_S:
        # eviction before the gap elapses would wrongly SPLIT a session for
        # a key that reappears within the 30-min gap (the eviction-is-safe
        # argument requires the evicted key's silence to exceed the gap)
        raise ValueError(
            f"state_timeout_s={state_timeout_s} must be >= session gap "
            f"{GAP_S}s: earlier eviction splits still-open sessions")
    reader = spark.readStream.schema(schema_ddl)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    ev = reader.parquet(events_dir)
    if state_timeout_s is not None:
        return (
            ev.withWatermark("ts", f"{watermark_delay_s} seconds")
            .groupBy("user_id")
            .applyInPandasWithState(
                _sessionize_evict_fn(state_timeout_s),
                outputStructType=SESSION_OUT_DDL,
                stateStructType=SESSION_STATE_DDL,
                outputMode="update",
                timeoutConf=GroupStateTimeout.EventTimeTimeout,
            )
        )
    return (
        ev.groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn,
            outputStructType=SESSION_OUT_DDL,
            stateStructType=SESSION_STATE_DDL,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
