"""Event-stream operators over the (event_id, ts, user_id, event_type,
value, props) events table: gap-based sessionization and per-session
rollups — the transcript/clickstream preprocessing shape every
training-data pipeline needs before per-session sampling or packing.

Scale posture: both operators are windows PARTITIONED BY user_id — no
global ordering anywhere, so the shuffle is one hash exchange on user_id
and each task sorts only its users' rows.  At 100 TB the same plan holds:
per-user event counts bound task memory (the worst real-world user is
millions of events, far under task limits), and a bucketed-by-user layout
makes the exchange vanish entirely.  Everything is built-in expressions —
whole-stage codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _epoch_sec(ts):
    """Epoch seconds (floored) from a timestamp column, timezone-free:
    NTZ minus the NTZ epoch literal is an interval whose long cast
    truncates to whole seconds — Spark 4 forbids a direct
    TIMESTAMP_NTZ -> BIGINT cast, and unix_timestamp() would drag the
    session timezone into an otherwise naive column."""
    return (ts.cast("timestamp_ntz")
            - F.to_timestamp_ntz(F.lit("1970-01-01 00:00:00"))).cast("long")


def sessionize_events(events: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """Assign a per-user session index: a new session starts when the gap
    to the previous event exceeds ``gap_sec`` seconds.

    Returns every event row tagged with ``session_idx`` (1-based, in ts
    order within the user).  Deterministic tie-break on event_id for
    equal timestamps.
    """
    # order by the FLOORED second (the same granularity the gap test
    # uses), not the raw microsecond timestamp: rows inside one second
    # are session-equivalent anyway, and the (second, event_id) order is
    # engine-portable (a SQL oracle replays it without microsecond
    # timestamp semantics)
    ts_sec = _epoch_sec(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(ts_sec, "event_id")
    gap = ts_sec - F.lag(ts_sec).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_sec), 1).otherwise(0)
    run = Window.partitionBy("user_id").orderBy(ts_sec, "event_id") \
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.select(
        "event_id", "user_id", "event_type", "ts", "value",
        F.sum(is_new).over(run).alias("session_idx"),
    )


def session_stats(events: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """Per-session rollup: event count, start epoch, span seconds, total
    value.  One additional hash aggregation on (user_id, session_idx) —
    same partitioning key prefix as the sessionize window, so with a
    user-bucketed layout the whole operator is exchange-free."""
    s = sessionize_events(events, gap_sec=gap_sec)
    ts_sec = _epoch_sec(F.col("ts"))
    return (
        s.groupBy("user_id", "session_idx")
        .agg(F.count("*").alias("n_events"),
             F.min(ts_sec).alias("start_sec"),
             (F.max(ts_sec) - F.min(ts_sec)).alias("span_sec"),
             F.round(F.sum("value"), 4).alias("total_value"))
    )
