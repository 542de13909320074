"""Event-stream operators over the (event_id, ts, user_id, event_type,
value, props) events table: gap-based sessionization, per-session
rollups, and a keyed as-of join — the transcript/clickstream
preprocessing shapes every training-data pipeline needs before
per-session sampling or packing.

Scale posture: every operator here is a window PARTITIONED BY the entity
key (user_id / the ``by`` columns) — no global ordering anywhere, so the
shuffle is one hash exchange on the key and each task sorts only its
keys' rows.  At 100 TB the same plan holds: per-key event counts bound
task memory (the worst real-world user is millions of events, far under
task limits), and a bucketed-by-key layout makes the exchange vanish
entirely.  Everything is built-in expressions — whole-stage codegen, no
Python.  The as-of join in particular is deliberately NOT a range
θ-join: a range join materializes O(|L|·|R| within tolerance) candidate
pairs per key before picking the nearest, which explodes on hot keys;
the union+window form is O((|L|+|R|) log) per key with exactly one pass.
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


def asof_join(left: DataFrame, right: DataFrame, on: str = "t",
              by: tuple[str, ...] = ("user_id",),
              direction: str = "backward",
              tolerance: int | None = None,
              suffix: str = "_r") -> DataFrame:
    """Keyed as-of join: for every left row, attach the single nearest
    right row with right.``on`` <= left.``on`` (``backward``; ``forward``
    flips the inequality) within the same ``by`` key, optionally within
    ``tolerance`` units, else NULLs.  The operator Spark famously lacks
    (pandas merge_asof / DuckDB ASOF JOIN / kdb aj).

    ``on`` must be a numeric (orderable, subtractable) column present in
    both sides; ``right`` must be unique per (by, on) — pre-aggregate
    duplicates first, otherwise "the" as-of match is ill-defined (this
    mirrors merge_asof's allow_exact_matches=True with unique right
    keys).  Right payload columns are suffixed with ``suffix``; the match
    timestamp comes back as ``{on}{suffix}``.

    Implementation: tag both sides, UNION, one window per ``by`` key
    ordered by (on, side) with last(non-null right payload) — right rows
    sort before left rows at equal ``on``, so exact matches are taken.
    One hash exchange on ``by``, one per-key sort, zero candidate-pair
    blowup (see module header vs range-join).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    by = list(by)
    sign = -1 if direction == "forward" else 1
    ord_t = (F.col(on) * sign).alias("_ord")
    rpay = [c for c in right.columns if c not in by]
    l_tagged = left.select(*by, ord_t, F.lit(1).alias("_side"),
                           F.struct(*left.columns).alias("_lv"),
                           F.lit(None).cast(
                               right.select(F.struct(*rpay).alias("s"))
                               .schema["s"].dataType.simpleString()).alias("_rv"))
    r_tagged = right.select(*by, ord_t, F.lit(0).alias("_side"),
                            F.lit(None).cast(
                                left.select(F.struct(*left.columns).alias("s"))
                                .schema["s"].dataType.simpleString()).alias("_lv"),
                            F.struct(*rpay).alias("_rv"))
    w = (Window.partitionBy(*by).orderBy("_ord", "_side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = (l_tagged.unionByName(r_tagged)
               .withColumn("_m", F.last("_rv", ignorenulls=True).over(w))
               .filter(F.col("_side") == 1))
    if tolerance is not None:
        in_tol = F.abs(F.col(f"_lv.{on}") - F.col(f"_m.{on}")) <= tolerance
        matched = matched.withColumn(
            "_m", F.when(in_tol, F.col("_m")).otherwise(F.lit(None)))
    out_left = [F.col(f"_lv.{c}").alias(c) for c in left.columns]
    out_right = [F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in rpay]
    return matched.select(*out_left, *out_right)
