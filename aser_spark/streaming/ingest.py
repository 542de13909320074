"""Structured Streaming ingest: incremental transcript -> KG extraction.

The reference is batch-only (multiprocessing over files,
/root/reference/aser/pipe/__init__.py:150-171) with a ZMQ serving layer;
it has no streaming semantics to replicate.  This module adds the natural
Spark-native extension the north rule's production story needs: transcripts
landing continuously are extracted incrementally into the SAME instance
staging layout the batch checkpointer uses, so the graph aggregation
(nodes/edges) can be refreshed from the union of batch + streamed instances
at any time.

* ``stream_extract_transcripts`` — file-source stream -> foreachBatch ->
  fused extraction -> IDEMPOTENT parquet sink: each micro-batch overwrites
  its own ``batch_id=`` partition (dynamic partition overwrite), so a
  replay after a mid-write failure REPLACES the partial output instead of
  appending duplicates — foreachBatch is only at-least-once by itself, and
  duplicated instance rows would permanently inflate node frequencies.
  Caveat (documented contract): conversations straddling micro-batches
  lose cross-batch adjacent-sentence relations; co-locate a conversation's
  files in one trigger (or run a periodic batch reconciliation) where that
  matters.
* ``streaming_turn_rates`` — watermarked tumbling-window aggregation
  (event-time ts, late data tolerated up to the watermark) as the
  monitoring-metric example of stateful streaming ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..datagen.transcripts import TRANSCRIPT_SCHEMA
from ..pipeline.extract import extract_graph_instances


def stream_extract_transcripts(spark, input_path: str, workdir: str,
                               available_now: bool = True,
                               mode: str = "seed"):
    """Start (and with available_now=True, run to completion) a streaming
    query that extracts graph instances from transcript parquet files as
    they land under ``input_path``.  ``mode`` selects the extraction
    kernel ('seed' | 'discourse'), same as the batch path.

    Like the batch checkpoint path, the workdir records its extraction
    mode (a ``_mode/<mode>`` marker via the Hadoop FS): restarting the
    stream over the same workdir with a different mode fails fast instead
    of appending rows from an incompatible kernel next to the committed
    ones (the streaming checkpoint would skip old files, silently mixing
    eid spaces)."""
    from ..pipeline.checkpoint import _delete, _exists, _list_names, _mkdirs

    marker_dir = f"{workdir}/_mode"
    existing = set(_list_names(spark, marker_dir))
    has_data = _exists(spark, f"{workdir}/instances_stream")
    if has_data and existing != {mode}:
        # committed data under a different mode — or a pre-marker legacy
        # workdir whose mode is unknowable — either way, refuse
        raise ValueError(
            f"stream workdir {workdir} holds instances written with mode="
            f"{sorted(existing) or ['<unrecorded>']}; refusing to append "
            f"mode={mode!r} rows next to them")
    if existing != {mode}:
        # no committed data: a stale marker from a start that never
        # produced a batch is safe to replace
        _delete(spark, marker_dir)
        _mkdirs(spark, f"{marker_dir}/{mode}")

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_path)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        inst = extract_graph_instances(
            batch_df.select("conv_id", "turn_idx", "text"), mode=mode)
        (inst.withColumn("batch_id", F.lit(batch_id))
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("batch_id")
             .parquet(f"{workdir}/instances_stream"))

    writer = (
        stream.writeStream
        .foreachBatch(process_batch)
        .option("checkpointLocation", f"{workdir}/_stream_checkpoint")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_conversation_progress(spark, input_path: str):
    """CUSTOM STATEFUL operator (applyInPandasWithState): per-conversation
    running progress — cumulative turn/char counts emitted every time new
    turns for the conversation arrive in a micro-batch.  State = one small
    (n_turns, n_chars) tuple per live conv_id, the Spark-native analog of
    the reference's per-document accumulation loop; state store is
    checkpointed with the stream, so a restart resumes exactly.

    Returns the streaming DataFrame (caller attaches a sink)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(input_path)

    def update(key, pdfs, state: GroupState):
        n_turns, n_chars = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n_turns += len(pdf)
            n_chars += int(pdf["text"].str.len().sum())
        state.update((n_turns, n_chars))
        yield pd.DataFrame({"conv_id": [key[0]], "n_turns": [n_turns],
                            "n_chars": [n_chars]})

    return (
        stream.groupBy("conv_id")
        .applyInPandasWithState(
            update,
            outputStructType="conv_id string, n_turns long, n_chars long",
            stateStructType="n_turns long, n_chars long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_dedup_turns(spark, input_path: str,
                          watermark: str = "1 hour"):
    """Watermarked streaming deduplication of re-delivered turns —
    ``dropDuplicatesWithinWatermark`` on the transcript key
    (conv_id, turn_idx).  Upstream transcript buses are at-least-once;
    without this gate a re-delivered turn re-enters extraction and
    permanently inflates node/edge frequencies (the same invariant the
    batch path's idempotent ``batch_id=`` overwrite protects).  Unlike a
    plain ``dropDuplicates``, state is BOUNDED: a key is only held until
    the event-time watermark passes it, so the dedup store does not grow
    with the (unbounded) stream — the production contract at 10^12 turns,
    where re-delivery happens within minutes, not months.

    Returns the deduplicated streaming DataFrame (caller attaches the
    extraction sink)."""
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(input_path)
    return (stream.withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(["conv_id", "turn_idx"]))


def streaming_conversation_sessions(spark, input_path: str,
                                    gap: str = "30 minutes",
                                    watermark: str = "1 hour"):
    """Event-time SESSION windows per conversation — Spark's native
    ``session_window`` (dynamic-gap windows that close when no turn
    arrives for ``gap``), the streaming counterpart of the batch
    ``eventops.sessionize_events`` operator.  State is bounded: a session
    finalizes (and is emitted, append mode) once the watermark passes its
    close; late turns beyond the watermark are dropped rather than
    reopening state.

    Output per closed session: (conv_id, session_start, session_end,
    n_turns, n_chars).  Returns the streaming DataFrame (caller attaches
    a sink)."""
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(input_path)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "conv_id")
        .agg(F.count("*").alias("n_turns"),
             F.sum(F.length("text")).alias("n_chars"))
        .select("conv_id", F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"), "n_turns", "n_chars")
    )


def streaming_turn_rates(spark, input_path: str, watermark: str = "10 minutes",
                         window: str = "5 minutes"):
    """Watermarked windowed counts of turns per role — returns the streaming
    DataFrame (caller attaches a sink); late rows beyond the watermark are
    dropped, state is bounded."""
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(input_path)
    )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "role")
        .agg(F.count("*").alias("n_turns"))
        .select(F.col("w.start").alias("window_start"), "role", "n_turns")
    )
