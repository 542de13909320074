"""Tests for conceptualization (H6/J7/A4/J5), entity linking, multimodal
plumbing, and the streaming ingest path."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def kg(spark):
    from aser_spark.datagen import transcripts_df
    from aser_spark.pipeline import build_knowledge_graph, extract_graph_instances

    inst = extract_graph_instances(transcripts_df(spark, 40, seed=42)).cache()
    nodes, edges, lineage = build_knowledge_graph(inst)
    return {"nodes": nodes.cache(), "edges": edges.cache()}


def test_seed_rule_pronoun_abstraction(spark):
    from aser_spark.pipeline.concepts import seed_rule_concepts

    nodes = spark.createDataFrame(
        [("e1", "s-v-o", "he give she the key", "PRP VBD PRP DT NN", "he give she", "give", 3.0),
         ("e2", "s-be-a", "i be hungry", "PRP VBP JJ", "i be hungry", "be", 5.0)],
        "eid string, pattern string, words string, pos_tags string, "
        "skeleton_words string, verbs string, frequency double",
    )
    got = {r.eid: r.concept_words for r in seed_rule_concepts(nodes).collect()}
    # 'he' is the first distinct pronoun (-> 0), 'she' second (-> 1)
    assert got["e1"] == "__PERSON__0 give __PERSON__1 the key"
    assert got["e2"] == "__PERSON__0 be hungry"


def test_probase_concepts_and_aggregation(spark, kg):
    from aser_spark.pipeline.concepts import (aggregate_concepts,
                                              build_concept_relations,
                                              probase_concepts, toy_probase)

    concepts = probase_concepts(kg["nodes"], toy_probase(spark), topk=2)
    concept_nodes, pairs = aggregate_concepts(concepts)
    cn = concept_nodes.cache()
    assert cn.count() > 0
    # sha1 ids well-formed and consistent
    row = pairs.limit(1).collect()[0]
    import hashlib
    assert len(row.pid) == 40 and len(row.cid) == 40
    some = cn.limit(5).collect()
    for r in some:
        assert r.cid == hashlib.sha1(r.words.encode()).hexdigest()

    # substitution actually lifted some noun to a hypernym
    lifted = cn.filter(F.col("words").contains("animal") |
                       F.col("words").contains("person") |
                       F.col("words").contains("document")).count()
    assert lifted > 0

    crel = build_concept_relations(pairs, kg["edges"])
    assert crel.filter(F.col("h_cid") == F.col("t_cid")).count() == 0
    assert crel.count() > 0


def test_entity_linking(spark, kg):
    from aser_spark.pipeline.entities import (entity_cooccurrence_edges,
                                              link_entities, toy_kb)

    links = link_entities(kg["nodes"], toy_kb(spark)).cache()
    assert links.count() > 0
    # one best link per (eid, mention)
    dups = links.groupBy("eid", "mention").count().filter("count > 1").count()
    assert dups == 0
    edges = entity_cooccurrence_edges(links)
    assert edges.filter(F.col("e1") >= F.col("e2")).count() == 0


def test_multimodal_plumbing(spark):
    from aser_spark.textops.multimodal import (extract_media_features,
                                               sample_video_frames,
                                               synthesize_media)

    media = synthesize_media(spark, n=30).cache()
    feats = extract_media_features(media).collect()
    assert len(feats) == 30
    by_id = {r.media_id: r for r in feats}
    assert all(len(r.features) == 16 for r in feats)
    # deterministic: same payload -> same features
    feats2 = {r.media_id: r.features for r in extract_media_features(media).collect()}
    assert all(by_id[k].features == v for k, v in feats2.items())

    # REAL decoders: feature values reflect the decoded payload structure
    rows = {r["media_id"]: r for r in media.collect()}
    for mid, r in by_id.items():
        meta = rows[mid]["meta"]
        if r.kind == "image":
            assert r.features[0] == float(meta["width"])
            assert r.features[1] == float(meta["height"])
        elif r.kind == "audio":
            assert r.features[1] == pytest.approx(meta["sample_rate"] / 1e4)
            assert r.features[2] > 0                     # rms
        else:
            assert r.features[0] == float(meta["n_frames"])

    frames = sample_video_frames(media, every_n=50)
    assert frames.filter(F.col("frame_idx") % 50 != 0).count() == 0

    # strict succeeds for the supported uncompressed codecs...
    assert len(extract_media_features(media, strict=True).collect()) == 30
    # ...and raises for a codec that genuinely needs external libraries
    from aser_spark.textops.multimodal import decode_features

    with pytest.raises(NotImplementedError, match="h264"):
        decode_features(b"whatever", "h264", strict=True)


def test_multimodal_codec_roundtrips():
    """Pure-bytes BMP / WAV / RAWV codecs round-trip exactly."""
    import numpy as np

    from aser_spark.textops.multimodal import (_bmp_decode, _bmp_encode,
                                               _rawv_decode, _rawv_encode,
                                               _wav_decode, _wav_encode)

    px = (np.arange(11 * 7 * 3, dtype=np.uint8).reshape(7, 11, 3) * 3) % 256
    assert np.array_equal(_bmp_decode(_bmp_encode(px)), px)

    samples = (np.sin(np.arange(500) / 7.0) * 20000).astype(np.int16)
    rate, out = _wav_decode(_wav_encode(samples, 8000))
    assert rate == 8000 and np.array_equal(out, samples)

    frames = [px, (px + 40) % 256]
    back = _rawv_decode(_rawv_encode(frames))
    assert len(back) == 2
    assert all(np.array_equal(a, b) for a, b in zip(back, frames))


import pytest


@pytest.mark.parametrize("mode", ["seed", "discourse"])
def test_streaming_ingest_matches_batch(spark, tmp_path, mode):
    from aser_spark.datagen import transcripts_df
    from aser_spark.pipeline import extract_graph_instances
    from aser_spark.streaming import stream_extract_transcripts

    src = str(tmp_path / "landing")
    wd = str(tmp_path / "stream_wd")
    t = transcripts_df(spark, 20, seed=42)
    t.write.mode("overwrite").parquet(src)

    q = stream_extract_transcripts(spark, src, wd, available_now=True,
                                   mode=mode)
    q.awaitTermination(120)

    streamed = spark.read.parquet(f"{wd}/instances_stream")
    batch = extract_graph_instances(t, mode=mode)
    assert streamed.count() == batch.count()
    a = streamed.groupBy("kind").count().collect()
    b = batch.groupBy("kind").count().collect()
    assert {(r.kind, r['count']) for r in a} == {(r.kind, r['count']) for r in b}

    # idempotent restart: availableNow again processes nothing new
    q2 = stream_extract_transcripts(spark, src, wd, available_now=True,
                                    mode=mode)
    q2.awaitTermination(120)
    assert spark.read.parquet(f"{wd}/instances_stream").count() == batch.count()


def test_streaming_windowed_rates(spark, tmp_path):
    from aser_spark.datagen import transcripts_df
    from aser_spark.streaming import streaming_turn_rates

    src = str(tmp_path / "landing2")
    transcripts_df(spark, 10, seed=42).write.mode("overwrite").parquet(src)
    rates = streaming_turn_rates(spark, src, watermark="1 hour", window="30 minutes")
    q = (rates.writeStream.format("memory").queryName("turn_rates")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    # append mode emits only watermark-closed windows; with availableNow the
    # final watermark closes all but the last — just require the query ran
    got = spark.sql("SELECT * FROM turn_rates")
    assert got.columns == ["window_start", "role", "n_turns"]


def test_probase_concepts_multi_combination_scores(spark):
    """Level-2 combinations carry likelihood PRODUCTS and every subset of
    matched words is enumerated exactly once."""
    from pyspark.sql import functions as F

    from aser_spark.pipeline.concepts import probase_concepts_multi

    nodes = spark.createDataFrame(
        [("e1", "s-v-o", "the dog see the cat", "DT NN VBZ DT NN", 3.0)],
        "eid string, pattern string, words string, pos_tags string, frequency double")
    probase = spark.createDataFrame(
        [("dog", "animal", 0.9), ("cat", "animal", 0.8), ("cat", "pet", 0.5)],
        "instance string, concept string, likelihood double")
    out = probase_concepts_multi(nodes, probase, topk=2, max_subs=2)
    got = {(r.concept_words): round(r.score, 6) for r in out.collect()}
    assert got["the dog see the cat"] == 1.0                    # subset {}
    assert got["the animal see the cat"] == 0.9                 # {dog}
    assert got["the dog see the animal"] == 0.8                 # {cat->animal}
    assert got["the dog see the pet"] == 0.5                    # {cat->pet}
    assert got["the animal see the animal"] == round(0.9 * 0.8, 6)
    assert got["the animal see the pet"] == round(0.9 * 0.5, 6)
    assert len(got) == 6


def test_load_probase_dump_likelihood(spark, tmp_path):
    """Real-dump loader: TSV (concept, instance, freq) -> likelihood =
    freq / instance_total, matching ProbaseConcept.conceptualize
    (concept.py:165-191)."""
    from aser_spark.pipeline.concepts import load_probase, probase_concepts

    tsv = tmp_path / "probase.txt"
    tsv.write_text("animal\tdog\t30\npet\tdog\t10\nanimal\tcat\t5\n")
    got = {(r.instance, r.concept): round(r.likelihood, 6)
           for r in load_probase(spark, str(tsv)).collect()}
    assert got[("dog", "animal")] == 0.75
    assert got[("dog", "pet")] == 0.25
    assert got[("cat", "animal")] == 1.0

    # drop-in: feeds the conceptualization operators unchanged
    nodes = spark.createDataFrame(
        [("e1", "s-v", "the dog bark", "DT NN VBZ", 2.0)],
        "eid string, pattern string, words string, pos_tags string, frequency double")
    out = probase_concepts(nodes, load_probase(spark, str(tsv)), topk=2)
    assert "the animal bark" in {r.concept_words for r in out.collect()}


def test_load_kb_aliases_dump(spark, tmp_path):
    from aser_spark.pipeline.entities import load_kb_aliases

    tsv = tmp_path / "kb.tsv"
    tsv.write_text("dog\tQ1\t0.9\ndog\tQ2\t\ncat\tQ3\t\n")
    got = {(r.alias, r.entity_id): round(r.prior, 4)
           for r in load_kb_aliases(spark, str(tsv)).collect()}
    assert got[("dog", "Q1")] == 0.9
    assert got[("dog", "Q2")] == 0.5     # uniform fallback: 1/2 candidates
    assert got[("cat", "Q3")] == 1.0


def test_streaming_stateful_conversation_progress(spark, tmp_path):
    """applyInPandasWithState: the final per-conversation state matches the
    batch groupBy ground truth, across multiple micro-batches."""
    from pyspark.sql import functions as F

    from aser_spark.datagen import transcripts_df
    from aser_spark.streaming.ingest import streaming_conversation_progress

    t = transcripts_df(spark, 20, seed=42)
    # two file drops -> at least two micro-batches with maxFilesPerTrigger
    t.filter(F.col("turn_idx") < 3).write.parquet(f"{tmp_path}/in/a")
    t.filter(F.col("turn_idx") >= 3).write.parquet(f"{tmp_path}/in/b")
    src = f"{tmp_path}/in/*"

    q = (streaming_conversation_progress(spark, src)
         .writeStream.format("memory").queryName("conv_progress")
         .outputMode("update")
         .option("checkpointLocation", f"{tmp_path}/ckpt")
         .trigger(availableNow=True).start())
    q.awaitTermination()

    # last emitted row per conv = final cumulative state
    got = {}
    for r in spark.sql("SELECT * FROM conv_progress").collect():
        got[r.conv_id] = (r.n_turns, r.n_chars)  # later rows overwrite
    want = {r.conv_id: (r.n_turns, r.n_chars)
            for r in t.groupBy("conv_id")
                      .agg(F.count("*").alias("n_turns"),
                           F.sum(F.length("text")).alias("n_chars")).collect()}
    # memory sink rows arrive in batch order; take max per conv (cumulative)
    final = {}
    for r in spark.sql("SELECT * FROM conv_progress").collect():
        cur = final.get(r.conv_id, (0, 0))
        final[r.conv_id] = max(cur, (r.n_turns, r.n_chars))
    assert final == want


def test_streaming_state_recovery_after_midbatch_kill(spark, tmp_path):
    """Failure injection (r6 VERDICT #7): a micro-batch that dies AFTER
    the offset log planned it — a corrupt parquet file lands inside the
    batch — must, on restart from the SAME checkpoint, replay the planned
    batch and converge to the exact batch ground truth.  State-store
    commits are transactional per micro-batch, so the kill can neither
    lose the dead batch's turns nor double-count whatever the failed
    attempt partially processed."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F
    from pyspark.sql.streaming import StreamingQueryException

    from aser_spark.datagen import transcripts_df
    from aser_spark.streaming.ingest import streaming_conversation_progress

    t = transcripts_df(spark, 12, seed=7).cache()
    src = tmp_path / "in"
    src.mkdir()

    def drop(df, name):
        # single-FILE drop at a controlled path (pyarrow, not a Spark
        # directory write) so the poison file can be replaced IN PLACE
        # under the same path the offset log recorded
        pdf = df.toPandas()
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                       src / name, coerce_timestamps="us",
                       allow_truncated_timestamps=True)

    out = str(tmp_path / "out")

    def sink(batch_df, batch_id):
        # idempotent per-batch parquet overwrite — the memory sink does
        # NOT support restarting from a checkpoint, and this is the same
        # replay-safe sink shape stream_extract_transcripts ships
        (batch_df.withColumn("batch_id", F.lit(batch_id))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id").parquet(out))

    def run():
        q = (streaming_conversation_progress(spark, str(src))
             .writeStream.foreachBatch(sink)
             .outputMode("update")
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return q

    drop(t.filter(F.col("turn_idx") < 2), "a.parquet")
    run()  # batch 0 commits cleanly

    # next trigger plans {b.parquet, poison.parquet} into one batch, then
    # dies mid-batch reading the poison
    drop(t.filter((F.col("turn_idx") >= 2) & (F.col("turn_idx") < 4)),
         "b.parquet")
    (src / "poison.parquet").write_bytes(b"PAR1 not a parquet footer")
    with pytest.raises(StreamingQueryException):
        run()

    # operator fixes the file in place; restart from the same checkpoint
    # replays the planned batch against the repaired file
    drop(t.filter(F.col("turn_idx") >= 4), "poison.parquet")
    run()

    # every conversation has turns in the replayed batch, so the final
    # update-mode emission per conversation carries its FINAL cumulative
    # state; equality against the batch ground truth rules out both loss
    # and double-counting.  Cumulative counts are monotone in batch_id,
    # so max() per conversation is the last emission.
    final = {}
    for r in spark.read.parquet(out).collect():
        cur = final.get(r.conv_id, (0, 0))
        final[r.conv_id] = max(cur, (r.n_turns, r.n_chars))
    want = {r.conv_id: (r.n_turns, r.n_chars)
            for r in t.groupBy("conv_id")
                      .agg(F.count("*").alias("n_turns"),
                           F.sum(F.length("text")).alias("n_chars")).collect()}
    assert final == want
    t.unpersist()


def test_coref_candidate_rank_matches_reference_fold(spark):
    """The closed-form weights in coref_candidate_rank must equal the
    reference's literal Entity.update fold f <- (f + f_i)/2 over carriers
    in document order (entity_linker.py:146-160, :312-313)."""
    from aser_spark.pipeline.entities import coref_candidate_rank

    # one scope; mentions "x", "x y", "y" all corefer via containment
    mentions = spark.createDataFrame(
        [("c0", "x", 1), ("c0", "x y", 2), ("c0", "y", 3), ("c0", "z", 4)],
        "conv_id string, mention string, ord long")
    kb = spark.createDataFrame(
        [("x", "Q1", 0.9), ("x y", "Q1", 0.6), ("y", "Q1", 0.9),
         ("y", "Q2", 0.4), ("z", "Q3", 0.5)],
        "alias string, entity_id string, prior double")
    rows = {(r["component"], r["entity_id"]): (r["merged_freq"], r["rank"])
            for r in coref_candidate_rank(mentions, kb).collect()}

    def fold(freqs):
        f = freqs[0]
        for x in freqs[1:]:
            f = (f + x) / 2
        return round(f, 6)

    # carriers of Q1 in ord order: x(0.9), "x y"(0.6), y(0.9)
    assert rows[("x", "Q1")] == (fold([0.9, 0.6, 0.9]), 1)
    assert rows[("x", "Q2")] == (fold([0.4]), 2)    # only y carries Q2
    assert rows[("z", "Q3")] == (fold([0.5]), 1)    # singleton cluster


def test_streaming_dedup_turns_bounded_state(spark, tmp_path):
    """At-least-once re-delivery: dropDuplicatesWithinWatermark must pass
    each (conv_id, turn_idx) exactly once — including re-deliveries
    arriving in a LATER micro-batch within the watermark horizon — so
    downstream extraction never double-counts frequencies."""
    from pyspark.sql import functions as F

    from aser_spark.datagen import transcripts_df
    from aser_spark.streaming import streaming_dedup_turns

    src = str(tmp_path / "landing_dup")
    ckpt = str(tmp_path / "dedup_ckpt")
    sink = str(tmp_path / "dedup_out")
    t = transcripts_df(spark, 12, seed=42).cache()
    n_unique = t.count()
    # first delivery already contains intra-batch duplicates
    t.union(t.limit(17)).write.mode("overwrite").parquet(src)

    def run_available_now():
        # file sink, not memory: only file sinks support restarting from
        # the checkpoint (the re-delivery batch below needs a restart)
        q = (streaming_dedup_turns(spark, src, watermark="2 hours")
             .writeStream.format("parquet").option("path", sink)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)

    run_available_now()
    out = spark.read.parquet(sink)
    assert out.count() == n_unique
    assert out.select("conv_id", "turn_idx").distinct().count() == n_unique

    # second delivery: the same turns re-delivered later (same event ts,
    # well inside the watermark) — the restarted stream must emit nothing
    t.limit(40).write.mode("append").parquet(src)
    run_available_now()
    assert spark.read.parquet(sink).count() == n_unique
    t.unpersist()


def test_streaming_session_windows_match_batch_gaps(spark, tmp_path):
    """Native session_window sessions must equal the serial gap-scan over
    the same turns once the watermark passes them.  Protocol: run
    availableNow over the real turns (sessions may stay open — append
    mode only emits watermark-closed windows), then deliver one
    far-future punctuation turn and restart from the checkpoint: the
    advanced watermark closes every real session exactly once."""
    import datetime as dt

    from aser_spark.streaming import streaming_conversation_sessions

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    # conv A: two sessions (45-min gap > 30-min gap closes the first);
    # conv B: 29-min gaps chain ONE session across all three turns
    for i, off_min in enumerate((0, 5, 10, 55, 60)):
        rows.append(("A", i, "user", f"turn a{i}", "",
                     base + dt.timedelta(minutes=off_min)))
    for i, off_min in enumerate((0, 29, 58)):
        rows.append(("B", i, "user", f"turn b{i}", "",
                     base + dt.timedelta(minutes=off_min)))
    schema = ("conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    src = str(tmp_path / "landing_sess")
    ckpt = str(tmp_path / "sess_ckpt")
    sink = str(tmp_path / "sess_out")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(src)

    def run_available_now():
        q = (streaming_conversation_sessions(spark, src, gap="30 minutes",
                                             watermark="1 minute")
             .writeStream.format("parquet").option("path", sink)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)

    run_available_now()
    # punctuation: one far-future turn advances the watermark past every
    # real session's close on the restarted stream
    spark.createDataFrame(
        [("Z", 0, "user", "late punctuation", "",
          base + dt.timedelta(days=2))], schema
    ).write.mode("append").parquet(src)
    run_available_now()

    got = {(r.conv_id,
            int((r.session_start - base).total_seconds()) // 60,
            int((r.session_end - base).total_seconds()) // 60,
            r.n_turns, r.n_chars)
           for r in spark.read.parquet(sink).collect()}
    # serial gap-scan ground truth: window end = last turn + gap
    assert got == {
        ("A", 0, 10 + 30, 3, 21),    # 12:00-12:10 -> closes 12:40
        ("A", 55, 60 + 30, 2, 14),   # 12:55-13:00 -> closes 13:30
        ("B", 0, 58 + 30, 3, 21),    # one chained session
    }
