"""Giant-conversation skew guard: extract_graph_instances(max_turns=m)
splits each conversation into turn-range chunks keyed (conv_id, chunk)
with carried boundary context, bounding per-task work for pathological
million-turn conversations — and must yield byte-identical rows to the
unsplit path in BOTH extraction modes (windowed-emission contract,
kernel/relations.py + kernel/discourse.py ``window=``)."""

import itertools
import json
from pathlib import Path

import pytest

FIXTURES = Path(__file__).resolve().parent.parent / "fixtures"


def _giant_turns(n):
    """Realistic prose turns from the frozen held-out corpus."""
    paras = []
    with open(FIXTURES / "heldout_prose.jsonl") as f:
        for line in f:
            paras.append(json.loads(line)["doc_texts"])
    texts = list(itertools.islice(
        itertools.cycle(t for p in paras for t in p), n))
    return [(i, t) for i, t in enumerate(texts)]


@pytest.mark.parametrize("mode", ["seed", "discourse"])
def test_kernel_window_chunking_identical(mode):
    """Pure-kernel contract: windowed emission over (core + 2-turn carry)
    chunks reproduces the whole-conversation rows exactly."""
    from aser_spark.pipeline.extract import (_sentence_cache,
                                             conversation_instance_rows)

    turns = _giant_turns(60)
    memo = _sentence_cache(mode)
    whole = conversation_instance_rows("giant", turns, memo, mode)
    m, k = 16, 2
    chunked = []
    for c in range((len(turns) + m - 1) // m):
        lo, hi = c * m, (c + 1) * m
        window = [r for r in turns if lo - k <= r[0] < hi + k]
        chunked.extend(conversation_instance_rows(
            "giant", window, memo, mode, emit_turns=(lo, hi)))
    assert sorted(map(repr, whole)) == sorted(map(repr, chunked))


@pytest.mark.parametrize("mode", ["seed", "discourse"])
def test_spark_split_identical_rows(spark, mode):
    """End-to-end: a 72-turn conversation mixed with normal ones, split at
    max_turns=16, emits the identical row multiset."""
    from aser_spark.datagen import transcripts_df
    from aser_spark.pipeline.extract import extract_graph_instances

    giant = spark.createDataFrame(
        [("giant-0", i, t) for i, t in _giant_turns(72)],
        "conv_id string, turn_idx int, text string")
    normal = transcripts_df(spark, 6, seed=7).select(
        "conv_id", "turn_idx", "text")
    src = normal.unionByName(giant)

    def rows(df):
        return sorted(map(repr, df.collect()))

    whole = rows(extract_graph_instances(src, mode=mode))
    split = rows(extract_graph_instances(src, mode=mode, max_turns=16))
    assert whole == split


def test_split_plan_no_conv_keyed_big_exchange(spark):
    """Plan contract for the gap-safe two-phase rank: NO window over the
    full row set may be keyed by conv_id alone (that single task would
    scale with the pathological conversation — measured worse than the
    unsplit kernel task, scale_evidence.py giant_conv_tasks).  The
    row_number window partitions by (conv_id, bucket); the only
    conv_id-keyed window is the prefix sum over the tiny per-bucket
    counts table."""
    import re

    from aser_spark.datagen import transcripts_df
    from aser_spark.pipeline.extract import extract_graph_instances

    df = extract_graph_instances(transcripts_df(spark, 5, seed=42),
                                 max_turns=16)
    jvm = df.sparkSession._jvm
    p = df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert "REPARTITION_BY_NUM" in p
    assert "MapInPandas" in p
    # the big-side row_number must be bucket-partitioned
    assert re.search(
        r"row_number\(\) windowspecdefinition\(conv_id#\d+, _b#\d+", p)
    # exactly one conv_id-alone window spec: the _cnt prefix sum
    solo = [m for m in re.findall(r"windowspecdefinition\(conv_id#\d+,"
                                  r" (\w+)#\d+L? ASC", p)]
    assert solo == ["_b"] and "sum(_cnt" in p


@pytest.mark.parametrize("mode", ["seed", "discourse"])
def test_spark_split_gapped_turn_idx_identical(spark, mode):
    """Gap-safety (r6 ADVICE repro class): sparse/gapped turn indices —
    e.g. turns {5, 100} with m=16 — must still chunk by the DENSE rank so
    every chunk receives the conversation's true previous turns as
    context. Value-based chunking separated such turns into different
    chunks and flipped connective relation rows."""
    from aser_spark.pipeline.extract import extract_graph_instances

    texts = [t for _, t in _giant_turns(40)]
    # gaps of wildly varying size, incl. the exact {5, 100} repro shape
    idxs, cur = [], 5
    for i in range(40):
        idxs.append(cur)
        cur += (95, 1, 7, 1000)[i % 4]
    giant = spark.createDataFrame(
        [("gappy-0", i, t) for i, t in zip(idxs, texts)],
        "conv_id string, turn_idx int, text string")

    def rows(df):
        return sorted(map(repr, df.collect()))

    whole = rows(extract_graph_instances(giant, mode=mode))
    split = rows(extract_graph_instances(giant, mode=mode, max_turns=16,
                                         context_turns=2))
    assert whole == split


def test_split_bounds_max_task_rows(spark):
    """Direct boundedness evidence: with max_turns=m, no UDF task group
    sees more than m + 2*context_turns turns of one conversation."""
    from pyspark.sql import functions as F

    from aser_spark.pipeline.extract import extract_graph_instances

    giant = spark.createDataFrame(
        [("giant-0", i, f"the worker finishes task {i}.")
         for i in range(400)],
        "conv_id string, turn_idx int, text string")
    out = extract_graph_instances(giant, mode="seed", max_turns=32)
    # every emitted node row's turn lands in exactly one 32-turn chunk;
    # the exchange key is (conv_id, chunk), so per-task turns <= 32+4
    per_chunk = (out.filter(F.col("kind") == "node")
                 .withColumn("chunk", (F.col("turn_idx") / 32).cast("long"))
                 .groupBy("chunk").agg(F.countDistinct("turn_idx").alias("n"))
                 .collect())
    assert per_chunk and all(r["n"] <= 32 for r in per_chunk)
