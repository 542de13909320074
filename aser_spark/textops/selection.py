"""Corpus selection operators: benchmark decontamination and deterministic
sampling — the two gates every large-scale training-data pipeline runs
after dedup/quality and before mixing.

Both are pure whole-stage-codegen DataFrame plans with md5-arithmetic
hashing, so the DuckDB oracle reproduces every value bit-for-bit (same
primitive family as textops/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import _hash60, _norm as _norm_sel, doc_grams


def benchmark_contamination(documents: DataFrame, benchmarks: DataFrame,
                            n: int = 8,
                            min_containment: float = 0.5) -> DataFrame:
    """Flag documents that contain a benchmark/eval text — the n-gram
    containment decontamination step (the GPT-3/FineWeb recipe: drop any
    training doc sharing long character n-grams with an eval set).

    benchmarks: (bench_id, text) — a SMALL dimension (eval suites are
    thousands of rows), so its gram set is broadcast and the corpus-side
    scan is one equi-join on the gram — no shuffle of the corpus beyond
    the per-doc gram aggregation.  Containment is directional:
    |grams(doc) ∩ grams(bench)| / |grams(bench)| — a doc embedding the
    whole benchmark scores 1.0 regardless of how much other text it has.

    Output: (doc_id, bench_id, containment) for pairs >= min_containment.
    """
    bench = doc_grams(benchmarks.select(F.col("bench_id").alias("doc_id"),
                                        "text"), n)
    bench = bench.select(F.col("doc_id").alias("bench_id"), "gram")
    bench_sizes = bench.groupBy("bench_id").agg(F.count("*").alias("n_bench"))
    d = doc_grams(documents, n)
    hits = (
        d.join(F.broadcast(bench), "gram")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("inter"))
        .join(F.broadcast(bench_sizes), "bench_id")
    )
    return (
        hits.select("doc_id", "bench_id",
                    F.round(F.col("inter") / F.col("n_bench"), 6)
                    .alias("containment"))
        .filter(F.col("containment") >= min_containment)
    )


def hash_sample(documents: DataFrame, rate: float,
                key_col: str = "doc_id", salt: str = "sample") -> DataFrame:
    """Deterministic corpus sampling: keep a row iff its salted 60-bit md5
    hash falls under rate * 2^60.  Unlike ``df.sample`` this is stable
    across runs, partitionings, and engines (the production property you
    need for reproducible training mixes), and it is exactly reproducible
    by the DuckDB oracle from the same md5 arithmetic."""
    h = _hash60(F.concat(F.col(key_col).cast("string"), F.lit("#" + salt)))
    return documents.filter(h < F.lit(int(rate * float(2 ** 60))))


def stratified_hash_sample(documents: DataFrame, rates: dict,
                           strata_col: str,
                           key_col: str = "doc_id",
                           default_rate: float = 0.0,
                           salt: str = "sample") -> DataFrame:
    """Per-stratum deterministic sampling (the training-mix knob: e.g.
    keep 100% of 'en' books, 10% of crawl).  rates: {stratum: rate}.
    One codegen filter, no shuffle, no RNG."""
    h = _hash60(F.concat(F.col(key_col).cast("string"), F.lit("#" + salt)))
    thresh = F.lit(int(default_rate * float(2 ** 60)))
    for stratum, rate in sorted(rates.items()):
        thresh = F.when(F.col(strata_col) == stratum,
                        F.lit(int(rate * float(2 ** 60)))).otherwise(thresh)
    return documents.filter(h < thresh)


def pack_documents(documents: DataFrame, seq_len: int,
                   shard_size: int = 4096) -> DataFrame:
    """Sequence packing for training: concatenate documents in doc_id
    order and cut every ``seq_len`` tokens (the standard "concat then
    chunk" packing); each document is assigned the sequence index and
    token offset where it STARTS.

    Scale shape — distributed prefix sum, NOT a global window: a plain
    ``SUM() OVER (ORDER BY doc_id)`` funnels the whole corpus through one
    partition.  Instead: contiguous doc_id shards get per-shard running
    sums in parallel (window partitioned by shard), the tiny per-shard
    totals table computes shard base offsets with one window over
    n_shards rows, and a broadcast join adds the base back.  One sort per
    shard + one broadcast — the same plan at 10^9 documents.

    Output: (doc_id, n_tokens, seq_id, seq_offset)."""
    toks = documents.select(
        "doc_id",
        F.size(F.split(_norm_sel(F.col("text")), " ")).cast("long")
        .alias("n_tokens"),
        # `div` is integral long division — a double `/` + cast loses
        # integer exactness past 2^53, which a 100 TB corpus exceeds
        F.expr(f"doc_id div {int(shard_size)}").alias("_shard"))
    w_in = (Window.partitionBy("_shard").orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = toks.withColumn("_cum_in", F.sum("n_tokens").over(w_in))
    # shard totals aggregate the PRE-window projection: the partial sum
    # combines map-side, so this branch ships one row per (task, shard)
    # and skips the window's sort entirely.  (Deriving totals from the
    # window output looks cheaper — "reuse the exchange" — but column
    # pruning makes the two branches' exchanges non-canonical, Spark
    # cannot reuse them, and the r7 executed-plan audit showed the
    # duplicated branch paying a full extra sort+window.)  The map-side
    # tokenization still runs once per branch — callers packing the same
    # corpus repeatedly should persist `documents` upstream.
    shard_totals = (toks.groupBy("_shard")
                    .agg(F.sum("n_tokens").alias("_tot")))
    w_sh = (Window.orderBy("_shard")
            .rowsBetween(Window.unboundedPreceding, -1))
    base = shard_totals.withColumn(
        "_base", F.coalesce(F.sum("_tot").over(w_sh), F.lit(0))).drop("_tot")
    return (
        local.join(F.broadcast(base), "_shard")
        .withColumn("_start",
                    (F.col("_base") + F.col("_cum_in") - F.col("n_tokens"))
                    .cast("long"))
        .select("doc_id", "n_tokens",
                F.expr(f"_start div {int(seq_len)}").alias("seq_id"),
                (F.col("_start") % seq_len).cast("long").alias("seq_offset"))
    )


def budget_select(scored: DataFrame, budget_tokens: int,
                  strata_col: str = "lang",
                  score_col: str = "quality_score",
                  token_col: str = "n_ws_tokens",
                  key_col: str = "doc_id",
                  bucket_width: float = 0.001) -> DataFrame:
    """Token-budget corpus selection (the data-mixing gate): within each
    stratum keep the highest-``score_col`` documents whose running token
    total stays within ``budget_tokens``, ordering (score DESC, key ASC)
    for a deterministic cut.

    Scale shape — pack_documents' distributed prefix sum transposed onto a
    rank ordering: the naive ``SUM(tokens) OVER (PARTITION BY stratum
    ORDER BY score DESC)`` funnels each stratum through ONE task, and a
    stratum at 100 TB is most of the corpus.  Instead the score domain is
    cut into deterministic ``bucket_width`` ranges (scores are 6dp-rounded,
    so the integer-scaled cut is exact — no fp boundary ambiguity):
    per-(stratum, bucket) running sums run in parallel, the tiny
    per-bucket totals table is prefix-summed per stratum, and a broadcast
    join adds the bucket base back.  Documents tied on score never
    straddle buckets (equal score ⇒ equal bucket), so the global order is
    exactly (score DESC, key ASC).

    Output: (key, stratum, score, tokens, cum_tokens) for kept documents.
    """
    s = F.col(score_col)
    # integer-scaled score: 6dp scores scale exactly; OFFSET keeps the
    # bucket id positive so `div` (truncating division) stays monotone
    si = F.round(s * 1_000_000).cast("long")
    step = max(int(round(bucket_width * 1_000_000)), 1)
    offset = 1 << 40
    # `div` is integral long division (same exactness rationale as
    # pack_documents' shard id)
    d = (scored.withColumn("_si", si)
         .withColumn("_bucket", F.expr(f"({offset}L - _si) div {step}"))
         .drop("_si"))
    w_in = (Window.partitionBy(strata_col, "_bucket")
            .orderBy(s.desc(), F.col(key_col).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = d.withColumn("_cum_in",
                         F.sum(F.col(token_col)).over(w_in))
    # bucket totals aggregate the PRE-window projection (map-side partial
    # sums; no sort) — same rationale as pack_documents' shard totals.
    # The scoring expressions in `scored` run once per branch; callers
    # selecting from the same scored corpus repeatedly should persist it.
    tots = (d.groupBy(strata_col, "_bucket")
            .agg(F.sum(F.col(token_col)).alias("_tot")))
    w_b = (Window.partitionBy(strata_col).orderBy("_bucket")
           .rowsBetween(Window.unboundedPreceding, -1))
    base = tots.withColumn(
        "_base", F.coalesce(F.sum("_tot").over(w_b), F.lit(0))).drop("_tot")
    return (
        local.join(F.broadcast(base), [strata_col, "_bucket"])
        .withColumn("cum_tokens",
                    (F.col("_base") + F.col("_cum_in")).cast("long"))
        .filter(F.col("cum_tokens") <= budget_tokens)
        .select(key_col, strata_col, score_col, token_col, "cum_tokens")
    )


def chunk_documents(documents: DataFrame, seq_len: int, overlap: int = 0,
                    text_col: str = "text") -> DataFrame:
    """Sliding-window document chunking — the pre-tokenization pass that
    cuts long documents into ``seq_len``-token windows advancing by
    ``seq_len - overlap`` (the standard stride-with-overlap shape; the
    final chunk may be shorter).  Complements pack_documents: packing
    concatenates SHORT docs up to seq_len, chunking splits LONG docs
    down to it.

    Scan-shaped at any scale: chunk starts are computed per row with
    integer arithmetic and exploded locally — no shuffle, no UDF; the
    output inherits the input partitioning.  Chunk count uses integral
    `div` so the plan is exact past 2^53 tokens (same rationale as
    pack_documents' shard ids).

    Output: (doc_id, chunk_idx, n_tokens, chunk_text).
    """
    if not 0 <= overlap < seq_len:
        raise ValueError(f"require 0 <= overlap < seq_len, got "
                         f"overlap={overlap} seq_len={seq_len}")
    stride = seq_len - overlap
    d = documents.select(
        "doc_id", F.split(_norm_sel(F.col(text_col)), " ").alias("_tok"))
    n = F.size("_tok").cast("long")
    # K = 1 for n <= seq_len, else ceil((n - seq_len) / stride) + 1
    k = F.when(n <= seq_len, F.lit(1).cast("long")).otherwise(
        F.expr(f"(size(_tok) - {seq_len} + {stride} - 1) div {stride}")
        + F.lit(1))
    exploded = d.select(
        "doc_id", "_tok",
        F.posexplode(F.sequence(F.lit(0).cast("long"), k - 1)))
    chunk = F.slice(F.col("_tok"),
                    (F.col("col") * stride + 1).cast("int"), seq_len)
    return exploded.select(
        "doc_id", F.col("pos").cast("long").alias("chunk_idx"),
        F.size(chunk).alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"))


__all__ = ["benchmark_contamination", "budget_select", "chunk_documents",
           "hash_sample", "stratified_hash_sample", "pack_documents",
           "temperature_mix_rates"]


def temperature_mix_rates(stratum_counts: dict, temperature: float,
                          budget: int | None = None) -> dict:
    """Per-stratum sampling rates for temperature-based data mixing (the
    multilingual pre-training standard: sample stratum i with probability
    ∝ n_i^τ, τ<1 up-weighting low-resource strata).  Returns
    {stratum: rate} ready for stratified_hash_sample.

    ``budget``: total documents to target across strata (rates are
    scaled so expected kept-count sums to it, each rate capped at 1.0 —
    a stratum cannot yield more than it has; the shortfall from capped
    strata is NOT redistributed, matching the fixed-ratio contract of
    the published recipes).  With budget=None, rates are normalized so
    the most UP-WEIGHTED stratum (the smallest, for τ<1) keeps
    everything and every other stratum scales to the exact n^τ
    proportions — the largest kept corpus realizing the mix with no
    rate above 1.

    Driver-side pure math over the (tiny) stratum histogram — the
    distributed parts stay in stratified_hash_sample."""
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    if not stratum_counts:
        return {}
    weights = {s: float(n) ** temperature
               for s, n in stratum_counts.items() if n > 0}
    total_w = sum(weights.values())
    if budget is None:
        # rate_i ∝ w_i / n_i, scaled so the max rate is exactly 1.0 —
        # keeps the n^τ proportions exact with no capping
        per_doc = {s: w / stratum_counts[s] for s, w in weights.items()}
        top = max(per_doc.values())
        return {s: per_doc[s] / top for s in per_doc}
    return {s: min(w / total_w * budget / stratum_counts[s], 1.0)
            for s, w in weights.items()}
