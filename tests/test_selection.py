"""Corpus selection operators: decontamination containment semantics and
deterministic-sampling properties."""

from pyspark.sql import functions as F


def test_benchmark_contamination(spark):
    from aser_spark.textops import benchmark_contamination

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta"),
         (2, "prefix words then alpha beta gamma delta epsilon and more"),
         (3, "completely unrelated content with no shared grams at all")],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "bench_id long, text string")
    out = {(r["doc_id"], r["bench_id"]): r["containment"]
           for r in benchmark_contamination(docs, bench, n=8,
                                            min_containment=0.3).collect()}
    # doc 1 and 2 both embed the full benchmark string -> containment 1.0
    assert out[(1, 100)] == 1.0 and out[(2, 100)] == 1.0
    assert (3, 100) not in out
    # directionality: doc length does not dilute the score
    assert len(out) == 2


def test_hash_sample_determinism_and_rate(spark):
    from aser_spark.textops import hash_sample

    docs = spark.createDataFrame([(i, f"t{i}") for i in range(2000)],
                                 "doc_id long, text string")
    a = sorted(r["doc_id"] for r in hash_sample(docs, 0.3).collect())
    b = sorted(r["doc_id"] for r in
               hash_sample(docs.repartition(13), 0.3).collect())
    assert a == b  # partitioning-independent
    assert 0.25 < len(a) / 2000 < 0.35  # md5 is uniform enough at n=2000
    # different salt -> different (deterministic) subset
    c = sorted(r["doc_id"] for r in
               hash_sample(docs, 0.3, salt="other").collect())
    assert c != a


def test_stratified_hash_sample(spark):
    from aser_spark.textops import hash_sample, stratified_hash_sample

    docs = spark.createDataFrame(
        [(i, "x", "en" if i % 2 else "zh") for i in range(1000)],
        "doc_id long, text string, lang string")
    out = stratified_hash_sample(docs, {"en": 1.0, "zh": 0.0},
                                 strata_col="lang").collect()
    assert all(r["lang"] == "en" for r in out)
    assert len(out) == 500
    # a stratum's subset equals the plain sample of that stratum (same salt)
    half = stratified_hash_sample(docs, {"en": 0.4}, strata_col="lang")
    plain = hash_sample(docs.filter(F.col("lang") == "en"), 0.4)
    assert sorted(r["doc_id"] for r in half.collect()) == \
        sorted(r["doc_id"] for r in plain.collect())


def test_pack_documents_matches_serial_packing(spark):
    from aser_spark.textops import pack_documents

    docs = [(i, " ".join("w" * 1 for _ in range(5 + (i * 7) % 23)))
            for i in range(300)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["seq_id"], r["seq_offset"])
           for r in pack_documents(df, seq_len=64, shard_size=32).collect()}
    # serial ground truth: concat in doc_id order, chunk every 64 tokens
    cum = 0
    for i, text in docs:
        n = len(text.split(" "))
        assert got[i] == (n, cum // 64, cum % 64), i
        cum += n
    # shard size is an implementation knob, not a semantic one
    alt = {r["doc_id"]: (r["n_tokens"], r["seq_id"], r["seq_offset"])
           for r in pack_documents(df, seq_len=64, shard_size=7).collect()}
    assert alt == got


def test_pack_documents_exact_past_double_precision(spark):
    """Integral `div` arithmetic: doc_ids beyond 2^53 (where a double
    round-trips inexactly) must still shard and pack exactly — the
    100 TB invariant the ADVICE review flagged."""
    from pyspark.sql import functions as F

    from aser_spark.textops import pack_documents

    base = (1 << 53) + 7        # not representable gaps start at 2^53
    rows = [(base + i, "w " * (i + 1)) for i in range(6)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens, r.seq_id, r.seq_offset)
           for r in pack_documents(d, seq_len=4, shard_size=2).collect()}
    start = 0
    for doc_id, text in rows:
        n = len(text.split())
        assert got[doc_id] == (n, start // 4, start % 4), doc_id
        start += n
    # shard assignment itself must be exact: consecutive giant ids land
    # in the integer-correct shard (doc_id div 2), which a double cast
    # gets wrong for odd ids past 2^53
    shards = (d.select(F.expr("doc_id div 2").alias("s")).distinct().count())
    assert shards == 4  # ids base..base+5 with base odd span 4 shards


def test_budget_select_matches_serial_greedy(spark):
    """The bucketed distributed prefix sum must reproduce the serial
    greedy selection exactly: per stratum, take docs by (score DESC,
    doc_id ASC) while the running token total stays within budget."""
    from aser_spark.textops import budget_select
    from aser_spark.textops.quality import scored_documents

    docs = spark.createDataFrame(
        [(i, "en" if i % 3 else "de",
          " ".join(["the word is"] * (1 + i % 17)) + (" !!!" * (i % 5)))
         for i in range(400)],
        "doc_id long, lang string, text string")
    scored = scored_documents(docs)
    got = sorted((r["doc_id"], r["cum_tokens"])
                 for r in budget_select(scored, budget_tokens=800).collect())

    rows = scored.collect()
    exp = []
    for lang in {r["lang"] for r in rows}:
        cum = 0
        for r in sorted((r for r in rows if r["lang"] == lang),
                        key=lambda r: (-r["quality_score"], r["doc_id"])):
            cum += r["n_ws_tokens"]
            if cum <= 800:
                exp.append((r["doc_id"], cum))
    assert got == sorted(exp) and len(got) > 0
    # bucket width is an implementation knob, not a semantic one
    alt = sorted((r["doc_id"], r["cum_tokens"])
                 for r in budget_select(scored, budget_tokens=800,
                                        bucket_width=0.2).collect())
    assert alt == got


def test_budget_select_ties_never_straddle_buckets(spark):
    """Equal scores get equal buckets by construction; the cut inside a
    tie block is decided by doc_id alone, independent of partitioning."""
    from aser_spark.textops import budget_select

    scored = spark.createDataFrame(
        [(i, "en", 10, 0.5) for i in range(20)],
        "doc_id long, lang string, n_ws_tokens long, quality_score double")
    out = sorted(r["doc_id"] for r in
                 budget_select(scored, budget_tokens=55).collect())
    assert out == [0, 1, 2, 3, 4]
    alt = sorted(r["doc_id"] for r in
                 budget_select(scored.repartition(7),
                               budget_tokens=55).collect())
    assert alt == out


def test_chunk_documents_matches_serial_windows(spark):
    """Sliding-window chunking == the serial stride loop, including the
    short-final-chunk and the n <= seq_len single-chunk cases."""
    from aser_spark.textops import chunk_documents

    texts = {1: " ".join(f"w{i}" for i in range(25)),
             2: "a b c",
             3: " ".join(f"x{i}" for i in range(10)),
             4: " ".join(f"y{i}" for i in range(11))}
    docs = spark.createDataFrame(list(texts.items()),
                                 "doc_id long, text string")
    got = sorted((r.doc_id, r.chunk_idx, r.n_tokens, r.chunk_text)
                 for r in chunk_documents(docs, seq_len=10,
                                          overlap=2).collect())
    exp = []
    for doc_id, text in texts.items():
        toks, stride = text.split(), 8
        n = len(toks)
        k = 1 if n <= 10 else -(-(n - 10) // stride) + 1
        for i in range(k):
            w = toks[i * stride:i * stride + 10]
            exp.append((doc_id, i, len(w), " ".join(w)))
    assert got == sorted(exp)
    # every chunk boundary pair shares exactly `overlap` tokens
    by_doc = {}
    for d, i, n, t in got:
        by_doc.setdefault(d, []).append((i, t.split()))
    for d, chunks in by_doc.items():
        chunks.sort()
        for (_, a), (_, b) in zip(chunks, chunks[1:]):
            assert a[-2:] == b[:2], d

    import pytest
    with pytest.raises(ValueError):
        chunk_documents(docs, seq_len=8, overlap=8)


def test_chunk_documents_randomized_lengths(spark):
    """Randomized sweep over doc lengths (including 0, stride-boundary
    and off-by-one lengths) vs the serial stride loop — one DataFrame,
    one Spark round.  The serial mirror normalizes exactly like the
    operator (split on single spaces after collapse: empty text is ONE
    empty token, matching Spark's split semantics)."""
    import random
    import re

    from aser_spark.textops import chunk_documents

    random.seed(11)
    seq_len, overlap = 7, 3
    stride = seq_len - overlap
    lengths = list(range(0, 30)) + [random.randint(30, 200)
                                    for _ in range(40)]
    texts = {i: " ".join(f"t{i}_{j}" for j in range(n)) or ""
             for i, n in enumerate(lengths)}
    docs = spark.createDataFrame(list(texts.items()),
                                 "doc_id long, text string")
    got = sorted((r.doc_id, r.chunk_idx, r.n_tokens, r.chunk_text)
                 for r in chunk_documents(docs, seq_len=seq_len,
                                          overlap=overlap).collect())
    exp = []
    for doc_id, text in texts.items():
        toks = re.sub(r"\s+", " ", text.strip()).lower().split(" ")
        n = len(toks)
        k = 1 if n <= seq_len else -(-(n - seq_len) // stride) + 1
        for i in range(k):
            w = toks[i * stride:i * stride + seq_len]
            exp.append((doc_id, i, len(w), " ".join(w)))
    assert got == sorted(exp)


def test_temperature_mix_rates(spark):
    """τ=1 reproduces proportional mixing (uniform rates); τ→0 flattens
    toward equal per-stratum counts; budgeted rates hit the budget in
    expectation and cap at 1.0."""
    import pytest

    from aser_spark.textops import (stratified_hash_sample,
                                    temperature_mix_rates)

    counts = {"en": 8000, "fr": 1000, "de": 1000}
    # τ=1, no budget: pure proportional -> every stratum keeps everything
    r1 = temperature_mix_rates(counts, temperature=1.0)
    assert all(abs(v - 1.0) < 1e-12 for v in r1.values())
    # τ=0.3 up-weights low-resource strata: the smallest strata keep
    # everything, en scales down, and the kept counts hit the exact
    # n_i^τ proportions (no capping distortion)
    r = temperature_mix_rates(counts, temperature=0.3)
    assert r["fr"] == 1.0 and r["de"] == 1.0 and r["en"] < 1.0
    exp = {s: counts[s] * r[s] for s in counts}
    assert abs(exp["fr"] / exp["en"] - (1000 ** 0.3) / (8000 ** 0.3)) < 1e-9
    # budget: expected total equals the budget when no rate caps
    rb = temperature_mix_rates(counts, temperature=0.5, budget=2000)
    assert abs(sum(counts[s] * rb[s] for s in counts) - 2000) < 1e-6
    with pytest.raises(ValueError):
        temperature_mix_rates(counts, temperature=0.0)

    # composes with the distributed sampler: realized counts land within
    # md5-uniformity noise of the expectation
    docs = spark.createDataFrame(
        [(i, "en" if i < 4000 else ("fr" if i < 4500 else "de"), "x")
         for i in range(5000)], "doc_id long, lang string, text string")
    c = {"en": 4000, "fr": 500, "de": 500}
    rates = temperature_mix_rates(c, temperature=0.5, budget=1500)
    got = (stratified_hash_sample(docs, rates, strata_col="lang")
           .groupBy("lang").count().collect())
    realized = {r["lang"]: r["count"] for r in got}
    for s in c:
        assert abs(realized.get(s, 0) - c[s] * rates[s]) < 120, (s, realized)
