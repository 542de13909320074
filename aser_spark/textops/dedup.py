"""Deduplication operators over a ``documents(doc_id, text, ...)`` table.

Four escalating strategies, all oracle-reproducible (md5-hex arithmetic):

* exact          — hash-groupBy on normalized text (one shuffle, short key)
* n-gram Jaccard — character-shingle set overlap via explode + equi-join on
                   the gram, banded by length so the self-join never goes
                   quadratic in the corpus
* MinHash + LSH  — k salted min-hashes -> bands -> bucket join; pair cost is
                   ~|bucket|^2 only inside colliding buckets
* SimHash        — per-bit weighted majority over token hashes -> compact
                   signature; near-dups differ in few bits

All hash primitives are ``conv(substr(md5(x),1,15),16,10)`` so a DuckDB
oracle reproduces every value bit-for-bit
(``CAST('0x'||substr(md5(x),1,15) AS BIGINT)``).  At 100 TB the only
quadratic danger is the pair join; both LSH and the gram join are bucketed
so work is proportional to actual collisions, and AQE skew-join splits
pathological buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_WS = r"\s+"


def _norm(col):
    return F.lower(F.regexp_replace(F.trim(col), _WS, " "))


def _hash60(col):
    """60-bit integer hash (md5-prefix), DuckDB-reproducible."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def exact_duplicates(documents: DataFrame) -> DataFrame:
    """Normalized-text hash groups with >1 member."""
    return (
        documents
        .select("doc_id", F.md5(_norm(F.col("text"))).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("canonical_doc_id"))
        .filter(F.col("n_dups") > 1)
    )


def doc_grams(documents: DataFrame, n: int = 3,
              distinct: bool = True) -> DataFrame:
    """Character n-grams per document (explode positions + substr —
    whole-stage-codegen expressions only), de-duplicated per document by
    default.  ``distinct=False`` skips the dedup EXCHANGE for consumers
    whose downstream aggregate is duplicate-insensitive (min over salted
    hashes in ``minhash_signatures``): same results, one shuffle less."""
    g = (
        documents
        .select("doc_id", _norm(F.col("text")).alias("_t"))
        .select("doc_id", "_t",
                F.explode(F.sequence(
                    F.lit(1), F.greatest(F.length("_t") - (n - 1), F.lit(1))
                )).alias("i"))
        .select("doc_id", F.expr(f"substr(_t, i, {n})").alias("gram"))
    )
    return g.distinct() if distinct else g


def ngram_jaccard_pairs(documents: DataFrame, n: int = 3,
                        threshold: float = 0.8,
                        length_band: int = 16,
                        max_gram_df: int | None = None) -> DataFrame:
    """Near-duplicate pairs by character-n-gram Jaccard similarity.

    Scale bounds on the gram self-join:

    * ``max_gram_df`` — STOP-GRAM pruning: grams appearing in more than
      this many documents are dropped BEFORE the join (their buckets go
      quadratic in corpus size — a gram like ``'the'`` is in ~every doc).
      Jaccard is then computed over the pruned (informative-gram) universe
      consistently — numerator AND denominators — so two documents
      differing only in boilerplate score by their distinctive content,
      the idf-style semantics a near-dup detector wants.  REQUIRED at
      corpus scale; None only for tiny exact comparisons.
    * length banding — pairs are kept when floor(len/band) differs by at
      most 1 (adjacent bands included, so near-dups straddling a band
      boundary are NOT silently missed); with the df cutoff in place this
      is a filter, not the join key.
    """
    from pyspark.sql import Window

    # len_band is a per-document scalar: compute it inline on the document
    # row BEFORE the gram explode and carry it through (functionally
    # dependent on doc_id, so the per-document distinct set is unchanged)
    # instead of re-scanning ``documents`` for a second join — one scan and
    # two exchanges fewer than the join-back shape.
    g = (
        documents
        .select("doc_id", _norm(F.col("text")).alias("_t"))
        .select("doc_id", "_t",
                (F.length("_t") / length_band).cast("int").alias("len_band"),
                F.explode(F.sequence(
                    F.lit(1), F.greatest(F.length("_t") - (n - 1), F.lit(1))
                )).alias("i"))
        .select("doc_id", "len_band", F.expr(f"substr(_t, i, {n})").alias("gram"))
        .distinct()
    )
    if max_gram_df is not None:
        # df pruning stays a combining groupBy + semi-join (NOT a window
        # partitioned by gram): a stop-gram's rows would all land in ONE
        # window task, while the hash agg combines map-side and the join
        # is AQE-skew-splittable.
        keep = (g.groupBy("gram").agg(F.count("*").alias("df"))
                .filter(F.col("df") <= max_gram_df).select("gram"))
        g = g.join(keep, "gram", "left_semi")
    # per-document gram count as a window over doc_id (bounded by document
    # length — no skew exposure) instead of a groupBy + join-back: one
    # exchange instead of two.
    g = g.withColumn("n_grams", F.count("*").over(Window.partitionBy("doc_id")))

    a, b = g.alias("a"), g.alias("b")
    inter = (
        a.join(b, (F.col("a.gram") == F.col("b.gram")) &
                  (F.col("a.doc_id") < F.col("b.doc_id")) &
                  (F.abs(F.col("a.len_band") - F.col("b.len_band")) <= 1))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
                 F.col("a.n_grams").alias("na"), F.col("b.n_grams").alias("nb"))
        .agg(F.count("*").alias("inter"))
    )
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(documents: DataFrame, n: int = 4,
                       num_perm: int = 16) -> DataFrame:
    """(doc_id, perm, minhash) long-form signatures — k salted min-hashes
    over character n-gram shingles.

    Plan shape: per-gram hash ARRAY for all perms (computed once per gram,
    whole-stage codegen), posexplode to (doc_id, perm, h), then ONE
    partial+final min aggregation.  Higher-order fold alternatives
    (aggregate over collect_list) are CodegenFallback — interpreted per
    element — and benchmarked ~30x slower.

    ``distinct=False`` on the gram stream: min() is duplicate-insensitive,
    so pre-deduplicating grams only added a full (doc_id, gram) shuffle
    before the combining min aggregation — identical signatures, one
    exchange instead of two."""
    g = doc_grams(documents, n, distinct=False)
    hashes = F.array(*[
        _hash60(F.concat(F.col("gram"), F.lit(f"#{p}"))) for p in range(num_perm)
    ])
    return (
        g.select("doc_id", F.posexplode(hashes).alias("perm", "h"))
        .groupBy("doc_id", "perm")
        .agg(F.min("h").alias("minhash"))
    )


def lsh_candidate_pairs(signatures: DataFrame, bands: int = 4) -> DataFrame:
    """Band the long-form signatures and bucket-join: documents sharing any
    full band hash are near-duplicate candidates."""
    band_sig = (
        signatures.withColumn("band", F.col("perm") % bands)
        .groupBy("doc_id", "band")
        .agg(F.md5(F.concat_ws(",", F.sort_array(F.collect_list(
            F.concat_ws(":", "perm", "minhash"))))).alias("band_hash"))
    )
    a, b = band_sig.alias("a"), band_sig.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) &
                  (F.col("a.band_hash") == F.col("b.band_hash")) &
                  (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def near_dup_groups(documents: DataFrame, n: int = 4, num_perm: int = 16,
                    bands: int = 4) -> DataFrame:
    """The full production dedup shape (the FineWeb/SlimPajama pipeline):
    MinHash signatures -> banded LSH candidate pairs -> connected
    components -> one row per document with its duplicate-group id and a
    canonical flag (keep ``is_canonical = 1``, drop the rest).

    Components use large-star/small-star (graphops.py) — bounded-round CC,
    so a 100 TB corpus whose duplicate graph has long chains (doc A ~ B ~ C
    ... through drifting boilerplate) still resolves in O(log^2 n) rounds.
    group_id = the smallest doc_id of the group; documents with no
    near-duplicate are their own singleton group."""
    from ..graphops import connected_components_star

    pairs = lsh_candidate_pairs(minhash_signatures(documents, n, num_perm), bands)
    comp = (connected_components_star(pairs, src="doc_a", dst="doc_b")
            .withColumnRenamed("node", "doc_id"))
    return (
        documents.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("group_id"))
        .withColumn("is_canonical",
                    (F.col("doc_id") == F.col("group_id")).cast("int"))
    )


def simhash(documents: DataFrame, bits: int = 16) -> DataFrame:
    """Per-document SimHash over distinct tokens: sign of the per-bit sum of
    +1/-1 contributions from each token's 60-bit hash."""
    tok = (
        documents
        .select("doc_id", F.explode(F.split(_norm(F.col("text")), " ")).alias("token"))
        .filter(F.length("token") > 0)
        .distinct()
        .withColumn("h", _hash60(F.col("token")))
    )
    # ONE combining aggregation with a ±1 sum per bit (16 agg expressions)
    # instead of exploding every token row x bits and aggregating twice:
    # same per-bit sums, same sign rule, same packed value — minus the
    # bits-fold row amplification and one whole exchange.
    per_bit = tok.groupBy("doc_id").agg(*[
        F.sum(F.when(F.expr(f"(h >> {b}) & 1") == 1, F.lit(1))
              .otherwise(F.lit(-1))).alias(f"_s{b}")
        for b in range(bits)
    ])
    packed = None
    for b in range(bits):
        term = F.when(F.col(f"_s{b}") > 0, F.lit(1 << b).cast("bigint")) \
                .otherwise(F.lit(0).cast("bigint"))
        packed = term if packed is None else packed + term
    return per_bit.select("doc_id", packed.alias("simhash"))
