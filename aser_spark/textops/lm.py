"""Corpus-statistics language-model operators: unigram log-probability
scoring and TF-IDF keyword extraction — the perplexity-gate /
keyword-profile shape of pre-training data curation (a KenLM-style gate
without a binary model dependency: the corpus itself is the model).

Scale posture (100 TB): both operators are two-pass corpus aggregations.
Pass 1 builds the token statistics with a map-side-combining hash agg on
the token key (high-cardinality but combinable — partial aggregation
collapses each task's counts before the exchange).  Pass 2 re-joins the
per-token statistic to the exploded corpus on the same token key; at real
scale the statistics table is Zipf-skewed but SMALL relative to the
corpus (vocabulary, not tokens), so AQE either broadcasts it outright or
skew-splits the few head-token partitions.  The only scalars (corpus
token mass, document count) are single-row aggregates collected on the
driver — bounded by construction.  No Python anywhere: split/explode/
ln are whole-stage-codegen expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .quality import _norm


def _doc_tokens(documents: DataFrame) -> DataFrame:
    """(doc_id, token) exploded rows; empty tokens dropped so the
    whitespace normalizer can't inject ''."""
    toks = F.split(_norm(F.col("text")), " ")
    return (
        documents.select("doc_id", F.explode(toks).alias("token"))
        .filter(F.length("token") > 0)
    )


def unigram_logprob(documents: DataFrame) -> DataFrame:
    """Average natural-log unigram probability per document, with the
    unigram model estimated from the same corpus (self-perplexity — the
    standard in-distribution quality gate; decontaminated scoring just
    swaps the model side for a reference-corpus aggregate).

    Output: (doc_id, n_tokens, avg_logprob) — avg_logprob rounded to 6dp,
    higher (closer to 0) = more typical text.
    """
    tok = _doc_tokens(documents)
    counts = tok.groupBy("token").agg(F.count("*").alias("tok_count"))
    # corpus token mass: one-row aggregate (bounded driver collect, same
    # convention as store.py scalar masses)
    total = counts.agg(F.sum("tok_count")).collect()[0][0]
    scored = tok.join(counts, "token")
    return (
        scored.groupBy("doc_id")
        .agg(F.count("*").alias("n_tokens"),
             F.round(F.avg(F.log(F.col("tok_count") / F.lit(float(total)))), 6)
              .alias("avg_logprob"))
    )


def tfidf_top_terms(documents: DataFrame, k: int = 5) -> DataFrame:
    """Top-k TF-IDF terms per document: tf(doc, term) * ln(N / df(term)).

    Ranking is on the ROUNDED (6dp) score with a token tie-break, so the
    cut is deterministic and engine-portable (an unrounded float order
    could flip sub-ulp ties between engines).  Output: (doc_id, rank,
    token, tfidf).
    """
    tok = _doc_tokens(documents)
    n_docs = documents.select(F.countDistinct("doc_id")).collect()[0][0]
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df_ = tok.select("doc_id", "token").distinct() \
             .groupBy("token").agg(F.count("*").alias("df"))
    scored = tf.join(df_, "token").select(
        "doc_id", "token",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6)
         .alias("tfidf"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "rank", "token", "tfidf")
    )
