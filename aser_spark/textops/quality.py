"""Text analysis operators: token stats, quality scoring, language ID,
fingerprinting — all whole-stage-codegen expressions (no UDFs), each with a
DuckDB-reproducible formulation for the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_WS = r"\s+"
_WORD = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# tiny per-language stopword lists for the n-gram/stopword-hit heuristic
LANG_STOPWORDS = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it", "was", "for"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "sich", "auf"),
    "fr": ("le", "la", "les", "et", "est", "une", "dans", "que", "pour", "pas"),
    "es": ("el", "la", "los", "y", "es", "una", "en", "que", "por", "con"),
}


def _norm(col):
    return F.lower(F.regexp_replace(F.trim(col), _WS, " "))


def token_stats(documents: DataFrame) -> DataFrame:
    """Whitespace token count, BPE-ish regex token count, char length."""
    t = _norm(F.col("text"))
    return documents.select(
        "doc_id",
        F.length(t).alias("n_chars"),
        F.size(F.split(t, " ")).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(_WORD), 0)).alias("n_regex_tokens"),
    )


def _quality_exprs(text_col="text"):
    """The quality-gate feature expressions over one normalized text column
    (shared by quality_scores and scored_documents so composed pipelines
    compute the identical score in a single projection)."""
    t = _norm(F.col(text_col))
    n_chars = F.length(t)
    strip = lambda pat: (n_chars - F.length(F.regexp_replace(t, pat, "")))
    n_punct = strip(r"[^\w\s]")
    n_digit = strip(r"[^0-9]")
    tokens = F.split(t, " ")
    n_tok = F.size(tokens)
    n_stop = F.size(F.filter(tokens, lambda w: w.isin(*LANG_STOPWORDS["en"])))
    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6)
    digit_ratio = F.round(n_digit / F.greatest(n_chars, F.lit(1)), 6)
    stop_ratio = F.round(n_stop / F.greatest(n_tok, F.lit(1)), 6)
    mean_tok_len = F.round(n_chars / F.greatest(n_tok, F.lit(1)), 6)
    score = F.round(
        F.lit(1.0)
        - F.least(punct_ratio * 2, F.lit(0.5))
        - F.least(digit_ratio * 2, F.lit(0.3))
        + F.least(stop_ratio, F.lit(0.2)),
        6,
    )
    return {
        "punct_ratio": punct_ratio, "digit_ratio": digit_ratio,
        "stopword_ratio": stop_ratio, "mean_token_len": mean_tok_len,
        "quality_score": score, "n_ws_tokens": n_tok,
    }


def quality_scores(documents: DataFrame) -> DataFrame:
    """Length/punctuation/digit/stopword ratio features + a composite score
    (the standard pre-training quality gate shape)."""
    e = _quality_exprs()
    return documents.select(
        "doc_id", e["punct_ratio"].alias("punct_ratio"),
        e["digit_ratio"].alias("digit_ratio"),
        e["stopword_ratio"].alias("stopword_ratio"),
        e["mean_token_len"].alias("mean_token_len"),
        e["quality_score"].alias("quality_score"),
    )


def scored_documents(documents: DataFrame,
                     strata_col: str = "lang") -> DataFrame:
    """(doc_id, <stratum>, n_ws_tokens, quality_score) in ONE projection —
    the input shape budget_select consumes.  Composing quality_scores with
    token_stats would re-join on doc_id (a shuffle the single scan
    avoids); the expressions here are the same objects quality_scores
    builds, so the scores are identical by construction."""
    e = _quality_exprs()
    return documents.select(
        "doc_id", strata_col,
        e["n_ws_tokens"].cast("long").alias("n_ws_tokens"),
        e["quality_score"].alias("quality_score"),
    )


def language_id(documents: DataFrame) -> DataFrame:
    """Stopword-hit language heuristic: argmax of per-language stopword hit
    counts over the token set (deterministic tie-break by language code)."""
    tokens = F.split(_norm(F.col("text")), " ")

    def _counter(sw):
        return lambda w: w.isin(*sw)

    hits = {
        lang: F.size(F.filter(tokens, _counter(sw)))
        for lang, sw in LANG_STOPWORDS.items()
    }
    best = F.greatest(*hits.values())
    pred = F.lit("und")
    for lang in sorted(LANG_STOPWORDS, reverse=True):
        pred = F.when((hits[lang] == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return documents.select("doc_id", "lang", pred.alias("pred_lang"))


def document_fingerprint(documents: DataFrame) -> DataFrame:
    """Stable content fingerprints: full-text md5 + a locality-preserving
    prefix fingerprint (first 64 normalized chars) for clustering."""
    t = _norm(F.col("text"))
    return documents.select(
        "doc_id",
        F.md5(t).alias("fingerprint"),
        F.md5(F.substring(t, 1, 64)).alias("prefix_fingerprint"),
    )


# PII patterns, applied in this fixed order.  Kept to the regex subset on
# which Spark's Java regex and DuckDB's RE2 agree exactly (ASCII \d, \b,
# bounded quantifiers; no lookaround, no unicode classes) so the operator
# is oracle-checkable engine-to-engine.  Order matters only for the
# replacement pass (an earlier replacement must not synthesize a later
# pattern — the tokens contain no digits); counts are measured per type
# on the ORIGINAL text, independently.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("card", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b", "<CARD>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IPV4>"),
)


def scrub_pii(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """PII redaction — the standard pre-training scrub pass (emails, card
    numbers, SSNs, phone numbers, IPv4s -> typed placeholder tokens), as a
    pure whole-stage-codegen expression chain: one projection, no UDF, no
    shuffle — at 100 TB this is a scan-shaped pass that pipelines with
    whatever reads follow it.

    Output: (doc_id, text scrubbed, n_<type> match counts on the original
    text).  Counts use regexp_count (JVM); replacements apply the patterns
    in PII_PATTERNS order, each replacing ALL occurrences."""
    t = F.col(text_col)
    counts = [F.regexp_count(t, F.lit(pat)).alias(f"n_{name}")
              for name, pat, _ in PII_PATTERNS]
    scrubbed = t
    for _, pat, token in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, token)
    return documents.select("doc_id", scrubbed.alias("text"), *counts)


def repetition_stats(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Repetition-based quality features — the duplicate-fraction gates
    standard pre-training filters apply (Gopher/RefinedWeb shape):
    duplicate-token fraction and duplicate-bigram fraction over the
    normalized text.  Pure expression chain (array ops inside whole-stage
    codegen), no UDF, no shuffle — scan-shaped at any scale."""
    t = _norm(F.col(text_col))
    d = documents.select("doc_id", F.split(t, " ").alias("_tok"))
    big = F.expr(
        "CASE WHEN size(_tok) < 2 THEN array() "
        "ELSE transform(sequence(1, size(_tok) - 1), "
        "     i -> concat(element_at(_tok, i), ' ', element_at(_tok, i + 1))) "
        "END")
    n = F.size("_tok")
    nd = F.size(F.array_distinct("_tok"))
    out = d.select(
        "doc_id", n.alias("n_tokens"),
        F.round(F.lit(1) - nd / n, 6).alias("dup_token_ratio"),
        big.alias("_bg"))
    nb = F.size("_bg")
    ndb = F.size(F.array_distinct("_bg"))
    return out.select(
        "doc_id", "n_tokens", "dup_token_ratio",
        F.when(nb == 0, F.lit(0.0))
         .otherwise(F.round(F.lit(1) - ndb / nb, 6))
         .alias("dup_bigram_ratio"))


def grouped_quantiles(df: DataFrame, value_col: str, probs: list,
                      group_col: str = "lang") -> DataFrame:
    """Exact per-group quantiles with linear interpolation (the
    quantile_cont / numpy-linear definition: h = p*(n-1), interpolate
    between the floor(h)-th and ceil(h)-th order statistics) — the
    corpus-distribution profile every curation run reports (length
    percentiles per language/source before setting filter thresholds).

    Scale shape — a HISTOGRAM, not a per-group sort: Spark's exact
    ``percentile`` aggregate buffers every value of a group in one task's
    memory, which a 100 TB group kills.  Here the only shuffle is the
    map-side-combining groupBy(group, value) — for discrete-ish domains
    (token counts, char lengths, scores at fixed precision) that compact
    histogram is orders of magnitude smaller than the data — followed by
    a cumulative window over the histogram rows and one broadcast join of
    the tiny (group × prob) index table against the covering rows.

    Output: (``group_col``, prob, quantile), one row per group × prob.
    """
    spark = df.sparkSession
    vals = df.select(F.col(group_col).alias(group_col),
                     F.col(value_col).cast("double").alias("_v"))
    hist0 = vals.groupBy(group_col, "_v").agg(F.count("*").alias("_cnt"))
    w = (Window.partitionBy(group_col).orderBy("_v")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # _nxt (the next distinct value) makes the upper order statistic
    # available on the SAME covering row, so one join serves both ends of
    # the interpolation
    hist = (hist0.withColumn("_cum", F.sum("_cnt").over(w))
            .withColumn("_nxt", F.lead("_v").over(
                Window.partitionBy(group_col).orderBy("_v"))))
    # group sizes from the PRE-window histogram (sum of counts == max
    # running sum): the totals branch skips the window's sort — same
    # executed-plan rationale as selection.py's prefix-sum totals
    totals = hist0.groupBy(group_col).agg(F.sum("_cnt").alias("_n"))
    probs_df = spark.createDataFrame([(float(p),) for p in probs],
                                     "prob double")
    keyed = (totals.crossJoin(F.broadcast(probs_df))
             .withColumn("_h", F.col("prob") * (F.col("_n") - 1))
             .withColumn("_k_lo", F.floor("_h"))
             .withColumn("_k_hi", F.ceil("_h"))
             .withColumnRenamed(group_col, "_g"))
    # the histogram row covering 0-based index k spans [_cum-_cnt, _cum-1]
    j = hist.join(
        F.broadcast(keyed),
        (F.col(group_col) == F.col("_g"))
        & (F.col("_k_lo") >= F.col("_cum") - F.col("_cnt"))
        & (F.col("_k_lo") <= F.col("_cum") - 1))
    v_hi = F.when(F.col("_k_hi") <= F.col("_cum") - 1, F.col("_v")) \
            .otherwise(F.col("_nxt"))
    q = F.col("_v") + (F.col("_h") - F.col("_k_lo")) * (v_hi - F.col("_v"))
    return j.select(group_col, "prob", F.round(q, 6).alias("quantile"))
