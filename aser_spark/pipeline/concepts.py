"""Conceptualization: eventualities -> abstracted concepts -> concept KG.

Re-expresses the reference's conceptualize stack
(/root/reference/aser/conceptualize/aser_conceptualizer.py,
conceptualize/utils.py:8-68, concept.py:28-38,91-103) as DataFrame plans:

* seed-rule abstraction (H6): personal pronouns -> __PERSON__<i> numbered by
  first occurrence among the eventuality's distinct pronouns
  (aser_conceptualizer.py:63-96) — pure array expressions, no UDF.
* probase-style hypernym lift (J7/T3): broadcast join nouns against a
  (instance, concept, likelihood) table, window top-k per instance
  (concept.py:165-191, probase_topk config.py:118-119).  We materialize the
  single-substitution expansion (the reference's beam restricted to
  combination size 1 — the dominant mass; its full combinatorial beam is a
  driver-side heap, not a scalable plan).
* A4 score aggregation: cid -> sum(score * frequency), cid = sha1(words),
  pid = sha1(cid$eid) — JVM-side sha1.
* J5 concept-relation join: pairs ⋈ relations ⋈ pairs with score products
  (conceptualize/utils.py:37-68).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# aser_conceptualizer.py:46-49
PERSON_PRONOUNS = ("he", "she", "i", "him", "her", "me", "woman", "man",
                   "boy", "girl", "you", "we", "they")


def seed_rule_concepts(nodes: DataFrame) -> DataFrame:
    """(eid, concept_words, score=1.0): pronoun-abstracted eventuality.

    '__PERSON__<i>' numbering = index of the word among the DISTINCT
    pronouns of this eventuality in first-occurrence order — exactly the
    reference's ners_dict counter semantics."""
    toks = F.split(F.col("words"), " ")
    prons = F.array(*[F.lit(p) for p in PERSON_PRONOUNS])
    distinct_prons = F.array_distinct(F.filter(toks, lambda w: F.array_contains(prons, w)))
    abstracted = F.transform(
        toks,
        lambda w: F.when(
            F.array_contains(prons, w),
            F.concat(F.lit("__PERSON__"),
                     (F.array_position(distinct_prons, w) - 1).cast("string")),
        ).otherwise(w),
    )
    return nodes.select(
        "eid", "pattern", "frequency",
        F.concat_ws(" ", abstracted).alias("concept_words"),
        F.lit(1.0).alias("score"),
    )


def probase_concepts(nodes: DataFrame, probase: DataFrame, topk: int = 3,
                     min_frequency: float = 0.0,
                     broadcast: bool = True) -> DataFrame:
    """Single-noun hypernym substitutions over the seed-abstracted words.

    probase: (instance string, concept string, likelihood double).
    Output: (eid, pattern, frequency, concept_words, score) — one row per
    (eventuality, substituted concept).

    ``min_frequency``: the reference conceptualizes only eventualities with
    frequency >= 5 by default (aser-pipe --concept_min_frequency,
    /root/reference/aser/utils/config.py:113-116) — pass 5.0 for the
    faithful pipeline configuration.

    ``broadcast``: join-strategy control for the probe join.  True (the
    default) HINTS a broadcast of the top-k-filtered probase — right for
    the toy/test dimension and for any dump whose per-instance top-k
    projection fits executor memory.  For a REAL Probase-scale dump (the
    reference loads ~30M rows, concept.py:64-77 — top-3 per instance is
    still ~10M rows / several hundred MB), pass False: the hint would
    force an oversized broadcast, while without it Catalyst plans a
    shuffled join on ``word = instance`` and AQE still downgrades it to a
    broadcast at runtime if the filtered side turns out small.  The
    plan-shape contract is pinned by tests/test_plan_shapes.py."""
    if min_frequency > 0:
        nodes = nodes.filter(F.col("frequency") >= F.lit(min_frequency))
    seed = seed_rule_concepts(nodes)
    w = Window.partitionBy("instance").orderBy(F.desc("likelihood"), F.asc("concept"))
    top = (
        probase.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("instance", F.regexp_replace("concept", " ", "-").alias("concept"),
                "likelihood")
    )
    if broadcast:
        top = F.broadcast(top)
    toks = F.posexplode(F.split(F.col("concept_words"), " ")).alias("pos", "word")
    exploded = seed.select("eid", "pattern", "frequency", "concept_words", toks)
    hits = exploded.join(top, exploded.word == top.instance, "inner")
    substituted = hits.select(
        "eid", "pattern", "frequency",
        F.concat_ws(" ", F.transform(
            F.split(F.col("concept_words"), " "),
            lambda ww: F.when(ww == F.col("word"), F.col("concept")).otherwise(ww),
        )).alias("concept_words"),
        F.col("likelihood").alias("score"),
    )
    return seed.unionByName(substituted)


def probase_concepts_multi(nodes: DataFrame, probase: DataFrame, topk: int = 3,
                           max_subs: int = 2,
                           min_frequency: float = 0.0,
                           global_topk: int | None = None,
                           broadcast: bool = True) -> DataFrame:
    """MULTI-noun hypernym substitution — the reference's combination beam
    (aser_conceptualizer.py:168-215) re-expressed as ``max_subs`` rounds of
    DataFrame expansion instead of a driver-side heap.

    Level k substitutes k distinct matched words of the SEED string in
    ascending word order (each subset enumerated exactly once); the score
    of a combination is the product of its substitutions' likelihoods,
    exactly the reference's ``prob * c_prob`` chain.  Divergences, chosen
    for scale: (a) the reference bounds output with a global
    ``topk**topk``-size score heap — a driver structure; we bound by
    subset size, which is the plan-shaped equivalent (eventualities have
    <= ~4 nouns, so max_subs=2..3 covers the reference's mass); (b)
    substitution is by word VALUE (all occurrences), not token index — the
    two differ only if a substituted concept string equals another
    instance word, which Probase's concept vocabulary avoids."""
    if min_frequency > 0:
        nodes = nodes.filter(F.col("frequency") >= F.lit(min_frequency))
    seed = seed_rule_concepts(nodes)
    w = Window.partitionBy("instance").orderBy(F.desc("likelihood"), F.asc("concept"))
    top = (
        probase.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("instance", F.regexp_replace("concept", " ", "-").alias("concept"),
                "likelihood")
    )
    if broadcast:
        top = F.broadcast(top)
    base = seed.select(
        "eid", "pattern", "frequency",
        F.col("concept_words").alias("_orig"),
        "concept_words", "score", F.lit("").alias("_last"))
    levels = [base]
    cur = base
    for _ in range(max_subs):
        cand = cur.select(
            "eid", "pattern", "frequency", "_orig", "concept_words", "score",
            F.explode(F.array_distinct(F.filter(
                F.split(F.col("_orig"), " "),
                lambda x: x > F.col("_last")))).alias("word"))
        hits = cand.join(top, cand.word == top.instance, "inner")
        cur = hits.select(
            "eid", "pattern", "frequency", "_orig",
            F.concat_ws(" ", F.transform(
                F.split(F.col("concept_words"), " "),
                lambda ww: F.when(ww == F.col("word"), F.col("concept")).otherwise(ww),
            )).alias("concept_words"),
            (F.col("score") * F.col("likelihood")).alias("score"),
            F.col("word").alias("_last"))
        levels.append(cur)
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    out = out.select("eid", "pattern", "frequency", "concept_words", "score")
    if global_topk:
        # the reference's global per-eventuality beam bound: keep the
        # topk**topk best-scoring combinations (its heap,
        # aser_conceptualizer.py:173-207), expressed as a rank window.
        # The window partitions on eid — a fact key — but its input is the
        # already-bounded combination expansion of the (frequency-gated)
        # conceptualized nodes, not raw instances, so no hot-key funnel.
        # Remaining documented divergence: the reference's early-break
        # heuristic (:201-206) can stop enumerating large subsets early.
        wk = Window.partitionBy("eid").orderBy(F.desc("score"),
                                               F.asc("concept_words"))
        out = (out.withColumn("_r", F.row_number().over(wk))
               .filter(F.col("_r") <= global_topk).drop("_r"))
    return out


def probase_concepts_exact(nodes: DataFrame, probase_rows_list: list,
                           topk: int = 3,
                           min_frequency: float = 0.0) -> DataFrame:
    """REFERENCE-EXACT conceptualization: per-eventuality heap beam with the
    reference's `topk**topk` cut, tie ordering, early break, and fallback
    (concepts_exact.py — bit-parity-tested against the reference class).

    Plan shape: the work is per-row bounded (<= topk^topk combinations per
    eventuality), so this is ONE Arrow-batched mapInPandas pass — no
    shuffle, no window.  The probase index rides the task closure like the
    reference's in-worker Probase dict; for a multi-GB real dump prefer the
    bounded DataFrame expansion (probase_concepts_multi), which keeps the
    dimension broadcast-joined instead of materialized per worker.

    nodes needs (eid, pattern, frequency, words, pos_tags, ners); output is
    one row per (eventuality, beam entry) with the reference's rank."""
    from .concepts_exact import build_probase_index, exact_concept_rows

    if min_frequency > 0:
        nodes = nodes.filter(F.col("frequency") >= F.lit(min_frequency))
    index = build_probase_index(probase_rows_list)
    src = nodes.select("eid", "pattern", "frequency", "words", "pos_tags",
                       "ners")
    schema = ("eid string, pattern string, frequency double, words string, "
              "rank int, concept_words string, score double")

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in ("eid", "pattern", "frequency", "words",
                                   "rank", "concept_words", "score")}
            for eid, pattern, freq, words, pos, ners in pdf.itertuples(index=False):
                toks = words.split(" ")
                ner_list = ners.split(" ") if ners else ["O"] * len(toks)
                for rank, cstr, score in exact_concept_rows(
                        toks, pos.split(" "), ner_list, index, topk):
                    out["eid"].append(eid)
                    out["pattern"].append(pattern)
                    out["frequency"].append(freq)
                    out["words"].append(words)
                    out["rank"].append(rank)
                    out["concept_words"].append(cstr)
                    out["score"].append(score)
            yield pd.DataFrame(out)

    return src.mapInPandas(gen, schema)


def aggregate_concepts(concepts: DataFrame):
    """-> (concept nodes with summed scores, concept-instance pairs).

    cid = sha1(concept_str) (concept.py:28-38); pid = sha1(cid$eid)
    (concept.py:91-103); cid score = sum(score * frequency)
    (conceptualize/utils.py:8-34)."""
    with_cid = concepts.withColumn("cid", F.sha1(F.encode("concept_words", "utf-8")))
    concept_nodes = (
        with_cid.groupBy("cid")
        .agg(F.any_value("concept_words").alias("words"),
             F.sum(F.col("score") * F.col("frequency")).alias("score"),
             F.count("*").alias("n_instances"))
    )
    # one pair per (cid, eid) with DETERMINISTIC score = max over duplicate
    # derivations (dropDuplicates would keep an arbitrary row when the same
    # concept string arises from different substitutions)
    pairs = (
        with_cid.groupBy("cid", "eid")
        .agg(F.any_value("pattern").alias("pattern"), F.max("score").alias("score"))
        .withColumn("pid", F.sha1(F.concat_ws("$", "cid", "eid")))
        .select("pid", "cid", "eid", "pattern", "score")
    )
    return concept_nodes, pairs


def build_concept_relations(pairs: DataFrame, edges: DataFrame) -> DataFrame:
    """J5: lift eventuality edges to concept edges with score products
    (conceptualize/utils.py:37-68): weight(h_cid, sense, t_cid) =
    sum over instance pairs of w * s_h * s_t, excluding self-loops."""
    h = pairs.select(F.col("cid").alias("h_cid"), F.col("eid").alias("hid"),
                     F.col("score").alias("h_score"))
    t = pairs.select(F.col("cid").alias("t_cid"), F.col("eid").alias("tid"),
                     F.col("score").alias("t_score"))
    return (
        edges.join(h, "hid").join(t, "tid")
        .filter(F.col("h_cid") != F.col("t_cid"))
        .groupBy("h_cid", "t_cid", "sense")
        .agg(F.sum(F.col("weight") * F.col("h_score") * F.col("t_score")).alias("weight"))
        .withColumn("rid", F.sha1(F.concat_ws("$", "h_cid", "t_cid")))
        .select("rid", "h_cid", "t_cid", "sense", "weight")
    )


def probase_rows() -> list:
    """Pure-Python rows of the deterministic hypernym table — shared by the
    Spark DataFrame (`toy_probase`) and the oracle stager so DuckDB sees the
    identical dimension."""
    rows = []
    taxonomy = {
        "animal": ["dog", "cat", "bird", "horse"],
        "person": ["teacher", "doctor", "farmer", "manager", "lawyer",
                   "engineer", "child", "friend", "neighbor", "user"],
        "vehicle": ["car", "boat", "bus", "train", "bike"],
        "building": ["house", "school", "office", "hospital", "station", "store"],
        "document": ["report", "letter", "book", "file", "message", "ticket"],
        "artifact": ["key", "phone", "computer", "guitar", "piano", "picture"],
        "food": ["coffee", "cake", "bread", "soup", "dinner"],
        "issue": ["problem", "bug", "mistake", "question"],
        "event": ["meeting", "test", "game", "party"],
        "group": ["team", "army", "family"],
    }
    for concept, instances in taxonomy.items():
        for i, inst in enumerate(instances):
            rows.append((inst, concept, round(0.9 - 0.05 * i, 4)))
            rows.append((inst, "entity", 0.2))
    return rows


def toy_probase(spark) -> DataFrame:
    """Deterministic hypernym table over the generator vocabulary — the
    stand-in for the real Probase dump (external data is out of scope);
    schema-compatible so a real dump drops in unchanged."""
    return spark.createDataFrame(
        probase_rows(), "instance string, concept string, likelihood double")


def load_probase(spark, path: str, score_method: str = "likelihood") -> DataFrame:
    """REAL Probase dump loader: `data-concept-instance-relations.txt`
    (TSV: concept \\t instance \\t co-occurrence freq) -> the
    (instance, concept, likelihood) table every conceptualization operator
    here consumes — a drop-in for ``toy_probase``.

    Scoring mirrors the reference (concept.py:165-191):
    likelihood = co_occurrence / instance_freq;
    pmi = co_occurrence / concept_freq / instance_freq.
    Pure DataFrame plan (csv scan + windowed normalizations), so a
    multi-GB dump loads distributed instead of into a driver dict."""
    from pyspark.sql import Window as W

    raw = (spark.read.option("sep", "\t").csv(path)
           .toDF("concept", "instance", "freq")
           .withColumn("freq", F.col("freq").cast("double")))
    w_inst = W.partitionBy("instance")
    scored = raw.withColumn("_inst_freq", F.sum("freq").over(w_inst))
    if score_method == "likelihood":
        score = F.col("freq") / F.col("_inst_freq")
    elif score_method == "pmi":
        w_con = W.partitionBy("concept")
        scored = scored.withColumn("_con_freq", F.sum("freq").over(w_con))
        score = F.col("freq") / F.col("_con_freq") / F.col("_inst_freq")
    else:
        raise NotImplementedError(score_method)
    return scored.select("instance", "concept", score.alias("likelihood"))
