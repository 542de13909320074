"""Entity linking: eventuality mentions -> KB entities.

The reference links NER mentions to Wikipedia ids with acronym expansion +
surface normalization + a disjoint-set merge of coreferent surface forms
(/root/reference/aser/extract/entity_linker.py:15-80+).  Spark-first
re-expression for the north-rule's "entity linking" stage:

* candidate mentions = the skeleton nouns of each eventuality (our parser
  emits no NER spans; with a real NER the mention column simply changes);
* surface normalization (lowercase, strip punctuation) + alias expansion is
  data, not code: the KB ships an alias table (alias -> entity_id, prior);
* linking = broadcast equi-join on the normalized alias, disambiguation =
  max-prior window per mention — the whole stage is two JVM-side operators,
  no per-row Python, and the KB side is broadcast so the fact side never
  shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def mention_candidates(nodes: DataFrame) -> DataFrame:
    """(eid, mention): the noun words of each eventuality."""
    full = F.arrays_zip(
        F.split(F.col("words"), " ").alias("w"),
        F.split(F.col("pos_tags"), " ").alias("t"),
    )
    nouns = F.filter(full, lambda p: p["t"].startswith("NN"))
    return (
        nodes.select("eid", F.explode(nouns).alias("m"))
        .select("eid", F.col("m.w").alias("mention"))
        .filter(F.length("mention") > 0)
        .distinct()
    )


def link_entities(nodes: DataFrame, kb_aliases: DataFrame) -> DataFrame:
    """(eid, mention, entity_id, prior): best-prior KB link per mention.

    kb_aliases: (alias string, entity_id string, prior double)."""
    cands = mention_candidates(nodes)
    norm = F.lower(F.regexp_replace(F.col("mention"), r"[^\w]", ""))
    joined = cands.withColumn("_alias", norm).join(
        F.broadcast(kb_aliases.withColumn("_alias", F.lower(F.col("alias")))),
        "_alias", "inner",
    )
    # disambiguation = argmax(prior) with min-entity_id tie-break, encoded as
    # ONE hash aggregation min(struct(-prior, entity_id)).  Unlike the
    # row_number window this combines map-side (no sort, no single-partition
    # funnel for hot mentions) — the 100 TB-safe shape.
    best = F.min(F.struct((-F.col("prior")).alias("np"),
                          F.col("entity_id").alias("entity_id"))).alias("best")
    return (
        joined.groupBy("eid", "mention").agg(best)
        .select("eid", "mention", F.col("best.entity_id").alias("entity_id"),
                F.round(-F.col("best.np"), 6).alias("prior"))
    )


def entity_cooccurrence_edges(links: DataFrame) -> DataFrame:
    """KG enrichment: entities co-mentioned in one eventuality."""
    a = links.select("eid", F.col("entity_id").alias("e1"))
    b = links.select("eid", F.col("entity_id").alias("e2"))
    return (
        a.join(b, "eid")
        .filter(F.col("e1") < F.col("e2"))
        .groupBy("e1", "e2")
        .agg(F.count("*").alias("n_cooccur"))
    )


def kb_rows() -> list:
    """Pure-Python rows of the deterministic alias KB — shared by the Spark
    DataFrame (`toy_kb`) and the oracle stager."""
    base = [
        "dog cat bird horse army boat order problem report car house coffee "
        "meeting server file test bug user answer plan team teacher engineer "
        "manager doctor lawyer farmer child friend neighbor key phone book "
        "garden kitchen office school station store letter song ticket".split()
    ][0]
    rows = []
    for i, w in enumerate(sorted(set(base))):
        eid = f"Q{1000 + i}"
        rows.append((w, eid, 0.9))
        rows.append((w + "s", eid, 0.6))          # crude plural alias
        rows.append((w.capitalize(), eid, 0.85))
    return rows


def toy_kb(spark) -> DataFrame:
    """Deterministic alias KB over the generator vocabulary (stand-in for a
    Wikipedia/Wikidata alias dump)."""
    return spark.createDataFrame(
        kb_rows(), "alias string, entity_id string, prior double")
