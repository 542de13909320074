"""Serving-style KG queries over the materialized graph tables — the
DataFrame re-expression of the reference's ZMQ server commands
(/root/reference/aser/utils/config.py:4-16, kg_connection.py:479-918).
All pure built-in-function plans: broadcastable lookups, window top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def exact_match_eventuality(nodes: DataFrame, words: list) -> DataFrame:
    """kg_connection.py:117-136 cache-key match: ' '.join(words) — the node
    table stores exactly that rendering."""
    return nodes.filter(F.col("words") == " ".join(words))


def related_eventualities(nodes: DataFrame, edges: DataFrame, eid: str) -> DataFrame:
    """J6 neighborhood fetch (kg_connection.py:871-918): out-edges of eid
    joined to tail nodes, ranked by total weight."""
    out = (
        edges.filter(F.col("hid") == eid)
        .groupBy("hid", "tid").agg(F.sum("weight").alias("total_weight"))
        .join(nodes.withColumnRenamed("eid", "tid"), "tid")
        .orderBy(F.desc("total_weight"))
    )
    return out.select("tid", "words", "pattern", "frequency", "total_weight")


def partial_match_top_k(nodes: DataFrame, words: list, k: int = 10,
                        threshold: float = 0.1) -> DataFrame:
    """T2 (kg_connection.py:479-528): Jaccard word-overlap ranking via
    array_intersect/array_union — JVM-side, no UDF."""
    probe = F.array(*[F.lit(w) for w in words])
    toks = F.split(F.col("words"), " ")
    sim = (
        F.size(F.array_intersect(toks, probe)) /
        F.size(F.array_union(toks, probe))
    ).alias("similarity")
    return (
        nodes.select("eid", "words", "pattern", "frequency", sim)
        .filter(F.col("similarity") >= threshold)
        # total order (eid tiebreak) so limit-k is deterministic
        .orderBy(F.desc("similarity"), F.desc("frequency"), F.asc("eid"))
        .limit(k)
    )


def predict_relation(edges: DataFrame, hid: str, tid: str) -> DataFrame:
    """Sense distribution between two eventualities (ASERCmd
    predict_relation)."""
    return edges.filter((F.col("hid") == hid) & (F.col("tid") == tid)) \
                .select("sense", "weight")


def top_edges_per_sense(edges: DataFrame, k: int = 10) -> DataFrame:
    """Window top-k: strongest pairs per discourse sense."""
    w = Window.partitionBy("sense").orderBy(F.desc("weight"),
                                            F.asc("hid"), F.asc("tid"))
    return (
        edges.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def sense_histogram(edges: DataFrame) -> DataFrame:
    """A3-style global metrics: per-sense edge counts + weight mass."""
    return edges.groupBy("sense").agg(
        F.count("*").alias("n_edges"),
        F.sum("weight").alias("total_weight"),
    )


def frequency_sweep(nodes: DataFrame, thresholds=(50.0, 30.0, 20.0, 10.0, 5.0, 3.0)) -> DataFrame:
    """A5 multi-threshold KG-shrinking sweep
    (examples/database/filter_kg.py:67-90) as ONE scan: bucket each node by
    the highest threshold it clears, then a cumulative window sum."""
    thr = sorted(thresholds)
    bucket = F.lit(None).cast("double")
    for t in thr:
        bucket = F.when(F.col("frequency") >= t, F.lit(t)).otherwise(bucket)
    counts = (
        nodes.withColumn("threshold_bucket", bucket)
        .filter(F.col("threshold_bucket").isNotNull())
        .groupBy("threshold_bucket").agg(F.count("*").alias("n"))
    )
    w = Window.orderBy(F.desc("threshold_bucket")) \
              .rowsBetween(Window.unboundedPreceding, 0)
    return counts.withColumn("n_nodes_at_or_above", F.sum("n").over(w)) \
                 .select(F.col("threshold_bucket").alias("threshold"),
                         "n_nodes_at_or_above")


def sample_nodes_per_pattern(nodes: DataFrame, n: int = 100,
                             salt: str = "sample") -> DataFrame:
    """Per-pattern eventuality sample — the reference's QA workflow
    (examples/sample/sample_eventualities.py:29-36: shuffle each
    pattern's eids, keep N) re-expressed deterministically: rank each
    pattern's nodes by a salted 60-bit md5 of the eid (an
    engine-portable shuffle — stable across runs, partitionings, and
    replayable by the DuckDB oracle) and keep rank <= n.

    One window per pattern partition — pattern cardinality is the 18
    extraction patterns, and the rank stops scanning after the sort, so
    the shape is a bounded top-k per small stratum, not a global sort.

    Output: (pattern, sample_rank, eid, words, frequency)."""
    from ..textops.dedup import _hash60

    h = _hash60(F.concat(F.col("eid"), F.lit("#" + salt)))
    w = Window.partitionBy("pattern").orderBy(h.asc(), F.col("eid").asc())
    return (
        nodes.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n)
        .select("pattern", "sample_rank", "eid", "words", "frequency")
    )


def sample_edges_per_sense(edges: DataFrame, n: int = 100,
                           salt: str = "sample") -> DataFrame:
    """Per-sense relation sample — examples/sample/sample_relations.py's
    np.random.shuffle-per-sense, deterministic (same salted-md5 order as
    sample_nodes_per_pattern, keyed on hid|tid).

    Output: (sense, sample_rank, hid, tid, weight)."""
    from ..textops.dedup import _hash60

    h = _hash60(F.concat_ws("|", F.col("hid"), F.col("tid"),
                            F.lit(salt)))
    w = Window.partitionBy("sense").orderBy(h.asc(), F.col("hid").asc(),
                                            F.col("tid").asc())
    return (
        edges.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n)
        .select("sense", "sample_rank", "hid", "tid", "weight")
    )
