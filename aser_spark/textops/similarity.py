"""Similarity search over an embedding column (array<float>).

* brute-force cosine top-k — zip_with/aggregate dot products (JVM-side),
  window top-k; the exact baseline.
* LSH ANN — random-hyperplane signatures; here the "hyperplanes" are the
  first P data vectors (deterministic, oracle-reproducible), sign-bit
  signature -> bucket join -> rerank inside buckets.  At scale the probe
  side only joins its own bucket, turning O(N*Q) into O(bucket) work, and
  the signature build is a single broadcast join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _d(a):
    """float32 -> float64 elementwise, so accumulation matches the DuckDB
    oracle (CAST(embedding AS DOUBLE[])) bit-for-bit."""
    return F.transform(a, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(_d(a), _d(b), lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm2(a):
    return F.sqrt(F.aggregate(F.transform(_d(a), lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine(a, b):
    return _dot(a, b) / (_norm2(a) * _norm2(b))


def brute_force_cosine_topk(embeddings: DataFrame, k: int = 5,
                            max_queries: int | None = None) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    The candidate side stays the full table; optionally bound the query
    side (the reasonable production shape: few queries against a broadcast
    or bucketed corpus)."""
    q = embeddings.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
    if max_queries is not None:
        q = q.filter(F.col("qid") < max_queries)
    c = embeddings.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    sim = F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim")
    pairs = q.join(c, F.col("qid") != F.col("cid")).select("qid", "cid", sim)
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("cid"))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "rank", "cid", "cos_sim"))


def hyperplane_signatures(embeddings: DataFrame, n_planes: int = 8) -> DataFrame:
    """Sign-bit LSH signature per vector; planes = the first ``n_planes``
    vectors of the table itself (deterministic, no RNG, reproducible in
    SQL).  Output: (vec_id, sig) with sig a bit-string like '01101010'."""
    planes = (
        embeddings.filter(F.col("vec_id") < n_planes)
        .select(F.col("vec_id").alias("plane_id"), F.col("embedding").alias("pv"))
    )
    crossed = embeddings.crossJoin(F.broadcast(planes))
    bit = F.when(_dot(F.col("embedding"), F.col("pv")) >= 0, F.lit("1")).otherwise(F.lit("0"))
    return (
        crossed.select("vec_id", "plane_id", bit.alias("bit"))
        .groupBy("vec_id")
        .agg(F.concat_ws("", F.transform(
            F.array_sort(F.collect_list(F.struct("plane_id", "bit"))),
            lambda s: s["bit"],
        )).alias("sig"))
    )


def lsh_ann_topk(embeddings: DataFrame, k: int = 5, n_planes: int = 8) -> DataFrame:
    """Approximate top-k: candidates share the signature bucket; exact
    cosine rerank inside the bucket only."""
    sig = hyperplane_signatures(embeddings, n_planes)
    e = embeddings.join(sig, "vec_id")
    q = e.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"), "sig")
    c = e.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"),
                 F.col("sig").alias("csig"))
    pairs = q.join(c, (F.col("sig") == F.col("csig")) & (F.col("qid") != F.col("cid")))
    sim = F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim")
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("cid"))
    return (pairs.select("qid", "cid", sim)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "rank", "cid", "cos_sim"))
