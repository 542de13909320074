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


def _pair_dot_udf():
    """Vectorized (Arrow) pandas UDF computing per-pair dot products with
    SEQUENTIAL per-dimension double accumulation — bit-identical to the
    higher-order-function fold (and the DuckDB list_dot_product oracle),
    but vectorized ACROSS pairs with numpy, ~20x faster than the
    CodegenFallback HOF path on wide pair joins."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def dot(a, b):
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        A = np.asarray(a.tolist(), dtype=np.float64)
        B = np.asarray(b.tolist(), dtype=np.float64)
        acc = np.zeros(len(A), dtype=np.float64)
        for d in range(A.shape[1]):          # sequential over dims,
            acc += A[:, d] * B[:, d]         # vectorized over pairs
        return pd.Series(acc)

    # real (non-stringified) annotations — this module uses
    # `from __future__ import annotations`, which pandas_udf can't introspect
    dot.__annotations__ = {"a": pd.Series, "b": pd.Series, "return": pd.Series}
    return pandas_udf(dot, "double")


def _with_norms(embeddings: DataFrame, id_alias: str, v_alias: str, n_alias: str):
    """Project (id, double-vector, norm): the O(N) per-vector work happens
    once here instead of once per pair."""
    return embeddings.select(
        F.col("vec_id").alias(id_alias),
        _d(F.col("embedding")).alias(v_alias),
        _norm2(F.col("embedding")).alias(n_alias),
    )


def brute_force_cosine_topk(embeddings: DataFrame, k: int = 5,
                            max_queries: int | None = None) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Plan: the (bounded) query block is broadcast as a dense matrix; ONE
    ``mapInPandas`` pass over the candidate side emits (qid, cid, sim)
    triples.  The naive inequality-join alternative ships both 64-dim
    vectors per PAIR through the exchange (O(pairs·dim) bytes); this ships
    candidates once (O(N·dim)) — ~10x faster at sf0.1 and the gap widens
    with corpus size.  Accumulation stays sequential over dimensions
    (vectorized over rows), bit-identical to the fold semantics the DuckDB
    oracle reproduces."""
    import pandas as pd

    spark = embeddings.sparkSession
    q = embeddings
    if max_queries is not None:
        q = q.filter(F.col("vec_id") < max_queries)
    q_rows = q.select("vec_id", "embedding").collect()  # bounded query batch
    if not q_rows:
        return spark.createDataFrame([], "qid long, rank int, cid long, cos_sim double")

    import numpy as np

    qids = np.array([r.vec_id for r in q_rows], dtype=np.int64)
    Q = np.asarray([list(r.embedding) for r in q_rows], dtype=np.float64)
    qn = _seq_norms(Q)
    bc = spark.sparkContext.broadcast((qids, Q, qn))

    def run(batches):
        qids_, Q_, qn_ = bc.value
        nq, dim = Q_.shape
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.asarray(pdf["embedding"].tolist(), dtype=np.float64)
            cids = pdf["vec_id"].to_numpy(dtype=np.int64)
            acc = np.zeros((len(C), nq), dtype=np.float64)
            for d in range(dim):                    # sequential over dims
                acc += C[:, d:d + 1] * Q_[None, :, d]
            cn = _seq_norms(C)
            sim = acc / (cn[:, None] * qn_[None, :])
            qcol = np.repeat(qids_[None, :], len(C), axis=0).ravel()
            ccol = np.repeat(cids, nq)
            scol = np.round(sim.ravel(), 6)
            mask = qcol != ccol
            yield pd.DataFrame({"qid": qcol[mask], "cid": ccol[mask],
                                "cos_sim": scol[mask]})

    pairs = embeddings.select("vec_id", "embedding").mapInPandas(
        run, schema="qid long, cid long, cos_sim double")
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("cid"))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "rank", "cid", "cos_sim"))


def embedding_near_duplicates(embeddings: DataFrame, threshold: float = 0.95,
                              n_planes: int = 8) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the fifth dedup strategy):
    LSH signature buckets bound the candidate set, exact cosine rerank
    inside buckets, keep pairs with cos >= threshold.

    With random-hyperplane LSH the collision probability is
    (1 - theta/pi)^n_planes, so true near-dups (theta ~ 0) almost always
    share a bucket while the cross-corpus quadratic pair space never
    materializes."""
    dot = _pair_dot_udf()
    sig = hyperplane_signatures(embeddings, n_planes)
    e = embeddings.join(sig, "vec_id")
    a = _with_norms(e, "vec_a", "va", "na").join(
        e.select(F.col("vec_id").alias("vec_a"), "sig"), "vec_a")
    b = _with_norms(e, "vec_b", "vb", "nb").join(
        e.select(F.col("vec_id").alias("vec_b"), F.col("sig").alias("bsig")), "vec_b")
    pairs = a.join(b, (F.col("sig") == F.col("bsig")) & (F.col("vec_a") < F.col("vec_b")))
    sim = F.round(dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6)
    return (pairs.select("vec_a", "vec_b", sim.alias("cos_sim"))
            .filter(F.col("cos_sim") >= threshold))


def _seq_norms(M):
    """Euclidean norms with sequential per-dim accumulation (matches the
    fold/list_dot_product order exactly)."""
    import numpy as np

    acc = np.zeros(M.shape[0], dtype=np.float64)
    for d in range(M.shape[1]):
        acc += M[:, d] * M[:, d]
    return np.sqrt(acc)


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
    dot = _pair_dot_udf()
    sig = hyperplane_signatures(embeddings, n_planes)
    e = embeddings.join(sig, "vec_id")
    q = _with_norms(e, "qid", "qv", "qn").join(
        e.select(F.col("vec_id").alias("qid"), "sig"), "qid")
    c = _with_norms(e, "cid", "cv", "cn").join(
        e.select(F.col("vec_id").alias("cid"), F.col("sig").alias("csig")), "cid")
    pairs = q.join(c, (F.col("sig") == F.col("csig")) & (F.col("qid") != F.col("cid")))
    sim = F.round(dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6)
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("cid"))
    return (pairs.select("qid", "cid", sim.alias("cos_sim"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "rank", "cid", "cos_sim"))
