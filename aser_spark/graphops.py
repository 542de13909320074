"""Distributed graph primitives for KG enrichment and analytics at corpus
scale: bounded-round connected components, weighted PageRank,
degree-ordered triangle enumeration, k-core extraction, and a bounded
networkx export.

``connected_components_star`` is the large-star/small-star alternation of
Kiveris et al., "Connected Components in MapReduce and Beyond" (SOCC'14) —
the standard bounded-round CC algorithm for massive graphs (the same family
GraphFrames/GraphX ship).  Unlike plain min-label propagation
(aser_spark/pipeline/entities.py:connected_components), whose round count is
the component DIAMETER (a 1M-node chain needs 1M Spark jobs), star
alternation provably converges in O(log^2 n) rounds regardless of topology,
each round two shuffles — the shape that survives a billion-edge mention or
near-duplicate graph.

Semantics: undirected graph given as an edge list; output labels every
endpoint with the ordering-minimal node of its component (works for any
orderable key type — long doc ids, string mention keys).  Isolated vertices
never appear in an edge list, so callers union them back (see
textops/dedup.py:near_dup_groups for the pattern).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, functions as F


def _canon(edges: DataFrame) -> DataFrame:
    """Undirected edge set in canonical form: (a=min, b=max), no self
    loops, no nulls, distinct."""
    return (
        edges.filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """For every node u: connect each strictly-larger neighbor to
    min(N(u) ∪ {u}).  Needs the symmetric neighborhood, so expand the
    canonical set both ways first."""
    sym = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    m = (sym.groupBy("a").agg(F.min("b").alias("_mn"))
         .select("a", F.least("_mn", "a").alias("m")))
    return _canon(
        sym.join(m, "a")
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges large→small; for every node u connect all its smaller
    neighbors (and u itself) to the minimum one."""
    m = edges.groupBy("b").agg(F.min("a").alias("m"))
    out = (
        edges.join(m, "b")
        .select(F.col("a"), F.col("m").alias("b"))
        .unionByName(m.select(F.col("b").alias("a"), F.col("m").alias("b")))
    )
    return _canon(out)


def connected_components_star(edges: DataFrame, src: str = "src",
                              dst: str = "dst",
                              max_iter: int = 50,
                              round_stats: list | None = None) -> DataFrame:
    """(node, component) for every edge endpoint; component = the minimal
    node of its connected component.

    Each round runs one large-star + one small-star pass (two shuffles) and
    ONE driver action (a count+checksum aggregate) for the convergence
    test; rounds are O(log^2 n) worst case, 2-4 in practice on near-clique
    coref/near-dup graphs.  At the fixpoint the canonical edge set is a
    union of stars (root=a, child=b) with root = component minimum."""
    # localCheckpoint (not persist) each round: it TRUNCATES lineage, so the
    # logical plan Catalyst must re-analyze stays constant-size across
    # rounds — with persist alone, analysis time grows with round count and
    # dominates by round 3.  Old checkpoint blocks are released by the
    # ContextCleaner once unreferenced.
    cur = _canon(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    ).localCheckpoint(eager=True)

    # (n_edges, xor checksum) identifies the canonical edge set (xor
    # aggregation: order-independent, overflow-free under ANSI mode);
    # equal signature two rounds running == fixpoint.
    def _sig(df):
        row = df.agg(F.count("*").alias("n"),
                     F.expr("bit_xor(xxhash64(a, b))").alias("h")).collect()[0]
        return (row["n"], row["h"])

    sig = _sig(cur)
    converged = False
    for rnd in range(max_iter):
        t0 = time.time()
        nxt = _small_star(_large_star(cur)).localCheckpoint(eager=True)
        new_sig = _sig(nxt)
        cur = nxt
        if round_stats is not None:
            # (round, n_edges after the pass, wall seconds) — scale
            # evidence for the O(log^2 n) round bound (BENCH/NOTES.md)
            round_stats.append((rnd + 1, new_sig[0],
                                round(time.time() - t0, 3)))
        if new_sig == sig:
            converged = True
            break
        sig = new_sig
    if not converged:
        # returning the non-fixpoint edge set would silently split
        # components — fail loud instead (practical graphs converge in
        # single-digit rounds; raise max_iter for adversarial topologies)
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} "
            "rounds; raise max_iter")
    return (
        cur.select(F.col("b").alias("node"), F.col("a").alias("component"))
        .unionByName(
            cur.select(F.col("a").alias("node"), F.col("a").alias("component")))
        .groupBy("node").agg(F.min("component").alias("component"))
    )


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             weight: str | None = None, iters: int = 5,
             damping: float = 0.85, pin_dp: int | None = 12) -> DataFrame:
    """Weighted PageRank over a directed edge list, fixed ``iters`` power
    iterations (fixed-iteration, not convergence-tested, so the result is
    a deterministic pure function of the input — oracle-replayable in
    SQL with the iterations unrolled).

    r_0 = 1/N;  r_{k+1}(v) = (1-d)/N + d * (Σ_{u→v} r_k(u)·w(u,v)/out_w(u)
                                            + dangling_mass_k / N)

    Dangling nodes (no out-edges) redistribute uniformly — the standard
    correction, without it rank mass leaks and the vector no longer sums
    to 1.

    Scale posture: each iteration is ONE equi-join of the rank vector to
    the edge list on the src key plus a map-side-combining groupBy on dst
    — the textbook distributed PageRank shape.  The rank vector is |V|
    rows (small next to |E|); with both sides hash-partitioned on the
    node key the join reuses one exchange across iterations.  The
    dangling mass stays IN the dataflow as a broadcast single-row
    aggregate (constant-key hash join) — no driver collect, so an
    iteration is one job with zero driver round-trips; the r7 scaling
    campaign measured the collect-per-iteration variant serializing ~2
    extra barriers per round.  localCheckpoint truncates lineage each
    round so plan analysis stays O(1) in the iteration count (same
    rationale as connected_components_star).

    ``pin_dp`` rounds the edge shares and each iteration's rank vector to
    that many decimals.  This pins the whole computation to a value that
    is independent of floating-point summation ORDER, so a different
    engine (the DuckDB oracle, a different partitioning, a different
    cluster size) replays it bit-for-bit; set ``pin_dp=None`` for raw
    doubles when cross-engine replay is not needed.
    """
    def _pin(c):
        return F.round(c, pin_dp) if pin_dp is not None else c

    w_col = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"),
                      w_col.alias("w"))
         .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
         .groupBy("src", "dst").agg(F.sum("w").alias("w")))
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint(eager=True))
    n = nodes.count()
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    # normalize edge weights once: contribution share per edge
    e_norm = e.join(out_w, "src") \
              .select("src", "dst",
                      _pin(F.col("w") / F.col("out_w")).alias("share")) \
              .localCheckpoint(eager=True)
    has_out = out_w.select(F.col("src").alias("node"),
                           F.lit(True).alias("_has_out"))
    # all pins use Spark's HALF_UP round (same tie rule as SQL engines),
    # never Python's banker's round — so ties round identically everywhere
    ranks = nodes.select("node", _pin(F.lit(1.0) / n).alias("rank"))
    for _ in range(iters):
        # dangling mass: single-row aggregate kept IN the dataflow (the
        # arithmetic mirrors the former driver-side
        # `(1-d)/n + d*dm/n` float expression term-for-term, so pinned
        # values are unchanged)
        dm_df = (ranks.join(has_out, "node", "left")
                 .filter(F.col("_has_out").isNull())
                 .agg(_pin(F.coalesce(F.sum("rank"), F.lit(0.0)))
                      .alias("_dm"))
                 .withColumn("_k", F.lit(1)))
        contrib = (ranks.join(e_norm, ranks["node"] == e_norm["src"])
                   .groupBy("dst")
                   .agg(F.sum(F.col("rank") * F.col("share")).alias("c"))
                   .withColumnRenamed("dst", "node"))
        base = (F.lit((1.0 - damping) / n)
                + F.lit(damping) * F.col("_dm") / F.lit(float(n)))
        ranks = (nodes.join(contrib, "node", "left")
                 .withColumn("_k", F.lit(1))
                 .join(F.broadcast(dm_df), "_k")
                 .select("node",
                         _pin(base +
                              F.lit(damping) *
                              F.coalesce(F.col("c"), F.lit(0.0)))
                         .alias("rank"))
                 .localCheckpoint(eager=False))
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def enumerate_triangles(edges: DataFrame, src: str = "src",
                        dst: str = "dst") -> DataFrame:
    """All triangles of the undirected simple graph as (x, y, z) node
    triples with x < y < z — each triangle exactly once.

    Implementation is the degree-ordered wedge join (the MapReduce
    triangle algorithm of Suri & Vassilvitskii, WWW'11): orient every
    edge from its lower-(degree, id) endpoint to the higher one, build
    wedges only at each edge's LOW-degree endpoint, then semi-join the
    closing edge.  Identical output to the naive three-way self-join
    (pytest property-checks this), but the wedge fan-out per node is
    bounded by its ORIENTED out-degree ≤ O(sqrt(|E|)) — a degree-10^6
    celebrity hub generates zero wedges instead of 10^12, which is what
    makes the plan survive a power-law 100 TB graph.
    """
    canon = _canon(edges.select(F.col(src).alias("a"), F.col(dst).alias("b")))
    sym = canon.unionByName(
        canon.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = sym.groupBy("a").agg(F.count("*").alias("deg")) \
             .select(F.col("a").alias("node"), "deg")
    # orientation key: (degree, node id) — total order, so every edge gets
    # exactly one direction
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("dega"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("degb"))
    keyed = canon.join(da, "a").join(db, "b")
    lo_first = (F.col("dega") < F.col("degb")) | \
               ((F.col("dega") == F.col("degb")) & (F.col("a") < F.col("b")))
    oriented = keyed.select(
        F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
        F.when(lo_first, F.col("dega")).otherwise(F.col("degb")).alias("dlo"),
        F.when(lo_first, F.col("degb")).otherwise(F.col("dega")).alias("dhi"),
    ).localCheckpoint(eager=True)
    # wedges at the low endpoint: two oriented out-edges (lo→u, lo→v),
    # ordered u before v by the same (degree, id) key so each wedge is
    # built once; the closing edge u→v is then oriented u→v by
    # transitivity of the total order
    e1 = oriented.select(F.col("lo"), F.col("hi").alias("u"),
                         F.col("dhi").alias("du"))
    e2 = oriented.select(F.col("lo"), F.col("hi").alias("v"),
                         F.col("dhi").alias("dv"))
    wedges = e1.join(e2, "lo").filter(
        (F.col("du") < F.col("dv")) |
        ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))))
    closing = oriented.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
    tri = wedges.join(closing, ["u", "v"])
    xyz = F.array_sort(F.array("lo", "u", "v"))
    return tri.select(xyz[0].alias("x"), xyz[1].alias("y"), xyz[2].alias("z"))


def kg_to_networkx(nodes: DataFrame, edges: DataFrame,
                   max_nodes: int = 2_000_000,
                   max_edges: int = 5_000_000):
    """Merged-eventuality networkx export — the reference's
    examples/postprocess_aser/convert_aser_2_nx.py:25-46 surface: a
    DiGraph at the WORDS grain (eventualities with identical words
    merge; node freq = summed frequency) whose edges carry a
    {sense: summed weight} dict gathered across every merged eid pair.

    The merge/gather runs DISTRIBUTED (two groupBys + two node joins);
    only the final words-grain graph is collected, and the collect is
    bounded: the export REFUSES graphs past max_nodes/max_edges instead
    of silently OOMing the driver — a networkx graph is a single-machine
    artifact by definition, so the bound is the honest contract (filter
    the KG first, examples/database/filter_kg.py-style, to export a
    core subgraph of a 100 TB build)."""
    import networkx as nx

    merged = nodes.groupBy("words").agg(F.sum("frequency").alias("freq")) \
                  .persist()
    h = nodes.select(F.col("eid").alias("hid"),
                     F.col("words").alias("head_words"))
    t = nodes.select(F.col("eid").alias("tid"),
                     F.col("words").alias("tail_words"))
    gathered = (
        edges.join(h, "hid").join(t, "tid")
        .groupBy("head_words", "tail_words", "sense")
        .agg(F.sum("weight").alias("w"))
    ).persist()
    # persist both: the size guards and the export iteration would
    # otherwise each recompute the full merge/gather dataflow
    try:
        n_nodes = merged.count()
        if n_nodes > max_nodes:
            raise ValueError(
                f"{n_nodes} merged nodes exceed max_nodes={max_nodes}; "
                "filter the KG to a core subgraph before exporting")
        n_pairs = (gathered.select("head_words", "tail_words")
                   .distinct().count())
        if n_pairs > max_edges:
            raise ValueError(
                f"{n_pairs} merged edges exceed max_edges={max_edges}; "
                "filter the KG to a core subgraph before exporting")

        g = nx.DiGraph()
        for row in merged.toLocalIterator():
            g.add_node(row["words"], freq=row["freq"])
        for row in gathered.toLocalIterator():
            if not g.has_edge(row["head_words"], row["tail_words"]):
                g.add_edge(row["head_words"], row["tail_words"],
                           relations={})
            g[row["head_words"]][row["tail_words"]]["relations"][
                row["sense"]] = row["w"]
        return g
    finally:
        merged.unpersist()
        gathered.unpersist()


def k_core(edges: DataFrame, k: int, src: str = "src", dst: str = "dst",
           max_iter: int = 100) -> DataFrame:
    """The k-core of the undirected simple graph: repeatedly remove nodes
    of degree < k until none remain — structural KG denoising (the
    graph-topology complement of the frequency filter in
    examples/database/filter_kg.py: a node survives because its
    NEIGHBORHOOD is dense, not because it is individually frequent).

    Returns the surviving canonical edge list (a < b).  Deterministic:
    the k-core is a unique subgraph, independent of peel order.

    Scale posture: each round is one degree aggregation over the
    symmetric edge set + two semi-joins — all equi-operations on the
    node key; localCheckpoint truncates lineage per round.  Round count
    is bounded by the peel depth (pathological paths peel O(n) rounds —
    max_iter guards; real KG/power-law graphs peel in a few dozen).
    The per-round convergence check rides the degree aggregate — no
    extra pass."""
    e = _canon(edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
               ).localCheckpoint(eager=True)
    n_edges = e.count()
    for _ in range(max_iter):
        if n_edges == 0:
            return e
        sym = e.unionByName(
            e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        keep = (sym.groupBy("a").agg(F.count("*").alias("_d"))
                .filter(F.col("_d") >= k).select("a"))
        e2 = (e.join(keep, "a", "left_semi")
              .join(keep.select(F.col("a").alias("b")), "b", "left_semi")
              .select("a", "b")
              .localCheckpoint(eager=True))
        n2 = e2.count()
        if n2 == n_edges:
            return e2
        e, n_edges = e2, n2
    raise RuntimeError(f"k_core did not converge in {max_iter} rounds")
