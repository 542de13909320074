"""Distributed graph primitives for KG enrichment at corpus scale.

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
