"""Large-star/small-star connected components vs a pure-Python union-find,
plus the composed near-dup grouping operator."""

import random

from pyspark.sql import functions as F


def _uf_components(edges):
    """Ground truth: union-find over the same edge list; label = min member."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a == b:  # self loops do not create vertices, matching _canon
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _run_star(spark, edges, schema):
    from aser_spark.graphops import connected_components_star

    df = spark.createDataFrame(edges, schema)
    got = {r["node"]: r["component"]
           for r in connected_components_star(df, "src", "dst").collect()}
    assert got == _uf_components(edges)
    return got


def test_star_cc_random_graphs(spark):
    rng = random.Random(7)
    for n_nodes, n_edges in [(30, 20), (60, 80), (120, 90)]:
        edges = [(rng.randrange(n_nodes), rng.randrange(n_nodes))
                 for _ in range(n_edges)]
        _run_star(spark, edges, "src long, dst long")


def test_star_cc_long_chain(spark):
    """A 300-node path — the diameter case plain label propagation needs 300
    rounds for; star alternation must resolve it in O(log^2 n)."""
    edges = [(i, i + 1) for i in range(300)]
    got = _run_star(spark, edges, "src long, dst long")
    assert set(got.values()) == {0}


def test_star_cc_string_keys_and_self_loops(spark):
    edges = [("b", "a"), ("c", "b"), ("d", "d"), ("x", "y"), ("z", "z")]
    got = _run_star(spark, [e for e in edges], "src string, dst string")
    assert got["c"] == "a" and got["x"] == "x" and got["y"] == "x"
    # pure self-loop nodes are isolated vertices: absent, like in union-find
    assert "z" not in got or got["z"] == "z"


def test_star_cc_dense_merge(spark):
    """Two cliques bridged by one edge plus parallel duplicate edges."""
    edges = ([(i, j) for i in range(10) for j in range(i + 1, 10)]
             + [(i, j) for i in range(20, 28) for j in range(i + 1, 28)]
             + [(9, 20)] * 3)
    got = _run_star(spark, edges, "src long, dst long")
    assert set(got.values()) == {0}


def test_near_dup_groups(spark):
    from aser_spark.textops import lsh_candidate_pairs, minhash_signatures, near_dup_groups

    docs = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again!"),
        (3, "completely different text about spark shuffle partitions"),
        (4, "the quick brown fox jumps over the lazy dog again & again"),
        (5, "another unrelated document mentioning catalyst optimizer rules"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: (r["group_id"], r["is_canonical"])
           for r in near_dup_groups(df, n=4, num_perm=8, bands=4).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    # group assignment must equal the transitive closure of the LSH pairs
    pairs = [(r["doc_a"], r["doc_b"]) for r in lsh_candidate_pairs(
        minhash_signatures(df, n=4, num_perm=8), bands=4).collect()]
    truth = _uf_components(pairs)
    for d in out:
        assert out[d][0] == truth.get(d, d)
        assert out[d][1] == (1 if out[d][0] == d else 0)
    # the near-identical trio should actually collide
    assert out[1][0] == out[2][0] == out[4][0]
    assert out[3][0] == 3 and out[5][0] == 5


def test_star_cc_raises_when_not_converged(spark):
    import pytest
    from aser_spark.graphops import connected_components_star

    df = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_star(df, "src", "dst", max_iter=1)


def test_kg_to_networkx_merged_grain(spark):
    """convert_aser_2_nx.py parity shape: nodes merge at the words grain
    (freq = summed frequency), each edge carries per-sense weight sums
    gathered across EVERY merged eid pair."""
    from aser_spark.graphops import kg_to_networkx

    # e1/e2 share words "i sleep" -> one merged node
    nodes = spark.createDataFrame(
        [("e1", "i sleep", "s-v", 3.0), ("e2", "i sleep", "s-v", 2.0),
         ("e3", "i be tired", "s-be-a", 4.0)],
        "eid string, words string, pattern string, frequency double")
    edges = spark.createDataFrame(
        [("e1", "e3", "Reason", 1.5), ("e2", "e3", "Reason", 0.5),
         ("e2", "e3", "Result", 1.0)],
        "hid string, tid string, sense string, weight double")
    g = kg_to_networkx(nodes, edges)
    assert set(g.nodes) == {"i sleep", "i be tired"}
    assert g.nodes["i sleep"]["freq"] == 5.0
    assert g.nodes["i be tired"]["freq"] == 4.0
    # both eid pairs gather into ONE words-grain edge
    assert g["i sleep"]["i be tired"]["relations"] == {
        "Reason": 2.0, "Result": 1.0}
    assert g.number_of_edges() == 1

    import pytest
    with pytest.raises(ValueError, match="max_nodes"):
        kg_to_networkx(nodes, edges, max_nodes=1)


def test_sample_nodes_per_pattern_deterministic(spark):
    """Exactly min(n, stratum size) rows per pattern; identical sample
    (incl. ranks) across partitionings; different salt -> different
    deterministic order."""
    from aser_spark.queries import sample_nodes_per_pattern

    rows = [(f"e{i}", f"w{i}", "s-v" if i % 3 else "s-be-a", float(i))
            for i in range(200)]
    nodes = spark.createDataFrame(
        rows, "eid string, words string, pattern string, frequency double")
    out = sample_nodes_per_pattern(nodes, n=10)
    got = sorted((r.pattern, r.sample_rank, r.eid) for r in out.collect())
    by_pat = {}
    for p, _, _ in got:
        by_pat[p] = by_pat.get(p, 0) + 1
    assert by_pat == {"s-v": 10, "s-be-a": 10}
    alt = sorted((r.pattern, r.sample_rank, r.eid) for r in
                 sample_nodes_per_pattern(nodes.repartition(13),
                                          n=10).collect())
    assert alt == got
    other = sorted((r.pattern, r.sample_rank, r.eid) for r in
                   sample_nodes_per_pattern(nodes, n=10,
                                            salt="other").collect())
    assert other != got
    # a stratum smaller than n returns whole-stratum
    tiny = sample_nodes_per_pattern(nodes.limit(3), n=10)
    assert tiny.count() == 3


def test_sample_edges_per_sense_deterministic(spark):
    from aser_spark.queries import sample_edges_per_sense

    rows = [(f"h{i}", f"t{i}", "Reason" if i % 2 else "Result",
             float(i % 7) + 0.5) for i in range(120)]
    edges = spark.createDataFrame(
        rows, "hid string, tid string, sense string, weight double")
    out = sorted((r.sense, r.sample_rank, r.hid)
                 for r in sample_edges_per_sense(edges, n=15).collect())
    counts = {}
    for s, _, _ in out:
        counts[s] = counts.get(s, 0) + 1
    assert counts == {"Reason": 15, "Result": 15}
    alt = sorted((r.sense, r.sample_rank, r.hid) for r in
                 sample_edges_per_sense(edges.repartition(9),
                                        n=15).collect())
    assert alt == out


def test_k_core_matches_networkx(spark):
    """Fixpoint peeling == networkx.k_core (independent implementation)
    on random graphs, a clique-with-tendrils, and a pure path (deep
    sequential peel); k larger than any core -> empty."""
    import random

    import networkx as nx

    from aser_spark.graphops import k_core

    def run(pairs, k):
        df = spark.createDataFrame(pairs or [(0, 0)], "src long, dst long")
        return sorted((r.a, r.b) for r in k_core(df, k).collect())

    def truth(pairs, k):
        g = nx.Graph()
        g.add_edges_from(pairs)
        g.remove_edges_from(nx.selfloop_edges(g))
        core = nx.k_core(g, k)
        return sorted((min(a, b), max(a, b)) for a, b in core.edges)

    random.seed(3)
    rand = [(random.randint(0, 40), random.randint(0, 40))
            for _ in range(150)]
    clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    tendrils = clique + [(0, 100), (100, 101), (101, 102)]
    path = [(i, i + 1) for i in range(30)]
    for pairs, k in [(rand, 2), (rand, 3), (tendrils, 3), (path, 2),
                     (clique, 4)]:
        assert run(pairs, k) == truth(pairs, k), (k, len(pairs))
    assert run(clique, 5) == []
