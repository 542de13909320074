"""Beyond-reference analytics operators vs pure-Python ground truth:
weighted PageRank (numpy power iteration), degree-ordered triangle
enumeration (naive adjacency scan), gap sessionization (per-user scan),
unigram log-probability and TF-IDF (dict arithmetic)."""

import math
import random
from collections import Counter, defaultdict

from pyspark.sql import functions as F


# ---------------------------------------------------------------- pagerank

def _py_pagerank(edges, iters=5, damping=0.85, pin_dp=12):
    """Ground truth mirroring graphops.pagerank's pinned arithmetic."""
    w = Counter()
    for s, d_, wt in edges:
        w[(s, d_)] += wt
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(nodes)
    out_w = Counter()
    for (s, d_), wt in w.items():
        out_w[s] += wt
    share = {k: round(wt / out_w[k[0]], pin_dp) for k, wt in w.items()}
    rank = {v: round(1.0 / n, pin_dp) for v in nodes}
    for _ in range(iters):
        dm = round(sum(rank[v] for v in nodes if v not in out_w), pin_dp)
        contrib = defaultdict(float)
        for (s, d_), sh in share.items():
            contrib[d_] += rank[s] * sh
        base = (1.0 - damping) / n + damping * dm / n
        rank = {v: round(base + damping * contrib.get(v, 0.0), pin_dp)
                for v in nodes}
    return {v: round(r, 6) for v, r in rank.items()}


def test_pagerank_random_graph(spark):
    from aser_spark.graphops import pagerank

    rng = random.Random(11)
    edges = [(rng.randrange(40), rng.randrange(40), float(rng.randint(1, 5)))
             for _ in range(120)]
    df = spark.createDataFrame(edges, "src long, dst long, w double")
    got = {r["node"]: r["rank"]
           for r in pagerank(df, weight="w", iters=5).collect()}
    want = _py_pagerank(edges)
    assert got == want
    # rank mass is conserved (dangling correction): sums to ~1
    assert abs(sum(got.values()) - 1.0) < 1e-4


def test_pagerank_dangling_and_unweighted(spark):
    from aser_spark.graphops import pagerank

    # 3 -> nothing (dangling); star into 0
    edges = [(1, 0), (2, 0), (0, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=5).collect()}
    want = _py_pagerank([(s, d, 1.0) for s, d in edges])
    assert got == want
    assert abs(sum(got.values()) - 1.0) < 1e-4
    # the sink of the star outranks its spokes
    assert got[0] > got[1] == got[2]


# --------------------------------------------------------------- triangles

def _py_triangles(edges):
    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    out = set()
    for x in adj:
        for y in adj[x]:
            if y <= x:
                continue
            for z in adj[x] & adj[y]:
                if z > y:
                    out.add((x, y, z))
    return out


def test_triangles_random_graphs(spark):
    from aser_spark.graphops import enumerate_triangles

    rng = random.Random(5)
    for n_nodes, n_edges in [(15, 40), (30, 120), (50, 100)]:
        edges = [(rng.randrange(n_nodes), rng.randrange(n_nodes))
                 for _ in range(n_edges)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {(r["x"], r["y"], r["z"])
               for r in enumerate_triangles(df).collect()}
        rows = enumerate_triangles(df).collect()
        assert len(rows) == len(got)  # each triangle exactly once
        assert got == _py_triangles(edges)


def test_triangles_hub_and_clique(spark):
    from aser_spark.graphops import enumerate_triangles

    # K5 (10 triangles) plus a degree-heavy hub node with no closures
    edges = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    edges += [(99, i) for i in range(10, 40)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {(r["x"], r["y"], r["z"]) for r in enumerate_triangles(df).collect()}
    assert got == _py_triangles(edges)
    assert len(got) == 10


# ------------------------------------------------------------ sessionize

def _py_sessions(rows, gap_sec):
    """rows: (event_id, user_id, ts_epoch_sec).  Returns event->session."""
    by_user = defaultdict(list)
    for eid, uid, ts in rows:
        by_user[uid].append((ts, eid))
    out = {}
    for uid, evs in by_user.items():
        evs.sort()
        sess, prev = 0, None
        for ts, eid in evs:
            if prev is None or ts - prev > gap_sec:
                sess += 1
            out[eid] = sess
            prev = ts
    return out


def test_sessionize_and_stats(spark):
    import datetime as dt

    from aser_spark.eventops import session_stats, sessionize_events

    rng = random.Random(3)
    base = dt.datetime(2026, 1, 1)
    rows = []
    for eid in range(400):
        uid = rng.randrange(12)
        ts = base + dt.timedelta(seconds=rng.randrange(0, 86400))
        rows.append((eid, ts, uid, "click", float(rng.randint(0, 9)), ""))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    gap = 1800
    got = {r["event_id"]: r["session_idx"]
           for r in sessionize_events(df, gap_sec=gap).collect()}
    want = _py_sessions(
        [(eid, uid, int(ts.timestamp())) for eid, ts, uid, *_ in rows], gap)
    assert got == want

    stats = {(r["user_id"], r["session_idx"]): r
             for r in session_stats(df, gap_sec=gap).collect()}
    # recompute one rollup by hand per user
    by_sess = defaultdict(list)
    for eid, ts, uid, _t, val, _p in rows:
        by_sess[(uid, want[eid])].append((int(ts.timestamp()), val))
    assert set(stats) == set(by_sess)
    for key, evs in by_sess.items():
        r = stats[key]
        assert r["n_events"] == len(evs)
        assert r["start_sec"] == min(t for t, _ in evs)
        assert r["span_sec"] == max(t for t, _ in evs) - min(t for t, _ in evs)
        assert r["total_value"] == round(sum(v for _, v in evs), 4)


# ------------------------------------------------------------- lm scoring

def _norm_py(s):
    return " ".join(s.strip().lower().split())


def test_unigram_logprob(spark):
    from aser_spark.textops.lm import unigram_logprob

    docs = [(0, "the cat sat on the mat"),
            (1, "the dog  ate the cat"),
            (2, "zebra xylophone"),
            (3, "the the the")]
    df = spark.createDataFrame([(i, t, "en", "s", len(t)) for i, t in docs],
                               "doc_id long, text string, lang string, "
                               "source string, n_chars long")
    counts = Counter(w for _, t in docs for w in _norm_py(t).split())
    total = sum(counts.values())
    got = {r["doc_id"]: (r["n_tokens"], r["avg_logprob"])
           for r in unigram_logprob(df).collect()}
    for i, t in docs:
        toks = _norm_py(t).split()
        want = round(sum(math.log(counts[w] / total) for w in toks)
                     / len(toks), 6)
        assert got[i] == (len(toks), want)
    # rare-token doc scores lowest, repetitive common-token doc highest
    assert got[2][1] == min(v for _, v in got.values())
    assert got[3][1] == max(v for _, v in got.values())


def test_tfidf_top_terms(spark):
    from aser_spark.textops.lm import tfidf_top_terms

    docs = [(0, "apple banana apple cherry"),
            (1, "banana cherry cherry date"),
            (2, "apple apple apple egg"),
            (3, "fig grape fig banana")]
    df = spark.createDataFrame([(i, t, "en", "s", len(t)) for i, t in docs],
                               "doc_id long, text string, lang string, "
                               "source string, n_chars long")
    n_docs = len(docs)
    dfreq = Counter()
    for _, t in docs:
        for w in set(_norm_py(t).split()):
            dfreq[w] += 1
    got = defaultdict(list)
    for r in tfidf_top_terms(df, k=2).orderBy("doc_id", "rank").collect():
        got[r["doc_id"]].append((r["rank"], r["token"], r["tfidf"]))
    for i, t in docs:
        tf = Counter(_norm_py(t).split())
        scored = sorted(
            ((round(c * math.log(n_docs / dfreq[w]), 6), w) for w, c in tf.items()),
            key=lambda x: (-x[0], x[1]))[:2]
        want = [(rk + 1, w, s) for rk, (s, w) in enumerate(scored)]
        assert got[i] == want


# -------------------------------------------------------------- asof join

def _py_asof(lrows, rrows, direction="backward", tolerance=None):
    """lrows: (uid, t, lval); rrows: (uid, t, rval) unique per (uid, t).
    Returns {(uid, t, lval): (rt, rval) or None}."""
    out = {}
    for uid, t, lv in lrows:
        cands = [(rt, rv) for ruid, rt, rv in rrows if ruid == uid
                 and (rt <= t if direction == "backward" else rt >= t)
                 and (tolerance is None or abs(rt - t) <= tolerance)]
        if cands:
            best = min(cands, key=lambda c: abs(c[0] - t))
            out[(uid, t, lv)] = best
        else:
            out[(uid, t, lv)] = None
    return out


def test_asof_join_directions_and_tolerance(spark):
    from aser_spark.eventops import asof_join

    rng = random.Random(17)
    lrows = [(rng.randrange(6), rng.randrange(100), i) for i in range(120)]
    rrows = list({(uid, t): (uid, t, 1000 + i) for i, (uid, t) in enumerate(
        (rng.randrange(6), rng.randrange(100)) for _ in range(80))}.values())
    ldf = spark.createDataFrame(lrows, "user_id long, t long, lval long")
    rdf = spark.createDataFrame(rrows, "user_id long, t long, rval long")
    for direction in ("backward", "forward"):
        for tol in (None, 10):
            got = {(r["user_id"], r["t"], r["lval"]):
                   (None if r["t_r"] is None else (r["t_r"], r["rval_r"]))
                   for r in asof_join(ldf, rdf, on="t", by=("user_id",),
                                      direction=direction,
                                      tolerance=tol).collect()}
            want = _py_asof(lrows, rrows, direction, tol)
            assert got == want, (direction, tol)


def test_asof_join_exact_match_inclusive(spark):
    from aser_spark.eventops import asof_join

    ldf = spark.createDataFrame([(1, 50, 0)], "user_id long, t long, lval long")
    rdf = spark.createDataFrame([(1, 50, 7), (1, 40, 8)],
                                "user_id long, t long, rval long")
    row = asof_join(ldf, rdf, on="t").collect()[0]
    assert (row["t_r"], row["rval_r"]) == (50, 7)
