"""Physical-plan regression guards: the optimizations that matter at 100 TB
must stay visible in the executed plan (pushdown, pruning, broadcast,
explicit UDF-stage partitioning)."""

import re

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df, mode="formatted"):
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode))


def test_filter_pushdown_and_column_pruning(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = (li.filter(F.col("l_shipdate") <= "1995-01-01")
         .groupBy("l_returnflag").agg(F.sum("l_quantity").alias("q")))
    p = _plan(q)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"l_shipdate", "l_returnflag", "l_quantity"}


def test_small_dims_broadcast_not_sortmerge(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet")
    c = spark.read.parquet(f"{SF}/customer.parquet")
    n = spark.read.parquet(f"{SF}/nation.parquet")
    q = (o.join(c, o.o_custkey == c.c_custkey)
         .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
         .groupBy("n_name").count())
    p = _plan(q, "simple")
    assert "BroadcastHashJoin" in p


def test_semi_join_stays_semi(spark):
    from aser_spark.pipeline.graph import build_core_kg

    nodes = spark.createDataFrame(
        [("a", "p", "w", "t", "s", "v", 3.0)],
        "eid string, pattern string, words string, pos_tags string, "
        "skeleton_words string, verbs string, frequency double")
    edges = spark.createDataFrame(
        [("r", "a", "a", "Reason", 1.0)],
        "rid string, hid string, tid string, sense string, weight double")
    _, core = build_core_kg(nodes, edges)
    assert _plan(core, "simple").count("LeftSemi") == 2


def test_extraction_exchange_has_explicit_partition_count(spark):
    from aser_spark.datagen import transcripts_df
    from aser_spark.pipeline.extract import extract_graph_instances

    df = extract_graph_instances(transcripts_df(spark, 5, seed=42))
    p = _plan(df, "simple")
    # REPARTITION_BY_NUM marks a user-pinned exchange AQE will not coalesce
    assert "REPARTITION_BY_NUM" in p
    assert "MapInPandas" in p


def test_salted_agg_is_two_phase(spark):
    from aser_spark.pipeline.aggregate import salted_sum

    df = spark.createDataFrame([("k", "c1", 1.0)], "k string, c string, v double")
    p = _plan(salted_sum(df, ["k"], "v", "c"), "simple")
    # two logical aggregations (salted partial + final), each with its own
    # partial/final physical pair -> at least 3 HashAggregate operators
    assert p.count("HashAggregate") >= 3


def _exec_plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_concept_multi_substitution_broadcasts_only(spark):
    """The combination beam joins the (tiny) probase top-k per level:
    every join must broadcast; a sort-merge join here would shuffle the
    fact side once per substitution level."""
    from aser_spark.pipeline.concepts import probase_concepts_multi, toy_probase

    nodes = spark.createDataFrame(
        [("e1", "s-v", "the dog bark", "DT NN VBZ", 3.0)],
        "eid string, pattern string, words string, pos_tags string, frequency double")
    plan = _exec_plan(probase_concepts_multi(nodes, toy_probase(spark), topk=3, max_subs=2))
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_coref_components_single_exchange(spark):
    """Scope-local union-find: ONE hash exchange (the groupBy scope), no
    iterative driver loop, no windows."""
    from aser_spark.pipeline.entities import coref_components

    m = spark.createDataFrame([("c1", "dog"), ("c1", "the dog")],
                              "conv_id string, mention string")
    plan = _exec_plan(coref_components(m))
    assert plan.count("Exchange") == 1
    assert "Window" not in plan and "FlatMapGroupsInPandas" in plan


def test_link_entities_no_window(spark):
    """Disambiguation is a map-side-combinable hash aggregation, not a
    row_number window (the r1 36s scale-killer)."""
    from aser_spark.pipeline.entities import link_entities, toy_kb

    nodes = spark.createDataFrame(
        [("e1", "s-v", "the dog bark", "DT NN VBZ", 3.0)],
        "eid string, pattern string, words string, pos_tags string, frequency double")
    plan = _exec_plan(link_entities(nodes, toy_kb(spark)))
    assert "Window" not in plan
    assert "HashAggregate" in plan


def test_ivf_grid_broadcasts_centroids_no_cartesian(spark):
    """IVF-grid assignment is an N x n_lists broadcast nested loop against
    the tiny centroid table, never an N x N cartesian: candidate
    generation goes through the equi-join on the list id."""
    from aser_spark.textops import ivf_ann_topk_grid

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = _plan(ivf_ann_topk_grid(emb, k=2, n_lists=4, n_probe=2), "simple")
    assert "BroadcastNestedLoopJoin" in plan      # x tiny centroid table
    assert "CartesianProduct" not in plan
    # the probe->assigned candidate join is an equi hash join on list id
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan \
        or plan.count("BroadcastHashJoin") >= 1


def test_node_ner_profiles_two_phase_hash_agg(spark):
    """NER profile aggregation combines map-side (explode -> partial
    hash agg) — no windows on the hot eid keys."""
    from aser_spark.pipeline.aggregate import node_ner_profiles

    inst = spark.createDataFrame(
        [("e1", 2.0, "PERSON O O")],
        "eid string, frequency double, ners string")
    plan = _exec_plan(node_ner_profiles(inst))
    assert "Window" not in plan
    assert plan.count("HashAggregate") >= 2      # partial + final


def test_benchmark_contamination_broadcasts_bench_no_cartesian(spark):
    """Decontamination joins the corpus grams against the SMALL benchmark
    gram set via broadcast on the gram key — the corpus side never
    shuffles into a pair join."""
    from aser_spark.textops import benchmark_contamination

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bench = docs.limit(3).select(F.col("doc_id").alias("bench_id"), "text")
    plan = _plan(benchmark_contamination(docs, bench, n=8), "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_stratified_sample_is_pure_filter(spark):
    """Deterministic sampling must be a scan + filter: no exchange, no
    aggregation, no UDF — it runs at parquet-scan speed."""
    from aser_spark.textops import stratified_hash_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _exec_plan(stratified_hash_sample(
        docs, {"en": 0.5, "de": 0.1}, strata_col="lang"))
    assert "Exchange" not in plan
    assert "HashAggregate" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pack_documents_prefix_sum_not_global_window(spark):
    """Packing must run the corpus-sized window PARTITIONED by shard (the
    distributed prefix sum) and add shard bases via broadcast; only the
    n_shards-row base table may use an unpartitioned window."""
    from aser_spark.textops import pack_documents

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(pack_documents(docs, seq_len=512, shard_size=64), "formatted")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # the corpus-side window renders as
    # windowspecdefinition(_shard#N, doc_id#M ASC ...): partitioned by
    # shard, ordered by doc_id.  A regression to an unpartitioned global
    # window would render windowspecdefinition(doc_id#M ASC ...) instead.
    assert re.search(r"windowspecdefinition\(_shard#\d+L?, doc_id#\d+", plan)


def test_parse_coverage_shuffle_free(spark):
    """parse_coverage is one narrow projection + one mapInPandas — no
    exchange anywhere: per-turn rows are independent, so at 100 TB the
    coverage sweep is a pure scan-shaped pass."""
    from aser_spark.datagen import transcripts_df
    from aser_spark.pipeline.extract import parse_coverage

    plan = _plan(parse_coverage(transcripts_df(spark, 50, seed=42)), "simple")
    assert "Exchange" not in plan
    assert "MapInPandas" in plan


def test_ivf_trained_broadcasts_centroids_no_cartesian(spark):
    """The trained-quantizer IVF shares the grid variant's plan shape:
    broadcast nested loop against the tiny centroid table only, never an
    N x N cartesian."""
    from aser_spark.textops import ivf_ann_topk_trained

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = _plan(ivf_ann_topk_trained(emb, k=2, n_lists=4, n_probe=2,
                                      max_fit=64), "simple")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_probase_join_strategy_flips_past_broadcast_size(spark):
    """Probase at realistic scale (r6 VERDICT #5): the hinted default
    broadcasts the top-k probase (right for dims that fit executor
    memory), and broadcast=False must hand the strategy back to Catalyst
    so a 30M-row real dump plans a SHUFFLED join instead of an OOM
    broadcast.  autoBroadcastJoinThreshold=-1 stands in for 'filtered
    probase larger than the threshold' at test scale; AQE may still
    downgrade to broadcast at runtime when the filtered side is truly
    small, which is exactly the wanted behavior."""
    from aser_spark.pipeline.concepts import probase_concepts, toy_probase

    nodes = spark.createDataFrame(
        [("e1", "s-v-o", "the dog see the cat", "DT NN VBZ DT NN", 5.0)],
        "eid string, pattern string, words string, pos_tags string, "
        "frequency double")
    pb = toy_probase(spark)

    assert "BroadcastHashJoin" in _plan(probase_concepts(nodes, pb), "simple")

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = _plan(probase_concepts(nodes, pb, broadcast=False), "simple")
        assert "BroadcastHashJoin" not in p
        assert "SortMergeJoin" in p or "ShuffledHashJoin" in p
        # the explicit hint must still win over the threshold
        assert "BroadcastHashJoin" in _plan(
            probase_concepts(nodes, pb, broadcast=True), "simple")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_asof_join_single_exchange_no_cartesian(spark):
    """The as-of join must stay ONE hash exchange on the by-key (the
    union+window form) — a range θ-join would surface as
    CartesianProduct / BroadcastNestedLoopJoin and explode on hot keys."""
    from aser_spark.eventops import asof_join

    l = spark.createDataFrame([(1, 10, 0)], "user_id long, t long, lv long")
    r = spark.createDataFrame([(1, 5, 1)], "user_id long, t long, rv long")
    p = _plan(asof_join(l, r, on="t"), "simple")
    assert "CartesianProduct" not in p
    assert "NestedLoop" not in p
    assert p.count("Window") == 1


def test_pagerank_and_triangles_equijoin_only(spark):
    """PageRank's per-iteration rank⋈edges and the triangle wedge join
    are equi-joins — any nested-loop/cartesian in the plan means a
    regression that cannot survive a power-law 100 TB graph."""
    from aser_spark.graphops import enumerate_triangles, pagerank

    e = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "src long, dst long")
    for df in (pagerank(e, iters=1), enumerate_triangles(e)):
        p = _plan(df, "simple")
        assert "CartesianProduct" not in p
        assert "NestedLoop" not in p


def test_budget_select_and_chunking_never_single_partition(spark):
    """budget_select's prefix sum must stay bucket-sharded and
    chunk_documents must stay scan-shaped: an `Exchange SinglePartition`
    (the global-window funnel) in either plan is the 100 TB regression
    these operators exist to avoid."""
    from aser_spark.textops import budget_select, chunk_documents

    scored = spark.createDataFrame(
        [(1, "en", 10, 0.5)],
        "doc_id long, lang string, n_ws_tokens long, quality_score double")
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    for df in (budget_select(scored, budget_tokens=100),
               chunk_documents(docs, seq_len=2, overlap=1)):
        p = _plan(df, "simple")
        assert "SinglePartition" not in p
    # chunking additionally must not shuffle at all
    assert "Exchange" not in _plan(chunk_documents(docs, 2, 1), "simple")


def test_entity_kb_join_strategy_flips_past_broadcast_size(spark):
    """Same contract as the probase probe join: the hinted default
    broadcasts the alias KB, and broadcast=False hands the strategy to
    Catalyst/AQE so a Wikidata-scale alias dump plans a SHUFFLED join
    instead of an OOM broadcast."""
    from aser_spark.pipeline.entities import link_entities, toy_kb

    nodes = spark.createDataFrame(
        [("e1", "s-v-o", "the doctor see the cat", "DT NN VBZ DT NN", 5.0)],
        "eid string, pattern string, words string, pos_tags string, "
        "frequency double")
    kb = toy_kb(spark)

    assert "BroadcastHashJoin" in _plan(link_entities(nodes, kb), "simple")

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = _plan(link_entities(nodes, kb, broadcast=False), "simple")
        assert "BroadcastHashJoin" not in p
        assert "SortMergeJoin" in p or "ShuffledHashJoin" in p
        # the explicit hint must still win over the threshold
        assert "BroadcastHashJoin" in _plan(
            link_entities(nodes, kb, broadcast=True), "simple")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
