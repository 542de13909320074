"""DEV: scale-evidence benchmarks backing three SURVEY/north-rule claims
(results recorded in BENCH/NOTES.md):

  skew    — salted two-phase lineage collect vs naive groupBy+collect_set
            on a Zipf-headed corpus (a few eids at ~10^5 x the median
            frequency), local[4].  Also times the SUM path both ways to
            record honestly that map-side combine already neutralizes
            hot keys for combining aggregates.
  cc      — connected_components_star on a ~10M-edge chain+clique graph,
            local[4]: per-round edge counts and wall, demonstrating the
            bounded O(log^2 n) round behavior on a diameter-5M topology
            that min-label propagation could never finish.
  export  — export_kg_to_sqlite of the REAL sf0.1-scale core KG
            (25k conversations through the full extraction pipeline):
            wall, rows/s, and driver peak-RSS before/after, backing the
            "bandwidth-bound, never memory-bound" claim.

Usage: python scripts/scale_evidence.py {skew|cc|export}
"""

from __future__ import annotations

import json
import resource
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _maxrss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def _best_of(fn, n=2):
    best = None
    for _ in range(n):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def bench_skew_tasks():
    """Per-TASK shuffle-read instrumentation for the salted vs naive
    lineage collect on the 5x10^5-ratio head-key corpus (VERDICT r4 #6).

    The r4 latency experiment showed naive beating salted wall-clock at
    local[4]; the cluster-scale argument was always per-task input
    BOUNDEDNESS, not latency — a 10^12-frequency head key funnels its
    entire occurrence set through ONE reducer task in the naive plan,
    while the salted plan caps any single task at ~1/n_salts of the hot
    key (phase 1) and n_salts*cap rows (phase 2).  This measures exactly
    that: max task shuffle-read records/bytes per stage, via the Spark
    REST API (/api/v1 taskSummary, quantile 1.0)."""
    import urllib.request

    from pyspark.sql import functions as F

    from aser_spark.config import get_spark
    from aser_spark.pipeline.aggregate import DEFAULT_SALTS, build_lineage

    spark = get_spark(app="skew-task-evidence", cpus=4, shuffle_partitions=8,
                      extra={"spark.ui.enabled": "true"})
    sc = spark.sparkContext
    app_id = sc.applicationId
    base = sc.uiWebUrl + "/api/v1"

    def rest(path):
        with urllib.request.urlopen(base + path) as r:
            return json.load(r)

    def stage_ids():
        return {s["stageId"] for s in rest(f"/applications/{app_id}/stages")}

    def max_task_reads(new_ids):
        per_stage = []
        for st in sorted(new_ids):
            try:
                summ = rest(f"/applications/{app_id}/stages/{st}/0/"
                            "taskSummary?quantiles=1.0")
            except Exception:
                continue  # stage with no tasks / skipped
            sr = summ.get("shuffleReadMetrics") or {}
            recs = (sr.get("readRecords") or [0])[0]
            byts = (sr.get("readBytes") or [0])[0]
            if recs or byts:
                per_stage.append({"stage": st,
                                  "max_task_shuffle_records": int(recs),
                                  "max_task_shuffle_mb": round(byts / 2**20, 2)})
        return per_stage

    cap, n_cold = 64, 500_000
    out = {"metric": "skew_task_evidence", "n_cold_rows": n_cold,
           "cap": cap, "n_salts": DEFAULT_SALTS, "cpus": 4, "sweep": []}
    sid = F.concat_ws("|", "conv_id", "turn_idx", "sent_idx").alias("sid")

    # sweep the HOT key's frequency at fixed cold mass: the naive plan's
    # hot reducer must read every partial set of the head key in one
    # task (max-task bytes grows ~linearly with hot frequency), while the
    # salted phase-1 spreads it 1/n_salts per task and phase-2 reads
    # n_salts capped partials — the max-task curve goes FLAT.
    for hot_share in (750_000, 1_500_000, 3_000_000):
        df = (spark.range(hot_share + n_cold)
              .select(
                  F.when(F.col("id") < hot_share, F.lit("hot_0"))
                  .otherwise(F.concat(F.lit("e_"), F.expr("id div 3")))
                  .alias("eid"),
                  F.concat(F.lit("c"), F.col("id")).alias("conv_id"),
                  F.lit(0).alias("turn_idx"), F.lit(0).alias("sent_idx"),
                  F.lit(1.0).alias("frequency"))
              .persist())
        df.count()

        def naive_capped():
            (df.select("eid", sid).groupBy("eid")
             .agg(F.slice(F.sort_array(F.collect_set("sid")), 1, cap)
                  .alias("sids"), F.count("*").alias("n"))
             .select(F.sum(F.size("sids"))).collect())

        def salted_capped():
            build_lineage(df, max_sids=cap) \
                .select(F.sum(F.size("sids"))).collect()

        row = {"hot_rows": hot_share}
        for name, fn in (("naive", naive_capped), ("salted", salted_capped)):
            before = stage_ids()
            fn()
            stages = max_task_reads(stage_ids() - before)
            row[f"{name}_stages"] = stages
            row[f"{name}_max_task_mb"] = max(
                (s["max_task_shuffle_mb"] for s in stages), default=0.0)
        row["max_task_ratio_naive_over_salted"] = round(
            row["naive_max_task_mb"] / max(row["salted_max_task_mb"], 1e-9), 2)
        out["sweep"].append(row)
        df.unpersist()
    lo, hi = out["sweep"][0], out["sweep"][-1]
    out["naive_max_task_growth_4x_hot"] = round(
        hi["naive_max_task_mb"] / max(lo["naive_max_task_mb"], 1e-9), 2)
    out["salted_max_task_growth_4x_hot"] = round(
        hi["salted_max_task_mb"] / max(lo["salted_max_task_mb"], 1e-9), 2)
    print(json.dumps(out))
    spark.stop()


def bench_skew():
    from pyspark.sql import functions as F

    from aser_spark.config import get_spark
    from aser_spark.pipeline.aggregate import build_lineage, salted_sum

    spark = get_spark(app="skew-evidence", cpus=4, shuffle_partitions=8)
    n_rows, hot_share, cap = 2_000_000, 1_500_000, 64
    # ONE hot eid holding 75% of all instances; ~166k cold eids with ~3
    # each -> hot/median frequency ratio = 5e5 (the north-star head-key
    # shape, aser/eventuality.py:57-85 at 10^12 turns)
    df = (spark.range(n_rows)
          .select(
              F.when(F.col("id") < hot_share, F.lit("hot_0"))
              .otherwise(F.concat(F.lit("e_"), F.expr("id div 3")))
              .alias("eid"),
              F.concat(F.lit("c"), F.col("id")).alias("conv_id"),
              F.lit(0).alias("turn_idx"), F.lit(0).alias("sent_idx"),
              F.lit(1.0).alias("frequency"))
          .persist())
    df.count()

    sid = F.concat_ws("|", "conv_id", "turn_idx", "sent_idx").alias("sid")

    def calib():
        t0 = time.time()
        spark.range(0, 200_000_000, 1, 4).selectExpr(
            "sum(pmod(id * 2654435761, 1000003))").collect()
        return round(time.time() - t0, 3)

    def naive_full():
        (df.select("eid", sid).groupBy("eid")
         .agg(F.collect_set("sid").alias("sids"), F.count("*").alias("n"))
         .select(F.sum(F.size("sids"))).collect())

    def salted_full():
        build_lineage(df).select(F.sum(F.size("sids"))).collect()

    def naive_capped():
        (df.select("eid", sid).groupBy("eid")
         .agg(F.slice(F.sort_array(F.collect_set("sid")), 1, cap)
              .alias("sids"), F.count("*").alias("n"))
         .select(F.sum(F.size("sids"))).collect())

    def salted_capped():
        build_lineage(df, max_sids=cap) \
            .select(F.sum(F.size("sids"))).collect()

    def naive_sum():
        df.groupBy("eid").agg(F.sum("frequency").alias("f")) \
          .select(F.sum("f")).collect()

    def two_phase_sum():
        salted_sum(df, ["eid"], "frequency", "conv_id") \
            .select(F.sum("frequency")).collect()

    variants = [("naive_full", naive_full), ("salted_full", salted_full),
                ("naive_capped", naive_capped),
                ("salted_capped", salted_capped),
                ("naive_sum", naive_sum), ("salted_sum", two_phase_sum)]
    out = {"metric": "skew_evidence", "n_rows": n_rows,
           "hot_rows": hot_share, "hot_to_median_ratio": 5e5,
           "cap": cap, "cpus": 4, "cpu_calib_start_sec": calib()}
    # interleave reps so host-speed drift hits every variant equally
    times = {name: [] for name, _ in variants}
    for _rep in range(2):
        for name, fn in variants:
            t0 = time.time()
            fn()
            times[name].append(round(time.time() - t0, 3))
    for name, ts in times.items():
        out[f"{name}_sec"] = min(ts)
        out[f"{name}_reps"] = ts
    out["cpu_calib_end_sec"] = calib()
    out["capped_speedup_salted_vs_naive"] = round(
        out["naive_capped_sec"] / out["salted_capped_sec"], 2)
    print(json.dumps(out))
    spark.stop()


def bench_cc():
    from pyspark.sql import functions as F

    from aser_spark.config import get_spark
    from aser_spark.graphops import connected_components_star

    spark = get_spark(app="cc-evidence", cpus=4, shuffle_partitions=16)
    chain_n = 1_000_000
    n_cliques, clique_k = 400, 100
    chain = spark.range(chain_n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    members = spark.range(n_cliques * clique_k).select(
        F.expr("id div 100").alias("c"),
        (F.col("id") + 10_000_000).alias("v"))
    cliq = (members.alias("x").join(members.alias("y"), "c")
            .filter(F.col("x.v") < F.col("y.v"))
            .select(F.col("x.v").alias("src"), F.col("y.v").alias("dst")))
    edges = chain.unionByName(cliq).persist()
    n_edges = edges.count()

    stats: list = []
    t0 = time.time()
    comp = connected_components_star(edges, max_iter=80, round_stats=stats)
    n_comp = comp.select("component").distinct().count()
    wall = round(time.time() - t0, 3)
    expect = 1 + n_cliques  # one chain component + each clique
    print(json.dumps({
        "metric": "cc_star_evidence", "n_edges": n_edges,
        "chain_diameter": chain_n, "n_components": n_comp,
        "components_expected": expect, "rounds": len(stats),
        "total_sec": wall,
        "round_table": [{"round": r, "edges": n, "sec": s}
                        for r, n, s in stats],
    }))
    assert n_comp == expect, f"CC WRONG: {n_comp} != {expect}"
    spark.stop()


def bench_export():
    import tempfile

    from aser_spark.config import get_spark
    from aser_spark.datagen import transcripts_df
    from aser_spark.pipeline import extract_graph_instances
    from aser_spark.pipeline.aggregate import (aggregate_edges,
                                               aggregate_nodes,
                                               edges_from_instances,
                                               nodes_from_instances)
    from aser_spark.pipeline.graph import build_core_kg
    from aser_spark.serving_sqlite import export_kg_to_sqlite

    spark = get_spark(app="export-evidence", cpus=32, shuffle_partitions=32)
    t = transcripts_df(spark, 25_000, seed=42)
    inst = extract_graph_instances(t, pre_grouped=True).persist()
    inst.count()
    nodes = aggregate_nodes(nodes_from_instances(inst)).persist()
    edges = aggregate_edges(edges_from_instances(inst)).persist()
    core_nodes, core_edges = build_core_kg(nodes, edges)
    core_nodes = core_nodes.persist()
    core_edges = core_edges.persist()
    n_nodes, n_edges = core_nodes.count(), core_edges.count()

    rss_before = _maxrss_mb()
    db = tempfile.mktemp(suffix=".db")
    t0 = time.time()
    stats = export_kg_to_sqlite(core_nodes, core_edges, db)
    wall = round(time.time() - t0, 3)
    rss_after = _maxrss_mb()
    n_exported = stats["n_eventualities"] + stats["n_relations"]
    print(json.dumps({
        "metric": "serving_export_evidence", "sf_equiv": 0.1,
        "core_nodes": n_nodes, "core_edges_long": n_edges,
        "exported_rows": n_exported, "export_sec": wall,
        "rows_per_sec": round(n_exported / wall, 1),
        "db_mb": round(Path(db).stat().st_size / 1e6, 1),
        "driver_maxrss_mb_before": round(rss_before, 1),
        "driver_maxrss_mb_after": round(rss_after, 1),
    }))
    Path(db).unlink(missing_ok=True)
    spark.stop()


def bench_giant_conv():
    """Giant-conversation skew guard: one pathological conversation of N
    turns (plus a normal tail of small conversations) extracted at
    local[8], unsplit (keyed conv_id — the giant is ONE task) vs
    max_turns=64 chunks.  Records wall both ways; the split's win is the
    parallelism the unsplit plan structurally cannot have.  Identity of
    the outputs is pinned by tests/test_skew_split.py; this measures."""
    from aser_spark.config import get_spark
    from aser_spark.datagen import transcripts_df
    from aser_spark.pipeline.extract import extract_graph_instances

    n_turns = int(sys.argv[2]) if len(sys.argv) > 2 else 3000
    spark = get_spark(app="giant-conv", cpus=8, shuffle_partitions=8)
    texts = [f"the worker finishes task {i} and the reviewer checks the "
             f"result before the deadline." for i in range(n_turns)]
    giant = spark.createDataFrame(
        [("giant-0", i, t) for i, t in enumerate(texts)],
        "conv_id string, turn_idx int, text string")
    tail = transcripts_df(spark, 64, seed=11).select(
        "conv_id", "turn_idx", "text")
    src = giant.unionByName(tail).persist()
    src.count()

    out = {}
    for label, kw in (("unsplit", {}), ("split_64", {"max_turns": 64})):
        out[label + "_sec"] = _best_of(
            lambda kw=kw: extract_graph_instances(src, **kw)
            .write.format("noop").mode("overwrite").save(), n=2)
    out["speedup"] = round(out["unsplit_sec"] / out["split_64_sec"], 2)
    print(json.dumps({"metric": "giant_conv_skew_guard", "n_turns": n_turns,
                      "cpus": 8, **out}))
    spark.stop()


def bench_giant_conv_tasks():
    """Per-TASK boundedness of the max_turns skew guard at the edge
    (r6 VERDICT #6): ONE synthetic 100k-turn conversation hidden among
    20k normal ones, extracted with and without the guard, max task
    shuffle-read records/bytes per stage via the REST taskSummary (the
    r5 methodology).  Keyed on conv_id alone the giant is ONE task whose
    shuffle read grows with the conversation; with max_turns=64 every
    task's read is capped at m + 2*context_turns turns of any single
    conversation regardless of its length.  Output identity under the
    guard is pinned by tests/test_skew_split.py; this measures the
    boundedness claim."""
    import urllib.request

    from aser_spark.config import get_spark
    from aser_spark.datagen import transcripts_df
    from aser_spark.pipeline.extract import extract_graph_instances

    giant_turns = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    n_normal = int(sys.argv[3]) if len(sys.argv) > 3 else 20_000
    spark = get_spark(app="giant-conv-tasks", cpus=8, shuffle_partitions=16,
                      extra={"spark.ui.enabled": "true"})
    sc = spark.sparkContext
    app_id = sc.applicationId
    base = sc.uiWebUrl + "/api/v1"

    def rest(path):
        with urllib.request.urlopen(base + path) as r:
            return json.load(r)

    def stage_ids():
        return {s["stageId"] for s in rest(f"/applications/{app_id}/stages")}

    def max_task_reads(new_ids):
        worst = {"max_task_shuffle_records": 0, "max_task_shuffle_mb": 0.0}
        for st in sorted(new_ids):
            try:
                summ = rest(f"/applications/{app_id}/stages/{st}/0/"
                            "taskSummary?quantiles=1.0")
            except Exception:
                continue
            sr = summ.get("shuffleReadMetrics") or {}
            recs = int((sr.get("readRecords") or [0])[0])
            byts = (sr.get("readBytes") or [0])[0]
            if recs > worst["max_task_shuffle_records"]:
                worst = {"max_task_shuffle_records": recs,
                         "max_task_shuffle_mb": round(byts / 2**20, 2)}
        return worst

    giant = spark.createDataFrame(
        [("giant-0", i,
          f"the worker finishes task {i} and the reviewer checks the "
          f"result before the deadline.") for i in range(giant_turns)],
        "conv_id string, turn_idx int, text string")
    tail = transcripts_df(spark, n_normal, seed=11).select(
        "conv_id", "turn_idx", "text")
    src = giant.unionByName(tail).persist()
    n_rows = src.count()

    out = {"metric": "giant_conv_task_evidence", "giant_turns": giant_turns,
           "n_normal_convs": n_normal, "n_rows_total": n_rows, "cpus": 8}
    for label, kw in (("split_64", {"max_turns": 64}), ("unsplit", {})):
        before = stage_ids()
        t0 = time.time()
        (extract_graph_instances(src, **kw)
         .write.format("noop").mode("overwrite").save())
        out[label + "_sec"] = round(time.time() - t0, 3)
        out[label] = max_task_reads(stage_ids() - before)
    out["max_task_records_ratio_unsplit_over_split"] = round(
        out["unsplit"]["max_task_shuffle_records"]
        / max(out["split_64"]["max_task_shuffle_records"], 1), 2)
    out["wall_speedup_split"] = round(
        out["unsplit_sec"] / max(out["split_64_sec"], 1e-9), 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    {"skew": bench_skew, "skew_tasks": bench_skew_tasks, "cc": bench_cc,
     "export": bench_export, "giant_conv": bench_giant_conv,
     "giant_conv_tasks": bench_giant_conv_tasks}[sys.argv[1]]()
