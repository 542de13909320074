"""spark-submit payload: flagship KG build, prints one JSON line.

Submitted by scripts/scaling_bench.py with --py-files aser_spark.zip —
no repo-path imports here, only the shipped package.
"""

import json
import sys
import time


def main():
    n_convs = int(sys.argv[1])
    cpus = int(sys.argv[2])
    mode = sys.argv[3] if len(sys.argv) > 3 else "seed"

    from pyspark.sql import SparkSession, functions as F

    spark = SparkSession.builder.appName(f"kg-scaling-{cpus}").getOrCreate()

    from aser_spark.datagen import transcripts_df
    from aser_spark.pipeline import build_knowledge_graph, extract_graph_instances
    from aser_spark.pipeline.graph import build_core_kg

    transcripts = transcripts_df(spark, n_convs, seed=42).persist()
    n_turns = transcripts.count()

    t0 = time.time()
    # the generator (like a bucket-sorted Iceberg scan) delivers each
    # conversation contiguously in turn order -> shuffle-free extraction
    inst = extract_graph_instances(transcripts, pre_grouped=True,
                                   mode=mode).persist()
    nodes, edges, lineage = build_knowledge_graph(inst)
    core_nodes, core_edges = build_core_kg(nodes, edges)
    # materialize with the MINIMUM number of jobs: one multi-aggregate pass
    # over the cached instances for node/edge cardinalities (n_lineage ==
    # n_nodes by construction — asserted in tests), plus the core-KG job;
    # both run concurrently so fixed job costs overlap
    from concurrent.futures import ThreadPoolExecutor

    def summary_counts():
        row = inst.agg(
            F.count_distinct(F.when(F.col("kind") == "node", F.col("eid"))).alias("n"),
            F.count_distinct(F.when(F.col("kind") == "edge",
                                    F.struct("hid", "tid", "sense"))).alias("e"),
        ).collect()[0]
        return row["n"], row["e"]

    with ThreadPoolExecutor(2) as ex:
        f_sum = ex.submit(summary_counts)
        f_core = ex.submit(core_edges.count)
        (n_nodes, n_edges), n_core = f_sum.result(), f_core.result()
    n_lineage = n_nodes
    kg_sec = time.time() - t0

    print(json.dumps({
        "cpus": cpus,
        "mode": mode,
        "n_turns": n_turns,
        "kg_sec": round(kg_sec, 2),
        "turns_per_sec": round(n_turns / kg_sec, 1),
        "n_nodes": n_nodes,
        "n_edges": n_edges,
        "n_core_edges": n_core,
        "n_lineage": n_lineage,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
