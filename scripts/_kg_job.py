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

    from pyspark.sql import SparkSession, functions as F

    spark = SparkSession.builder.appName(f"kg-scaling-{cpus}").getOrCreate()

    from aser_spark.datagen import transcripts_df
    from aser_spark.pipeline import build_knowledge_graph, extract_graph_instances
    from aser_spark.pipeline.graph import build_core_kg

    transcripts = transcripts_df(spark, n_convs, seed=42).persist()
    n_turns = transcripts.count()

    t0 = time.time()
    inst = extract_graph_instances(transcripts).persist()
    nodes, edges, lineage = build_knowledge_graph(inst)
    core_nodes, core_edges = build_core_kg(nodes, edges)
    # the four independent aggregations run as CONCURRENT jobs (local mode
    # shares one scheduler): wall = max, not sum, of their fixed costs
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(4) as ex:
        f = [ex.submit(df.count) for df in (nodes, edges, core_edges, lineage)]
        n_nodes, n_edges, n_core, n_lineage = [x.result() for x in f]
    kg_sec = time.time() - t0

    print(json.dumps({
        "cpus": cpus,
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
