#!/usr/bin/env python
"""Probase at realistic scale (r6 VERDICT #5): synthesize a multi-million-
row Zipf-skewed probase dump in the reference's TSV layout
(concept \t instance \t co-occurrence freq), run the REAL loader
(load_probase: distributed csv scan + windowed normalization — never a
driver dict) and the conceptualization join with broadcast=False (the
realistic-dump strategy; the hinted broadcast would OOM at 30M rows), and
report throughput.

The node side is synthesized over the same instance vocabulary so the
probe join carries real hit rates; its plan (seed abstraction + explode +
equi-join + union) is identical to the production operator's — this
measures the concept-build dataflow, not the extraction kernel.

Usage: python scripts/probase_scale_bench.py [n_probase_rows] [n_nodes]
Defaults: 3,000,000 probase rows (~120k Zipf-skewed instances), 200,000
nodes.  Prints one JSON line; record it in BENCH/NOTES.md.
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
    n_nodes = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000

    from pyspark.sql import functions as F

    from aser_spark.config import get_spark
    from aser_spark.pipeline.concepts import load_probase, probase_concepts

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app="probase_scale", cpus=cpus,
                      shuffle_partitions=cpus)

    out = {"n_probase_rows": n_rows, "n_nodes": n_nodes, "cpus": cpus}
    tmp = tempfile.mkdtemp(prefix="probase_scale_")

    # --- synthesize the dump: Zipf-skewed instances (inverse-CDF on a
    # hash-uniform), hash-spread concepts, freq 1..1000.  Deterministic:
    # every column is a pure function of the row id. ----------------------
    t0 = time.time()
    u = (F.abs(F.xxhash64(F.col("id"))) % 1_000_003) / 1_000_003.0
    inst = F.pmod(F.pow(u + 1e-9, F.lit(-1.25)).cast("long"),
                  F.lit(120_000))
    con = F.abs(F.xxhash64(F.col("id") * 7 + 13)) % 40_000
    freq = 1 + F.abs(F.xxhash64(F.col("id") * 31 + 5)) % 1000
    dump = f"{tmp}/probase_tsv"
    (spark.range(n_rows)
     .select(F.concat(F.lit("concept"), con.cast("string")).alias("concept"),
             F.concat(F.lit("w"), inst.cast("string")).alias("instance"),
             freq.cast("string").alias("freq"))
     .write.mode("overwrite").option("sep", "\t").csv(dump))
    out["synth_sec"] = round(time.time() - t0, 3)

    # --- the real loader: csv scan + per-instance windowed normalization
    t0 = time.time()
    pb = load_probase(spark, dump)
    n_pb = pb.count()
    out["load_sec"] = round(time.time() - t0, 3)
    out["load_rows_per_sec"] = round(n_pb / max(out["load_sec"], 1e-9))

    # --- node side over the same vocabulary (4 content words per node,
    # one pronoun so the seed abstraction path executes too)
    w = lambda k: F.concat(F.lit("w"), (F.abs(F.xxhash64(F.col("id") * k))
                                        % 120_000).cast("string"))
    nodes = (spark.range(n_nodes)
             .select(F.concat(F.lit("e"), F.col("id").cast("string")).alias("eid"),
                     F.lit("s-v-o").alias("pattern"),
                     F.concat_ws(" ", F.lit("i"), w(3), w(17), w(29)).alias("words"),
                     F.lit("PRP VB NN NN").alias("pos_tags"),
                     F.lit(5.0).alias("frequency"))
             .persist())
    nodes.count()

    # --- concept build, realistic-dump strategy: NO broadcast hint (the
    # top-k projection of a 30M-row dump does not fit executor memory);
    # Catalyst plans a shuffled equi-join, AQE may downgrade if small
    t0 = time.time()
    concepts = probase_concepts(nodes, pb, topk=3, broadcast=False)
    n_out = concepts.count()
    out["concept_build_sec"] = round(time.time() - t0, 3)
    out["n_concept_rows"] = n_out
    out["nodes_per_sec"] = round(n_nodes / max(out["concept_build_sec"], 1e-9))

    plan = concepts._jdf.queryExecution().executedPlan().toString()
    out["probe_join"] = ("broadcast" if "BroadcastHashJoin" in plan
                         else "shuffled")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
