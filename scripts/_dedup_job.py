"""spark-submit job: near-duplicate grouping throughput at one parallelism
level (scaling evidence for the dedup pipeline shape).

Synthesizes a deterministic corpus with planted near-duplicate clusters
(in every 5-doc block, docs 1 and 2 are single-word mutations of doc 0, so
expected groups = 3/5 of n_docs), runs the same stages near_dup_groups
composes — minhash -> LSH pairs -> star connected components -> canonical
flags — with the two phases timed separately, and prints one JSON line
{n_docs, cpus, wall_sec, pairs_sec, cc_sec, docs_per_sec, n_groups}.

Usage: spark-submit --py-files aser_spark.zip _dedup_job.py N_DOCS CPUS
"""

import hashlib
import json
import sys
import time


def synth_docs(n_docs: int):
    """Deterministic corpus: ~40% of docs are mutated copies of a base doc
    (drop/replace one word), the rest unique."""
    rows = []
    for i in range(n_docs):
        base = i - (i % 5) if i % 5 in (1, 2) else i  # 2 of 5 docs near-dup
        words = [hashlib.md5(f"{base}:{j}".encode()).hexdigest()[:8]
                 for j in range(32)]  # unique docs share no shingles
        if base != i:  # mutate: replace one word position per copy index
            words[(i % 5) * 6] = "mut" + str(i % 5)
        rows.append((i, " ".join(words)))
    return rows


def main():
    n_docs, cpus = int(sys.argv[1]), int(sys.argv[2])
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.appName(f"dedup-scale-{cpus}")
             .getOrCreate())
    from aser_spark.graphops import connected_components_star
    from aser_spark.textops import lsh_candidate_pairs, minhash_signatures

    docs = spark.createDataFrame(synth_docs(n_docs),
                                 "doc_id long, text string").cache()
    docs.count()
    # stage 1 (the data-parallel bulk): shingle -> minhash -> banded pairs
    t0 = time.time()
    pairs = lsh_candidate_pairs(
        minhash_signatures(docs, n=4, num_perm=16), bands=4
    ).localCheckpoint(eager=True)
    pairs_sec = time.time() - t0
    # stage 2 (bounded-round tail): components + canonical flags — work is
    # proportional to the PAIR graph, not the corpus
    t1 = time.time()
    from pyspark.sql import functions as F

    comp = (connected_components_star(pairs, "doc_a", "doc_b")
            .withColumnRenamed("node", "doc_id"))
    out = (docs.select("doc_id").join(comp, "doc_id", "left")
           .select("doc_id", F.coalesce("component", F.col("doc_id"))
                   .alias("group_id")))
    n_groups = out.filter("doc_id = group_id").count()
    cc_sec = time.time() - t1
    dt = pairs_sec + cc_sec
    print(json.dumps({"n_docs": n_docs, "cpus": cpus,
                      "wall_sec": round(dt, 2),
                      "pairs_sec": round(pairs_sec, 2),
                      "cc_sec": round(cc_sec, 2),
                      "docs_per_sec": round(n_docs / dt, 1),
                      "pairs_docs_per_sec": round(n_docs / pairs_sec, 1),
                      "n_groups": n_groups}))
    spark.stop()


if __name__ == "__main__":
    main()
