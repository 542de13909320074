"""spark-submit job for curation-operator scaling evidence: sliding-window
chunking + token-budget selection + grouped exact quantiles over a document
corpus synthesized deterministically IN Spark (seeded hash columns — no I/O
bottleneck, so the measurement isolates the operators' compute/shuffle).

Prints ONE JSON line: wall seconds per operator + docs/s + output checksums
(xxhash64-xor + row count) so the harness can assert the two parallelism
levels produced IDENTICAL results.

Usage (via spark-submit): _curation_job.py <n_docs> <cpus>
"""

import json
import sys
import time

from pyspark.sql import SparkSession, functions as F

# vocabulary mixing stopwords / plain words / digit- and punct-bearing
# tokens so quality scores (and thus budget_select's buckets) spread out
WORDS = ("the and of model data training graph learn x9 42 spark corpus "
         "!! node edge weight is in sample").split()


def synth_documents(spark, n):
    """Deterministic documents table: 4 languages, 20-200 token texts."""
    vocab = F.array(*[F.lit(w) for w in WORDS])
    length = (F.pmod(F.xxhash64("id"), F.lit(181)) + 20).cast("int")
    text = F.array_join(
        F.transform(F.sequence(F.lit(1), length),
                    lambda i: F.element_at(
                        vocab,
                        (F.pmod(F.xxhash64(F.col("id"), i),
                                F.lit(len(WORDS))) + 1).cast("int"))),
        " ")
    lang = F.element_at(F.array(F.lit("en"), F.lit("de"), F.lit("fr"),
                                F.lit("es")),
                        (F.pmod(F.xxhash64("id", F.lit(7)), F.lit(4)) + 1)
                        .cast("int"))
    return spark.range(n).select(F.col("id").alias("doc_id"),
                                 lang.alias("lang"), text.alias("text"))


def checksum(df):
    """(row_count, xor of per-row xxhash64) — order-insensitive identity."""
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
            for c in df.columns]
    r = (df.select(F.xxhash64(*cols).alias("h"))
         .agg(F.count("*").alias("n"), F.expr("bit_xor(h)").alias("x"))
         .collect()[0])
    return int(r["n"]), int(r["x"])


def main():
    n_docs = int(sys.argv[1])
    cpus = int(sys.argv[2])
    spark = (SparkSession.builder.appName(f"curation-scale-{cpus}")
             .getOrCreate())
    from aser_spark.textops import (budget_select, chunk_documents,
                                    grouped_quantiles)
    from aser_spark.textops.quality import scored_documents

    docs = synth_documents(spark, n_docs)
    docs.count()  # JIT/codegen the generator outside the measured ops

    t0 = time.time()
    chunk_n, chunk_h = checksum(chunk_documents(docs, seq_len=64, overlap=8))
    t_chunk = time.time() - t0

    # budget sized to keep ~half the corpus per language
    budget = max((n_docs // 4) * 110 // 2, 1000)
    t0 = time.time()
    sel_n, sel_h = checksum(budget_select(scored_documents(docs), budget))
    t_sel = time.time() - t0

    t0 = time.time()
    q_n, q_h = checksum(grouped_quantiles(
        docs.select("lang", F.size(F.split(F.lower(F.trim("text")), " "))
                    .alias("n")),
        "n", [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]))
    t_q = time.time() - t0

    total = t_chunk + t_sel + t_q
    print(json.dumps({
        "n_docs": n_docs, "cpus": cpus,
        "chunk_sec": round(t_chunk, 2), "budget_sec": round(t_sel, 2),
        "quantiles_sec": round(t_q, 2), "total_sec": round(total, 2),
        "docs_per_sec": round(n_docs * 3 / total, 1),
        "checksums": {"chunk": [chunk_n, chunk_h],
                      "budget": [sel_n, sel_h],
                      "quantiles": [q_n, q_h]},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
