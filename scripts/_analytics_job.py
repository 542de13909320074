"""spark-submit job for analytics-operator scaling evidence: gap
sessionization + keyed as-of join + pinned PageRank over data synthesized
deterministically IN Spark (seeded hash columns — no I/O bottleneck, so
the measurement isolates the operators' compute/shuffle).

Prints ONE JSON line: wall seconds per operator + rows/s + output
checksums (xxhash64-sum + row count) so the harness can assert the two
parallelism levels produced IDENTICAL results.

Usage (via spark-submit): _analytics_job.py <n_events> <cpus>
"""

import json
import sys
import time

from pyspark.sql import SparkSession, functions as F

N_USERS = 50_000
BASE_SEC = 1_704_067_200  # 2024-01-01


def synth_events(spark, n):
    """Deterministic events table: ~20% purchases, 30-day window."""
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        F.pmod(F.xxhash64("id"), F.lit(N_USERS)).alias("user_id"),
        F.timestamp_seconds(
            F.lit(BASE_SEC)
            + F.pmod(F.xxhash64("id", F.lit(1)), F.lit(86400 * 30))
        ).alias("ts"),
        F.when(F.pmod(F.xxhash64("id", F.lit(2)), F.lit(5)) == 0, "purchase")
         .otherwise("click").alias("event_type"),
        (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(10000)) / 100.0)
         .alias("value"),
        F.lit("").alias("props"),
    )


def checksum(df):
    """(row_count, xor of per-row xxhash64) — order-insensitive identity
    (xor, not sum: a long sum of 64-bit hashes overflows under ANSI)."""
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
            for c in df.columns]
    r = (df.select(F.xxhash64(*cols).alias("h"))
         .agg(F.count("*").alias("n"), F.expr("bit_xor(h)").alias("x"))
         .collect()[0])
    return int(r["n"]), int(r["x"])


def main():
    n_events = int(sys.argv[1])
    cpus = int(sys.argv[2])
    spark = (SparkSession.builder.appName(f"analytics-scale-{cpus}")
             .getOrCreate())
    from aser_spark.eventops import _epoch_sec, asof_join, session_stats
    from aser_spark.graphops import pagerank

    ev = synth_events(spark, n_events)
    ev.count()  # warm: materialize nothing, but JIT/codegen the generator

    t0 = time.time()
    sess_n, sess_h = checksum(session_stats(ev, gap_sec=1800))
    t_sess = time.time() - t0

    left = (ev.filter(F.col("event_type") == "click")
            .select("user_id", _epoch_sec(F.col("ts")).alias("t"),
                    "event_id", "value"))
    right = (ev.filter(F.col("event_type") == "purchase")
             .groupBy("user_id", _epoch_sec(F.col("ts")).alias("t"))
             .agg(F.round(F.sum("value"), 4).alias("purchase_value")))
    t0 = time.time()
    asof_n, asof_h = checksum(
        asof_join(left, right, on="t", by=("user_id",), tolerance=7200))
    t_asof = time.time() - t0

    # graph: ~n_events/4 edges over n_events/40 nodes, weighted
    n_nodes = max(n_events // 40, 1000)
    edges = spark.range(n_events // 4).select(
        F.pmod(F.xxhash64("id", F.lit(10)), F.lit(n_nodes)).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(11)), F.lit(n_nodes)).alias("dst"),
        (F.pmod(F.xxhash64("id", F.lit(12)), F.lit(9)) + 1.0).alias("w"))
    t0 = time.time()
    pr_n, pr_h = checksum(pagerank(edges, weight="w", iters=5))
    t_pr = time.time() - t0

    total = t_sess + t_asof + t_pr
    print(json.dumps({
        "n_events": n_events, "cpus": cpus,
        "sessionize_sec": round(t_sess, 2), "asof_sec": round(t_asof, 2),
        "pagerank_sec": round(t_pr, 2), "total_sec": round(total, 2),
        "events_per_sec": round(n_events * 2 / (t_sess + t_asof), 1),
        "turns_per_sec": round(n_events * 3 / total, 1),
        "n_turns": n_events * 3,
        "kg_sec": round(total, 2),
        "n_nodes": sess_n, "n_edges": asof_n,
        "checksums": {"session": [sess_n, sess_h],
                      "asof": [asof_n, asof_h],
                      "pagerank": [pr_n, pr_h]},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
