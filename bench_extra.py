"""Auxiliary benchmark: per-query noop-sink isolation + plan capture.

NOT the driver contract (bench.py is frozen for measurement) — this is the
guide-§1 measurement harness used during optimization rounds:

* times each head/enrichment query against the noop sink (computes every
  column of every row, no output cost, visible in the SQL tab) with N reps
  and reports the min;
* optionally writes ``.explain('formatted')`` for each query to
  ``plans/<tag>/<name>_<suffix>.txt`` so plan-shape claims in
  OPTIMIZATION_r*.md are checkable without running Spark.

Usage:
    python bench_extra.py [--plans plans/r08 --suffix before] [names...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("BENCH_EXTRA_REPS", "3"))

HEAD_NAMES = [
    "tpch_q1_pricing", "join_region_order_volume",
    "adjacent_event_transitions", "salted_user_value_sum",
    "minhash_signatures", "ngram_jaccard_pairs", "simhash_documents",
    "cosine_topk", "lsh_candidate_pairs",
]


def main():
    args = sys.argv[1:]
    plans_dir = None
    suffix = "before"
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--plans":
            plans_dir = Path(args[i + 1])
            i += 2
        elif args[i] == "--suffix":
            suffix = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1
    if not names:
        names = HEAD_NAMES

    import __spark_entry__ as E
    from aser_spark.config import get_spark

    spark = get_spark(app="aser-bench-extra", cpus=CPUS,
                      shuffle_partitions=max(CPUS * 2, 16))
    E._ship_package(spark)
    qs = E.queries()
    out = {}
    for name in names:
        fn = qs[name]
        if plans_dir is not None:
            plans_dir.mkdir(parents=True, exist_ok=True)
            df = fn(spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            (plans_dir / f"{name}_{suffix}.txt").write_text(txt)
        best = None
        for _ in range(REPS):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            el = round(time.time() - t0, 3)
            best = el if best is None else min(best, el)
        spark.sparkContext.setJobDescription(None)
        out[name] = best
        print(f"[{name}] min of {REPS}: {best}s", file=sys.stderr)
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "noop_min": out}))
    spark.stop()


if __name__ == "__main__":
    main()
