"""Scaling evidence for the r7 curation operators (sliding-window chunking,
token-budget selection, grouped exact quantiles) — same alternating
best-of protocol as scaling_bench.py, two parallelism levels via
spark-submit --py-files; asserts the two levels produced IDENTICAL outputs
(checksums) and writes a section under BENCH/.

Usage: python scripts/curation_scaling.py [n_docs] [low] [high] [repeats]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

from scaling_bench import build_zip, run_once as _run_job

REPO = Path(__file__).resolve().parent.parent
JOB = REPO / "scripts" / "_curation_job.py"


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    repeats = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    pyfiles = build_zip()
    runs_low, runs_high = [], []
    for i, (cpus, bucket) in enumerate(
            [(low, runs_low), (high, runs_high)] * repeats):
        r = _run_job(cpus, n_docs, pyfiles, job=JOB,
                     job_args=[n_docs, cpus], timeout=3600)
        bucket.append(r)
        print(f"run {i + 1}/{2 * repeats} local[{cpus}]: "
              f"{r['total_sec']}s total "
              f"(chunk {r['chunk_sec']} / budget {r['budget_sec']} / "
              f"quantiles {r['quantiles_sec']})", file=sys.stderr, flush=True)
        time.sleep(10)

    r_low = min(runs_low, key=lambda r: r["total_sec"])
    r_high = min(runs_high, key=lambda r: r["total_sec"])
    assert r_low["checksums"] == r_high["checksums"], (
        "outputs differ across parallelism levels!",
        r_low["checksums"], r_high["checksums"])
    speedup = r_low["total_sec"] / r_high["total_sec"]
    eff = speedup / (high / low)
    per_op = {
        op: round(r_low[f"{op}_sec"] / r_high[f"{op}_sec"] / (high / low), 2)
        for op in ("chunk", "budget", "quantiles")}
    stamp = int(time.time())
    md = f"""
## Curation-operator scaling (r7: chunking / budget select / quantiles)

Same job (`scripts/_curation_job.py`, {n_docs:,} synthesized documents,
~110 tokens each) at local[{low}] vs local[{high}], alternating
best-of-{repeats}; outputs checksum-IDENTICAL at both levels
(chunk/budget/quantiles row counts + xxhash64 xors match).

| parallelism | chunk (s) | budget (s) | quantiles (s) | total (s) |
|---|---|---|---|---|
| local[{low}] (N) | {r_low['chunk_sec']} | {r_low['budget_sec']} | {r_low['quantiles_sec']} | {r_low['total_sec']} |
| local[{high}] ({high // low}N) | {r_high['chunk_sec']} | {r_high['budget_sec']} | {r_high['quantiles_sec']} | {r_high['total_sec']} |

- total speedup: **{speedup:.2f}x** (ideal {high // low}x) -> **efficiency {eff:.2f}**
- per-operator efficiency: {json.dumps(per_op)}
- all runs (total s): local[{low}] {[r['total_sec'] for r in runs_low]}, local[{high}] {[r['total_sec'] for r in runs_high]}
"""
    out = REPO / "BENCH" / f"curation_scaling_{stamp}.md"
    out.write_text(md.lstrip())
    print(md)
    print(f"written: {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
