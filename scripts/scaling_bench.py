"""N vs 4N scaling-efficiency evidence (BASELINE.json north rule).

Runs the SAME flagship KG-construction job on the SAME input at two
parallelism levels (default local[8] vs local[32] — the sandbox stand-in
for N vs 4N executors, per the driver's instruction) via spark-submit
--py-files, and writes BENCH/BASELINE.md with turns/sec at both plus the
scaling efficiency.

Usage: python scripts/scaling_bench.py [n_convs] [low_cpus] [high_cpus]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

JOB = REPO / "scripts" / "_kg_job.py"


def build_zip() -> str:
    zpath = "/tmp/aser_spark_submit.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        # ship data resources (frozen discourse classifier weights/vocabs)
        # alongside the code — executors on a real cluster see ONLY this
        # zip, and kernel/discourse_models.py loads via importlib.resources
        # precisely so the zip works without extraction
        for pat in ("*.py", "*.npz", "*.json.gz"):
            for p in (REPO / "aser_spark").rglob(pat):
                z.write(p, p.relative_to(REPO))
    return zpath


def run_once(cpus: int, n_convs: int, pyfiles: str, mode: str = "seed",
             job=None, job_args=None, timeout: int = 3600) -> dict:
    """Run one spark-submit job and parse its JSON line.  ``job``/
    ``job_args`` default to the flagship KG job; other scaling scripts
    (dedup_scaling.py) pass their own job so the launcher lives once."""
    # prefer the pip-pyspark spark-submit (same Spark build the rest of the
    # repo runs on); fall back to whatever is on PATH
    candidate = Path(sys.executable).parent / "spark-submit"
    spark_submit = str(candidate) if candidate.exists() else shutil.which("spark-submit")
    if spark_submit is None:
        raise RuntimeError("spark-submit not found (neither next to the "
                           "python interpreter nor on PATH)")
    args = ([str(a) for a in job_args] if job_args is not None
            else [str(n_convs), str(cpus), mode])
    out = subprocess.run(
        [spark_submit,
         "--master", f"local[{cpus}]",
         "--py-files", pyfiles,
         "--conf", "spark.sql.adaptive.enabled=true",
         "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
         "--conf", f"spark.sql.shuffle.partitions={max(cpus * 2, 16)}",
         "--conf", "spark.ui.enabled=false",
         # generous heap: at 16+ task threads the Arrow/UDF allocation rate
         # makes an 8g heap GC-bound and silently destroys scaling
         "--driver-memory", os.environ.get("SPARK_DRIVER_MEMORY", "32g"),
         str(job or JOB), *args],
        capture_output=True, text=True, timeout=timeout,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from spark-submit (cpus={cpus}):\n"
                       f"{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    repeats = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    mode = sys.argv[5] if len(sys.argv) > 5 else "seed"

    pyfiles = build_zip()
    # The sandbox VM's effective CPU capacity varies over time (shared
    # host / throttling), so a single A-then-B measurement is unreliable.
    # Alternate the two configs `repeats` times with cool-downs and take
    # the BEST throughput per config — throttling only ever slows a run
    # down, so best-of approximates unthrottled capacity.
    import time as _time

    runs_low, runs_high = [], []
    order = [(low, runs_low), (high, runs_high)] * repeats
    for i, (cpus, bucket) in enumerate(order):
        r = run_once(cpus, n_convs, pyfiles, mode)
        bucket.append(r)
        print(f"run {i + 1}/{len(order)} local[{cpus}]: "
              f"{r['turns_per_sec']} turns/s", file=sys.stderr, flush=True)
        # also mirror to stdout-adjacent log for monitoring
        _time.sleep(15)

    r_low = max(runs_low, key=lambda r: r["turns_per_sec"])
    r_high = max(runs_high, key=lambda r: r["turns_per_sec"])
    speedup = r_high["turns_per_sec"] / r_low["turns_per_sec"]
    efficiency = speedup / (high / low)
    all_runs = {
        f"local[{low}]": [r["turns_per_sec"] for r in runs_low],
        f"local[{high}]": [r["turns_per_sec"] for r in runs_high],
    }
    md = f"""# BENCH/BASELINE — scaling evidence (N vs 4N parallelism)

The north rule requires throughput scaling efficiency >= 0.8 from N to 4N
executors.  No real cluster exists in this sandbox, so (per the driver's
instruction) the SAME flagship KG-construction job runs on the SAME input
at two local parallelism levels via `spark-submit --py-files`:

```
spark-submit --master local[{{N}}] --py-files aser_spark.zip scripts/_kg_job.py {n_convs} {{N}}
```

| parallelism | turns | wall (s) | throughput (turns/s) | nodes | edges |
|---|---|---|---|---|---|
| local[{low}] (N) | {r_low['n_turns']} | {r_low['kg_sec']} | {r_low['turns_per_sec']} | {r_low['n_nodes']} | {r_low['n_edges']} |
| local[{high}] (4N) | {r_high['n_turns']} | {r_high['kg_sec']} | {r_high['turns_per_sec']} | {r_high['n_nodes']} | {r_high['n_edges']} |

- speedup {low}->{high} cores: **{speedup:.2f}x** (ideal {high // low}x)
- **scaling efficiency: {efficiency:.2f}** (target >= 0.8)
- identical outputs at both levels (nodes/edges counts match): {r_low['n_nodes'] == r_high['n_nodes'] and r_low['n_edges'] == r_high['n_edges']}

Measurement protocol: the sandbox VM's effective CPU capacity fluctuates
(shared host), so each config ran {repeats}x in alternating order with
cool-downs; the table reports the best run per config (throttling only
slows runs down).  All runs (turns/s): {json.dumps(all_runs)}

Work scales with conversation-hash partitions (explicit partition count —
see `aser_spark/pipeline/extract.py:_group_by_conv`), so the same plan
fans out across executors of a real cluster unchanged; the only global
barriers are the conv_id exchange and the final hash aggregations, both of
which combine map-side.
"""
    (REPO / "BENCH").mkdir(exist_ok=True)
    # don't clobber the curated BASELINE.md unless explicitly asked —
    # individual campaign reports go to a timestamped file
    import os as _os
    if _os.environ.get("SCALING_WRITE_BASELINE") == "1":
        (REPO / "BENCH" / "BASELINE.md").write_text(md)
    else:
        import time as _t
        (REPO / "BENCH" / f"scaling_run_{int(_t.time())}.md").write_text(md)
    print(json.dumps({"low": r_low, "high": r_high,
                      "speedup": round(speedup, 3),
                      "efficiency": round(efficiency, 3)}))


if __name__ == "__main__":
    main()
