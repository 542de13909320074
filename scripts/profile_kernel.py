"""Single-threaded kernel profile (the r4/r5 '12k-turn profile', now a
committed script instead of an ad-hoc drive).

Drives conversation_instance_rows over N generated conversations in ONE
python process — no Spark, no Arrow — so the number isolates pure kernel
CPU from every distribution effect.  Reports a python cpu-calib probe
(host-throttle normalizer), then cold and warm passes per mode.

Usage: python scripts/profile_kernel.py [n_convs=1500] [mode=both]
Optionally `--cprofile` dumps the top-30 cumulative functions of the
discourse cold pass.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def cpu_calib() -> float:
    """Fixed pure-python work: normalizes stage timings against host
    throttle (mirrors bench.py's JVM probe, python-side)."""
    t = time.time()
    s = 0
    for i in range(8_000_000):
        s = (s + i * 2654435761) % 1000003
    return round(time.time() - t, 3)


def drive(convs, mode: str, memo=None):
    from aser_spark.pipeline.extract import (_sentence_cache,
                                             conversation_instance_rows)

    if memo is None:
        memo = _sentence_cache(mode)
    t0 = time.time()
    n_rows = 0
    for conv_id, turns in convs:
        n_rows += len(conversation_instance_rows(conv_id, turns, memo=memo,
                                                 mode=mode))
    return round(time.time() - t0, 3), n_rows, memo


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_convs = int(args[0]) if args else 1500
    mode = args[1] if len(args) > 1 else "both"
    use_cprofile = "--cprofile" in sys.argv

    from aser_spark.datagen.transcripts import gen_conversation_rows

    convs = []
    n_turns = 0
    for i in range(n_convs):
        rows = gen_conversation_rows(42, i)
        convs.append((rows[0][0], [(r[1], r[3]) for r in rows]))
        n_turns += len(rows)
    print(f"n_convs={n_convs} n_turns={n_turns}")
    print(f"cpu_calib={cpu_calib()}s  (healthy baseline ~0.55-0.7s)")

    for m in (["seed", "discourse"] if mode == "both" else [mode]):
        if use_cprofile and m == "discourse":
            import cProfile
            import pstats

            pr = cProfile.Profile()
            pr.enable()
        cold, n_rows, memo = drive(convs, m)
        if use_cprofile and m == "discourse":
            pr.disable()
            pstats.Stats(pr).sort_stats("cumulative").print_stats(30)
        warm, _, _ = drive(convs, m, memo=memo)
        print(f"{m}: cold={cold}s ({n_turns/cold:.0f} turns/s)  "
              f"warm={warm}s ({n_turns/warm:.0f} turns/s)  rows={n_rows}")
    print(f"cpu_calib_end={cpu_calib()}s")


if __name__ == "__main__":
    main()
