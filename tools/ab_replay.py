#!/usr/bin/env python
"""A/B the fused single-pass stage against the classic two-job pipeline using
bench.py's own noise discipline (idle-window launches, pinned subprocess
children, quarter-size warmup, interleaved reps). Dev tool behind BENCH.md.

Usage: python tools/ab_replay.py [reps]
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402

reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
results: dict[tuple[int, str], list[float]] = {}
folds: dict[tuple[int, str], list[float]] = {}
for rep in range(reps):
    for cores in (32, 8):
        for sp in ("1", "0"):
            os.environ["BENCH_SINGLE_PASS"] = sp
            dt, dt_fold, n, noise = bench.replay_subprocess(cores)
            results.setdefault((cores, sp), []).append(dt)
            folds.setdefault((cores, sp), []).append(dt_fold)
            print(f"rep={rep} cores={cores} single_pass={sp} apply={dt:.2f}s "
                  f"fold={dt_fold:.2f}s ev/s={n/dt:,.0f} noise={noise}",
                  flush=True)

print("\n=== best-of summary ===")
for (cores, sp), ts in sorted(results.items()):
    best = min(ts)
    print(f"cores={cores} single_pass={sp}: best apply={best:.2f}s "
          f"({bench.N_EVENTS/best:,.0f} ev/s) all={[round(t,1) for t in ts]} "
          f"fold_best={min(folds[(cores,sp)]):.2f}s")
for sp in ("1", "0"):
    t8, t32 = min(results[(8, sp)]), min(results[(32, sp)])
    print(f"single_pass={sp}: eff(8->32) best-of = {t8/(4*t32):.3f}")
