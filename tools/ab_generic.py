#!/usr/bin/env python
"""Generic bench-child A/B over env-var configurations, using bench.py's
noise discipline. Dev tool behind BENCH.md.

Usage: python tools/ab_generic.py reps cores "LABEL:K=V,K=V" "LABEL:K=V" ...
Example: python tools/ab_generic.py 2 32 "base:" "cap2m:BENCH_CAP=2000000,BENCH_CONC=3"
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402

reps = int(sys.argv[1])
cores_list = [int(c) for c in sys.argv[2].split("+")]
configs = []
for spec in sys.argv[3:]:
    label, _, kvs = spec.partition(":")
    env = dict(kv.split("=", 1) for kv in kvs.split(",") if kv)
    configs.append((label, env))

KEYS = {k for _, env in configs for k in env}
results: dict[tuple[str, int], list[float]] = {}
for rep in range(reps):
    for cores in cores_list:
        for label, env in configs:
            for k in KEYS:
                os.environ.pop(k, None)
            os.environ.update(env)
            dt, dt_fold, n, noise = bench.replay_subprocess(cores)
            results.setdefault((label, cores), []).append(dt)
            print(f"rep={rep} cores={cores} cfg={label} apply={dt:.2f}s "
                  f"fold={dt_fold:.2f}s ev/s={n/dt:,.0f} noise={noise}", flush=True)

print("\n=== best-of summary ===")
for (label, cores), ts in sorted(results.items()):
    print(f"{label} cores={cores}: best={min(ts):.2f}s all={[round(t,1) for t in ts]}")
