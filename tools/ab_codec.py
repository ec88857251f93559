#!/usr/bin/env python
"""A/B the delta/fold parquet codec (snappy vs zstd) through bench.py's own
pinned, idle-gated, probe-gauged subprocess children — the round-5 verdict
item 2 experiment. Each child reports BOTH the apply wall and the fold wall,
so the trade (zstd: +compress CPU on the apply's write job vs -bytes for the
bandwidth-bound fold) is measured end-to-end, per level.

Usage: python tools/ab_codec.py [reps]
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402

reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
applies: dict[tuple[int, str], list[float]] = {}
folds: dict[tuple[int, str], list[float]] = {}
noises: dict[tuple[int, str], list[dict]] = {}
for rep in range(reps):
    for cores in (32, 8):
        for codec in ("snappy", "zstd"):
            os.environ["BENCH_COMPRESSION"] = codec
            dt, dt_fold, n, noise = bench.replay_subprocess(cores, do_fold=True)
            # absolute-anchored contamination call (bench.contaminated's
            # probe gates are absolute with relative backstops; anchor the
            # relative part to this box's known-healthy probe floor)
            noise["contaminated"] = bench.contaminated(noise, 0.15, 100.0)
            applies.setdefault((cores, codec), []).append(dt)
            folds.setdefault((cores, codec), []).append(dt_fold)
            noises.setdefault((cores, codec), []).append(noise)
            print(f"rep={rep} cores={cores} codec={codec} apply={dt:.2f}s "
                  f"fold={dt_fold:.2f}s total={dt + dt_fold:.2f}s "
                  f"noise={noise}", flush=True)

print("\n=== best-of summary (clean-preferred) ===")


def best(vals, nzs):
    clean = [v for v, nz in zip(vals, nzs) if not nz.get("contaminated")]
    return min(clean if clean else vals)


for codec in ("snappy", "zstd"):
    t8 = best(applies[(8, codec)], noises[(8, codec)])
    t32 = best(applies[(32, codec)], noises[(32, codec)])
    f8 = best(folds[(8, codec)], noises[(8, codec)])
    f32 = best(folds[(32, codec)], noises[(32, codec)])
    print(f"codec={codec}: apply 8c={t8:.2f} 32c={t32:.2f} | "
          f"fold 8c={f8:.2f} 32c={f32:.2f} | "
          f"incl-fold eff = {(t8 + f8) / (4 * (t32 + f32)):.3f} | "
          f"apply eff = {t8 / (4 * t32):.3f}")
