#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line for the driver.

Measures:
1. Headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
   local[$SPARK_GRAFT_CPUS] — per-query seconds (forced with a noop sink).
2. The north metric: CDC replay throughput (change-events/sec applied
   end-to-end: WAL scan -> quarantine -> LWW dedup -> Arrow text extraction ->
   lake MERGE) at TWO parallelism levels (cpus/4 and cpus — the sandbox
   stand-in for N and 4N executors) on IDENTICAL pre-generated input.

Methodology notes (this sandbox is a shared VM with ~2-3x run-to-run variance):
- every replay runs in its OWN subprocess => fresh JVM, no heap carry-over;
- levels are INTERLEAVED and each level takes the best of $BENCH_REPS runs
  (best-of-N estimates machine capability under external noise);
- WAL, lake tables, and spark.local.dir live on tmpfs (/dev/shm) — stand-in
  for a cluster's distributed store; the single local disk's seek contention
  under 32 concurrent writers is an artifact a real cluster doesn't have.

Output: {"metric": ..., "value": <total sec>, "unit": "sec",
         "queries": {...}, "sf": ..., "events_per_sec": ..., "scaling": {...}}
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_EVENTS = int(os.environ.get("BENCH_EVENTS", "4000000"))
REPS = int(os.environ.get("BENCH_REPS", "2"))
SHM = "/dev/shm" if os.path.isdir("/dev/shm") else os.environ.get("TMPDIR", "/tmp")
WAL_CACHE = os.path.join(SHM, f"datax_bench_wal_{N_EVENTS}")

HEADLINE = [
    "cdc_lww_latest",
    "tpch_q1_pricing",
    "tpch_q3_shipping",
    "tpch_q5_nation_revenue",
    "events_sessionize",
    "doc_fingerprint",
    "doc_minhash_signatures",
    "doc_ngram_jaccard",
    "emb_cosine_topk",
]

_CHILD = r"""
import sys, time, shutil, os
sys.path.insert(0, {repo!r})
from datax_3_0_0_src_spark.session import get_spark
from datax_3_0_0_src_spark.cdc.gen import EventGenConfig, write_event_log
from datax_3_0_0_src_spark.cdc.replayer import ReplayConfig, Replayer
cores = {cores}
spark = get_spark(parallelism=cores, shuffle_partitions=cores,
                  extra_conf={{"spark.local.dir": {shm!r} + "/spark_local_bench"}})
base = {shm!r} + f"/datax_bench_replay_{{cores}}"
shutil.rmtree(base, ignore_errors=True)
wcfg = EventGenConfig(seed=9, n_events=20_000, events_per_epoch=20_000)
write_event_log(spark, wcfg, base + "/warm_wal", slices=cores)
Replayer(spark, ReplayConfig(log_dir=base + "/warm_wal",
                             table_path=base + "/warm_pages",
                             work_dir=base + "/warm_work", num_buckets=16)).run()
rep = Replayer(spark, ReplayConfig(log_dir={wal!r}, table_path=base + "/pages",
                                   work_dir=base + "/work", num_buckets=16))
t0 = time.monotonic()
res = rep.run()
dt = time.monotonic() - t0
n = sum(r.events_read for r in res)
shutil.rmtree(base, ignore_errors=True)
print(f"RESULT {{dt}} {{n}}")
spark.stop()
"""


def replay_subprocess(cores: int) -> tuple[float, int]:
    env = dict(os.environ, SPARK_DRIVER_MEM=os.environ.get("SPARK_DRIVER_MEM", "48g"))
    code = _CHILD.format(repo=REPO, cores=cores, shm=SHM, wal=WAL_CACHE)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        env=env, timeout=1800, check=False,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            _, dt, n = line.split()
            return float(dt), int(n)
    raise RuntimeError(f"replay child (cores={cores}) failed:\n{out.stderr[-3000:]}")


def main() -> None:
    from datax_3_0_0_src_spark import queries as qcat
    from datax_3_0_0_src_spark.cdc.gen import EventGenConfig, write_event_log
    from datax_3_0_0_src_spark.session import get_spark

    # ---- phase A: one-time WAL generation (cached across runs) -----------
    spark = get_spark(app_name="bench", parallelism=CPUS, shuffle_partitions=CPUS,
                      extra_conf={"spark.local.dir": f"{SHM}/spark_local_bench"})
    if not os.path.isdir(WAL_CACHE):
        cfg = EventGenConfig(seed=42, n_events=N_EVENTS,
                             events_per_epoch=N_EVENTS // 2)
        write_event_log(spark, cfg, WAL_CACHE, slices=CPUS * 4)

    # ---- phase B: headline queries at full parallelism -------------------
    def force(df):
        df.write.format("noop").mode("overwrite").save()

    queries: dict[str, float] = {}
    for name in HEADLINE:
        fn = qcat.QUERIES[name]
        force(fn(spark, SF_DIR))  # warm
        t0 = time.monotonic()
        force(fn(spark, SF_DIR))
        queries[name] = round(time.monotonic() - t0, 3)
    spark.stop()

    # ---- phase C: replay at two parallelism levels, interleaved ----------
    small = max(2, CPUS // 4)
    times: dict[int, list[float]] = {small: [], CPUS: []}
    n_events = {small: 0, CPUS: 0}
    for _ in range(REPS):
        for cores in (CPUS, small):
            dt, n = replay_subprocess(cores)
            times[cores].append(dt)
            n_events[cores] = n
    dt_small, dt_large = min(times[small]), min(times[CPUS])
    thr_small = n_events[small] / dt_small
    thr_large = n_events[CPUS] / dt_large
    efficiency = (thr_large / thr_small) / (CPUS / small)

    queries[f"cdc_replay_local{small}"] = round(dt_small, 3)
    queries[f"cdc_replay_local{CPUS}"] = round(dt_large, 3)

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    try:
        sf = float(sf)
    except ValueError:
        pass
    print(json.dumps({
        "metric": "headline_queries_plus_cdc_replay_total",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "events_per_sec": round(thr_large, 1),
        "scaling": {
            "input_events": N_EVENTS,
            "reps_per_level": REPS,
            "estimator": "best-of-reps (shared-VM noise mitigation)",
            "cores_small": small,
            "cores_large": CPUS,
            "all_times_small": [round(t, 2) for t in times[small]],
            "all_times_large": [round(t, 2) for t in times[CPUS]],
            "events_per_sec_small": round(thr_small, 1),
            "events_per_sec_large": round(thr_large, 1),
            "scaling_efficiency": round(efficiency, 3),
        },
    }))


if __name__ == "__main__":
    main()
