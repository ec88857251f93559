#!/usr/bin/env python
"""One instrumented CDC replay run (phase laps) at a pinned core count.

Usage: python tools/measure_replay.py <cores> [n_events] [conc]
Prints per-batch phase laps (verbose replayer) plus total apply/fold walls.
Dev tool backing BENCH.md's phase analysis; not part of the bench contract.
"""
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

cores = int(sys.argv[1])
n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000
conc = int(sys.argv[3]) if len(sys.argv) > 3 else 2
if hasattr(os, "sched_setaffinity"):
    os.sched_setaffinity(0, set(range(cores)))

from datax_3_0_0_src_spark.session import get_spark
from datax_3_0_0_src_spark.cdc.replayer import THROUGHPUT_PROFILE, ReplayConfig, Replayer
from datax_3_0_0_src_spark.cdc.gen import EventGenConfig, write_event_log
from datax_3_0_0_src_spark.cdc.extract import extract_text_udf
from pyspark.sql import functions as F

SHM = "/dev/shm"
wal = os.path.join(SHM, f"datax_bench_wal_{n_events}")
spark = get_spark(parallelism=cores, shuffle_partitions=cores,
                  extra_conf={"spark.local.dir": SHM + "/spark_local_bench"})
if not os.path.isdir(wal):
    write_event_log(spark, EventGenConfig(seed=42, n_events=n_events,
                                          events_per_epoch=n_events // 2),
                    wal, slices=128)
# warm python workers
(spark.range(0, cores * 2000, numPartitions=cores)
 .select(extract_text_udf(F.lit(
     b"<html><head><title>t</title></head><body>b</body></html>")))
 .write.format("noop").mode("overwrite").save())

base = SHM + f"/datax_measure_{cores}"
profile = dict(THROUGHPUT_PROFILE, max_concurrent_batches=conc, verbose=True)
if os.environ.get("MEASURE_SINGLE_PASS") in ("0", "false"):
    profile["single_pass"] = False
for label in ("warm", "measured"):
    shutil.rmtree(base, ignore_errors=True)
    rep = Replayer(spark, ReplayConfig(log_dir=wal, table_path=base + "/pages",
                                       work_dir=base + "/work", num_buckets=32,
                                       **profile))
    t0 = time.monotonic()
    res = rep.run()
    dt = time.monotonic() - t0
    t1 = time.monotonic()
    rep.table.compact(target_files_per_bucket=2,
                      concurrency=profile["compact_concurrency"],
                      strategy=profile["compact_strategy"])
    dt_fold = time.monotonic() - t1
    n = sum(r.events_read for r in res)
    print(f"[{label}] cores={cores} conc={conc} apply={dt:.2f}s fold={dt_fold:.2f}s "
          f"events={n} ev/s={n/dt:,.0f}", flush=True)
shutil.rmtree(base, ignore_errors=True)
spark.stop()
