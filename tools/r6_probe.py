"""Round-6 probe: isolate why the 64M 32-core apply reads ~185s when the
16M trend predicts ~90-100s. Runs sequential single-child A/Bs in the
current window via bench.replay_subprocess (same pinning, probes, gauges).

Usage: setsid nohup python tools/r6_probe.py > /tmp/r6_probe.log 2>&1 &
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402

CASES = [
    # (label, env overrides)
    ("defaults_cap8M_zstd", {}),
    ("cap2M", {"BENCH_CAP": "2000000"}),
    ("snappy", {"BENCH_COMPRESSION": "snappy"}),
    ("cap2M_snappy", {"BENCH_CAP": "2000000", "BENCH_COMPRESSION": "snappy"}),
]

out = []
for label, env in CASES:
    for k in ("BENCH_CAP", "BENCH_COMPRESSION", "BENCH_CONC"):
        os.environ.pop(k, None)
    os.environ.update(env)
    t0 = time.monotonic()
    dt, dt_fold, n, noise = bench.replay_subprocess(32, do_fold=False)
    rec = {
        "label": label,
        "apply_s": round(dt, 2),
        "events": n,
        "ev_per_s": round(n / dt, 1),
        "child_wall_s": round(time.monotonic() - t0, 1),
        "noise": {k: noise.get(k) for k in (
            "steal_frac_during", "cpu_frac", "probe_st_s", "probe_st_s_after",
            "probe_bw_gbs", "loadavg_during_max")},
        "laps": noise.get("laps"),
    }
    out.append(rec)
    print("CASE " + json.dumps(rec), flush=True)
    time.sleep(10)

with open(os.path.join(bench.REPO, "BENCH_local_r6_probe.json"), "w") as f:
    json.dump(out, f, indent=1)
print("DONE")
