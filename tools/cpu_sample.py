#!/usr/bin/env python
"""Sample machine CPU utilization while a command runs: prints per-2s busy
fraction (user+sys+..., excluding idle+iowait+steal) over ALL cpus, plus the
run's mean. Usage: python tools/cpu_sample.py -- <cmd...>"""
import subprocess
import sys
import time


def snap():
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:]]
    idle = v[3] + v[4]
    steal = v[7] if len(v) > 7 else 0
    return idle, steal, sum(v)


def main() -> None:
    cmd = sys.argv[sys.argv.index("--") + 1:]
    proc = subprocess.Popen(cmd)
    series = []
    i0, s0, t0 = snap()
    while proc.poll() is None:
        time.sleep(2)
        i1, s1, t1 = snap()
        tot = max(1, t1 - t0)
        busy = 1.0 - (i1 - i0) / tot
        series.append(busy)
        print(f"busy={busy:.2f} steal={(s1 - s0) / tot:.3f}", flush=True)
        i0, s0, t0 = i1, s1, t1
    print("mean busy over run:", round(sum(series) / max(1, len(series)), 3))


if __name__ == "__main__":
    main()
