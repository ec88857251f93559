"""CLI entry point — the reference's Engine.main contract.

`python -m datax_3_0_0_src_spark -job job.json [--cpus N]` runs one job
document end-to-end, exactly like `datax.py job.json` runs a DataX job
(core/src/main/java/com/alibaba/datax/core/Engine.java:546-575: parse -job,
bind config, start JobContainer; the final stats print mirrors
JobContainer.logStatistics). Reader name selects the engine path:

- reader "eventlog" -> the CDC replayer (run_cdc_job): WAL tail -> rate-capped
  micro-batches -> lake MERGE, exactly-once, resume-safe;
- anything else     -> the generic reader -> transformers -> writer pipeline
  (run_job).

On a cluster this module is what `spark-submit --py-files pkg.zip
-m datax_3_0_0_src_spark -job job.json` executes; session.py ships the
package zip to executors either way.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="datax_3_0_0_src_spark")
    ap.add_argument("-job", "--job", required=True, help="job JSON path")
    ap.add_argument("--cpus", type=int, default=None, help="local[N] cores")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args(argv)

    from .config import JobSpec, mask_secrets, run_cdc_job, run_job
    from .session import get_spark

    with open(args.job) as f:
        text = f.read()
    spec = JobSpec.from_json(text)
    print(json.dumps(
        {"job": args.job, "reader": mask_secrets(spec.reader),
         "writer": mask_secrets(spec.writer)}, sort_keys=True))

    spark = get_spark(
        app_name=f"datax-job:{args.job}",
        parallelism=args.cpus,
        shuffle_partitions=args.shuffle_partitions,
    )
    t0 = time.monotonic()
    if spec.reader.get("name") == "eventlog":
        results = run_cdc_job(spark, spec)
        summary = {
            "batches": len(results),
            "events_read": sum(r.events_read for r in results),
            "events_applied": sum(r.events_applied for r in results),
            "events_quarantined": sum(r.events_quarantined for r in results),
        }
    else:
        run_job(spark, spec)
        summary = {"status": "ok"}
    summary["wall_s"] = round(time.monotonic() - t0, 3)
    # JobContainer.logStatistics equivalent: one machine-readable result line
    print("DATAX_RESULT " + json.dumps(summary, sort_keys=True))
    return 0


if __name__ == "__main__":
    sys.exit(main())
