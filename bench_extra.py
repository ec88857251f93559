#!/usr/bin/env python
"""Round-7 per-query isolation bench (guide §1.4): times each headline query
with the noop sink, best-of-N after one warm pass, and optionally dumps
.explain("formatted") to a directory. bench.py stays frozen (driver
contract); numbers from here are cited in OPTIMIZATION_r07.md.

Usage: python bench_extra.py [--queries q1,q2,...] [--reps 2]
       [--plandir plans/r07 --suffix before]
"""
from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

DEFAULT = [
    "cdc_lww_latest", "tpch_q1_pricing", "tpch_q3_shipping",
    "tpch_q5_nation_revenue", "events_sessionize", "doc_repetition",
    "doc_fingerprint", "doc_minhash_signatures", "doc_ngram_jaccard",
    "emb_cosine_topk", "doc_dup_spans", "doc_gopher_filter",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=",".join(DEFAULT))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--plandir", default=None)
    ap.add_argument("--suffix", default="now")
    args = ap.parse_args()

    from datax_3_0_0_src_spark import queries as qcat
    from datax_3_0_0_src_spark.session import get_spark

    spark = get_spark(app_name="bench-extra", parallelism=CPUS,
                      shuffle_partitions=CPUS)

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    names = [q for q in args.queries.split(",") if q]
    out: dict[str, float] = {}
    warmed = False
    for name in names:
        fn = qcat.QUERIES[name]
        spark.sparkContext.setJobDescription(f"warm:{name}")
        df = fn(spark, SF_DIR)
        if not warmed:
            force(df)
            warmed = True
        if args.plandir:
            os.makedirs(args.plandir, exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(
                    args.plandir, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
        best = float("inf")
        for r in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name}:rep{r}")
            t0 = time.monotonic()
            force(fn(spark, SF_DIR))
            best = min(best, time.monotonic() - t0)
        out[name] = round(best, 3)
    print("QUERIES " + json.dumps(out))
    print("TOTAL", round(sum(out.values()), 3))
    spark.stop()


if __name__ == "__main__":
    main()
