"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB
over the same parquet, compares row count + schema + order-insensitive values
(columns sorted by name, rows sorted by all columns).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            s = pd.to_datetime(pdf[c])
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            pdf[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("float64")
        elif pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("Int64")
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from datax_3_0_0_src_spark.session import get_spark

    spark = get_spark(app_name="correctness-check", parallelism=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t + '.parquet')}'"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {ex}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(got)} rows (no oracle) "
                  f"[{time.monotonic() - t0:.1f}s]")
            if len(got) == 0:
                print(f"WARN  {name}: zero rows")
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {ex}")
            failed.append(name)
            continue
        g, x = normalize(got), normalize(exp)
        status = "ok"
        if len(g) != len(x):
            status = f"ROWCOUNT {len(g)} != {len(x)}"
        elif list(g.columns) != list(x.columns):
            status = f"SCHEMA {list(g.columns)} != {list(x.columns)}"
        else:
            try:
                pd.testing.assert_frame_equal(g, x, check_dtype=False, check_exact=True)
            except AssertionError as ex:
                status = f"VALUES differ: {str(ex)[:400]}"
        tag = "ok   " if status == "ok" else "FAIL "
        print(f"{tag} {name}: {len(g)} rows [{time.monotonic() - t0:.1f}s]"
              + ("" if status == "ok" else f"\n      {status}"))
        if status != "ok":
            failed.append(name)
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
