"""RDBMS reader over any DB-API 2.0 driver — the jar-free twin of the
Spark-native JDBC reader.

Reference semantics (plugin-rdbms-util):
- PK-range split: MIN/MAX of the split key, equal-width ranges, one task per
  range (SingleTableSplitUtil.java:33-124 splitSingleTable + :279-289
  getPkRange). Spark's JDBC source implements the identical algorithm, but
  needs a JDBC jar; this reader drives the same protocol through a PICKLABLE
  DB-API ``connect`` factory so it is testable end-to-end against stdlib
  sqlite3 in this sandbox and drives mysqlclient/psycopg on a real cluster.
- column projection / WHERE pushdown into the per-range SELECT
  (CommonRdbmsReader.java:90-144 buildQuerySql: column list + where + range
  predicate compose into one statement per task).

Scale notes: the driver does only metadata work (one MIN/MAX query + an
optional LIMIT-0 schema probe); each executor task opens its own connection
and streams its range via ``fetchmany`` into Arrow batches (mapInPandas) — no
rows ever pass through the Spark driver, and parallelism is the range count
exactly like numPartitions in the native source.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from .registry import register_reader


def pk_ranges(lo, hi, n: int) -> list[tuple]:
    """Equal-width [lo, hi] split into n half-open ranges (the last is
    closed): SingleTableSplitUtil's integer bisection. Returns (lo, hi,
    is_last) triples; degenerate spans collapse to one range."""
    lo, hi = int(lo), int(hi)
    if n <= 1 or hi <= lo:
        return [(lo, hi, True)]
    width = max(1, (hi - lo + 1 + n - 1) // n)
    out = []
    cur = lo
    while cur <= hi:
        nxt = min(cur + width, hi + 1)
        out.append((cur, nxt - 1, nxt > hi))
        cur = nxt
    return out


def _range_sql(table: str, columns: list[str], split_pk: str,
               where: str | None, lo: int, hi: int, is_last: bool) -> str:
    cols = ", ".join(columns) if columns else "*"
    upper = f"{split_pk} <= {hi}" if is_last else f"{split_pk} < {hi + 1}"
    pred = f"{split_pk} >= {lo} AND {upper}"
    if where:
        pred = f"({where}) AND {pred}"
    return f"SELECT {cols} FROM {table} WHERE {pred}"


@register_reader("rdbms")
def read_dbapi(spark: SparkSession, p: dict) -> DataFrame:
    """Executor-side partitioned reads over a DB-API 2.0 ``connect`` factory.

    conf: connect (picklable callable -> DB-API connection), table,
    column? (list, default *), splitPk?, channel? (range count, default 4),
    lowerBound?/upperBound? (skip the MIN/MAX probe), where?,
    schema? (Spark DDL; default: inferred from a driver-side LIMIT-0 probe's
    cursor.description + a small sample), fetchSize? (rows per Arrow batch),
    querySql? (str or list — free-form SQL mode, one task per statement,
    table/column/where/splitPk ignored: ReaderSplitUtil.doSplit's querySql
    branch, plugin-rdbms-util/.../reader/util/ReaderSplitUtil.java:20-60).

    Without splitPk the whole table is one task (the reference's no-splitPk
    single-slice behavior, CommonRdbmsReader.java:68-88).
    """
    connect = p["connect"]
    if p.get("querySql"):
        qs = p["querySql"]
        return _run_sqls(
            spark, connect,
            [qs] if isinstance(qs, str) else list(qs),
            schema_ddl=p.get("schema"),
            probe_sql=f"SELECT * FROM ({qs if isinstance(qs, str) else qs[0]}) q WHERE 1=0",
            fetch=int(p.get("fetchSize", 10_000)),
        )
    table = p["table"]
    columns = list(p["column"]) if p.get("column") not in (None, "*", ["*"]) else []
    split_pk = p.get("splitPk")
    where = p.get("where")
    fetch = int(p.get("fetchSize", 10_000))

    # --- driver-side metadata: column names + split bounds ---------------
    conn = connect()
    try:
        cur = conn.cursor()
        cols_sql = ", ".join(columns) if columns else "*"
        cur.execute(f"SELECT {cols_sql} FROM {table} WHERE 1=0")
        colnames = [d[0] for d in cur.description]
        if split_pk:
            if p.get("lowerBound") is not None and p.get("upperBound") is not None:
                lo, hi = int(p["lowerBound"]), int(p["upperBound"])
            else:
                w = f" WHERE {where}" if where else ""
                cur.execute(f"SELECT MIN({split_pk}), MAX({split_pk}) FROM {table}{w}")
                lo, hi = cur.fetchone()
            ranges = (
                pk_ranges(lo, hi, int(p.get("channel", 4)))
                if lo is not None else []
            )
        else:
            ranges = None
        schema_ddl = p.get("schema")
        if not schema_ddl:
            # infer from a small sample (driver-side, bounded); explicit
            # ``schema`` skips this probe entirely
            cur.execute(
                _range_sql(table, columns, split_pk, where, lo, hi, True)
                if ranges else
                (f"SELECT {cols_sql} FROM {table}" + (f" WHERE {where}" if where else ""))
            )
            sample = cur.fetchmany(100)
            probe = spark.createDataFrame(
                [tuple(r) for r in sample] or [tuple(None for _ in colnames)],
                colnames,
            )
            schema_ddl = probe.schema.simpleString()[7:-1]  # strip struct<...>
    finally:
        conn.close()

    if ranges is not None and not ranges:  # empty table with a splitPk
        return spark.createDataFrame([], schema_ddl)

    sqls = (
        [_range_sql(table, columns, split_pk, where, lo_, hi_, last)
         for lo_, hi_, last in ranges]
        if ranges else
        [f"SELECT {', '.join(columns) if columns else '*'} FROM {table}"
         + (f" WHERE {where}" if where else "")]
    )
    return _run_sqls(spark, connect, sqls, schema_ddl=schema_ddl,
                     colnames=colnames, fetch=fetch)


def _run_sqls(
    spark: SparkSession,
    connect,
    sqls: list[str],
    *,
    schema_ddl: str | None,
    probe_sql: str | None = None,
    colnames: list[str] | None = None,
    fetch: int = 10_000,
) -> DataFrame:
    """One executor task per SQL statement, each streaming its result through
    ``fetchmany`` into Arrow batches. Driver does metadata-only probes."""
    if colnames is None or not schema_ddl:
        conn = connect()
        try:
            cur = conn.cursor()
            if colnames is None:
                cur.execute(probe_sql)
                colnames = [d[0] for d in cur.description]
            if not schema_ddl:
                # infer from a bounded sample; explicit ``schema`` skips this
                cur.execute(sqls[0])
                sample = cur.fetchmany(100)
                probe = spark.createDataFrame(
                    [tuple(r) for r in sample] or [tuple(None for _ in colnames)],
                    colnames,
                )
                schema_ddl = probe.schema.simpleString()[7:-1]  # strip struct<...>
        finally:
            conn.close()
    names = list(colnames)

    def run_sql(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for sql in pdf["sql"]:
                conn = connect()
                try:
                    cur = conn.cursor()
                    cur.execute(sql)
                    while True:
                        rows = cur.fetchmany(fetch)
                        if not rows:
                            break
                        yield pd.DataFrame.from_records(
                            [tuple(r) for r in rows], columns=names
                        )
                finally:
                    conn.close()

    # exactly one SQL per task: spark.range(n, numPartitions=n) puts one id
    # in each partition deterministically (a hash repartition of the SQL rows
    # can collide two ranges into one task and leave another idle)
    import pyspark.sql.functions as F

    arr = F.array(*[F.lit(s) for s in sqls])
    tasks = spark.range(0, len(sqls), 1, len(sqls)).select(
        F.element_at(arr, F.col("id").cast("int") + 1).alias("sql")
    )
    return tasks.mapInPandas(run_sql, schema_ddl)
