"""Reader registry — DataX's reader-plugin model as Spark source factories.

Reference: plugin registry + classloader isolation
(core/src/main/java/com/alibaba/datax/core/util/container/LoadUtil.java, the
plugin.json name->class contract, dataxPluginDev.md:444-449) becomes a plain
name->factory dict; DataX's per-reader split strategies (§SURVEY 2.2) map to
the split options each factory forwards:

- rdbms PK-range split (SingleTableSplitUtil.java:33-124)  -> spark.read.jdbc
  partitionColumn/lowerBound/upperBound/numPartitions (identical algorithm,
  built into Spark)
- file readers' one-task-per-file (TxtFileReader.java:213-234) -> Spark file
  splits (maxPartitionBytes), native
- otsstreamreader incremental shard replay                  -> "eventlog"
  epoch-sliced WAL reader (the engine's binlog tailer)
- streamreader synthetic generator (StreamReader.java:242-340) -> "synthetic"
  counter-based distributed generator (cdc.gen)

Every reader is ``fn(spark, conf: dict) -> DataFrame``.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

Reader = Callable[[SparkSession, dict], DataFrame]
READERS: dict[str, Reader] = {}


def register_reader(name: str) -> Callable[[Reader], Reader]:
    def deco(fn: Reader) -> Reader:
        READERS[name] = fn
        return fn

    return deco


def read_source(spark: SparkSession, conf: dict) -> DataFrame:
    """conf = {"name": <reader>, "parameter": {...}} (DataX job-JSON shape)."""
    name = conf["name"]
    if name not in READERS:
        raise KeyError(f"unknown reader {name!r}; registered: {sorted(READERS)}")
    return READERS[name](spark, conf.get("parameter", {}))


def _apply_columns(df: DataFrame, p: dict) -> DataFrame:
    """DataX column-list semantics: explicit list prunes/projects; '*' = all
    (UnstructuredStorageReaderUtil.java:104-111)."""
    cols = p.get("column")
    if cols and cols != ["*"] and cols != "*":
        df = df.select(*cols)
    if p.get("where"):
        df = df.filter(p["where"])  # pushed down by Catalyst
    return df


@register_reader("parquet")
def read_parquet(spark: SparkSession, p: dict) -> DataFrame:
    r = spark.read
    if p.get("schema"):
        r = r.schema(p["schema"])
    return _apply_columns(r.parquet(*_paths(p)), p)


@register_reader("orc")
def read_orc(spark: SparkSession, p: dict) -> DataFrame:
    return _apply_columns(spark.read.orc(*_paths(p)), p)


@register_reader("csv")
def read_csv(spark: SparkSession, p: dict) -> DataFrame:
    """txtfilereader/hdfsreader TEXT semantics: delimiter, header, nullFormat,
    compression are native Spark options
    (UnstructuredStorageReaderUtil.java:264-291 fieldDelimiter/nullFormat)."""
    opts = {
        "sep": p.get("fieldDelimiter", ","),
        "header": str(p.get("header", False)).lower(),
        "nullValue": p.get("nullFormat"),
        "encoding": p.get("encoding", "UTF-8"),
        "quote": p.get("quote", '"'),
        "escape": p.get("escape", "\\"),
    }
    r = spark.read.options(**{k: v for k, v in opts.items() if v is not None})
    if p.get("schema"):
        r = r.schema(p["schema"])
    return _apply_columns(r.csv(*_paths(p)), p)


@register_reader("json")
def read_json(spark: SparkSession, p: dict) -> DataFrame:
    r = spark.read
    if p.get("schema"):
        r = r.schema(p["schema"])
    return _apply_columns(r.json(*_paths(p)), p)


def jdbc_read_options(p: dict) -> dict:
    """Assemble Spark JDBC reader options from a DataX mysqlreader-shaped conf
    — pure, unit-testable without a database. querySql maps to a derived-table
    dbtable (SingleTableSplitUtil.buildQuerySql parity)."""
    opts = {"url": p["jdbcUrl"], "dbtable": p.get("table") or f"({p['querySql']}) q"}
    for k_src, k_dst in [
        ("username", "user"), ("password", "password"), ("splitPk", "partitionColumn"),
        ("lowerBound", "lowerBound"), ("upperBound", "upperBound"),
        ("channel", "numPartitions"), ("fetchSize", "fetchsize"), ("driver", "driver"),
    ]:
        if p.get(k_src) is not None:
            opts[k_dst] = str(p[k_src])
    return opts


@register_reader("jdbc")
def read_jdbc(spark: SparkSession, p: dict) -> DataFrame:
    """mysqlreader-family: PK-range parallel read. Spark implements the same
    MIN/MAX + equal-width range split DataX hand-rolls
    (SingleTableSplitUtil.java:279-289 min/max SQL, :33-124 bisection)."""
    opts = jdbc_read_options(p)
    return _apply_columns(spark.read.format("jdbc").options(**opts).load(), p)


@register_reader("lake")
def read_lake(spark: SparkSession, p: dict) -> DataFrame:
    """Snapshot read of a LakeTable (otsreader full-scan equivalent), with
    optional time travel + bucket pruning."""
    from ..lake.table import LakeTable

    t = LakeTable.load(spark, p["path"])
    return _apply_columns(
        t.read(
            version=p.get("version"),
            buckets=p.get("buckets"),
            include_deleted=bool(p.get("includeDeleted", False)),
        ),
        p,
    )


@register_reader("eventlog")
def read_eventlog(spark: SparkSession, p: dict) -> DataFrame:
    """The binlog tailer (otsstreamreader equivalent): epoch-sliced WAL scan.

    parameter: path, epochs (list) or startEpoch/endEpoch, offsetRange.
    Partition pruning by construction — only the named epoch dirs are read.
    """
    path = p["path"]
    if p.get("epochs") is not None:
        epochs = list(p["epochs"])
    else:
        import re as _re

        available = sorted(
            int(m.group(1))
            for d in os.listdir(path)
            if (m := _re.fullmatch(r"epoch=(\d+)", d))
        )
        lo = p.get("startEpoch", available[0] if available else 0)
        hi = p.get("endEpoch", available[-1] if available else -1)
        epochs = [e for e in available if lo <= e <= hi]
    import pyspark.sql.functions as F

    dfs = []
    for e in epochs:
        dfs.append(
            spark.read.parquet(os.path.join(path, f"epoch={e}")).withColumn(
                "epoch", F.lit(e)
            )
        )
    if not dfs:
        raise ValueError(f"no epochs to read under {path}")
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    if p.get("offsetRange"):
        lo, hi = p["offsetRange"]
        out = out.filter((F.col("log_offset") >= lo) & (F.col("log_offset") < hi))
    return _apply_columns(out, p)


@register_reader("synthetic")
def read_synthetic(spark: SparkSession, p: dict) -> DataFrame:
    """streamreader equivalent: deterministic distributed generator."""
    from ..cdc.gen import EventGenConfig, gen_events_df

    cfg = EventGenConfig(
        seed=p.get("seed", 42),
        n_events=p.get("nEvents", 10_000),
        events_per_epoch=p.get("eventsPerEpoch", 1_000),
        evo_epoch=p.get("evoEpoch"),
    )
    return gen_events_df(spark, cfg, slices=p.get("slices"))


def _paths(p: dict) -> list[str]:
    path = p["path"]
    return path if isinstance(path, list) else [path]
