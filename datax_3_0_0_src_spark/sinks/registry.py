"""Writer registry — DataX's writer-plugin model as Spark sink factories.

Write-mode semantics re-expressed:
- hdfswriter writeMode append / nonConflict / truncate
  (hdfswriter/src/main/java/com/alibaba/datax/plugin/writer/hdfswriter/HdfsWriter.java:82-90)
  => Spark save modes append / errorifexists / overwrite. DataX's temp-dir +
  atomic-rename commit (HdfsHelper.java:207-243) is Spark's file-commit
  protocol, native.
- rdbms writeMode insert / replace / update (INSERT | REPLACE INTO |
  ON DUPLICATE KEY UPDATE, WriterUtil.java:111-168) => "lake" writer modes
  append | merge (LWW upsert/delete on the LakeTable — the engine's MERGE INTO).
- streamwriter print sink (core/.../writer/streamwriter/StreamWriter.java)
  => "console".

Every writer is ``fn(df, conf: dict) -> None`` (or a stats object).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

Writer = Callable[[DataFrame, dict], object]
WRITERS: dict[str, Writer] = {}

_FILE_MODES = {"append": "append", "nonConflict": "errorifexists", "truncate": "overwrite"}


def register_writer(name: str) -> Callable[[Writer], Writer]:
    def deco(fn: Writer) -> Writer:
        WRITERS[name] = fn
        return fn

    return deco


def write_sink(df: DataFrame, conf: dict):
    name = conf["name"]
    if name not in WRITERS:
        raise KeyError(f"unknown writer {name!r}; registered: {sorted(WRITERS)}")
    return WRITERS[name](df, conf.get("parameter", {}))


def _file_writer(df: DataFrame, p: dict):
    w = df.write.mode(_FILE_MODES[p.get("writeMode", "append")])
    if p.get("partitionBy"):
        w = w.partitionBy(*p["partitionBy"])
    if p.get("compress"):
        w = w.option("compression", p["compress"])
    if p.get("maxRecordsPerFile"):
        w = w.option("maxRecordsPerFile", str(p["maxRecordsPerFile"]))
    return w


@register_writer("parquet")
def write_parquet(df: DataFrame, p: dict):
    _file_writer(df, p).parquet(p["path"])


@register_writer("orc")
def write_orc(df: DataFrame, p: dict):
    """hdfswriter ORC path (HdfsHelper.java:371-470) — native."""
    _file_writer(df, p).orc(p["path"])


@register_writer("csv")
def write_csv(df: DataFrame, p: dict):
    """txtfilewriter/hdfswriter TEXT path: delimiter + header + compression
    (gzip/bzip2 per HdfsWriter compress option)."""
    w = _file_writer(df, p).options(
        sep=p.get("fieldDelimiter", ","),
        header=str(p.get("header", False)).lower(),
        nullValue=p.get("nullFormat"),
    )
    w.csv(p["path"])


@register_writer("json")
def write_json(df: DataFrame, p: dict):
    _file_writer(df, p).json(p["path"])


@register_writer("lake")
def write_lake(df: DataFrame, p: dict):
    """The upsert sink: writeMode=merge is CommonRdbmsWriter's writeMode=update
    (ON DUPLICATE KEY UPDATE, WriterUtil.java:148-168) on the LakeTable;
    writeMode=append is blind insert."""
    from pyspark.sql.types import StructType

    from ..lake.table import LakeTable

    if LakeTable.exists(p["path"]):
        t = LakeTable.load(df.sparkSession, p["path"])
    else:
        schema = p.get("schema")
        if schema is None:
            reserved = {p.get("seqCol", "log_offset"), p.get("opCol", "op")}
            schema = StructType([f for f in df.schema.fields if f.name not in reserved])
        t = LakeTable.create(
            df.sparkSession, p["path"], schema,
            key=p.get("key", "url"), ts_col=p.get("tsCol", "warc_ts"),
            num_buckets=p.get("numBuckets", 16),
        )
    if p.get("writeMode", "merge") == "merge":
        return t.merge(
            df, seq_col=p.get("seqCol", "log_offset"), op_col=p.get("opCol", "op"),
            properties=p.get("properties"),
        )
    return t.append(df, properties=p.get("properties"))


@register_writer("console")
def write_console(df: DataFrame, p: dict):
    """streamwriter: print sink (test use)."""
    df.show(n=p.get("numRows", 20), truncate=bool(p.get("truncate", True)))


@register_writer("noop")
def write_noop(df: DataFrame, p: dict):
    """Forces full computation, discards output (benchmark sink)."""
    df.write.format("noop").mode("overwrite").save()
