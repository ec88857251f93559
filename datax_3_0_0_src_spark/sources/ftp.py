"""ftpreader / txtfilereader over remote protocols — executor-side fetch.

Reference semantics: ftpreader/txtfilereader expand the configured path list
into concrete files on the JOB side and split that list across tasks
(`TxtFileReader.java:213-234,349-360` subList chunks; ftpreader shares the
same unstructured-storage pipeline), then every task streams its files
through the csv parser (`UnstructuredStorageReaderUtil.java:269-291`
fieldDelimiter/encoding/nullFormat, compression `:117-213`).

Spark re-expression: the driver does METADATA work only (connect once,
glob-expand the path list); the file list is round-robin split into
``channel`` chunks, exactly one executor task per chunk; each task opens its
OWN client connection, fetches its files into memory, and parses them with
``pandas.read_csv`` into Arrow batches — vectorized, never per-row python.
At 100 TB-scale file counts the driver holds only the name list and each
executor streams its own subset; no bytes ever pass through the driver.

The client is any picklable object with the two-method protocol below
(``listdir``, ``fetch``). ``FtplibClient`` adapts stdlib ftplib for real FTP
servers (no FTP server ships in this container, so it is covered by
protocol/pickle tests); ``LocalDirClient`` adapts a local directory — which
IS the reference's txtfilereader variant, and doubles as the end-to-end test
transport for the shared fetch/parse/split pipeline.
"""

from __future__ import annotations

import bz2
import fnmatch
import gzip
import io
import json
import os
import posixpath
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from .registry import _apply_columns, register_reader


class LocalDirClient:
    """Local-filesystem transport (txtfilereader variant + test double)."""

    def __init__(self, root: str = "/"):
        self.root = root

    def _abs(self, path: str) -> str:
        return os.path.join(self.root, path.lstrip("/"))

    def listdir(self, path: str) -> list[str]:
        p = self._abs(path)
        return sorted(f for f in os.listdir(p) if os.path.isfile(os.path.join(p, f)))

    def fetch(self, path: str) -> bytes:
        with open(self._abs(path), "rb") as fh:
            return fh.read()


class FtplibClient:
    """stdlib-ftplib transport. Lazy-connecting and picklable: only the
    connection parameters travel to executors; each task dials its own
    control connection (the reference likewise opens one FTP session per
    task, FtpReader task init)."""

    def __init__(self, host: str, port: int = 21, username: str = "anonymous",
                 password: str = "", timeout: int = 60, passive: bool = True):
        self.host, self.port = host, port
        self.username, self.password = username, password
        self.timeout, self.passive = timeout, passive
        self._conn = None

    def __getstate__(self):
        d = dict(self.__dict__)
        d["_conn"] = None  # live sockets never pickle
        return d

    def _ftp(self):
        if self._conn is None:
            import ftplib

            ftp = ftplib.FTP()
            ftp.connect(self.host, self.port, timeout=self.timeout)
            ftp.login(self.username, self.password)
            ftp.set_pasv(self.passive)
            self._conn = ftp
        return self._conn

    def listdir(self, path: str) -> list[str]:
        return sorted(posixpath.basename(n) for n in self._ftp().nlst(path))

    def fetch(self, path: str) -> bytes:
        buf = io.BytesIO()
        self._ftp().retrbinary(f"RETR {path}", buf.write)
        return buf.getvalue()


class HttpRangeClient:
    """HTTP(S) object-store transport — the OSS/S3 analog of the reference's
    ossreader (`ossreader/src/main/java/.../OssReader.java` object list +
    GetObject) on pure stdlib urllib. Picklable: only the base URL and
    timeout travel to executors; every task issues its own requests.

    - ``listdir(path)``: GET ``<base>/<path>/`` expecting a JSON array of
      object names — the LIST-API analog (object stores list via an API
      call, not an FTP-style directory walk). A server can produce it with
      any index handler; the test suite's stub serves one per directory.
    - ``fetch(path)``: GET the object.
    - ``fetch_range(path, start, length)``: GET with a ``Range`` header —
      the partial-object read an executor uses to pull only its split of a
      large object (HTTP 206; a server ignoring Range returns 200 and the
      client slices locally so the result is identical either way).
    """

    def __init__(self, base_url: str, timeout: int = 60):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout

    def _get(self, path: str, headers: dict | None = None) -> tuple[int, bytes]:
        import urllib.request

        req = urllib.request.Request(
            f"{self.base_url}/{path.lstrip('/')}", headers=headers or {})
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            return resp.status, resp.read()

    def listdir(self, path: str) -> list[str]:
        _, body = self._get(path.rstrip("/") + "/")
        return sorted(json.loads(body))

    def fetch(self, path: str) -> bytes:
        _, body = self._get(path)
        return body

    def fetch_range(self, path: str, start: int, length: int) -> bytes:
        status, body = self._get(
            path, headers={"Range": f"bytes={start}-{start + length - 1}"})
        if status == 206:
            return body
        return body[start:start + length]  # server ignored Range: slice


def expand_paths(client, paths: list[str]) -> list[str]:
    """Glob/dir expansion of the configured path list (driver-side metadata,
    TxtFileReader.java:349-360 parity): an entry ending in "/" lists the
    directory; an entry with a glob char lists its parent and fnmatch-filters;
    anything else is taken as a concrete file path."""
    out: list[str] = []
    for entry in paths:
        if entry.endswith("/"):
            out.extend(posixpath.join(entry, f) for f in client.listdir(entry))
        elif any(c in posixpath.basename(entry) for c in "*?["):
            d = posixpath.dirname(entry) or "."
            pat = posixpath.basename(entry)
            out.extend(
                posixpath.join(d, f)
                for f in client.listdir(d)
                if fnmatch.fnmatch(f, pat)
            )
        else:
            out.append(entry)
    return sorted(dict.fromkeys(out))


def split_files(files: list[str], channel: int) -> list[list[str]]:
    """Round-robin file->task assignment (TxtFileReader.java:213-234 subList
    split, with round-robin instead of contiguous ranges so a sorted list of
    growing files doesn't skew one task)."""
    n = max(1, min(int(channel), len(files)))
    return [files[i::n] for i in range(n)]


def _decompress(name: str, data: bytes) -> bytes:
    if name.endswith(".gz"):
        return gzip.decompress(data)
    if name.endswith(".bz2"):
        return bz2.decompress(data)
    return data


@register_reader("ftpreader")
@register_reader("txtfilereader")
@register_reader("ossreader")
def read_ftp(spark: SparkSession, p: dict) -> DataFrame:
    """parameter:
    - client: picklable transport (FtplibClient / LocalDirClient /
      HttpRangeClient / custom), or host/port/username/password to build an
      FtplibClient, or endpoint (base URL) to build an HttpRangeClient
      (ossreader form)
    - path: list of files, dirs ("x/"), or globs ("x/*.csv")
    - schema: Spark DDL (required — the reference's column/type list)
    - fileType: "csv" (default) | "text" | "json"
    - fieldDelimiter, encoding, header, nullFormat: csv dialect
      (UnstructuredStorageReaderUtil parity); .gz/.bz2 decompressed by name
    - channel: max parallel fetch tasks (default 4)
    """
    client = p.get("client")
    if client is None and p.get("endpoint"):
        client = HttpRangeClient(p["endpoint"], timeout=int(p.get("timeout", 60)))
    if client is None:
        client = FtplibClient(
            host=p["host"], port=int(p.get("port", 21)),
            username=p.get("username", "anonymous"),
            password=p.get("password", ""),
            timeout=int(p.get("timeout", 60)),
        )
    schema_ddl = p.get("schema")
    if not schema_ddl:
        raise ValueError("ftpreader requires an explicit 'schema' DDL "
                         "(the reference's column/type list)")
    files = expand_paths(client, _as_list(p["path"]))
    if not files:
        return spark.createDataFrame([], schema_ddl)
    chunks = split_files(files, int(p.get("channel", 4)))

    file_type = p.get("fileType", "csv")
    sep = p.get("fieldDelimiter", ",")
    encoding = p.get("encoding", "utf-8")
    header = 0 if p.get("header") else None
    null_format = p.get("nullFormat")
    names = [f.strip().split()[0] for f in schema_ddl.split(",")]

    def fetch_chunk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for chunk_json in pdf["files"]:
                for path in json.loads(chunk_json):
                    raw = _decompress(path, client.fetch(path))
                    buf = io.BytesIO(raw)
                    if file_type == "json":
                        out = pd.read_json(buf, lines=True, encoding=encoding)
                        out = out.reindex(columns=names)
                    elif file_type == "text":
                        text = raw.decode(encoding)
                        lines = text.splitlines()
                        out = pd.DataFrame({names[0]: lines})
                    else:
                        out = pd.read_csv(
                            buf, sep=sep, header=header, names=names,
                            encoding=encoding, na_values=null_format,
                            keep_default_na=bool(null_format is None),
                        )
                    if len(out):
                        yield out

    import pyspark.sql.functions as F

    arr = F.array(*[F.lit(json.dumps(c)) for c in chunks])
    tasks = spark.range(0, len(chunks), 1, len(chunks)).select(
        F.element_at(arr, F.col("id").cast("int") + 1).alias("files")
    )
    return _apply_columns(tasks.mapInPandas(fetch_chunk, schema_ddl), p)


def _as_list(v) -> list[str]:
    return v if isinstance(v, list) else [v]
