"""ftpreader/txtfilereader/ossreader family: driver-side glob+split metadata,
executor-side fetch+parse over the picklable client protocol. FtplibClient is
exercised over REAL ftplib TCP traffic against an in-process RFC 959 stub;
HttpRangeClient against an in-process HTTP object-store stub (Range/206)."""

from __future__ import annotations

import gzip
import pickle

from datax_3_0_0_src_spark.sources import read_source
from datax_3_0_0_src_spark.sources.ftp import (
    FtplibClient, HttpRangeClient, LocalDirClient, expand_paths, split_files,
)

sys_path_hack = str(__import__("pathlib").Path(__file__).resolve().parent)
import sys

if sys_path_hack not in sys.path:  # stubs live beside the tests (no package)
    sys.path.insert(0, sys_path_hack)
from _net_stubs import FtpStubServer, HttpStubServer  # noqa: E402


def _mk_files(tmp_path):
    d = tmp_path / "data"
    d.mkdir()
    (d / "a.csv").write_text("1,x\n2,y\n")
    (d / "b.csv").write_text("3,z\n")
    (d / "c.csv.gz").write_bytes(gzip.compress(b"4,w\n5,v\n"))
    (d / "notes.txt").write_text("hello\nworld\n")
    (d / "rows.json").write_text('{"k": 9, "v": "j"}\n{"k": 10, "v": "q"}\n')
    return str(tmp_path)


def test_expand_and_split(tmp_path):
    root = _mk_files(tmp_path)
    c = LocalDirClient(root)
    assert expand_paths(c, ["data/"]) == [
        "data/a.csv", "data/b.csv", "data/c.csv.gz", "data/notes.txt", "data/rows.json",
    ]
    assert expand_paths(c, ["data/*.csv"]) == ["data/a.csv", "data/b.csv"]
    assert expand_paths(c, ["data/b.csv", "data/b.csv"]) == ["data/b.csv"]
    assert split_files(["f1", "f2", "f3", "f4", "f5"], 2) == [
        ["f1", "f3", "f5"], ["f2", "f4"]]
    assert split_files(["f1"], 4) == [["f1"]]


def test_ftpreader_csv_e2e_with_compression(spark, tmp_path):
    root = _mk_files(tmp_path)
    df = read_source(spark, {"name": "ftpreader", "parameter": {
        "client": LocalDirClient(root),
        "path": ["data/*.csv", "data/c.csv.gz"],
        "schema": "k bigint, v string",
        "channel": 2,
    }})
    assert df.rdd.getNumPartitions() == 2  # one task per file chunk
    got = {r["k"]: r["v"] for r in df.collect()}
    assert got == {1: "x", 2: "y", 3: "z", 4: "w", 5: "v"}

    # column projection + where pushdown through the shared reader plumbing
    some = read_source(spark, {"name": "txtfilereader", "parameter": {
        "client": LocalDirClient(root), "path": ["data/a.csv"],
        "schema": "k bigint, v string", "column": ["k"], "where": "k > 1",
    }})
    assert some.columns == ["k"] and [r["k"] for r in some.collect()] == [2]


def test_ftpreader_text_and_json_modes(spark, tmp_path):
    root = _mk_files(tmp_path)
    txt = read_source(spark, {"name": "ftpreader", "parameter": {
        "client": LocalDirClient(root), "path": ["data/notes.txt"],
        "fileType": "text", "schema": "line string",
    }})
    assert sorted(r["line"] for r in txt.collect()) == ["hello", "world"]

    js = read_source(spark, {"name": "ftpreader", "parameter": {
        "client": LocalDirClient(root), "path": ["data/rows.json"],
        "fileType": "json", "schema": "k bigint, v string",
    }})
    assert {r["k"]: r["v"] for r in js.collect()} == {9: "j", 10: "q"}


def test_ftpreader_over_real_ftplib_traffic(spark, tmp_path):
    """e2e csv.gz read where every Spark task dials the in-process FTP stub
    with stdlib ftplib: PASV data connections, NLST glob expansion on the
    driver, RETR fetches on executors (FtpReader.java task-session parity)."""
    root = _mk_files(tmp_path)
    with FtpStubServer(root) as srv:
        df = read_source(spark, {"name": "ftpreader", "parameter": {
            "host": "127.0.0.1", "port": srv.port,
            "path": ["data/*.csv", "data/c.csv.gz"],
            "schema": "k bigint, v string",
            "channel": 2,
        }})
        assert df.rdd.getNumPartitions() == 2
        got = {r["k"]: r["v"] for r in df.collect()}
    assert got == {1: "x", 2: "y", 3: "z", 4: "w", 5: "v"}


def test_ftplib_client_direct_against_stub(tmp_path):
    root = _mk_files(tmp_path)
    with FtpStubServer(root) as srv:
        c = FtplibClient("127.0.0.1", port=srv.port)
        assert c.listdir("data") == [
            "a.csv", "b.csv", "c.csv.gz", "notes.txt", "rows.json"]
        assert c.fetch("data/b.csv") == b"3,z\n"
        # a pickled clone re-dials its own session (executor behavior)
        c2 = pickle.loads(pickle.dumps(c))
        assert c2._conn is None and c2.fetch("data/a.csv") == b"1,x\n2,y\n"


def test_ossreader_http_range_e2e(spark, tmp_path):
    """ossreader analog over HTTP: JSON LIST-API directory listing, whole-
    object GET through the shared fetch/parse pipeline, and partial-object
    Range reads returning 206 slices."""
    root = _mk_files(tmp_path)
    with HttpStubServer(root) as srv:
        url = f"http://127.0.0.1:{srv.port}"
        df = read_source(spark, {"name": "ossreader", "parameter": {
            "endpoint": url,
            "path": ["data/*.csv", "data/c.csv.gz"],
            "schema": "k bigint, v string",
            "channel": 2,
        }})
        got = {r["k"]: r["v"] for r in df.collect()}
        assert got == {1: "x", 2: "y", 3: "z", 4: "w", 5: "v"}

        c = HttpRangeClient(url)
        assert c.listdir("data") == [
            "a.csv", "b.csv", "c.csv.gz", "notes.txt", "rows.json"]
        # range read: bytes 2..5 of "1,x\n2,y\n"
        assert c.fetch_range("data/a.csv", 2, 4) == b"x\n2,"
        assert pickle.loads(pickle.dumps(c)).fetch("data/b.csv") == b"3,z\n"


def test_ftplib_client_picklable_and_lazy():
    c = FtplibClient("ftp.example.com", port=2121, username="u", password="s")
    blob = pickle.dumps(c)  # no live socket: must pickle cleanly
    c2 = pickle.loads(blob)
    assert (c2.host, c2.port, c2.username, c2.password) == \
        ("ftp.example.com", 2121, "u", "s")
    assert c2._conn is None  # still lazy after the round trip
