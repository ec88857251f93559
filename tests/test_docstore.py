"""Document-store ("mongodb") reader: `_id`-range split parity + e2e reads
against the in-process DocStoreStub (tests/_net_stubs.py).

Reference: mongodbreader CollectionSplitUtil.java:26-167 (doSplit /
doSplitCollection — splitVector preferred, force-median when chunks < 1 MB,
skip/limit sampling fallback on Unauthorized) and MongoDBReader.java
(range find + projection per task).
"""
from __future__ import annotations

import pytest

from datax_3_0_0_src_spark.sources import read_source
from datax_3_0_0_src_spark.sources.docstore import (
    MAX_BOUND,
    MIN_BOUND,
    is_object_id,
    split_collection,
)

import _net_stubs
from _net_stubs import DocStoreStub
from pyspark import cloudpickle

# the stub travels BY VALUE inside the connect closure (executor workers
# don't have tests/ on their import path)
cloudpickle.register_pickle_by_value(_net_stubs)


def _docs(n, big=False):
    pad = "x" * 2000 if big else ""
    return [
        {"_id": i, "url": f"https://ex.com/{i}", "rank": i % 7, "pad": pad}
        for i in range(n)
    ]


def _connect_factory(stub):
    return lambda: stub


class TestSplit:
    def test_single_channel_is_min_max(self):
        stub = DocStoreStub(_docs(10))
        assert split_collection(stub, "db", "c", 1) == [(MIN_BOUND, MAX_BOUND)]

    def test_empty_collection_no_ranges(self):
        stub = DocStoreStub([], id_key="_id")
        assert split_collection(stub, "db", "c", 4) == []

    def test_split_vector_ranges_are_contiguous_half_open(self):
        # avgObjSize large enough that maxChunkSize >= 1 MB -> stats branch
        stub = DocStoreStub(_docs(4000), avg_obj_size=4096)
        ranges = split_collection(stub, "db", "c", 4)
        assert ranges[0][0] == MIN_BOUND and ranges[-1][1] == MAX_BOUND
        # interior bounds chain: upper(i) == lower(i+1)
        for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
            assert hi == lo
        assert stub.split_vector_calls >= 1

    def test_force_median_when_chunks_under_1mb(self):
        # tiny docs -> computed maxChunkSize < 1 MB -> forced median split
        # (CollectionSplitUtil.java:109-123)
        stub = DocStoreStub(_docs(100), avg_obj_size=10)
        ranges = split_collection(stub, "db", "c", 4)
        # median force split yields exactly one split point -> two ranges
        assert len(ranges) == 2
        assert ranges[0] == (MIN_BOUND, 50)

    def test_sampling_fallback_on_unauthorized(self):
        stub = DocStoreStub(_docs(100), allow_split_vector=False)
        ranges = split_collection(stub, "db", "c", 4)
        # skip/limit sampling: split points at chunk_doc_count strides
        # (25, 50, 75) -> 4 contiguous ranges (CollectionSplitUtil:136-151)
        assert ranges == [
            (MIN_BOUND, 25), (25, 50), (50, 75), (75, MAX_BOUND)]

    def test_is_object_id(self):
        assert is_object_id("507f1f77bcf86cd799439011")
        assert not is_object_id("not-hex-and-wrong-length")
        assert not is_object_id(42)


class TestReaderE2E:
    def test_reads_all_rows_exactly_once(self, spark):
        docs = _docs(200)
        stub = DocStoreStub(docs, avg_obj_size=4096)
        df = read_source(spark, {
            "name": "mongodb",
            "parameter": {
                "connect": _connect_factory(stub),
                "db": "db", "collection": "pages", "channel": 4,
                "column": ["_id", "url", "rank"],
            },
        })
        got = sorted(r["_id"] for r in df.collect())
        assert got == list(range(200))
        assert df.columns == ["_id", "url", "rank"]

    def test_fallback_split_reads_identical_result(self, spark):
        docs = _docs(150)
        a = DocStoreStub(docs, avg_obj_size=4096)
        b = DocStoreStub(docs, allow_split_vector=False)
        out = []
        for stub in (a, b):
            df = read_source(spark, {
                "name": "mongodb",
                "parameter": {
                    "connect": _connect_factory(stub),
                    "db": "db", "collection": "pages", "channel": 3,
                    "column": ["_id", "url"],
                },
            })
            out.append(sorted((r["_id"], r["url"]) for r in df.collect()))
        assert out[0] == out[1]
        assert len(out[0]) == 150

    def test_objectid_hex_ids_partition_without_dup_or_loss(self, spark):
        docs = [{"_id": f"{i:024x}", "v": i} for i in range(64)]
        stub = DocStoreStub(docs, avg_obj_size=4096)
        df = read_source(spark, {
            "name": "mongodb",
            "parameter": {
                "connect": _connect_factory(stub),
                "db": "db", "collection": "pages", "channel": 4,
                "column": ["_id", "v"],
            },
        })
        assert sorted(r["v"] for r in df.collect()) == list(range(64))

    def test_user_query_and_projection_pushdown(self, spark):
        stub = DocStoreStub(_docs(100), avg_obj_size=4096)
        df = read_source(spark, {
            "name": "mongodb",
            "parameter": {
                "connect": _connect_factory(stub),
                "db": "db", "collection": "pages", "channel": 2,
                "column": ["_id", "rank"],
                "query": {"rank": 3},
            },
        })
        rows = df.collect()
        assert all(r["rank"] == 3 for r in rows)
        assert sorted(r["_id"] for r in rows) == [
            i for i in range(100) if i % 7 == 3]

    def test_one_task_per_range(self, spark):
        stub = DocStoreStub(_docs(120), avg_obj_size=4096)
        df = read_source(spark, {
            "name": "mongodb",
            "parameter": {
                "connect": _connect_factory(stub),
                "db": "db", "collection": "pages", "channel": 4,
                "column": ["_id"],
            },
        })
        # parallelism is the range count (reference: one task per Range)
        assert df.rdd.getNumPartitions() >= 2

    def test_empty_collection_yields_empty_df_with_schema(self, spark):
        stub = DocStoreStub([])
        df = read_source(spark, {
            "name": "mongodb",
            "parameter": {
                "connect": _connect_factory(stub),
                "db": "db", "collection": "pages", "channel": 4,
                "column": ["_id", "url"],
                "schema": "_id long, url string",
            },
        })
        assert df.count() == 0
        assert df.columns == ["_id", "url"]


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-x", "-q"]))
