"""Elasticsearch bulk + ClickHouse HTTP writers, e2e over REAL wire traffic
against in-process protocol stubs (tests/_net_stubs.py) — same pattern as the
round-4 FTP / HTTP-range transports."""

from __future__ import annotations

import pytest

from datax_3_0_0_src_spark.sinks.registry import write_sink

from _net_stubs import ChStubServer, EsStubServer


def docs_df(spark, n=20, poison_ids=()):
    rows = [(i, f"d{i}", float(i) * 0.5, bool(i in poison_ids)) for i in range(n)]
    return spark.createDataFrame(
        rows, "doc_id int, title string, score double, poison boolean")


ES_COLS = [
    {"name": "doc_id", "type": "id"},
    {"name": "title"}, {"name": "score"}, {"name": "poison"},
]


def test_es_bulk_index_roundtrip_with_cleanup(spark):
    with EsStubServer() as es:
        res = write_sink(docs_df(spark, 20), {"name": "elasticsearch", "parameter": {
            "endpoint": f"http://127.0.0.1:{es.port}", "index": "pages",
            "column": ES_COLS, "batchSize": 7, "cleanup": True,
            "mappings": {"properties": {"title": {"type": "keyword"}}},
        }})
        assert res == {"rows_written": 20, "rows_dirty": 0}
        assert "pages" in es.server.indices
        assert es.server.indices["pages"]["mappings"]["properties"]["title"][
            "type"] == "keyword"
        assert len(es.server.docs) == 20
        assert es.server.docs[("pages", "3")] == {
            "title": "d3", "score": 1.5, "poison": False}


def test_es_update_upserts_and_merges(spark):
    with EsStubServer() as es:
        p = {"endpoint": f"http://127.0.0.1:{es.port}", "index": "pages",
             "column": ES_COLS}
        write_sink(docs_df(spark, 5), {"name": "elasticsearch",
                                       "parameter": {**p, "actionType": "index"}})
        upd = spark.createDataFrame([(1, "UPDATED")], "doc_id int, title string")
        res = write_sink(upd, {"name": "elasticsearch", "parameter": {
            **p, "actionType": "update",
            "column": [{"name": "doc_id", "type": "id"}, {"name": "title"}],
        }})
        assert res["rows_written"] == 1
        d = es.server.docs[("pages", "1")]
        assert d["title"] == "UPDATED" and d["score"] == 0.5  # merged, not replaced
        # upsert: an id that never existed is inserted
        new = spark.createDataFrame([(99, "NEW")], "doc_id int, title string")
        write_sink(new, {"name": "elasticsearch", "parameter": {
            **p, "actionType": "update",
            "column": [{"name": "doc_id", "type": "id"}, {"name": "title"}],
        }})
        assert es.server.docs[("pages", "99")] == {"title": "NEW"}


def test_es_per_item_failures_route_dirty(spark):
    with EsStubServer() as es:
        res = write_sink(docs_df(spark, 20, poison_ids={4, 11}), {
            "name": "elasticsearch", "parameter": {
                "endpoint": f"http://127.0.0.1:{es.port}", "index": "pages",
                "column": ES_COLS, "batchSize": 6,
            }})
        assert res == {"rows_written": 18, "rows_dirty": 2}
        assert ("pages", "4") not in es.server.docs
        assert len(es.server.docs) == 18


def test_es_alias_swap_after_write(spark):
    with EsStubServer() as es:
        write_sink(docs_df(spark, 3), {"name": "elasticsearch", "parameter": {
            "endpoint": f"http://127.0.0.1:{es.port}", "index": "pages_v2",
            "column": ES_COLS, "alias": "pages", "aliasNeedClean": True,
        }})
        assert es.server.aliases == {"pages": "pages_v2"}


def test_es_update_requires_id(spark):
    with pytest.raises(ValueError, match="id column"):
        write_sink(docs_df(spark, 1), {"name": "elasticsearch", "parameter": {
            "endpoint": "http://127.0.0.1:1", "index": "x",
            "actionType": "update", "column": [{"name": "title"}],
        }})


def test_es_transient_5xx_retries_then_succeeds(spark):
    """A one-shot 503 on the bulk endpoint is retried within trySize —
    zero rows lost, zero dirty (ESWriter.java:434-443 parity)."""
    with EsStubServer() as es:
        es.server.fail_next = (503, 1)
        res = write_sink(docs_df(spark, 8), {"name": "elasticsearch", "parameter": {
            "endpoint": f"http://127.0.0.1:{es.port}", "index": "pages",
            "column": ES_COLS, "batchSize": 100, "trySize": 3,
        }})
        assert res == {"rows_written": 8, "rows_dirty": 0}
        assert len(es.server.docs) == 8


def test_es_bulk_level_4xx_raises_not_silent_drop(spark):
    """Round-6 advice #2: a bulk-LEVEL 400 (malformed bulk / missing index /
    auth) has no per-item statuses — before the fix the whole batch vanished
    (not written, not dirty, no error). It must raise."""
    with EsStubServer() as es:
        es.server.fail_next = (400, 1)
        with pytest.raises(Exception, match="bulk rejected \\[400\\]"):
            write_sink(docs_df(spark, 8), {"name": "elasticsearch", "parameter": {
                "endpoint": f"http://127.0.0.1:{es.port}", "index": "pages",
                "column": ES_COLS, "batchSize": 100,
            }})
        # the rejected buffer was NOT silently absorbed (other partitions may
        # have landed theirs — a non-transactional sink's normal partial state)
        assert len(es.server.docs) < 8


def test_es_persistent_5xx_exhausts_retries_and_raises(spark):
    with EsStubServer() as es:
        es.server.fail_next = (503, 99)
        with pytest.raises(Exception, match="bulk failed after 2 tries"):
            write_sink(docs_df(spark, 4), {"name": "elasticsearch", "parameter": {
                "endpoint": f"http://127.0.0.1:{es.port}", "index": "pages",
                "column": ES_COLS, "trySize": 2,
            }})


def test_clickhouse_insert_presql_and_dirty_fallback(spark):
    with ChStubServer() as ch:
        res = write_sink(docs_df(spark, 20, poison_ids={7}), {
            "name": "clickhouse", "parameter": {
                "endpoint": f"http://127.0.0.1:{ch.port}", "table": "pages",
                "batchSize": 5,
                "preSql": ["TRUNCATE TABLE pages"],
                "postSql": ["OPTIMIZE TABLE pages FINAL"],
            }})
        # the poisoned batch fell back row-at-a-time: 4 of its 5 rows landed
        assert res == {"rows_written": 19, "rows_dirty": 1}
        rows = {r["doc_id"]: r for r in ch.server.tables["pages"]}
        assert len(rows) == 19 and 7 not in rows
        assert rows[3]["title"] == "d3"
        assert ch.server.sqls == ["TRUNCATE TABLE pages",
                                  "OPTIMIZE TABLE pages FINAL"]


def test_clickhouse_transient_5xx_retries_zero_dirty(spark):
    """Round-6 verdict item 3: a one-shot 503 (server busy) must be retried,
    not treated as row badness — before the fix every row of an unavailable
    server was counted dirty and the job 'succeeded'."""
    with ChStubServer() as ch:
        ch.server.fail_next = (503, 1)
        res = write_sink(docs_df(spark, 10), {"name": "clickhouse", "parameter": {
            "endpoint": f"http://127.0.0.1:{ch.port}", "table": "pages",
            "batchSize": 100, "trySize": 3,
        }})
        assert res == {"rows_written": 10, "rows_dirty": 0}
        assert len(ch.server.tables["pages"]) == 10


def test_clickhouse_persistent_5xx_raises(spark):
    with ChStubServer() as ch:
        ch.server.fail_next = (503, 99)
        with pytest.raises(Exception, match="insert failed after 2 tries"):
            write_sink(docs_df(spark, 4), {"name": "clickhouse", "parameter": {
                "endpoint": f"http://127.0.0.1:{ch.port}", "table": "pages",
                "trySize": 2,
            }})
        assert ch.server.tables.get("pages") is None  # no partial success claim
