"""Document-store reader (the mongodbreader twin) — `_id`-range chunked
parallel reads over any picklable document-store client factory.

Reference semantics (mongodbreader):
- `_id`-range split (CollectionSplitUtil.java:26-167 doSplit /
  doSplitCollection): detect whether the primary id is an ObjectId from one
  sampled document (:54-63), then
  * adviceNumber == 1 -> a single ("min", "max") range (:71-76);
  * else read count/avgObjSize from collStats (:78-89) and prefer the
    server's `splitVector` command for stats-based split points, with a
    force-median split when the computed maxChunkSize would be < 1 MB
    (:94-135); fall back to skip/limit sampling every `count/adviceNumber`
    docs when the user lacks the splitVector role (:136-151);
  * split points become half-open ranges [min, p1), [p1, p2), ... ,
    [pk, max) (:153-164).
- per-task reads stream the range query with projection pushdown
  (MongoDBReader.java TaskExecute: find(filter).projection(column list)).

Spark-first shape: the driver does ONLY metadata work (one sampled doc +
collStats + splitVector-or-sampling); each range is one executor task that
opens its own client and streams dict-documents into Arrow batches via
``mapInPandas`` — no documents pass through the driver, and parallelism is
the range count exactly like the reference's adviceNumber. The ``connect``
factory makes it e2e-testable against the in-process stub in
tests/_net_stubs.py and drives pymongo on a real cluster (same call shape
as the wire commands the reference issues).

Client protocol (duck-typed, modeled on MongoDB's PUBLIC commands):
- ``coll_stats(db, coll) -> {"count": int, "avgObjSize": int}``
- ``split_vector(ns, key, *, max_chunk_size_mb=None, max_split_points=None,
  force=False) -> list[id]`` — may raise ``PermissionError`` (the
  reference's code-13 Unauthorized / code-20 IllegalOperation paths)
- ``find(db, coll, filter=None, projection=None, skip=0, limit=0,
  sort=None) -> iterator of dicts`` — filter is the Mongo-style subset
  ``{"_id": {"$gte": lo, "$lt": hi}}`` plus an optional user query dict.
"""

from __future__ import annotations

import string
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from .registry import register_reader

# sentinels matching the reference's "min"/"max" open bounds
MIN_BOUND = "min"
MAX_BOUND = "max"


def is_object_id(v) -> bool:
    """ObjectId stand-in detection: pymongo would give an ObjectId instance;
    over a generic client the 24-hex-char string form is the contract
    (CollectionSplitUtil.java:54-63 isPrimaryIdObjectId -> the reader then
    re-wraps hex strings into ObjectId range predicates)."""
    return (
        isinstance(v, str)
        and len(v) == 24
        and all(c in string.hexdigits for c in v)
    )


def split_collection(client, db: str, coll: str, advice_number: int,
                     primary_id: str = "_id") -> list[tuple]:
    """(lower, upper) half-open `_id` ranges partitioning the collection —
    CollectionSplitUtil.doSplitCollection parity, including the
    force-median-when-chunks-under-1MB branch and the skip/limit sampling
    fallback for clients without the splitVector privilege."""
    if advice_number <= 1:
        return [(MIN_BOUND, MAX_BOUND)]
    stats = client.coll_stats(db, coll)
    doc_count = int(stats.get("count", 0))
    if doc_count == 0:
        return []
    avg_obj_size = int(stats.get("avgObjSize", 1) or 1)
    split_point_count = advice_number - 1
    chunk_doc_count = doc_count // advice_number
    ns = f"{db}.{coll}"

    split_points: list = []
    try:
        # role probe, then the real call — the reference issues a forced
        # probe first and only falls back on Unauthorized/IllegalOperation
        client.split_vector(ns, primary_id, force=True)
        supports = True
    except PermissionError:
        supports = False
    except Exception:
        # any other server error: the reference lets it propagate on the
        # REAL call; the probe itself only gates on the two auth codes
        supports = True

    if supports:
        max_chunk_size_mb = (
            (doc_count // split_point_count - 1) * 2 * avg_obj_size
            // (1024 * 1024)
        )
        if max_chunk_size_mb < 1:
            split_points = list(client.split_vector(ns, primary_id, force=True))
        else:
            split_points = list(client.split_vector(
                ns, primary_id,
                max_chunk_size_mb=max_chunk_size_mb,
                max_split_points=advice_number - 1,
            ))
    else:
        skip = chunk_doc_count
        for _ in range(split_point_count):
            docs = list(client.find(db, coll, skip=skip, limit=1,
                                    sort=[(primary_id, 1)]))
            if not docs:
                break
            split_points.append(docs[0][primary_id])
            skip += chunk_doc_count

    bounds = [MIN_BOUND, *split_points, MAX_BOUND]
    return [(bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)]


def _range_filter(primary_id: str, lo, hi, user_query: dict | None) -> dict:
    pred: dict = {}
    if lo != MIN_BOUND:
        pred["$gte"] = lo
    if hi != MAX_BOUND:
        pred["$lt"] = hi
    f: dict = {primary_id: pred} if pred else {}
    if user_query:
        f = {**user_query, **f}
    return f


@register_reader("mongodb")
def read_docstore(spark: SparkSession, p: dict) -> DataFrame:
    """Parallel document reads, one executor task per `_id` range.

    conf: connect (picklable callable -> client, see module docstring),
    db, collection, channel? (adviceNumber, default 4), column? (projection
    list; default: all keys of a sampled doc), query? (Mongo-style filter
    dict passed through to find), schema? (Spark DDL; default inferred from
    a driver-side 100-doc sample), fetchSize? (docs per Arrow batch),
    primaryId? (default "_id").
    """
    connect = p["connect"]
    db, coll = p["db"], p["collection"]
    channel = int(p.get("channel", 4))
    pid = p.get("primaryId", "_id")
    user_query = p.get("query")
    fetch = int(p.get("fetchSize", 10_000))

    client = connect()
    first = next(iter(client.find(db, coll, limit=1)), None)
    columns = list(p["column"]) if p.get("column") else (
        list(first) if first else [])
    if first is None:
        ranges: list[tuple] = []
    else:
        ranges = split_collection(client, db, coll, channel, primary_id=pid)
        if is_object_id(first.get(pid)):
            # ObjectId ids travel as hex strings (the reference re-wraps
            # oid.toHexString(), :129-135); normalize split points to
            # lowercase so the lexicographic range predicates match the
            # ObjectId byte order regardless of the server's hex casing
            ranges = [
                (lo.lower() if isinstance(lo, str) and lo != MIN_BOUND else lo,
                 hi.lower() if isinstance(hi, str) and hi != MAX_BOUND else hi)
                for lo, hi in ranges
            ]

    schema_ddl = p.get("schema")
    if not schema_ddl:
        sample = [d for _, d in zip(range(100), client.find(db, coll))]
        probe = spark.createDataFrame(
            [tuple(d.get(c) for c in columns) for d in sample]
            or [tuple(None for _ in columns)],
            columns or ["_id"],
        )
        schema_ddl = probe.schema.simpleString()[7:-1]  # strip struct<...>
    if not ranges:
        return spark.createDataFrame([], schema_ddl)

    names = list(columns)

    def run_ranges(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import json as _json

        for pdf in batches:
            for rng in pdf["range"]:
                lo, hi = _json.loads(rng)  # JSON keeps int/str bound types
                cl = connect()
                flt = _range_filter(pid, lo, hi, user_query)
                buf: list[tuple] = []
                for doc in cl.find(db, coll, filter=flt, projection=names):
                    buf.append(tuple(doc.get(c) for c in names))
                    if len(buf) >= fetch:
                        yield pd.DataFrame.from_records(buf, columns=names)
                        buf = []
                if buf:
                    yield pd.DataFrame.from_records(buf, columns=names)

    # one range per task, deterministically (same shape as dbapi._run_sqls:
    # spark.range(n, numPartitions=n) puts exactly one id in each partition);
    # bounds travel as JSON so numeric ids keep their type through the plan
    import json as _json

    import pyspark.sql.functions as F

    rng_arr = F.array(*[F.lit(_json.dumps(r)) for r in ranges])
    tasks = spark.range(0, len(ranges), 1, len(ranges)).select(
        F.element_at(rng_arr, F.col("id").cast("int") + 1).alias("range")
    )
    return tasks.mapInPandas(run_ranges, schema_ddl)
