"""LakeTable — snapshot-isolated, url-hash-bucketed parquet table with MERGE.

Implements the Iceberg subset the CDC engine needs, natively on parquet (no
Iceberg jars ship in this environment):

- atomic snapshot commits (manifest + pointer swap)            -> exactly-once sinks
- copy-on-write MERGE INTO by key with LWW ordering            -> upsert/delete apply
- hash-bucket layout: only buckets touched by a batch rewrite  -> bounded write amp
- additive schema evolution with null backfill                 -> ALTER TABLE ADD COLUMN
- tombstoned deletes                                           -> late events can't resurrect rows
- time travel by snapshot version                              -> audits / resume reconcile

Reference parity: upsert semantics mirror DataX's writeMode=update
(INSERT ... ON DUPLICATE KEY UPDATE template,
plugin-rdbms-util/src/main/java/com/alibaba/datax/plugin/rdbms/writer/util/WriterUtil.java:148-168)
and the commit protocol mirrors hdfswriter's temp-dir + rename
(hdfswriter/.../HdfsHelper.java:207-243), upgraded to snapshot isolation.

Scale design: a MERGE plans against the manifest only (driver-side KB of JSON),
reads just the touched buckets' files (partition pruning by construction),
shuffles once on the merge key (AQE skew-join splits hot keys), and rewrites
only touched buckets. Untouched data is never read or written. Bucket count is
chosen at table creation to keep per-bucket rewrite size ~file-group sized at
the target scale (e.g. 4096 buckets for 100 TB => ~25 GB/bucket, subdivided
into many parquet files by Spark's maxRecordsPerFile/partition count).
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import BooleanType, LongType, StructField, StructType

from .manifest import Snapshot, read_snapshot, write_snapshot

# system columns persisted in data files (never exposed by read())
SYS_OFFSET = "_lww_offset"   # sequence number of the winning event (LWW tiebreak)
SYS_DELETED = "_deleted"     # tombstone flag
SYS_BUCKET = "_bucket"       # partition-directory column (not stored inside files)


@dataclass
class MergeStats:
    version: int
    touched_buckets: int
    batch_rows: int
    batch_deletes: int
    new_files: int
    rows_per_bucket: dict | None = None  # bucket -> batch rows applied there


class LakeTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # ------------------------------------------------------------- lifecycle
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        schema: StructType,
        *,
        key: str,
        ts_col: str,
        num_buckets: int = 16,
        properties: dict | None = None,
    ) -> "LakeTable":
        if read_snapshot(path) is not None:
            raise FileExistsError(f"LakeTable already exists at {path}")
        if key not in schema.fieldNames() or ts_col not in schema.fieldNames():
            raise ValueError(f"key={key!r} and ts_col={ts_col!r} must be in schema")
        props = dict(properties or {})
        props.update({"key": key, "ts_col": ts_col})
        snap = Snapshot(
            version=0,
            parent=None,
            schema_json=schema.json(),
            num_buckets=num_buckets,
            files={},
            properties=props,
            summary={"created": True},
        )
        write_snapshot(path, snap)
        return cls(spark, path)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "LakeTable":
        if read_snapshot(path) is None:
            raise FileNotFoundError(f"no LakeTable at {path}")
        return cls(spark, path)

    @classmethod
    def exists(cls, path: str) -> bool:
        return read_snapshot(path) is not None

    # ------------------------------------------------------------- metadata
    def snapshot(self, version: int | None = None) -> Snapshot:
        snap = read_snapshot(self.path, version)
        if snap is None:
            raise FileNotFoundError(f"no snapshot v{version} at {self.path}")
        return snap

    def schema(self, version: int | None = None) -> StructType:
        return StructType.fromJson(__import__("json").loads(self.snapshot(version).schema_json))

    def _physical_schema(self, user_schema: StructType) -> StructType:
        return StructType(
            list(user_schema.fields)
            + [StructField(SYS_OFFSET, LongType(), True), StructField(SYS_DELETED, BooleanType(), True)]
        )

    @property
    def key(self) -> str:
        return self.snapshot().properties["key"]

    @property
    def ts_col(self) -> str:
        return self.snapshot().properties["ts_col"]

    @property
    def num_buckets(self) -> int:
        return self.snapshot().num_buckets

    def property(self, name: str, default=None):
        return self.snapshot().properties.get(name, default)

    def _bucket_expr(self, col: str):
        return F.pmod(F.xxhash64(F.col(col)), F.lit(self.num_buckets)).cast("int")

    # ------------------------------------------------------------- read path
    def _read_files(self, files: list[str], schema: StructType) -> DataFrame:
        if not files:
            return self.spark.createDataFrame([], schema)
        paths = [os.path.join(self.path, f) for f in files]
        # explicit schema => additive evolution backfills missing columns as null
        return self.spark.read.schema(schema).parquet(*paths)

    def read(
        self,
        version: int | None = None,
        *,
        include_deleted: bool = False,
        buckets: list[int] | None = None,
        with_sys_cols: bool = False,
    ) -> DataFrame:
        snap = self.snapshot(version)
        user_schema = StructType.fromJson(__import__("json").loads(snap.schema_json))
        phys = self._physical_schema(user_schema)
        if buckets is None:
            files = snap.all_files()
        else:
            files = [f for b in buckets for f in snap.bucket_files(b)]
        df = self._read_files(files, phys)
        if not include_deleted:
            df = df.filter(~F.coalesce(F.col(SYS_DELETED), F.lit(False)))
        if not with_sys_cols:
            df = df.select(*user_schema.fieldNames())
        return df

    # ------------------------------------------------------------ merge path
    def merge(
        self,
        batch: DataFrame,
        *,
        seq_col: str = "log_offset",
        op_col: str | None = "op",
        delete_op: str = "D",
        properties: dict | None = None,
        plan_rows_per_bucket: dict[int, int] | None = None,
    ) -> MergeStats:
        """Copy-on-write MERGE INTO: last-writer-wins upsert/delete by key.

        ``batch`` must contain at most one row per key (use cdc.dedup first),
        the table's key and ts columns, ``seq_col`` (monotone tiebreak, e.g.
        WAL offset), optionally ``op_col`` (rows with value ``delete_op``
        become tombstones), and any subset/superset of user payload columns —
        extra columns trigger additive schema evolution, missing ones are
        null-filled for inserted rows.

        Semantics match: MERGE INTO t USING s ON t.key = s.key
          WHEN MATCHED AND s is newer AND s.op = 'D' THEN DELETE (tombstone)
          WHEN MATCHED AND s is newer THEN UPDATE SET *
          WHEN NOT MATCHED THEN INSERT * (or tombstone for op='D')
        where "newer" = (s.ts, s.seq) > (t.ts, t._lww_offset).

        ``plan_rows_per_bucket``: optional precomputed {bucket: row_count} for
        the batch (e.g. from an upstream per-partition stat pass). When given,
        the planning aggregation is skipped and the batch pipeline is evaluated
        exactly once (matters when it embeds expensive stages like Arrow UDFs).
        """
        snap = self.snapshot()
        key, ts_col, nb = snap.properties["key"], snap.properties["ts_col"], snap.num_buckets
        old_schema = StructType.fromJson(__import__("json").loads(snap.schema_json))

        # --- additive schema evolution ---------------------------------
        reserved = {seq_col, op_col, SYS_OFFSET, SYS_DELETED, SYS_BUCKET}
        batch_fields = {f.name: f for f in batch.schema.fields}
        new_fields = [
            f for f in batch.schema.fields
            if f.name not in old_schema.fieldNames() and f.name not in reserved
        ]
        user_schema = StructType(list(old_schema.fields) + [
            StructField(f.name, f.dataType, True) for f in new_fields
        ])
        phys = self._physical_schema(user_schema)

        # --- normalize the batch to physical shape ---------------------
        is_del = (
            (F.col(op_col) == F.lit(delete_op)) if op_col and op_col in batch.columns
            else F.lit(False)
        )
        cols = []
        for f in user_schema.fields:
            if f.name in batch_fields:
                c = F.col(f.name)
                if batch_fields[f.name].dataType != f.dataType:
                    c = c.cast(f.dataType)
                # else: leave the bare attribute — a no-op cast would discard
                # the batch's hash(key) output partitioning and force an extra
                # shuffle in the merge join
            else:
                c = F.lit(None).cast(f.dataType)
            if f.name not in (key, ts_col):
                # a delete's stale payload must not leak into the tombstone
                c = F.when(is_del, F.lit(None).cast(f.dataType)).otherwise(c)
            cols.append(c.alias(f.name))
        cols.append(F.col(seq_col).cast("long").alias(SYS_OFFSET))
        cols.append(is_del.alias(SYS_DELETED))
        s = batch.select(*cols)

        # --- plan: touched buckets only --------------------------------
        # (uncached: recomputing the batch twice beats caching wide binary
        # rows, which thrashes at high core counts — see cdc/replayer.py)
        s = s.withColumn(SYS_BUCKET, self._bucket_expr(key))
        if plan_rows_per_bucket is not None:
            per_bucket = {int(b): int(n) for b, n in plan_rows_per_bucket.items() if n}
            batch_deletes = -1  # unknown without the agg; metrics use the plan
        else:
            agg = s.groupBy(SYS_BUCKET).agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col(SYS_DELETED).cast("long")).alias("d"),
            ).collect()
            per_bucket = {int(r[SYS_BUCKET]): int(r["n"]) for r in agg}
            batch_deletes = int(sum(r["d"] for r in agg))
        touched = sorted(per_bucket)
        batch_rows = int(sum(per_bucket.values()))
        if not touched:  # empty batch: still commit a (metadata-only) snapshot
            new_snap = Snapshot(
                version=snap.version + 1, parent=snap.version,
                schema_json=user_schema.json(), num_buckets=nb, files=dict(snap.files),
                properties={**snap.properties, **(properties or {})},
                summary={"touched_buckets": 0, "batch_rows": 0, "batch_deletes": 0},
            )
            write_snapshot(self.path, new_snap)
            return MergeStats(new_snap.version, 0, 0, 0, 0, {})

        touched_files = [f for b in touched for f in snap.bucket_files(b)]
        e = self._read_files(touched_files, phys)

        # --- LWW full-outer resolve ------------------------------------
        e, s = e.alias("e"), s.alias("s")
        joined = e.join(s, F.col(f"e.{key}") == F.col(f"s.{key}"), "full_outer")
        s_newer = F.col(f"s.{key}").isNotNull() & (
            F.col(f"e.{key}").isNull()
            | (F.col(f"s.{ts_col}") > F.col(f"e.{ts_col}"))
            | ((F.col(f"s.{ts_col}") == F.col(f"e.{ts_col}"))
               & (F.col(f"s.{SYS_OFFSET}") > F.col(f"e.{SYS_OFFSET}")))
        )
        out_cols = [
            F.when(s_newer, F.col(f"s.{f.name}")).otherwise(F.col(f"e.{f.name}")).alias(f.name)
            for f in phys.fields
        ]
        merged = joined.select(*out_cols).withColumn(SYS_BUCKET, self._bucket_expr(key))

        # Controlled file layout: without this, every join task writes into
        # every touched bucket => tasks x buckets tiny files, which compounds
        # into slow snapshot scans. Repartition on (bucket, salt) so the commit
        # produces ~salt files per bucket while keeping writes parallel.
        par = self.spark.sparkContext.defaultParallelism
        write_salt = max(1, par // max(1, len(touched)))
        merged = merged.repartition(
            max(len(touched) * write_salt, 1),
            F.col(SYS_BUCKET),
            F.pmod(F.xxhash64(F.col(key)), F.lit(write_salt)),
        )

        # --- write touched buckets, commit snapshot ---------------------
        version = snap.version + 1
        rel_dir = f"data/v{version:08d}"
        out_dir = os.path.join(self.path, rel_dir)
        (merged.write.mode("errorifexists").partitionBy(SYS_BUCKET).parquet(out_dir))

        new_files: dict[str, list[str]] = {
            b: list(fs) for b, fs in snap.files.items() if int(b) not in touched
        }
        n_new = 0
        for b in touched:
            bdir = os.path.join(out_dir, f"{SYS_BUCKET}={b}")
            if os.path.isdir(bdir):
                fs = sorted(
                    f"{rel_dir}/{SYS_BUCKET}={b}/{fn}"
                    for fn in os.listdir(bdir)
                    if fn.endswith(".parquet")
                )
                if fs:
                    new_files[str(b)] = fs
                    n_new += len(fs)
        new_snap = Snapshot(
            version=version, parent=snap.version,
            schema_json=user_schema.json(), num_buckets=nb, files=new_files,
            properties={**snap.properties, **(properties or {})},
            summary={
                "touched_buckets": len(touched),
                "batch_rows": batch_rows,
                "batch_deletes": batch_deletes,
                "new_files": n_new,
            },
        )
        write_snapshot(self.path, new_snap)
        return MergeStats(version, len(touched), batch_rows, batch_deletes, n_new, per_bucket)

    # ------------------------------------------------------------- append
    def append(self, df: DataFrame, *, properties: dict | None = None) -> MergeStats:
        """Blind append (no key resolution) — for quarantine/metrics tables."""
        snap = self.snapshot()
        user_schema = StructType.fromJson(__import__("json").loads(snap.schema_json))
        key = snap.properties["key"]
        out = df.select(*[F.col(f.name).cast(f.dataType).alias(f.name) for f in user_schema.fields])
        out = (
            out.withColumn(SYS_OFFSET, F.lit(None).cast("long"))
            .withColumn(SYS_DELETED, F.lit(False))
            .withColumn(SYS_BUCKET, self._bucket_expr(key))
        )
        version = snap.version + 1
        rel_dir = f"data/v{version:08d}"
        out_dir = os.path.join(self.path, rel_dir)
        out.write.mode("errorifexists").partitionBy(SYS_BUCKET).parquet(out_dir)
        new_files = {b: list(fs) for b, fs in snap.files.items()}
        n_new = 0
        if os.path.isdir(out_dir):
            for d in sorted(os.listdir(out_dir)):
                if not d.startswith(f"{SYS_BUCKET}="):
                    continue
                b = d.split("=", 1)[1]
                fs = sorted(
                    f"{rel_dir}/{d}/{fn}" for fn in os.listdir(os.path.join(out_dir, d))
                    if fn.endswith(".parquet")
                )
                new_files.setdefault(b, [])
                new_files[b] = new_files[b] + fs
                n_new += len(fs)
        new_snap = Snapshot(
            version=version, parent=snap.version, schema_json=snap.schema_json,
            num_buckets=snap.num_buckets, files=new_files,
            properties={**snap.properties, **(properties or {})},
            summary={"appended_files": n_new},
        )
        write_snapshot(self.path, new_snap)
        return MergeStats(version, 0, 0, 0, n_new)

    # --------------------------------------------------------- maintenance
    def compact(self, *, target_files_per_bucket: int = 1,
                buckets: list[int] | None = None) -> MergeStats:
        """Rewrite fragmented buckets into ~target_files_per_bucket files each
        (Iceberg rewrite_data_files equivalent). Metadata-only for buckets
        already at/below the target; commits one new snapshot. Tombstones are
        preserved (they guard against late-event resurrection)."""
        snap = self.snapshot()
        user_schema = StructType.fromJson(__import__("json").loads(snap.schema_json))
        phys = self._physical_schema(user_schema)
        key = snap.properties["key"]
        todo = [
            int(b) for b, fs in snap.files.items()
            if len(fs) > target_files_per_bucket
            and (buckets is None or int(b) in buckets)
        ]
        if not todo:
            return MergeStats(snap.version, 0, 0, 0, 0, {})
        df = self._read_files([f for b in todo for f in snap.bucket_files(b)], phys)
        df = df.withColumn(SYS_BUCKET, self._bucket_expr(key))
        if target_files_per_bucket == 1:
            df = df.repartition(len(todo), F.col(SYS_BUCKET))
        else:
            df = df.repartition(
                len(todo) * target_files_per_bucket, F.col(SYS_BUCKET),
                F.pmod(F.xxhash64(F.col(key)), F.lit(target_files_per_bucket)),
            )
        version = snap.version + 1
        rel_dir = f"data/v{version:08d}"
        out_dir = os.path.join(self.path, rel_dir)
        df.write.mode("errorifexists").partitionBy(SYS_BUCKET).parquet(out_dir)
        new_files = {b: list(fs) for b, fs in snap.files.items() if int(b) not in todo}
        n_new = 0
        for b in todo:
            bdir = os.path.join(out_dir, f"{SYS_BUCKET}={b}")
            if os.path.isdir(bdir):
                fs = sorted(
                    f"{rel_dir}/{SYS_BUCKET}={b}/{fn}"
                    for fn in os.listdir(bdir) if fn.endswith(".parquet")
                )
                if fs:
                    new_files[str(b)] = fs
                    n_new += len(fs)
        new_snap = Snapshot(
            version=version, parent=snap.version, schema_json=snap.schema_json,
            num_buckets=snap.num_buckets, files=new_files,
            properties=dict(snap.properties),
            summary={"compacted_buckets": len(todo), "new_files": n_new},
        )
        write_snapshot(self.path, new_snap)
        return MergeStats(version, len(todo), 0, 0, n_new, {})

    def expire_snapshots(self, keep_last: int = 2) -> int:
        """Delete data files referenced only by expired snapshots (GC).

        Equivalent of Iceberg expire_snapshots; keeps time travel for the
        newest ``keep_last`` versions.
        """
        meta = os.path.join(self.path, "_meta")
        versions = sorted(
            int(f[1:9]) for f in os.listdir(meta) if f.startswith("v") and f.endswith(".json")
        )
        keep = set(versions[-keep_last:])
        live: set[str] = set()
        for v in keep:
            live.update(self.snapshot(v).all_files())
        removed = 0
        data_root = os.path.join(self.path, "data")
        if os.path.isdir(data_root):
            for vdir in sorted(os.listdir(data_root)):
                for root, _dirs, fns in os.walk(os.path.join(data_root, vdir)):
                    for fn in fns:
                        rel = os.path.relpath(os.path.join(root, fn), self.path)
                        if fn.endswith(".parquet") and rel not in live:
                            os.unlink(os.path.join(root, fn))
                            removed += 1
        for v in versions:
            if v not in keep:
                os.unlink(os.path.join(meta, f"v{v:08d}.json"))
        # prune empty dirs
        if os.path.isdir(data_root):
            for vdir in list(os.listdir(data_root)):
                p = os.path.join(data_root, vdir)
                for root, dirs, fns in os.walk(p, topdown=False):
                    if not os.listdir(root):
                        os.rmdir(root)
        return removed

    def drop(self) -> None:
        shutil.rmtree(self.path, ignore_errors=True)
