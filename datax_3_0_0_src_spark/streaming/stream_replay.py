"""Structured-Streaming front-end for the CDC replayer.

The engine's primary mode is driver-planned batch epochs (deterministic,
resumable — mirrors DataX's job->taskGroup->task planning, SURVEY §2.6). This
module provides the continuous-tail alternative: ``readStream`` over the WAL
directory -> ``foreachBatch`` in which each micro-batch goes through the same
validate -> quarantine -> LWW dedup -> extract -> MERGE pipeline against the
same LakeTable. Exactly-once = Spark's streaming checkpoint (offset tracking)
+ the LWW-idempotent MERGE (re-delivered batches converge).

Reference parity: otsstreamreader's continuous shard tail with per-shard
checkpoints (otsstreamreader/.../core/RecordProcessor.java:137-248).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..cdc.dedup import dedup_lww
from ..cdc.extract import with_extracted_text
from ..cdc.quarantine import split_quarantine
from ..lake.table import LakeTable

EVENT_STREAM_DDL = ("log_offset long, op string, url string, "
                    "warc_ts timestamp, html binary, lang string")


class StreamReplayer:
    def __init__(
        self,
        spark: SparkSession,
        *,
        log_dir: str,
        table: LakeTable,
        work_dir: str,
        schema_ddl: str = EVENT_STREAM_DDL,
        max_files_per_trigger: int | None = None,
    ):
        self.spark = spark
        self.log_dir = log_dir
        self.table = table
        self.work_dir = work_dir
        self.schema_ddl = schema_ddl
        self.max_files_per_trigger = max_files_per_trigger

    def _apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        clean, dirty = split_quarantine(batch)
        (dirty.select("log_offset", F.col("url"), "reason",
                      F.col("html").alias("raw_payload"))
         .write.mode("overwrite")
         .parquet(os.path.join(self.work_dir, f"quarantine/batch={batch_id}")))
        if clean.isEmpty():
            return
        is_del = F.col("op") == F.lit("D")
        enriched = with_extracted_text(
            clean.withColumn("html", F.when(is_del, None).otherwise(F.col("html")))
        )
        winners = dedup_lww(enriched)
        self.table.merge(winners, seq_col="log_offset", op_col="op",
                         properties={"stream_batch_id": batch_id})

    def start(self, *, trigger_once: bool = False):
        """Start the streaming query; returns the StreamingQuery handle."""
        reader = (
            self.spark.readStream.schema(self.schema_ddl)
            .option("recursiveFileLookup", "true")
        )
        if self.max_files_per_trigger:
            # rate limiting, streaming flavor (Channel speed caps, F5)
            reader = reader.option("maxFilesPerTrigger", str(self.max_files_per_trigger))
        events = reader.parquet(self.log_dir)
        writer = (
            events.writeStream
            .foreachBatch(self._apply_batch)
            .option("checkpointLocation", os.path.join(self.work_dir, "stream_ckpt"))
        )
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
