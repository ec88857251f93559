"""datax_3_0_0_src_spark — a from-scratch PySpark-native CDC / incremental-ingest engine.

Re-expresses the capabilities of DataX 3.0 (reference: tanbingshi666/datax-3.0.0-src,
read-only at /root/reference) as an idiomatic Spark engine:

- reader -> channel -> writer pipeline        => DataFrame plan -> shuffle -> lake MERGE
- job -> taskGroup -> task split              => driver-planned epochs + url-hash buckets
- per-record transformers (dx_*)              => Column expressions / pandas_udf
- dirty-record quarantine + error limits      => validation split -> quarantine table
- channel rate limiting                       => per-epoch event caps
- per-task Communication metrics              => lineage/metrics table (partition, epoch)
- OTS stream reader checkpoints               => epoch checkpoint protocol + idempotent MERGE

The target is an Iceberg-style lake table of Common-Crawl-like web pages
(url, warc_ts, html, text, lang) maintained by last-writer-wins replay of a
binlog/WAL change-event log. Since no Iceberg runtime jars ship in this
environment, ``lake/`` implements the required subset (atomic snapshot commits,
copy-on-write MERGE, additive schema evolution, time travel) natively on parquet.
"""

__version__ = "0.1.0"
