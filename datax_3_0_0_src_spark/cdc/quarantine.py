"""Dirty-record quarantine + error limits.

Reference parity:
- TaskPluginCollector.collectDirtyRecord routes failed records to a collector
  with a reason and counts them into metrics
  (core/src/main/java/com/alibaba/datax/core/statistics/plugin/task/AbstractTaskPluginCollector.java:53-76,
  DirtyRecord.java:15-76). Here: a single declarative validity predicate splits
  the batch; dirty rows land in a quarantine table with reason + source offset.
- ErrorRecordChecker fails the job when dirty counts cross an absolute or
  percentage threshold (core/.../util/ErrorRecordChecker.java:52-85). Here:
  ``check_error_limits`` raises after each micro-batch.

The validity rules are pure BYTE checks (no encoding round-trip) so the Spark
predicate and the pandas oracle cannot diverge:
  url IS NOT NULL, warc_ts IS NOT NULL, and for non-deletes html must start
  with b"<html>" and end with b"</body></html>".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

HTML_PREFIX = b"<html>"
HTML_SUFFIX = b"</body></html>"


def reason_col(op_col: str = "op", delete_op: str = "D") -> Column:
    """NULL when valid, else the first failing rule's name."""
    is_del = F.col(op_col) == F.lit(delete_op)
    html_ok = (
        F.col("html").isNotNull()
        & F.col("html").startswith(F.lit(HTML_PREFIX))
        & F.col("html").endswith(F.lit(HTML_SUFFIX))
    )
    return (
        F.when(F.col("url").isNull(), F.lit("null_url"))
        .when(F.col("warc_ts").isNull(), F.lit("null_ts"))
        .when(~is_del & ~html_ok, F.lit("bad_html"))
        .otherwise(F.lit(None).cast("string"))
    )


def split_quarantine(
    df: DataFrame, *, op_col: str = "op", delete_op: str = "D"
) -> tuple[DataFrame, DataFrame]:
    """(clean, dirty) — dirty carries a ``reason`` column."""
    tagged = df.withColumn("_reason", reason_col(op_col, delete_op))
    clean = tagged.filter(F.col("_reason").isNull()).drop("_reason")
    dirty = tagged.filter(F.col("_reason").isNotNull()).withColumnRenamed("_reason", "reason")
    return clean, dirty


class ErrorLimitExceeded(RuntimeError):
    pass


def check_error_limits(
    dirty_count: int,
    total_count: int,
    *,
    record_limit: int | None = None,
    percentage_limit: float | None = None,
) -> None:
    """Abort semantics of ErrorRecordChecker.checkRecordLimit/checkPercentageLimit."""
    if record_limit is not None and dirty_count > record_limit:
        raise ErrorLimitExceeded(
            f"dirty records {dirty_count} exceed absolute limit {record_limit}"
        )
    if percentage_limit is not None and total_count > 0:
        pct = dirty_count / total_count
        if pct > percentage_limit:
            raise ErrorLimitExceeded(
                f"dirty ratio {pct:.4f} exceeds limit {percentage_limit:.4f}"
            )
