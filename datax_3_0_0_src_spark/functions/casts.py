"""The DataX type system + cast matrix, as Column expressions.

Reference: 8 logical types with per-cell dynamic casts
(common/src/main/java/com/alibaba/datax/common/element/Column.java:51-74 —
asLong/asDouble/asString/asDate/asBytes/asBoolean; concrete columns
LongColumn.java:27-88, DateColumn.java:15-65, StringColumn.java) and the
globally-configured conversion rules in ColumnCast
(common/.../element/ColumnCast.java:62-117 — datetime format lists, timezone,
encoding). Unsupported casts throw CONVERT_NOT_SUPPORT; overflow is guarded
(OverFlowUtil.java:28,53).

Spark re-expression: a fixed StructType everywhere + these helpers. The
"dirty routing" contract (cast failure => quarantine, not job abort) maps to
``try_*`` functions returning NULL, paired with a reason column.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# ColumnCast.java default format cascade (datetime/date/time + extraFormats);
# we pin UTC (the reference pins GMT+8 — a config, not a semantic)
DEFAULT_TS_FORMATS = [
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd",
    "HH:mm:ss",
    "yyyy/MM/dd HH:mm:ss",
    "yyyyMMdd",
]


def to_timestamp_multi(col: Column | str, formats: list[str] | None = None) -> Column:
    """String -> timestamp with a fallback format cascade
    (ColumnCast.string2Date, ColumnCast.java:87-117)."""
    c = F.col(col) if isinstance(col, str) else col
    attempts = [F.try_to_timestamp(c, F.lit(f)) for f in (formats or DEFAULT_TS_FORMATS)]
    # numeric strings are epoch millis (LongColumn.asDate semantics)
    epoch_ms = F.when(
        c.rlike(r"^-?\d{11,}$"), F.timestamp_millis(c.cast("long"))
    )
    return F.coalesce(*attempts, epoch_ms)


def as_long(col: Column | str) -> Column:
    """asLong: bool->0/1, doubles truncate toward zero, strings parse (null on
    garbage — dirty-routing contract) (LongColumn.java:27-88)."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.lower(c.cast("string"))
    return F.coalesce(
        F.when(s.isin("true", "false"), (s == "true").cast("long")),
        s.try_cast("long"),
        s.try_cast("double").cast("long"),  # truncates toward zero
    )


def as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("string").try_cast("double")


def as_string(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("string")


def as_decimal(col: Column | str, precision: int = 38, scale: int = 6) -> Column:
    """asDecimal: exact numeric where 精度 matters — the reference reads
    NUMERIC/DECIMAL via BigDecimal strings (CommonRdbmsReader.java:277-280;
    DoubleColumn.asBigDecimal). try_cast => overflow/garbage routes to null
    (the OverFlowUtil.java:28,53 guard as dirty routing, not job abort)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("string").try_cast(f"decimal({precision},{scale})")


def as_bool(col: Column | str) -> Column:
    """asBoolean: "true"/"false" (case-insensitive), 1/0 longs
    (BoolColumn semantics); anything else null."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.lower(c.cast("string"))
    return (
        F.when(s.isin("true", "1"), F.lit(True))
        .when(s.isin("false", "0"), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def as_bytes(col: Column | str, charset: str = "UTF-8") -> Column:
    """asBytes: string encodes with the pinned charset (BytesColumn +
    ColumnCast.string2Bytes)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.encode(c.cast("string"), charset)


def as_timestamp(col: Column | str) -> Column:
    """asDate: longs are epoch millis, strings go through the format cascade
    (DateColumn.java:15-65, StringColumn date parse)."""
    c = F.col(col) if isinstance(col, str) else col
    s = c.cast("string")
    return F.when(
        s.rlike(r"^-?\d+$"), F.timestamp_millis(s.try_cast("long"))
    ).otherwise(to_timestamp_multi(s))


def try_cast_or_reason(col: Column | str, dtype: str, reason: str) -> tuple[Column, Column]:
    """(value, reason) pair: NULL value + reason when the cast fails on a
    non-null input — the TaskPluginCollector.collectDirtyRecord contract
    (AbstractTaskPluginCollector.java:53-76) as pure expressions."""
    c = F.col(col) if isinstance(col, str) else col
    v = c.cast("string").try_cast(dtype)
    r = F.when(c.isNotNull() & v.isNull(), F.lit(reason)).otherwise(F.lit(None).cast("string"))
    return v, r
