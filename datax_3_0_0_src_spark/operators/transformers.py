"""The five built-in per-record transformers, re-expressed as Column ops.

Reference registry: core/src/main/java/com/alibaba/datax/core/transport/
transformer/TransformerRegistry.java:34-38 — dx_substr, dx_pad, dx_replace,
dx_filter, dx_groovy. All were Record -> Record|null (null = drop row); here
each is a declarative Column expression (whole-stage-codegen'd, no Python) and
dx_filter is a DataFrame filter. dx_groovy (the UDF escape hatch,
GroovyTransformer.java:25-88) maps to pandas_udf — see cdc.extract for the
engine's use.

A TransformerPipeline mirrors TransformerExchanger.doTransformer's ordered
application (core/.../transport/exchanger/TransformerExchanger.java:53-127).

The SPI registry (``register_transformer``) mirrors
TransformerRegistry.registTransformer (core/.../transport/transformer/
TransformerRegistry.java:28-62): user code registers a named transformer
(typically wrapping an Arrow ``pandas_udf`` — the dx_groovy slot) and job
specs invoke it by name like any built-in.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, functions as F

# SPI registry: name -> fn(df, column_name, paras) -> DataFrame
TRANSFORMERS: dict[str, Callable[[DataFrame, str, list], DataFrame]] = {}
# provenance of dynamically loaded entries ("module:function" class refs) —
# lets job-spec loading detect a name bound to a DIFFERENT target (the
# reference's isConfliction check) instead of silently ignoring the spec
_SPI_CLASS_REFS: dict[str, str] = {}


def register_transformer(name: str):
    """Decorator: register a custom transformer under a job-spec-visible name
    (TransformerRegistry.registTransformer parity; duplicate names rejected
    like the reference's isConfliction check)."""
    def deco(fn: Callable[[DataFrame, str, list], DataFrame]):
        if name in TRANSFORMERS:
            raise ValueError(f"transformer {name!r} already registered")
        TRANSFORMERS[name] = fn
        return fn

    return deco


def transformer_names() -> list[str]:
    return sorted(TRANSFORMERS)


def dx_substr(col: str, start: int, length: int) -> Column:
    """SubstrTransformer.java:21-64 — substring clamped at end; null passes."""
    return F.substring(F.col(col), start + 1, length)


def dx_pad(col: str, side: str, length: int, pad: str) -> Column:
    """PadTransformer.java:21-89 — lpad/rpad, truncates if longer; null -> ''."""
    base = F.coalesce(F.col(col), F.lit(""))
    if side == "l":
        return F.lpad(base, length, pad)
    if side == "r":
        return F.rpad(base, length, pad)
    raise ValueError(f"pad side must be 'l' or 'r', got {side!r}")


def dx_replace(col: str, start: int, length: int, replace: str) -> Column:
    """ReplaceTransformer.java:21-65 — splice-replace [start, start+length)."""
    c = F.col(col)
    return F.concat(
        F.substring(c, 1, start),
        F.lit(replace),
        F.when(F.length(c) > start + length,
               F.expr(f"substring({col}, {start + length + 1})")).otherwise(F.lit("")),
    )


_OPS = {
    ">": lambda c, v: c > v,
    "<": lambda c, v: c < v,
    ">=": lambda c, v: c >= v,
    "<=": lambda c, v: c <= v,
    "=": lambda c, v: c == v,
    "!=": lambda c, v: c != v,
}


def dx_filter(df: DataFrame, col: str, op: str, value) -> DataFrame:
    """FilterTransformer.java:20-310 — rows MATCHING the predicate are DROPPED
    (DataX semantics: filter means filter OUT)."""
    c = F.col(col)
    if op == "like":
        pred = c.rlike(value)
    elif op == "not like":
        pred = ~c.rlike(value)
    else:
        pred = _OPS[op](c, F.lit(value))
    # null-column rule (FilterTransformer): nulls never match value compares
    return df.filter(~F.coalesce(pred, F.lit(False)))


class TransformerPipeline:
    """Ordered transformer application (TransformerExchanger.java:53-127)."""

    def __init__(self):
        self._steps: list = []

    def with_column(self, name: str, col: Column) -> "TransformerPipeline":
        self._steps.append(("col", name, col))
        return self

    def filter_out(self, col: str, op: str, value) -> "TransformerPipeline":
        self._steps.append(("filter", col, (op, value)))
        return self

    def apply(self, df: DataFrame) -> DataFrame:
        for kind, a, b in self._steps:
            if kind == "col":
                df = df.withColumn(a, b)
            else:
                df = dx_filter(df, a, *b)
        return df
